package graft

import java.nio.channels.{Channels, SocketChannel}
import java.net.UnixDomainSocketAddress
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._


import graft.codec.{DnsWire, DnstapCodec}
import graft.sinks.BatchSink
import graft.sources.FrameStreams
import graft.streaming.DnstapPipeline

/** Sustained ingest→aggregate→sink throughput of the reference pipeline
  * (BASELINE.md's "ingest→aggregate→sink rows/s" BENCH line): dnstap
  * protobuf frames rendered from the events table are pushed at full
  * speed by concurrent framestream emitters through the REAL unix-socket
  * source (`graft-dnstap`, bidirectional handshake, reader pool), decoded
  * and aggregated by the W1 grouping-set branch (client queries + non-OK
  * client responses, reference aggregator.go:240-330's core loop), and
  * delivered to counting sinks per micro-batch.
  *
  * The measured window opens when the emitters start writing and closes
  * when the micro-batch that consumed the final frame COMMITS (its sink
  * writes run inside foreachBatch, before the progress event fires) — so
  * the rate is end-to-end through the sink, feed concurrent with
  * processing, exactly the reference's operating shape. rows/s counts
  * ingested frames (one dnstap MESSAGE per frame), the reference's unit.
  *
  * Scale shape: emitters and the socket reader pool are the single-node
  * ingest edge (the reference is also one listener per host); everything
  * downstream of the source is ordinary distributed Spark (the decode
  * flatMap parallelizes over the reader-pool partition split, the
  * grouping-set aggregation shuffles on its keys). On a cluster the same
  * topology runs one socket source per receiving executor.
  */
object PipelineThroughput {

  /** One micro-batch's progress snapshot, captured from the polling
    * loop (r19, VERDICT #2): when a trial lands far below the journal
    * band, these are what make the anomaly ATTRIBUTABLE — a feed stall
    * shows batches with few rows, an agg stall shows few long batches,
    * a sink stall shows committed offsets frozen while wall advances. */
  final case class BatchProg(batchId: Long, rows: Long, ms: Long,
                             offset: Long)

  final case class Result(frames: Long, secs: Double, rowsPerSec: Double,
                          queryAggRows: Long, responseAggRows: Long,
                          batches: Long,
                          batchProgress: Seq[BatchProg] = Nil)

  private final class CountingSink extends BatchSink {
    val rows = new AtomicLong(0L)
    override def write(df: DataFrame, batchId: Long): Unit = {
      rows.addAndGet(df.count()); ()
    }
  }

  /** Two dnstap frames per events row — a ClientQuery (the q25 rendering)
    * and a ClientResponse 200 ms later whose rcode is NOERROR for 3 of 4
    * rows (exercising the Fl4 early drop; the surviving quarter flows to
    * the response aggregation). Encoded on executors, collected once,
    * replayed `repeats` times by the emitters. */
  private[graft] def frameSet(spark: SparkSession, dir: String): Array[Array[Byte]] = {
    import spark.implicits._
    val qtypeCodes = Array(1, 5, 15, 16, 28, 65, 9999)
    Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        get_json_object(col("props"), "$.k").as("k"))
      .as[(Long, java.sql.Timestamp, Long, String, String)]
      .flatMap { case (eventId, ts, userId, eventType, k) =>
        val addr = Array(
          ((userId >> 24) & 0xff).toByte, ((userId >> 16) & 0xff).toByte,
          ((userId >> 8) & 0xff).toByte, (userId & 0xff).toByte)
        val id = (eventId % 65536).toInt
        val port = (1024 + userId % 60000).toInt
        val qs = Seq(DnsWire.Question(s"q$k.example.com.",
          qtypeCodes((userId % 7).toInt)))
        val inst = ts.toInstant
        val query = DnstapCodec.encode(DnstapCodec.Frame(DnstapCodec.TypeMessage,
          Some(eventType), Some(DnstapCodec.Message(DnstapCodec.ClientQuery,
            queryAddress = Some(addr), queryPort = Some(port),
            queryTimeSec = Some(inst.getEpochSecond),
            queryTimeNsec = Some(inst.getNano),
            queryMessage = Some(DnsWire.encode(id, 0, isResponse = false, qs))))))
        val rcode = if (userId % 4 == 0) 3 else 0
        val response = DnstapCodec.encode(DnstapCodec.Frame(DnstapCodec.TypeMessage,
          Some(eventType), Some(DnstapCodec.Message(DnstapCodec.ClientResponse,
            queryAddress = Some(addr), queryPort = Some(port),
            responseTimeSec = Some(inst.getEpochSecond),
            responseTimeNsec = Some(inst.getNano + 200000),
            responseMessage = Some(DnsWire.encode(id, rcode, isResponse = true, qs))))))
        Seq(query, response)
      }
      .collect()
  }

  /** `throttleNanosPerFrame` (test-only, default 0 = full speed)
    * park-delays every emitted frame — the artificially-slow feed the
    * anomaly-attribution spec drives without touching the real path. */
  def run(spark: SparkSession, sfDir: String, targetFrames: Long = 1000000L,
          emitters: Int = 4, deadlineSecs: Int = 600,
          throttleNanosPerFrame: Long = 0L): Result = {
    import spark.implicits._
    val frames = frameSet(spark, sfDir)
    require(frames.nonEmpty, s"no events at $sfDir")
    val repeats = math.max(1L, (targetFrames + frames.length - 1) / frames.length)
    val total = frames.length * repeats

    val dir = Files.createTempDirectory("graft-pipe-bench")
    val sock = dir.resolve("dnstap.sock").toString
    val src = spark.readStream.format("graft-dnstap")
      .option("path", sock)
      .option("readers", 16)
      .load()
      .select(col("value")).as[Array[Byte]]

    val qSink = new CountingSink
    val rSink = new CountingSink
    val cfg = DnstapPipeline.Config(clientResponseTimeSamples = false)

    val running = DnstapPipeline.start(spark, src, cfg,
      DnstapPipeline.Sinks(qSink, rSink, new CountingSink),
      s"$dir/ckpt", instantTriggers = true)
    val aggQuery = running.head
    try {
      val bindDeadline = System.nanoTime() + 30L * 1000000000L
      while (!Files.exists(Paths.get(sock)) && System.nanoTime() < bindDeadline)
        Thread.sleep(20)
      require(Files.exists(Paths.get(sock)), "socket never bound")

      val t0 = System.nanoTime()
      val workers = (0 until emitters).map { w =>
        val th = new Thread(() => {
          val conn = SocketChannel.open(UnixDomainSocketAddress.of(sock))
          try {
            val out = new java.io.BufferedOutputStream(
              Channels.newOutputStream(conn), 1 << 16)
            val in = new java.io.DataInputStream(Channels.newInputStream(conn))
            def readControl(): Unit = {
              require(in.readInt() == 0)
              val p = new Array[Byte](in.readInt()); in.readFully(p)
            }
            FrameStreams.writeControlFrame(out, FrameStreams.ControlReady,
              Seq(FrameStreams.ContentTypeDnstap))
            out.flush(); readControl() // ACCEPT
            FrameStreams.writeControlFrame(out, FrameStreams.ControlStart)
            // emitter w owns every frame index ≡ w (mod emitters), all repeats
            var r = 0L
            while (r < repeats) {
              var i = w
              while (i < frames.length) {
                FrameStreams.writeDataFrame(out, frames(i))
                if (throttleNanosPerFrame > 0L)
                  java.util.concurrent.locks.LockSupport
                    .parkNanos(throttleNanosPerFrame)
                i += emitters
              }
              r += 1
            }
            FrameStreams.writeControlFrame(out, FrameStreams.ControlStop)
            out.flush(); readControl() // FINISH
          } finally conn.close()
        }, s"graft-pipe-emitter-$w")
        th.setDaemon(true); th.start(); th
      }

      // Completion = the committed source offset of the last FINISHED
      // batch reaches `total` (its foreachBatch sink writes ran before
      // the progress was published). lastProgress is written
      // synchronously by the stream-execution thread — unlike
      // StreamingQueryListener events, which ride the async listener bus
      // and can be DROPPED under load (a dropped event would hang a
      // listener-based wait forever). Polled at 20 ms: ±20 ms on a
      // multi-second window.
      val deadline = System.nanoTime() + deadlineSecs * 1000000000L
      var tDone = 0L
      var committed = 0L
      val dataBatches = scala.collection.mutable.Set.empty[Long]
      // per-batch snapshots for anomaly attribution (last poll of each
      // batch id wins — the 20 ms poll sees every multi-ms batch)
      val progByBatch = scala.collection.mutable.LinkedHashMap
        .empty[Long, BatchProg]
      while (tDone == 0L && System.nanoTime() < deadline) {
        running.foreach(q => q.exception.foreach(e => throw e))
        val p = aggQuery.lastProgress
        if (p != null && p.sources.nonEmpty) {
          committed = math.max(committed, p.sources.head.endOffset.toLong)
          if (p.numInputRows > 0) dataBatches += p.batchId
          val ms = Option(p.durationMs)
            .flatMap(d => Option(d.get("triggerExecution")))
            .map(_.longValue).getOrElse(-1L)
          progByBatch.put(p.batchId,
            BatchProg(p.batchId, p.numInputRows, ms, committed))
          if (committed >= total) tDone = System.nanoTime()
        }
        if (tDone == 0L) Thread.sleep(20)
      }
      // a deadline stall never constructs a Result, so the per-batch
      // progress would be lost exactly when it matters — carry its tail
      // in the exception message, which the bench journals (r19)
      if (tDone == 0L) {
        val tail = progByBatch.values.toSeq.takeRight(5)
          .map(p => s"batch ${p.batchId}: rows=${p.rows} ms=${p.ms} " +
            s"offset=${p.offset}").mkString("; ")
        throw new IllegalStateException(
          s"pipeline committed $committed of $total frames within " +
            s"${deadlineSecs}s; last progress: $tail")
      }
      workers.foreach(_.join(10000))
      val secs = (tDone - t0) / 1e9
      Result(total, secs, total / secs, qSink.rows.get(), rSink.rows.get(),
        dataBatches.size.toLong, progByBatch.values.toVector)
    } finally {
      running.foreach(_.stop())
      // the temp dir holds the socket plus the full streaming checkpoint
      // (offsets/state for millions of frames) — repeated bench runs
      // would otherwise accumulate checkpoint trees in /tmp
      FsUtil.deleteRecursively(dir.toFile)
    }
  }

  /** Standalone drive: `runMain graft.PipelineThroughput [sfDir] [frames]`. */
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val target = args.lift(1).map(_.toLong).getOrElse(1000000L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config(SparkTuning.ExcludedRulesKey, SparkTuning.ExcludedRules)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warm run (same rationale as Bench's warm pass): streaming
    // query startup + foreachBatch plan codegen paid once up front
    if (sys.env.getOrElse("SPARK_GRAFT_PIPE_WARM", "1") != "0")
      run(spark, sfDir, targetFrames = 1L)
    val r = run(spark, sfDir, target)
    println(f"""{"metric":"pipeline_rows_per_sec","value":${r.rowsPerSec}%.0f,"frames":${r.frames},"secs":${r.secs}%.3f,"query_agg_rows":${r.queryAggRows},"response_agg_rows":${r.responseAggRows},"batches":${r.batches}}""")
    spark.stop()
  }
}
