package graft.streaming

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTuning

/** Measured evidence for the [[StreamCluster]] maintenance shapes: feed
  * N trickle batches through `maintain` and print ONE JSON line with
  * the per-batch wall distribution (early vs late — a maintenance cost
  * that grows with the corpus shows up as late/early drift), the final
  * artifact directory counts (compaction must bound them), and the
  * closure size. Deterministic corpus: every 7th doc joins an existing
  * near-dup family (exercising cross-batch edges and label deltas),
  * the rest are singletons.
  *
  * Run: `sbt "runMain graft.streaming.StreamClusterThroughput
  * [nBatches] [docsPerBatch] [nBuckets]"` (defaults 48 x 25 x 16).
  *
  * The bucket prune is a CONSTANT-FACTOR cut, not an asymptotic one: a
  * batch touching |B| of the nBuckets hash buckets reads |B|/nBuckets
  * of every generation, so the evidence for it is the bytes DROP
  * between `nBuckets = 1` (every read is the full corpus half) and a
  * bucket count well above the batch's shingle spread — run both and
  * compare `late8_avg_mb_read`. Production sizes nBuckets in the
  * thousands so a trickle batch touches a few percent of the corpus.
  */
object StreamClusterThroughput {

  def main(args: Array[String]): Unit = {
    val nBatches = args.headOption.map(_.toInt).getOrElse(48)
    val perBatch = args.drop(1).headOption.map(_.toInt).getOrElse(25)
    val nBuckets = args.drop(2).headOption.map(_.toInt).getOrElse(16)
    // the drift metric averages batches 4-11 vs the last 8: fewer than
    // 16 batches makes one window empty/undersized and prints NaN or a
    // meaningless late_over_early — refuse instead of misleading
    require(nBatches >= 16,
      s"nBatches must be >= 16 for the early/late drift windows " +
        s"(got $nBatches)")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config(SparkTuning.ExcludedRulesKey, SparkTuning.ExcludedRules)
      .config("spark.ui.enabled", "false")
      // AQE re-plans every shuffle stage as its own job — right for
      // corpus-sized stages, pure scheduling overhead for a trickle
      // batch's KB-sized frames; SPARK_GRAFT_SC_AQE=false measures the
      // difference (jobs/batch + wall) on the same workload
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_SC_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val path = java.nio.file.Files
      .createTempDirectory("sc_throughput").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("sc_throughput_ck").toString
    val mem = MemoryStream[(Long, String)]
    val query = StreamCluster.maintain(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", path, ckpt,
      nBuckets = nBuckets, compactEvery = 8)
    val families = Array(
      "alpha beta gamma delta epsilon zeta eta",
      "one two three four five six seven eight",
      "red orange yellow green blue indigo violet")
    def text(id: Long): String =
      if (id % 7 == 0) families((id / 7 % families.length).toInt)
      else s"unique u${id}a u${id}b u${id}c u${id}d u${id}e u${id}f"
    val walls = new Array[Double](nBatches)
    // per-batch INPUT BYTES (every task's inputMetrics.bytesRead): the
    // direct evidence for the hb=/cb= bucket prunes — an O(corpus) read
    // per batch shows up as bytes growing linearly with the batch
    // index, a delta-bounded batch as a flat line (r17, VERDICT #1's
    // "measured scan-bytes drop" done bar). Collected on the listener
    // bus; processAllAvailable + a bus drain order it per batch.
    val bytesRead = new java.util.concurrent.atomic.AtomicLong(0)
    // job count per batch: the trickle-batch overhead is mostly Spark
    // job scheduling (VERDICT r16 estimated ~40/batch) — count it so a
    // job-count cut is measurable, not anecdotal
    val jobsStarted = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) bytesRead.addAndGet(m.inputMetrics.bytesRead); ()
      }
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobsStarted.incrementAndGet(); ()
      }
    })
    val batchBytes = new Array[Long](nBatches)
    val batchJobs = new Array[Long](nBatches)
    try {
      var id = 0L
      (0 until nBatches).foreach { b =>
        val docs = (0 until perBatch).map { _ =>
          id += 1; (id, text(id))
        }
        mem.addData(docs)
        val t0 = System.nanoTime()
        query.processAllAvailable()
        walls(b) = (System.nanoTime() - t0) / 1e9
        // listener events are async — drain the bus so every task of
        // THIS batch lands in its own bucket before the delta is read
        // (listenerBus is private[spark] to scalac but public in
        // bytecode; a failed drain degrades to a settle sleep)
        try {
          val sc = spark.sparkContext
          val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
          bus.getClass.getMethod("waitUntilEmpty").invoke(bus); ()
        } catch { case _: Throwable => Thread.sleep(300) }
        batchBytes(b) = bytesRead.getAndSet(0)
        batchJobs(b) = jobsStarted.getAndSet(0)
      }
      def dirCount(half: String): Int =
        new java.io.File(s"$path/$half").listFiles()
          .count(f => f.isDirectory &&
            (f.getName.startsWith("gen=") || f.getName.startsWith("base=")))
      val labels = StreamCluster.readLabels(spark, path)
      val nDocs = labels.count()
      val nComponents = labels.select("component").distinct().count()
      val sorted = walls.sorted
      def avg(xs: Array[Double]) = xs.sum / xs.length
      val early = avg(walls.slice(4, 12)) // skip codegen/JIT warmup
      val late = avg(walls.takeRight(8))
      def avgL(xs: Array[Long]) = xs.sum.toDouble / xs.length
      val earlyB = avgL(batchBytes.slice(4, 12))
      val lateB = avgL(batchBytes.takeRight(8))
      val jobsP50 = batchJobs.sorted.apply(nBatches / 2)
      println(f"""{"metric":"stream_cluster_maintenance","batches":$nBatches,"n_buckets":$nBuckets,"docs":$nDocs,"components":$nComponents,"p50_batch_secs":${sorted(nBatches / 2)}%.3f,"max_batch_secs":${sorted.last}%.3f,"early8_avg_secs":$early%.3f,"late8_avg_secs":$late%.3f,"late_over_early":${late / early}%.2f,"p50_jobs_per_batch":$jobsP50,"early8_avg_mb_read":${earlyB / 1e6}%.2f,"late8_avg_mb_read":${lateB / 1e6}%.2f,"bytes_late_over_early":${lateB / earlyB}%.2f,"shingle_dirs":${dirCount("shingles")},"label_dirs":${dirCount("labels")}}""")
    } finally {
      query.stop()
      spark.stop()
    }
  }
}
