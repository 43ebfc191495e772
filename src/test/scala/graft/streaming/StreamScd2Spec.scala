package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Scd2

/** Streamed SCD2 maintenance emits exactly the batch builder's CLOSED
  * intervals — append-once, final on emission — including attribute
  * compression, cross-batch runs, and within-watermark disorder; the
  * open current intervals stay in state and the state stays key-sized
  * once the watermark drains the version buffer. */
class StreamScd2Spec extends SparkSpec {

  private def t(sec: Long) = new Timestamp(sec * 1000L)

  // (key, ts-sec, attrs): key 1 compresses twice across batches; key 3
  // receives its versions OUT OF ORDER across batches; key 2 stays open
  private val batches = Seq(
    Seq((1L, 10L, "A"), (1L, 20L, "A"), (3L, 30L, "X")),
    Seq((1L, 30L, "B"), (3L, 10L, "W"), (2L, 40L, "Q")),
    Seq((1L, 40L, "B"), (1L, 50L, "C")),
    Seq((99L, 10000L, "wm")), // watermark push: seals every real version
    Seq((98L, 20000L, "wm2"))) // timeout batch: buffers drain

  private def changesDf = {
    import spark.implicits._
    batches.flatten.map { case (k, s, a) => (k, t(s), a) }
      .toDF("key", "ts", "attrs")
  }

  test("streamed closed intervals == batch closed intervals") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val out = StreamScd2.intervals(
      mem.toDF().toDF("key", "ts", "attrs"),
      "key", "ts", "attrs", watermark = "60 seconds")
    val query = out.writeStream.format("memory").queryName("sscd2")
      .outputMode("append").start()
    try {
      batches.foreach { b =>
        mem.addData(b.map { case (k, s, a) => (k, t(s), a) }: _*)
        query.processAllAvailable()
      }
      val streamed = spark.sql("SELECT * FROM sscd2").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .toSet
      val batchClosed = Scd2.intervals(
          changesDf.withColumn("verMs", (col("ts").cast("double") * 1000).cast("long")),
          "key", "verMs", Seq("attrs"))
        .filter(col("valid_to").isNotNull)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .toSet
      assert(streamed == batchClosed)
      // the expected story, spelled out: two closes for key 1 (A then
      // B, each compressed over two versions), one for the out-of-order
      // key 3 (W slotted BEFORE the earlier-arrived X)
      assert(streamed == Set(
        (1L, 10000L, 29999L, "A"),
        (1L, 30000L, 49999L, "B"),
        (3L, 10000L, 29999L, "W")))
      // state bound: after the drain, one open-run row per live key
      // (1, 2, 3, 99, 98) and empty buffers
      val p = query.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(p == 5L, s"expected 5 open-run state rows, got $p")
    } finally query.stop()
  }

  test("duplicate version fails the query, as in the batch builder") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val out = StreamScd2.intervals(mem.toDF().toDF("key", "ts", "attrs"),
      "key", "ts", "attrs", watermark = "60 seconds")
    val query = out.writeStream.format("memory").queryName("sscd2_dup")
      .outputMode("append").start()
    try {
      mem.addData((1L, t(10), "A"), (1L, t(10), "B"))
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        query.processAllAvailable()
      }
      def chain(x: Throwable): Seq[Throwable] =
        Iterator.iterate(x)(_.getCause).takeWhile(_ != null).toSeq
      assert(chain(e).exists(_.getMessage != null) &&
        chain(e).exists(c => Option(c.getMessage).exists(_.contains("duplicate version"))))
    } finally query.stop()
  }
}
