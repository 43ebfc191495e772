package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Percentiles

case class Meas(ts: Timestamp, src: String, v: java.lang.Long)

/** Merged windowed histogram partials must equal the batch histogram
  * over the same rows (cell-exact integers), and percentiles folded
  * from them must equal the batch byRank answer — the lossless-merge
  * law, streamed. */
class StreamHistSpec extends SparkSpec {

  private def t(s: Long) = new Timestamp(s * 1000L)

  // two windows, a within-watermark late arrival, a NULL value
  private val events = Seq(
    Meas(t(0), "a", 10L), Meas(t(1), "a", 20L), Meas(t(2), "b", 10L),
    Meas(t(3), "a", 20L), Meas(t(9), "b", null),
    Meas(t(11), "a", 30L), Meas(t(12), "b", 40L), Meas(t(13), "b", 40L),
    Meas(t(5), "a", 20L) // late, within watermark
  )

  test("merged windowed partials == batch histogram; folded percentiles == byRank") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val mem = MemoryStream[Meas]
    val out = StreamHist.windowedHist(mem.toDF(), "src", "v", "ts",
      "10 seconds", "20 seconds")
    assert(out.isStreaming)
    val query = out.writeStream.format("memory").queryName("hist_stream")
      .outputMode("append").start()
    try {
      mem.addData(events.take(5): _*)
      query.processAllAvailable()
      mem.addData(events.drop(5): _*)
      query.processAllAvailable()
      mem.addData(Meas(t(100), "flush", 1L)) // close both real windows
      query.processAllAvailable()
    } finally query.stop()

    // the flush row's own window never closes (watermark reaches 80),
    // so append emits exactly the two real windows
    val partials = spark.sql("SELECT src, __v, __cnt FROM hist_stream")
    val merged = StreamHist.mergeHist(partials, "src")
    val streamedHist = merged.collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap

    val batchDf = events.toDF()
    val batchHist = batchDf.filter(col("v").isNotNull)
      .groupBy(col("src"), col("v").cast("long").as("__v"))
      .agg(count(lit(1)).as("__cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamedHist == batchHist)

    val ps = Seq("p50" -> 0.5, "p90" -> 0.9)
    val folded = Percentiles.fromHistogram(merged, "src", ps)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val batch = Percentiles.byRank(batchDf, "src", "v", ps)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(folded == batch)
    // spot values: a = (10,20,20,20,30) -> p50 rank 3 = 20, p90 rank 4 = 20
    assert(batch("a") == ((20L, 20L, 5L)))
  }

  test("bucket floors values before the histogram (bounded state)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[Meas]
    val out = StreamHist.windowedHist(mem.toDF(), "src", "v", "ts",
      "10 seconds", "20 seconds", bucket = 25L)
    val query = out.writeStream.format("memory").queryName("hist_bucket")
      .outputMode("append").start()
    try {
      mem.addData(events.take(4): _*) // values 10, 20, 10, 20 -> all bucket 0
      mem.addData(Meas(t(100), "flush", 1L))
      query.processAllAvailable()
    } finally query.stop()
    val rows = spark.sql("SELECT src, __v, __cnt FROM hist_bucket")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rows == Map(("a", 0L) -> 3L, ("b", 0L) -> 1L))
  }
}
