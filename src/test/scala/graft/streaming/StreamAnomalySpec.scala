package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TimeSeries

case class Tick(ts: Timestamp, k: String, v: java.lang.Long)

/** The anomaly card served from streamed partials: windowed bucket
  * counts (a 1-cell histogram — StreamHist's additive law) merge,
  * densify and flag to EXACTLY the batch anomalyBuckets answer over
  * the same rows. */
class StreamAnomalySpec extends SparkSpec {

  private def t(s: Long) = new Timestamp(s * 1000L)

  // hour 0: one event; hours 1-10 silent; hour 11: a 30-event spike —
  // the q207-shaped series where exactly the spike flags
  private val ticks = Seq(Tick(t(5), "k", 1L)) ++
    (1 to 30).map(i => Tick(t(11 * 3600 + i), "k", 1L))

  test("merged streamed bucket partials flag exactly the batch anomalies") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val mem = MemoryStream[Tick]
    // per-window per-(key, hour-bucket) counts — StreamHist with the
    // bucket id as the value column IS the bucket-count partial
    val out = StreamHist.windowedHist(
      mem.toDF().withColumn("b",
        expr("CAST(ts AS LONG) DIV 3600L")),
      "k", "b", "ts", "1 hour", "10 seconds")
    val query = out.writeStream.format("memory").queryName("anom_stream")
      .outputMode("append").start()
    try {
      mem.addData(ticks: _*)
      query.processAllAvailable()
      mem.addData(Tick(t(100L * 3600L), "flush", 0L))
      query.processAllAvailable()
    } finally query.stop()

    val partials = spark.sql(
      "SELECT k, __v, __cnt FROM anom_stream WHERE k <> 'flush'")
    val merged = StreamHist.mergeHist(partials, "k")
      .select(col("k"), col("__v").as("bucket_id"), col("__cnt").as("n"))
    val streamed = TimeSeries.anomalyFromSeries(
      TimeSeries.densify(merged, "k"), "k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet

    val batch = TimeSeries.anomalyBuckets(ticks.toDF("ts", "k", "v"),
      "k", "ts", bucketSec = 3600L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(streamed == batch)
    assert(streamed.map(x => (x._2, x._3, x._4)) == Set((11L, 30L, 1L)))
  }
}
