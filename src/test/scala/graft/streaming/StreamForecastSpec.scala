package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TimeSeries

case class SaleTick(ts: Timestamp, k: String, value: Double)

/** The forecast backtest served from streamed partials: per-window
  * (key, bucket) integer-cent sums are ADDITIVE, so merged partials
  * densify into exactly the batch series and backtestFromSeries lands
  * on the identical card — the q207 anomaly-serving law applied to the
  * q227 backtest. */
class StreamForecastSpec extends SparkSpec {

  private def t(d: Long) = new Timestamp(d * 86400L * 1000L)

  // day 0: 100c, day 1: 200c, day 2: 100c+10c, day 3: 240c, day 4: 110c
  private val ticks = Seq(
    SaleTick(t(0), "k", 1.00), SaleTick(t(1), "k", 2.00),
    SaleTick(t(2), "k", 1.00), SaleTick(t(2), "k", 0.10),
    SaleTick(t(3), "k", 2.40), SaleTick(t(4), "k", 1.10))

  test("merged streamed cent partials score exactly the batch backtest") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val mem = MemoryStream[SaleTick]
    val out = mem.toDF()
      .withWatermark("ts", "10 seconds")
      .withColumn("b", expr("CAST(ts AS LONG) DIV 86400L"))
      .withColumn("__c", floor(col("value") * 100).cast("long"))
      .groupBy(window(col("ts"), "1 day"), col("k"), col("b"))
      .agg(sum(col("__c")).as("cents"))
      .select(col("k"), col("b"), col("cents"))
    val query = out.writeStream.format("memory").queryName("fc_stream")
      .outputMode("append").start()
    try {
      // split mid-day-2 so one bucket's partials span two windows'
      // micro-batches — additivity is what the merge must restore
      val (a, b) = ticks.splitAt(3)
      mem.addData(a: _*); query.processAllAvailable()
      mem.addData(b: _*); query.processAllAvailable()
      mem.addData(SaleTick(t(100), "flush", 0.0))
      query.processAllAvailable()
    } finally query.stop()

    val merged = spark.sql(
      "SELECT k, b AS bucket_id, cents FROM fc_stream WHERE k <> 'flush'")
      .groupBy(col("k"), col("bucket_id"))
      .agg(sum(col("cents")).as("n"))
    val streamed = TimeSeries.backtestFromSeries(
      TimeSeries.densify(merged, "k"), "k", season = 2)
      .collect().map(_.toSeq).toSet

    val batch = TimeSeries.forecastBacktest(ticks.toDF("ts", "k", "value"),
      "k", "ts", "value", bucketSec = 86400L, season = 2)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
  }
}
