package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.{InfoTheory, TextAnalysis}

case class DocTick(ts: Timestamp, source: String, text: String)

/** The entropy card served from streamed partials: per-window
  * (source, token) counts are ADDITIVE, so serve-time merges them with
  * one sum and [[InfoTheory.entropyFromCounts]] lands on exactly the
  * batch [[InfoTheory.entropyCard]] — the q207/q227 partials-serving
  * law applied to the q239 card. The interesting failure mode this
  * pins: entropy itself is NOT additive across windows (H of merged
  * counts ≠ any combination of per-window H), so the leg must ship
  * counts, never per-window entropies. */
class StreamEntropySpec extends SparkSpec {

  private def t(s: Long) = new Timestamp(s * 1000L)

  private val ticks = Seq(
    DocTick(t(0), "a", "aa aa bb"),
    DocTick(t(1), "b", "cc cc cc cc"),
    // same source+token spanning both micro-batches AND two windows —
    // the merge must restore additivity across both axes
    DocTick(t(90), "a", "aa bb bb"),
    DocTick(t(91), "b", "cc dd"))

  test("merged streamed token-count partials fold to exactly the batch " +
    "entropy card") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val mem = MemoryStream[DocTick]
    val out = mem.toDF()
      .withWatermark("ts", "10 seconds")
      .select(col("ts"), col("source"),
        explode(TextAnalysis.tokens(col("text"))).as("__t"))
      .groupBy(window(col("ts"), "1 minute"), col("source"), col("__t"))
      .agg(count(lit(1)).as("__c"))
      .select(col("source"), col("__t"), col("__c"))
    val query = out.writeStream.format("memory").queryName("ent_stream")
      .outputMode("append").start()
    try {
      val (first, rest) = ticks.splitAt(2)
      mem.addData(first: _*); query.processAllAvailable()
      mem.addData(rest: _*); query.processAllAvailable()
      mem.addData(DocTick(t(10000), "flush", "zz"))
      query.processAllAvailable()
    } finally query.stop()

    val merged = spark.sql(
      "SELECT source, __t, __c FROM ent_stream WHERE source <> 'flush'")
      .groupBy(col("source"), col("__t"))
      .agg(sum(col("__c")).as("__c"))
    val streamed = InfoTheory.entropyFromCounts(merged, "source", "__c")
      .collect().map(_.toSeq).toSet

    val batch = InfoTheory.entropyCard(
      ticks.toDF("ts", "source", "text"), "source", "text")
      .collect().map(_.toSeq).toSet

    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }
}
