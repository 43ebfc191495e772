package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Scrub

case class Doc(doc_id: Long, text: String)

class StreamScrubSpec extends SparkSpec {

  private val evalDocs = Seq(
    "the quick brown fox jumps over the lazy dog tonight",
    "benchmark answer alpha beta gamma delta epsilon zeta")

  private val trainDocs = Seq(
    // verbatim 5-gram overlap with eval doc 1 -> must drop
    Doc(1L, "copied: the quick brown fox jumps over everything"),
    // clean, with PII to redact
    Doc(2L, "contact me at bob@example.com or 555-123-4567 please do"),
    // clean, no PII
    Doc(3L, "a perfectly ordinary training document with novel words"),
    // overlap with eval doc 2 -> must drop
    Doc(4L, "leak: answer alpha beta gamma delta epsilon here"),
    // fewer than 5 tokens: no shingles, never contaminated
    Doc(5L, "short clean doc"))

  private def evalDf = {
    import spark.implicits._
    evalDocs.toDF("text")
  }

  test("streaming scrub == batch scrub on the same frames (append, no state)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val hashes = StreamScrub.evalShingleHashes(evalDf, "text", n = 5)

    // batch reference: the SAME operator applied in batch mode, and the
    // independently-built batch pipeline (decontaminate-hits anti-join +
    // redact) — all three must agree exactly
    val batchDf = trainDocs.toDF("doc_id", "text")
    val viaOperator = StreamScrub.scrub(batchDf, hashes, "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val hits = Scrub.decontaminate(batchDf, evalDf, "doc_id", "text", n = 5)
      .select(col("doc_id"))
    val viaBatchPipeline = batchDf
      .join(hits, Seq("doc_id"), "left_anti")
      .withColumn("text", Scrub.redactPii(col("text")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(viaOperator == viaBatchPipeline)

    // streaming: two micro-batches through a memory sink
    val mem = MemoryStream[Doc]
    val out = StreamScrub.scrub(mem.toDF(), hashes, "text")
    assert(out.isStreaming)
    val query = out.writeStream.format("memory").queryName("scrub_stream")
      .outputMode("append").start()
    try {
      mem.addData(trainDocs.take(2): _*)
      query.processAllAvailable()
      mem.addData(trainDocs.drop(2): _*)
      query.processAllAvailable()
      val streamed = spark.sql("SELECT doc_id, text FROM scrub_stream")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(streamed == viaOperator)
    } finally query.stop()

    // and the content is right: leaks dropped, PII replaced
    assert(viaOperator.keySet == Set(2L, 3L, 5L))
    assert(viaOperator(2L) == "contact me at <EMAIL> or <PHONE> please do")
  }

  test("the eval-set bound fails loudly before collecting") {
    val e = intercept[IllegalArgumentException] {
      StreamScrub.evalShingleHashes(evalDf, "text", n = 5, maxEvalShingles = 2)
    }
    assert(e.getMessage.contains("maxEvalShingles"))
  }

  test("decontamination checks raw text, then redaction applies") {
    import spark.implicits._
    // an eval doc containing PII: a training copy must still be caught
    // (check-then-redact), and a clean doc's PII still redacts
    val evalPii = Seq("mail bob@example.com with code alpha beta gamma now").toDF("text")
    val hashes = StreamScrub.evalShingleHashes(evalPii, "text", n = 5)
    val docs = Seq(
      Doc(1L, "stolen: mail bob@example.com with code alpha beta gamma now"),
      Doc(2L, "write to alice@example.org for a fresh novel different story")
    ).toDF("doc_id", "text")
    val got = StreamScrub.scrub(docs, hashes, "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.keySet == Set(2L))
    assert(got(2L).contains("<EMAIL>") && !got(2L).contains("alice@"))
  }
}
