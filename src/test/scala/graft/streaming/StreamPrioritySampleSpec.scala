package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.Sampling

case class WDoc(ts: Timestamp, src: String, doc_id: Long, w: Long)

/** Merged streaming k-ledger partials must select exactly the batch
  * sample over the same rows — the lossless-merge law (top-k of a
  * union == top-k of per-slice top-ks), streamed, with the
  * deterministic draw making the equality falsifiable. */
class StreamPrioritySampleSpec extends SparkSpec {

  private def t(s: Long) = new Timestamp(s * 1000L)

  private val docs = (1L to 120L).map { i =>
    WDoc(t(i % 25), s"s${i % 2}", i, 1L + (i * 31) % 97)
  } :+ WDoc(t(3), "s1", 500L, 1000000L) // heavy row, early window

  test("merged windowed partials == batch grouped sample") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val mem = MemoryStream[WDoc]
    val out = StreamPrioritySample.windowedSample(mem.toDF(), "src",
      "doc_id", "w", "ts", "10 seconds", "5 seconds", k = 7)
    assert(out.isStreaming)
    val query = out.writeStream.format("memory").queryName("pri_stream")
      .outputMode("append").start()
    try {
      // all rows in one batch (the watermark only advances BETWEEN
      // batches — splitting 0..24 s rows across batches would drop the
      // second batch's early rows as late and make the batch
      // comparison vacuous), then a flush row closes the real windows
      mem.addData(docs: _*)
      query.processAllAvailable()
      mem.addData(WDoc(t(1000), "flush", 1L, 1L))
      query.processAllAvailable()
    } finally query.stop()

    val partials = spark.table("pri_stream")
      .filter($"src" =!= "flush")
    val merged = StreamPrioritySample.mergeSamples(partials, "src", k = 7)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet

    val batch = Sampling.groupedPrioritySample(docs.toDF(), "doc_id", "w",
      "src", k = 7)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(merged == batch)
    // the deliberately heavy row must have made the cut
    assert(merged.exists(_._2 == 500L))
  }
}
