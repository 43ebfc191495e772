package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.Retrieval

/** The streamed index must serve the SAME answers as a batch build over
  * all documents seen — including the df and avgdl drift the later
  * batches cause, which is what distinguishes a real additive index
  * merge from naively unioning scored results. */
class StreamIndexSpec extends SparkSpec {

  private val batch1 = Seq(
    RawDoc(1L, "hash join hash"), RawDoc(2L, "scan scan slow"))
  private val batch2 = Seq(
    RawDoc(3L, "join merge"), RawDoc(4L, "hash"), RawDoc(5L, ""))

  private val queries = Seq(1L -> Seq("hash", "join"), 2L -> Seq("scan"))

  test("merged streamed deltas == one-shot batch index (scores drift-exact)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val dir = java.nio.file.Files
      .createTempDirectory("graft_stream_index").toString

    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_stream_index_ckpt").toString
    val mem = MemoryStream[RawDoc]
    val query = StreamIndex.maintain(mem.toDF(), "doc_id", "text", dir, ckpt)
    try {
      mem.addData(batch1: _*)
      query.processAllAvailable()
      mem.addData(batch2: _*)
      query.processAllAvailable()
    } finally query.stop()

    val served = Retrieval.bm25FromIndex(
        StreamIndex.readMerged(spark, dir), queries, k = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val batch = Retrieval.bm25TopK(
        (batch1 ++ batch2).toDF(), "doc_id", "text", queries, k = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(served == batch)
    // batch 2 really changed the stats: doc 4 must appear for 'hash'
    // with the post-drift df (3 of 4 token-bearing docs contain hash
    // or join terms; the score only matches if N/sum_len re-summed)
    assert(served.exists { case (q, d, _, _) => q == 1L && d == 4L })
  }
}
