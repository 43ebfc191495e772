package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.Packing

/** The streaming packer must equal the batch concat-chunk packing span
  * for span under in-order admission across micro-batches, keep ONE
  * offset row per stream, and skip redeliveries instead of repacking
  * history. */
class StreamPackSpec extends SparkSpec {

  private def spans(rows: Seq[org.apache.spark.sql.Row]) = rows.map(r =>
    (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4))).toSet

  test("stream == batch concat packing across micro-batches; one state " +
    "row per stream; redeliveries skipped") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(String, Long, Long)]
    val out = StreamPack.chunkSpans(
      mem.toDF().toDF("stream", "doc_id", "n_toks"),
      "stream", "doc_id", "n_toks", capacity = 64L)
    val query = out.writeStream.format("memory").queryName("sp_pack")
      .outputMode("append").start()
    try {
      // wave 1: two streams, one oversize doc, one token-less doc
      mem.addData(Seq(("a", 1L, 30L), ("a", 2L, 250L), ("b", 10L, 64L),
        ("b", 11L, 0L)))
      query.processAllAvailable()
      // wave 2: continuation + a REDELIVERY of ("a", 2) that must skip
      mem.addData(Seq(("a", 3L, 7L), ("a", 2L, 250L), ("b", 12L, 65L)))
      query.processAllAvailable()
      val all = spans(spark.sql("SELECT * FROM sp_pack").collect().toSeq)
      // the redelivery is skipped from packing but NOT silent: it
      // surfaces as exactly one chunk_id = -1 quarantine row
      assert(all.filter(_._2 < 0) === Set(("a", -1L, 2L, 0L, 0L)))
      val got = all.filter(_._2 >= 0)
      // batch reference over the accumulated corpus, same order
      val batch = Packing.concatChunks(
        Seq(("a", 1L, 30L), ("a", 2L, 250L), ("a", 3L, 7L),
          ("b", 10L, 64L), ("b", 11L, 0L), ("b", 12L, 65L))
          .toDF("stream", "doc_id", "n_toks"),
        "stream", "doc_id", "n_toks", capacity = 64L)
      assert(got === spans(batch.collect().toSeq))
      // one 8-byte offset record per stream, never per doc
      val p = query.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(p === 2L, s"packer state should be |streams| = 2, got $p")
    } finally query.stop()
  }
}
