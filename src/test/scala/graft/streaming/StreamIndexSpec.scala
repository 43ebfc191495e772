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

  test("compaction keeps the artifact O(1) directories; answers unchanged") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val dir = java.nio.file.Files
      .createTempDirectory("graft_stream_index_c").toString
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_stream_index_c_ckpt").toString

    def dirs(): Seq[String] = {
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(new org.apache.hadoop.fs.Path(dir))
        .filter(_.isDirectory).map(_.getPath.getName).toSeq.sorted
    }

    val allDocs = (0 until 6).map(b =>
      Seq(RawDoc(10L * b + 1, s"term$b hash join"),
        RawDoc(10L * b + 2, s"term$b scan")))
    val mem = MemoryStream[RawDoc]
    val query = StreamIndex.maintain(mem.toDF(), "doc_id", "text", dir, ckpt)
    try {
      // 4 committed batches -> 4 delta dirs
      allDocs.take(4).foreach { b => mem.addData(b: _*); query.processAllAvailable() }
      assert(dirs().count(_.startsWith("delta=")) == 4)
      // compact the committed frontier: one base, zero deltas
      val swallowed = StreamIndex.compactDeltas(spark, dir, upTo = 3L)
      assert(swallowed == 4)
      assert(dirs() == Seq("compacted=3"))
      // two more batches, compact again: base + deltas -> ONE base
      allDocs.drop(4).foreach { b => mem.addData(b: _*); query.processAllAvailable() }
      assert(dirs().count(_.startsWith("delta=")) == 2)
      assert(StreamIndex.compactDeltas(spark, dir, upTo = 5L) == 3)
      assert(dirs() == Seq("compacted=5"))
    } finally query.stop()

    // the compacted artifact serves EXACTLY the one-shot batch answers
    val queries = Seq(1L -> Seq("hash", "join"), 2L -> Seq("scan"))
    val served = Retrieval.bm25FromIndex(
        StreamIndex.readMerged(spark, dir), queries, k = 20)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val batch = Retrieval.bm25TopK(
        allDocs.flatten.toDF(), "doc_id", "text", queries, k = 20)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(served == batch)
    // idempotence guard: nothing left to compact, base refuses re-swallow
    assert(StreamIndex.compactDeltas(spark, dir, upTo = 6L) == 0)
  }

  test("crash leftovers: a delta at or below the base id is ignored by " +
    "readMerged and swept by the next compaction, never re-merged") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_stream_index_r").toString
    def dirs(): Seq[String] = {
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(new org.apache.hadoop.fs.Path(dir))
        .filter(_.isDirectory).map(_.getPath.getName).toSeq.sorted
    }
    val d01 = Seq(RawDoc(1L, "hash join"), RawDoc(2L, "scan scan"))
    val d1 = Seq(RawDoc(3L, "hash"))
    Retrieval.writeIndex(
      Retrieval.indexParts(d01.toDF(), "doc_id", "text"), s"$dir/delta=0")
    Retrieval.writeIndex(
      Retrieval.indexParts(d1.toDF(), "doc_id", "text"), s"$dir/delta=1")
    assert(StreamIndex.compactDeltas(spark, dir, upTo = 1L) == 2)
    // simulate the crash window: rename landed, the delete pass did not —
    // BOTH leftover kinds: a low delta and an OLD compacted base (the
    // compact-over-compact crash leaves the previous base behind too)
    Retrieval.writeIndex(
      Retrieval.indexParts(d1.toDF(), "doc_id", "text"), s"$dir/delta=1")
    Retrieval.writeIndex(
      Retrieval.indexParts(d01.toDF(), "doc_id", "text"), s"$dir/compacted=0")
    val queries = Seq(1L -> Seq("hash"), 2L -> Seq("scan"))
    def serve(): Set[(Long, Long, Long, Long)] =
      Retrieval.bm25FromIndex(StreamIndex.readMerged(spark, dir), queries,
          k = 10).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
    val batch = Retrieval.bm25TopK((d01 ++ d1).toDF(), "doc_id", "text",
        queries, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // neither leftover may double-count any document's postings
    assert(serve() == batch)
    // a rerun at the SAME upTo is the legal recovery: sweeps both stale
    // dirs, keeps the newest base, changes no answers
    assert(StreamIndex.compactDeltas(spark, dir, upTo = 1L) == 2)
    assert(dirs() == Seq("compacted=1"))
    assert(serve() == batch)
  }
}
