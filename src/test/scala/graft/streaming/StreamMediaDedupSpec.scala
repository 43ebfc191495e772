package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.{Dedup, MediaCodec}

/** Streaming multimodal dedup vs its batch counterparts: the emitted
  * pair set over a bounded in-horizon prefix must equal the q119-shape
  * (image) and q121-shape (audio) batch joins exactly, and late rows
  * must drop without pairing or polluting state. */
class StreamMediaDedupSpec extends SparkSpec {

  private def t(sec: Int) = new Timestamp(3600_000L + sec * 1000L)

  /** Synthetic corpus with REAL window-duplicate families: pairs share
    * the full 192-byte thumbnail window (identical fingerprints) while
    * singletons are pairwise distant. */
  private def corpus: Seq[(Long, String)] = {
    val pad = "abcdefghijklmnopqrstuvwxyz0123456789 the quick brown fox " * 8
    (1L to 30L).map { id =>
      val fam = id % 10 // 10 families of 3: identical 192-char prefixes
      (id, pad.substring(0, 192).map(c => ((c + fam.toInt) % 127).toChar).mkString
        + s" tail unique to $id " + ("x" * (id.toInt % 17)))
    }
  }

  test("streaming image pairs equal the batch banded-hamming join") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val docs = corpus.toDF("doc_id", "text")
    val media = MediaCodec.attachThumbnails(docs)
    val want = Dedup.hammingPairs63(
        MediaCodec.dHashes(media).toDF(), "doc_id", "dhash", maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(want.nonEmpty, "corpus must produce batch image pairs")

    val rows = media.collect().map(m => (m.doc_id, m.media, t(m.doc_id.toInt)))
    val mem = MemoryStream[(Long, Array[Byte], Timestamp)]
    val out = StreamMediaDedup.imagePairs(
      mem.toDF().toDF("doc_id", "media", "ts"), watermark = "10 minutes")
    val query = out.writeStream.format("memory").queryName("smd_img")
      .outputMode("append").start()
    try {
      val (a, b) = rows.splitAt(rows.length / 2)
      mem.addData(a.toIndexedSeq); query.processAllAvailable()
      mem.addData(b.toIndexedSeq); query.processAllAvailable()
      val got = spark.sql("SELECT doc_a, doc_b, hamming FROM smd_img")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want, s"stream/batch divergence: got=$got want=$want")
    } finally query.stop()
  }

  test("streaming audio pairs equal the batch banded-hamming join") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val docs = corpus.toDF("doc_id", "text")
    val media = MediaCodec.attachAudio(docs)
    val want = Dedup.hammingPairs63(
        MediaCodec.audioFingerprints(media).toDF(), "doc_id", "fingerprint",
        maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(want.nonEmpty, "corpus must produce batch audio pairs")

    val rows = media.collect().map(m => (m.doc_id, m.media, t(m.doc_id.toInt)))
    val mem = MemoryStream[(Long, Array[Byte], Timestamp)]
    val out = StreamMediaDedup.audioPairs(
      mem.toDF().toDF("doc_id", "media", "ts"), watermark = "10 minutes")
    val query = out.writeStream.format("memory").queryName("smd_aud")
      .outputMode("append").start()
    try {
      mem.addData(rows.toIndexedSeq); query.processAllAvailable()
      val got = spark.sql("SELECT doc_a, doc_b, hamming FROM smd_aud")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want, s"stream/batch divergence: got=$got want=$want")
    } finally query.stop()
  }

  test("late fingerprints drop without pairing or polluting state") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Timestamp)]
    val out = StreamMediaDedup.hammingPairs63(
      mem.toDF().toDF("doc_id", "fp", "ts"), "doc_id", "fp", "ts",
      watermark = "1 minute")
    val query = out.writeStream.format("memory").queryName("smd_late")
      .outputMode("append").start()
    try {
      // seed a fingerprint, then push the watermark far past it
      mem.addData((1L, 0x123456789ABL, t(10)))
      query.processAllAvailable()
      mem.addData((2L, 0x700000000000L, t(1800)))
      query.processAllAvailable()
      // identical fp to doc 1, but 25+ minutes behind the watermark:
      // must NOT pair (its partner's state has expired AND the row is late)
      mem.addData((3L, 0x123456789ABL, t(20)))
      query.processAllAvailable()
      assert(spark.sql("SELECT * FROM smd_late").count() == 0)
      // an in-horizon twin of doc 2 still pairs — state wasn't corrupted
      mem.addData((4L, 0x700000000000L, t(1801)))
      query.processAllAvailable()
      val got = spark.sql("SELECT doc_a, doc_b, hamming FROM smd_late")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == Set((2L, 4L, 0L)))
    } finally query.stop()
  }

  test("redelivered doc_id does not re-emit its pairs (at-least-once upstream)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Timestamp)]
    val out = StreamMediaDedup.hammingPairs63(
      mem.toDF().toDF("doc_id", "fp", "ts"), "doc_id", "fp", "ts",
      watermark = "10 minutes")
    val query = out.writeStream.format("memory").queryName("smd_redeliver")
      .outputMode("append").start()
    try {
      mem.addData((1L, 0x123456789ABL, t(10)), (2L, 0x123456789ABL, t(11)))
      query.processAllAvailable()
      // doc 2 redelivered (same micro-batch semantics as an upstream
      // at-least-once source): its pair vs doc 1 must not duplicate
      mem.addData((2L, 0x123456789ABL, t(11)))
      query.processAllAvailable()
      val rows = spark.sql("SELECT doc_a, doc_b, hamming FROM smd_redeliver")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(rows == Seq((1L, 2L, 0L)), s"expected exactly one pair, got $rows")
      // a genuinely new twin still pairs against both held docs
      mem.addData((3L, 0x123456789ABL, t(12)))
      query.processAllAvailable()
      assert(spark.sql("SELECT * FROM smd_redeliver").count() == 3)
    } finally query.stop()
  }
}
