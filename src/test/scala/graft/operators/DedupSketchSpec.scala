package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Sketch-based dedup invariants: the 64-bit SimHash fingerprint and its
  * 16-bit-band blocking (Dedup.simHash / simHashPairs). */
class DedupSketchSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("simHash emits genuinely 64-bit fingerprints (high 32 bits used)") {
    val corpus = docs((1L to 40L).map(i =>
      i -> s"token$i word${i * 7} thing${i * 13} item${i * 31} x${i * 101}"): _*)
    val fps = Dedup.simHash(corpus, "doc_id", "text")
      .collect().map(_.getAs[Long]("simhash"))
    assert(fps.length == 40)
    // with 40 random-ish fingerprints the chance every high half is the
    // degenerate all-zero/all-one pattern is ~0 — any hit proves bits 32+
    assert(fps.exists(f => (f >> 32) != 0L && (f >> 32) != -1L))
    // and bit 63 itself (the Long.MinValue term) must occur: a negative
    // fingerprint means the sign bit participates in the sketch
    assert(fps.exists(_ < 0L))
  }

  test("16-bit bands cover the fingerprint and stay in [0, 65535]") {
    val corpus = docs((1L to 20L).map(i => i -> s"alpha$i beta$i gamma$i"): _*)
    val fps = Dedup.simHash(corpus, "doc_id", "text")
      .collect().map(_.getAs[Long]("simhash"))
    fps.foreach { f =>
      val bands = (0 until 4).map(b => (f >> (16 * b)) & 0xffffL)
      assert(bands.forall(v => v >= 0L && v <= 65535L))
      // the four bands reassemble the full fingerprint — no bit is lost
      // by the banding, which is what makes the pigeonhole argument exact
      val rebuilt = bands.zipWithIndex
        .map { case (v, b) => v << (16 * b) }.reduce(_ | _)
      assert(rebuilt == f)
    }
  }

  test("identical docs always pair at hamming 0; unrelated docs don't pair") {
    val corpus = docs(
      1L -> "the quick brown fox jumps over the lazy dog today",
      2L -> "the quick brown fox jumps over the lazy dog today",
      3L -> "completely different content about spark catalyst plans")
    val pairs = Dedup.simHashPairs(corpus, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("hamming")))
    assert(pairs.count { case (a, b, h) => a == 1L && b == 2L && h == 0L } == 1)
    assert(pairs.forall { case (a, b, _) => Set(a, b) == Set(1L, 2L) })
  }

  test("each pair is emitted exactly once despite agreeing on all 4 bands") {
    // identical fingerprints agree on every band: the canonical-band rule
    // (first agreeing band only) must still yield a single row per pair
    val corpus = docs(
      10L -> "alpha beta gamma delta epsilon",
      11L -> "alpha beta gamma delta epsilon",
      12L -> "alpha beta gamma delta epsilon")
    val pairs = Dedup.simHashPairs(corpus, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    assert(pairs.length == pairs.distinct.length)
    assert(pairs.toSet == Set((10L, 11L), (10L, 12L), (11L, 12L)))
  }

  test("hammingPairs63 pairs by exact hamming, once per pair, brute-force-equal") {
    import spark.implicits._
    // constructed fingerprints: 1/2 identical, 3 one bit off, 4 two bits
    // off, 5 three bits off (past threshold), 6 unrelated — plus a high
    // bit (62) so the top band participates
    val base = (1L << 62) | 0x155555L
    val hs = Seq(
      1L -> base, 2L -> base,
      3L -> (base ^ (1L << 21)),            // middle band, hamming 1
      4L -> (base ^ (1L << 62) ^ 1L),       // top+bottom bands, hamming 2
      5L -> (base ^ 1L ^ (1L << 21) ^ (1L << 42)), // one bit EVERY band
      6L -> 0L
    ).toDF("doc_id", "dhash")
    val got = Dedup.hammingPairs63(hs, "doc_id", "dhash", maxHamming = 2)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("hamming")))
    // brute force over the same fingerprints
    val raw = Seq(1L -> base, 2L -> base, 3L -> (base ^ (1L << 21)),
      4L -> (base ^ (1L << 62) ^ 1L),
      5L -> (base ^ 1L ^ (1L << 21) ^ (1L << 42)), 6L -> 0L)
    val want = (for {
      (a, ha) <- raw; (b, hb) <- raw if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 2
    } yield (a, b, d.toLong)).toSet
    assert(got.length == got.distinct.length, "a pair was emitted twice")
    assert(got.toSet == want)
    // sanity on the fixture itself: the hamming-3 pairs (1,5)/(2,5)/(3,4)
    // exist in the raw data and were excluded by the exact filter
    assert(!want.exists { case (a, b, _) => (a, b) == ((1L, 5L)) })
    assert(want.contains((3L, 5L, 2L))) // caught via its untouched band
  }

  test("hammingPairs63 refuses thresholds past the 3-band guarantee") {
    import spark.implicits._
    val hs = Seq(1L -> 7L).toDF("doc_id", "dhash")
    assert(intercept[IllegalArgumentException] {
      Dedup.hammingPairs63(hs, "doc_id", "dhash", maxHamming = 3)
    }.getMessage.contains("maxHamming"))
  }

  test("maxHamming past the banding guarantee is refused, not under-recalled") {
    val corpus = docs(1L -> "alpha beta", 2L -> "gamma delta")
    // hamming 4 can flip one bit in every band — blocking would silently
    // miss such pairs, so the operator must reject the parameter
    val e = intercept[IllegalArgumentException] {
      Dedup.simHashPairs(corpus, "doc_id", "text", maxHamming = 4)
    }
    assert(e.getMessage.contains("maxHamming"))
    assert(intercept[IllegalArgumentException] {
      Dedup.simHashPairs(corpus, "doc_id", "text", maxHamming = -1)
    }.getMessage.contains("maxHamming"))
  }
}
