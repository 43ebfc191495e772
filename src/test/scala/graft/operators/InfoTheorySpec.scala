package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{IntLog, IntLogFunctions}

/** The information-theory cards must be EXACT integer restatements of
  * their formulas: entropy on hand-computable distributions, KL == 0
  * on the self-referenced corpus (the strongest quantization check —
  * every per-bucket term cancels to exactly zero), and tf-idf weights
  * equal to the ilog arithmetic replayed in memory. Plus the Column
  * expression must agree with the driver-side scalar bit-for-bit. */
class InfoTheorySpec extends SparkSpec {
  import spark.implicits._

  test("ilog2_micro expression == scalar over random longs, null-safe") {
    val rnd = new scala.util.Random(0x1091L)
    val vals = (1L to 64L) ++ Seq.fill(500)(rnd.nextLong(1L << 55) + 1)
    val got = vals.toDF("n")
      .select(col("n"), IntLogFunctions.ilog2_micro(col("n")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    vals.foreach(v => assert(got(v) === IntLog.ilog2Micro(v), s"n=$v"))
    val withNull = Seq[(java.lang.Long, Int)]((null, 0), (4L, 1)).toDF("n", "i")
      .select(IntLogFunctions.ilog2_micro(col("n")).as("l"), col("i"))
      .collect().map(r => r.getInt(1) -> (if (r.isNullAt(0)) None else Some(r.getLong(0)))).toMap
    assert(withNull(0) === None)
    assert(withNull(1) === Some(2L << 20))
  }

  test("entropyCard: hand distributions — 1 bit, 0 bits, 2 bits") {
    val df = Seq(
      ("half", "aa aa bb bb"),   // uniform over 2 -> exactly 1 bit
      ("one", "aa aa aa aa"),    // degenerate -> exactly 0
      ("four", "aa bb cc dd"),   // uniform over 4 -> exactly 2 bits
      ("skew", "aa aa aa bb"))   // 3/4, 1/4 -> quantized H(0.75)
      .toDF("g", "text")
    val got = InfoTheory.entropyCard(df, "g", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("half") === ((4L, 2L, 1L << 20)))
    assert(got("one") === ((4L, 1L, 0L)))
    assert(got("four") === ((4L, 4L, 2L << 20)))
    // replay the integer formula for the skewed case
    val expSkew = IntLog.ilog2Micro(4L) -
      (3L * IntLog.ilog2Micro(3L) + 1L * IntLog.ilog2Micro(1L)) / 4L
    assert(got("skew") === ((4L, 2L, expSkew)))
    // and it brackets the true H(3/4,1/4) = 0.811278 bits
    assert(math.abs(got("skew")._3 / 1048576.0 - 0.8112781) < 1e-4)
  }

  test("klDriftCard: self-referenced corpus is exactly zero; disjoint " +
    "groups drift positive") {
    val self = Seq(("g", "aa bb cc aa")).toDF("g", "text")
    val r0 = InfoTheory.klDriftCard(self, "g", "text", buckets = 32)
      .collect()
    assert(r0.length === 1)
    assert(r0.head.getLong(1) === 4L)
    assert(r0.head.getLong(2) === 0L) // every bucket term cancels exactly
    val two = Seq(("p", "aa aa aa aa aa aa"), ("q", "bb bb bb bb bb bb"))
      .toDF("g", "text")
    val r2 = InfoTheory.klDriftCard(two, "g", "text", buckets = 32)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(r2("p") > 0L && r2("q") > 0L)
  }

  test("tfidfTopTerms: weights replay the ilog arithmetic; ranks by " +
    "(w DESC, hash ASC); strings recovered") {
    val docs = Seq(
      (1L, "g1", "apple apple banana"),
      (2L, "g1", "banana"),
      (3L, "g2", "cherry"))
      .toDF("doc_id", "g", "text")
    val got = InfoTheory.tfidfTopTerms(docs, "g", "doc_id", "text", k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    def w(tf: Long, dfd: Long): Long =
      ((1048576L + IntLog.ilog2Micro(tf)) *
        (IntLog.ilog2Micro(3L) - IntLog.ilog2Micro(dfd))) / 1048576L
    // g1: apple (tf 2, df 1) beats banana (tf 2, df 2)
    assert(got(("g1", 1L)) === (("apple", 2L, 1L, w(2, 1))))
    assert(got(("g1", 2L)) === (("banana", 2L, 2L, w(2, 2))))
    assert(got(("g2", 1L)) === (("cherry", 1L, 1L, w(1, 1))))
    assert(w(2, 1) > w(2, 2))
  }

  test("xentQualityCard: per-doc cross-entropy replays the integer " +
    "formula; token-less docs excluded; banding floors") {
    // corpus: aa x3, bb x1 -> T=4. doc1 = "aa aa aa" (all common),
    // doc2 = "bb" (rare), doc3 = "" (excluded).
    val docs = Seq(
      (1L, "s", "aa aa aa"), (2L, "s", "bb"), (3L, "s", ""))
      .toDF("doc_id", "g", "text")
    def xent(pairs: (Long, Long)*): Long = { // (cdt, ct)*
      val num = pairs.map { case (cdt, ct) =>
        cdt * (IntLog.ilog2Micro(4L) - IntLog.ilog2Micro(ct)) }.sum
      num / pairs.map(_._1).sum
    }
    val x1 = xent((3L, 3L)) // 3·(ilog4 − ilog3) / 3
    val x2 = xent((1L, 1L)) // ilog4 − ilog1 = exactly 2 bits
    assert(x2 === 2L << 20)
    val got = InfoTheory.xentQualityCard(docs, "g", "doc_id", "text",
      bandMb = 1L << 20) // 1-bit bands: doc1 -> band 0, doc2 -> band 2
    val rows = got.collect().map(r => r.getLong(1) ->
      ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(rows === Map(
      x1 / (1L << 20) -> ((1L, x1, x1)),
      2L -> ((1L, x2, x2))))
  }

  test("miFeatureCard: independent group/token -> exactly 0; " +
    "perfectly discriminative tokens -> +1 bit each") {
    // independence: both groups have the same token distribution
    val ind = Seq(("p", "aa bb"), ("q", "aa bb")).toDF("g", "text")
    val r0 = InfoTheory.miFeatureCard(ind, "g", "text", buckets = 64, k = 64)
      .collect()
    assert(r0.nonEmpty && r0.forall(_.getLong(2) === 0L))
    // perfect discrimination: each token identifies its group ->
    // each bucket contributes ilog(cgb)+ilog(T)-ilog(tg)-ilog(tb)
    // = 0 + ilog(4) - ilog(2) - ilog(2) = 0 per token... use counts 2:
    val disc = Seq(("p", "aa aa"), ("q", "bb bb")).toDF("g", "text")
    val r1 = InfoTheory.miFeatureCard(disc, "g", "text", buckets = 64, k = 64)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toSeq
    // each bucket: term = 2·(ilog(2)+ilog(4)−ilog(2)−ilog(2)) = 2·2^20;
    // mi_mb = 2·2^20 div 4 = 2^19 — exactly +0.5 bit per bucket,
    // the two buckets summing to the true MI of 1 bit.
    assert(r1.length === 2 && r1.forall { case (n, m) =>
      n === 2L && m === (1L << 19) })
  }

  test("leaveOneOutEntropy: delta form equals the direct rest-corpus " +
    "entropy; owner-of-everything excluded") {
    // corpus: x:2 (all from a), y:2 (one each), z:1 (from b); T=5
    val docs = Seq(("a", "x x y"), ("b", "y z")).toDF("g", "text")
    val got = InfoTheory.leaveOneOutEntropy(docs, "g", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5)))).toMap
    def h(counts: Seq[Long]): Long = {
      val t = counts.sum
      IntLog.ilog2Micro(t) -
        counts.map(c => c * IntLog.ilog2Micro(c)).sum / t
    }
    val hc = h(Seq(2L, 2L, 1L))
    // without a: y:1, z:1 -> exactly 1 bit, x vanished (types 3 -> 2)
    assert(got("a") === ((2L, 2L, 1L << 20, (1L << 20) - hc)))
    // without b: x:2, y:1 -> replay the integer formula
    val hb = h(Seq(2L, 1L))
    assert(got("b") === ((3L, 2L, hb, hb - hc)))
    // a single-group corpus has no rest distribution: zero rows
    val solo = Seq(("only", "p q")).toDF("g", "text")
    assert(InfoTheory.leaveOneOutEntropy(solo, "g", "text").count() === 0L)
  }

  test("klDriftMatrix: identical distributions -> exactly 0 both ways; " +
    "disjoint pair positive; group cap enforced") {
    val docs = Seq(
      ("p", "aa bb aa bb"), ("q", "aa bb aa bb"), // identical to p
      ("r", "cc cc cc cc"))                       // disjoint
      .toDF("g", "text")
    val got = InfoTheory.klDriftMatrix(docs, "g", "text", buckets = 32)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got.keySet === Set(("p", "q"), ("p", "r"), ("q", "r")))
    // identical cell counts: every per-bucket term cancels exactly
    assert(got(("p", "q")) === ((0L, 0L, 0L)))
    assert(got(("p", "r"))._3 > 0L && got(("q", "r"))._3 > 0L)
    // a token-less group still appears in every pair (pure-smoothing
    // drift), never silently vanishes from the matrix
    val withEmpty = docs.union(Seq(("z", "")).toDF("g", "text"))
    val keys = InfoTheory.klDriftMatrix(withEmpty, "g", "text",
        buckets = 32)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(keys === Set(("p", "q"), ("p", "r"), ("q", "r"),
      ("p", "z"), ("q", "z"), ("r", "z")))
    val err = intercept[IllegalArgumentException] {
      InfoTheory.klDriftMatrix(docs, "g", "text", buckets = 32,
        maxGroups = 2)
    }
    assert(err.getMessage.contains("groups"))
  }

  test("burstinessCard: one-per-doc-everywhere scores exactly 0; " +
    "concentrated token replays the cross-multiplied formula") {
    // N = 3 docs. 'u' once in every doc -> VMR 0. 'b' 6x in one doc:
    // sx = 6, sxx = 36 -> (3*36 - 36)*1e6 / (3*6) = 72e6/18 = 4e6.
    val docs = Seq((1L, "u b b b b b b"), (2L, "u"), (3L, "u"))
      .toDF("doc_id", "text")
    val got = InfoTheory.burstinessCard(docs, "doc_id", "text",
        minCount = 3L, k = 10)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map(
      "b" -> ((6L, 1L, 4000000L)),
      "u" -> ((3L, 3L, 0L))))
  }

  test("pmiCollocations: perfectly-bound pair replays the formula; " +
    "support floor prunes; cross-doc pairs never form") {
    // "aa bb" always together (3x, support floor 2 keeps it);
    // "cc dd" once (pruned); doc boundary between bb|cc never pairs
    val docs = Seq("aa bb aa bb", "aa bb", "cc dd").toDF("text")
    val got = InfoTheory.pmiCollocations(docs, "text", minCount = 2L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // bigram universe: (aa,bb) x3, (bb,aa) x1, (cc,dd) x1 -> T=5;
    // marginals cx(aa)=3, cy(bb)=3
    def pmi(cxy: Long, cx: Long, cy: Long): Long =
      IntLog.ilog2Micro(cxy) + IntLog.ilog2Micro(5L) -
        IntLog.ilog2Micro(cx) - IntLog.ilog2Micro(cy)
    assert(got === Map(("aa", "bb") -> ((3L, pmi(3L, 3L, 3L)))))
  }

  test("bigramEntropyRate: deterministic successor -> cond exactly 0; " +
    "uniform successor -> cond exactly 1 bit") {
    val docs = Seq(
      ("det", "aa bb aa bb aa bb aa bb aa"), // aa->bb, bb->aa only
      ("uni", "aa xx aa yy aa xx aa yy aa")) // aa-> {xx,yy} uniform
      .toDF("g", "text")
    val got = InfoTheory.bigramEntropyRate(docs, "g", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(4)))).toMap
    assert(got(("det"))._1 === 8L)
    assert(got(("det"))._2 === 0L) // H(X,Y)=H(X): successor determined
    // uni: bigrams (aa,xx)x2 (xx,aa)x2 (aa,yy)x2 (yy,aa)x2 -> H(X,Y)=2 bits
    // left marginal: aa x4, xx x2, yy x2 -> H(X)=1.5 bits -> cond=0.5?
    // hmm — cond = H(successor|current): aa->{xx,yy} uniform (1 bit,
    // weight 1/2), xx->aa, yy->aa deterministic (0, weight 1/2) -> 0.5 bit
    assert(got(("uni"))._1 === 8L)
    assert(got(("uni"))._2 === (1L << 19)) // exactly 0.5 bit
  }

  test("sourceOverlapMatrix: identical groups 1000000 ppm, disjoint 0, " +
    "half-overlap computed exactly; group cap enforced") {
    // 4-token docs -> 2 distinct 3-shingles each
    val docs = Seq(
      ("a", "w x y z"),   // shingles {w x y, x y z}
      ("b", "w x y z"),   // identical -> jaccard 1
      ("c", "w x y q"))   // shares {w x y} -> 1 of 3 distinct
      .toDF("g", "text")
    val got = Scrub.sourceOverlapMatrix(docs, "g", "text", n = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got(("a", "b")) === ((2L, 2L, 2L, 1000000L)))
    assert(got(("a", "c")) === ((2L, 2L, 1L, 1000000L / 3L)))
    assert(got(("b", "c")) === ((2L, 2L, 1L, 1000000L / 3L)))
    // a shingle-less group (docs shorter than n tokens) reports 0 ppm
    // against every partner instead of vanishing from the matrix
    val withShort = docs.union(Seq(("d", "x y")).toDF("g", "text"))
    val got2 = Scrub.sourceOverlapMatrix(withShort, "g", "text", n = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(4), r.getLong(5)))).toMap
    assert(got2.size === 6)
    assert(got2(("a", "d")) === ((2L, 0L, 0L)))
    assert(got2(("c", "d")) === ((2L, 0L, 0L)))
    val err = intercept[IllegalArgumentException] {
      Scrub.sourceOverlapMatrix(docs, "g", "text", n = 3, maxGroups = 2)
    }
    assert(err.getMessage.contains("groups"))
  }
}
