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
