package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** PPJoin must be EXACT: identical pair set and jaccard values to the
  * plain inverted-index join (no df cap) on random corpora — the
  * prefix filter may only prune candidates that cannot qualify. A tiny
  * vocabulary maximizes shingle sharing (worst case for candidate
  * dedup) and near-identical doc pairs stress the high-jaccard end. */
class SetSimJoinSpec extends SparkSpec {
  import spark.implicits._

  private def forAllSeeded[A](gen: Gen[A], n: Int)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(1342L + i)))
    }

  private val corpusGen: Gen[Seq[String]] = for {
    nDocs <- Gen.choose(2, 12)
    base <- Gen.listOfN(nDocs, for {
      nWords <- Gen.choose(0, 14)
      ws <- Gen.listOfN(nWords, Gen.oneOf("a", "b", "c", "d"))
    } yield ws.mkString(" "))
    // plant near-dups: clone some docs with a one-word perturbation
    clones <- Gen.someOf(base)
  } yield base ++ clones.map(t => if (t.isEmpty) t else t + " a")

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1),
      math.rint(r.getDouble(2) * 1e12) / 1e12)).toSet

  test("ppjoin == inverted-index join on random corpora, t = 0.5 and 0.8") {
    forAllSeeded(corpusGen, 25) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      for (t <- Seq(0.5, 0.8)) {
        val pp = pairs(SetSimJoin.ppjoinPairs(df, "doc_id", "text", 3, t))
        val ref = pairs(Dedup.ngramJaccardPairs(df, "doc_id", "text", 3, t))
        assert(pp == ref, s"threshold $t: ppjoin $pp vs reference $ref")
      }
    }
  }

  test("identical docs pair at jaccard 1.0; sub-shingle docs never pair") {
    val df = Seq(
      (1L, "x y z w v u t s"),
      (2L, "x y z w v u t s"),
      (3L, "a b"), // < n tokens: empty shingle set
      (4L, "a b")
    ).toDF("doc_id", "text")
    val got = pairs(SetSimJoin.ppjoinPairs(df, "doc_id", "text", 3, 0.8))
    assert(got == Set((1L, 2L, 1.0)))
  }

  test("ppjoinProbe == exact batch×corpus reference on random corpora") {
    forAllSeeded(corpusGen, 20) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val (batch, corpus) = docs.partition(_._1 % 3 == 0)
      val bDf = batch.toDF("doc_id", "text")
      val cDf = corpus.toDF("doc_id", "text")
      for (t <- Seq(0.5, 0.8)) {
        val got = pairs(SetSimJoin.ppjoinProbe(cDf, bDf, "doc_id", "text", 3, t))
        // reference: full ppjoin over the union, keep batch×corpus pairs
        // (exactness of the self-join form is pinned by the first test)
        val all = (batch ++ corpus).toDF("doc_id", "text")
        val bIds = batch.map(_._1).toSet
        val ref = pairs(SetSimJoin.ppjoinPairs(all, "doc_id", "text", 3, t))
          .collect {
            case (a, b, j) if bIds(a) ^ bIds(b) =>
              if (bIds(a)) (a, b, j) else (b, a, j)
          }
        assert(got == ref, s"threshold $t")
      }
    }
  }

  test("containmentPairs == brute-force asymmetric overlap on random corpora") {
    forAllSeeded(corpusGen, 20) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = docs.toDF("doc_id", "text")
      def shingleSet(t: String): Set[String] = {
        val tk = t.split(" ").filter(_.nonEmpty)
        if (tk.length < 3) Set.empty
        else tk.sliding(3).map(_.mkString(" ")).toSet
      }
      for (thr <- Seq(0.5, 0.8)) {
        val got = pairs(SetSimJoin.containmentPairs(df, "doc_id", "text", 3, thr))
        val ref = (for {
          (ia, ta) <- docs; (ib, tb) <- docs if ia != ib
          sa = shingleSet(ta); sb = shingleSet(tb)
          if sa.nonEmpty
          c = (sa & sb).size
          if c >= math.ceil(sa.size * thr)
        } yield (ia, ib,
          math.rint(c * 1.0 / sa.size * 1e12) / 1e12)).toSet
        assert(got == ref, s"threshold $thr")
      }
    }
  }

  test("a quoted excerpt is found by containment but invisible to jaccard") {
    val excerpt = "p q r s t u"
    val page = ("filler" +: (1 to 40).map(i => s"w$i")).mkString(" ") +
      s" $excerpt"
    val df = Seq((1L, excerpt), (2L, page)).toDF("doc_id", "text")
    val cont = pairs(SetSimJoin.containmentPairs(df, "doc_id", "text", 3, 0.8))
    assert(cont.map(p => (p._1, p._2)) == Set((1L, 2L)))
    assert(cont.head._3 == 1.0)
    val jac = pairs(SetSimJoin.ppjoinPairs(df, "doc_id", "text", 3, 0.5))
    assert(jac.isEmpty)
  }

  test("threshold 1.0 keeps only exact shingle-set matches") {
    val df = Seq(
      (1L, "x y z w"), (2L, "x y z w"), (3L, "x y z q")
    ).toDF("doc_id", "text")
    val got = pairs(SetSimJoin.ppjoinPairs(df, "doc_id", "text", 3, 1.0))
    assert(got == Set((1L, 2L, 1.0)))
  }
}
