package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property check for the BPE trainer: the distributed implementation
  * must equal a direct in-memory reference — naive pair counting, the
  * (count desc, left, right) tie-break, and textbook left-to-right
  * non-overlapping merges — on random corpora over a tiny alphabet
  * (maximal greedy-chain and tie stress). Deterministic seeds, the
  * InvariantsSpec convention. */
class BpeFuzzSpec extends SparkSpec {

  private def forAllSeeded[A](gen: Gen[A], n: Int)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(7042L + i)))
    }

  private val corpusGen: Gen[Seq[String]] = for {
    nDocs <- Gen.choose(1, 4)
    docs <- Gen.listOfN(nDocs, for {
      nWords <- Gen.choose(1, 12)
      ws <- Gen.listOfN(nWords, for {
        len <- Gen.choose(1, 6)
        cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c'))
      } yield cs.mkString)
    } yield ws.mkString(" "))
  } yield docs

  /** Reference trainer: Map[word -> count] of symbol lists. */
  private def naiveBpe(texts: Seq[String], k: Int): Seq[(String, String, Long)] = {
    var words: Map[List[String], Long] = texts
      .flatMap(_.split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, occ) =>
        w.toList.map(_.toString) -> occ.length.toLong
      }
    val out = Seq.newBuilder[(String, String, Long)]
    var round = 0
    var exhausted = false
    while (round < k && !exhausted) {
      val counts = words.toSeq.flatMap { case (sym, wc) =>
        sym.zip(sym.tail).map(p => p -> wc)
      }.groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
      if (counts.isEmpty) exhausted = true
      else {
        val ((a, b), n) = counts.minBy { case ((x, y), c) => (-c, x, y) }
        out += ((a, b, n))
        words = words.toSeq.map { case (sym, wc) =>
          val merged = scala.collection.mutable.ListBuffer.empty[String]
          var i = 0
          while (i < sym.length) {
            if (i + 1 < sym.length && sym(i) == a && sym(i + 1) == b) {
              merged += (a + b); i += 2 // consume both: non-overlapping
            } else { merged += sym(i); i += 1 }
          }
          merged.toList -> wc
        }.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sum }
        round += 1
      }
    }
    out.result()
  }

  private def checkAgainstNaive(texts: Seq[String], k: Int): Unit = {
    import spark.implicits._
    val want = naiveBpe(texts, k)
    if (want.length < k) {
      val e = intercept[IllegalStateException] {
        CorpusStats.bpeTrainMerges(texts.toDF("text"), "text", k).collect()
      }
      assert(e.getMessage.contains("ran out of adjacent pairs"))
    } else {
      val got = CorpusStats.bpeTrainMerges(texts.toDF("text"), "text", k)
        .collect().sortBy(_.getInt(0))
        .map(r => (r.getString(1), r.getString(2), r.getLong(4))).toSeq
      assert(got == want, s"corpus=$texts k=$k")
    }
  }

  test("bpeTrainMerges equals the naive reference on random tiny-alphabet corpora") {
    forAllSeeded(Gen.zip(corpusGen, Gen.choose(1, 4)), 25) { case (texts, k) =>
      checkAgainstNaive(texts, k)
    }
  }

  test("deep-k runs keep the incremental pair ledger exact across many rounds") {
    // the driver-side ledger is only ever UPDATED after round 1 (never
    // rebuilt) — an off-by-one in any round's delta would compound and
    // surface as a divergent later merge; deep k is the stress for it
    forAllSeeded(Gen.zip(corpusGen, Gen.choose(8, 16)), 8) { case (texts, k) =>
      checkAgainstNaive(texts, k)
    }
  }

  test("deep in-memory trainer equals the naive reference to exhaustion") {
    // the bpeTrainMergesDeep path: same argmax/tie-break/replacement as
    // the distributed trainer, driven to full exhaustion (k past what
    // the corpus supports exercises the budget-stop)
    forAllSeeded(Gen.zip(corpusGen, Gen.choose(1, 40)), 25) { case (texts, k) =>
      val ledger = texts.flatMap(_.split(" ").filter(_.nonEmpty))
        .groupBy(identity).toArray
        .map { case (w, occ) =>
          (occ.length.toLong, w.split("").filter(_.nonEmpty)) }
      val got = CorpusStats.bpeTrainInMemory(ledger, k)
        .map(m => (m._2, m._3, m._5))
      val want = naiveBpe(texts, k)
      assert(got == want, s"corpus=$texts k=$k")
    }
  }

  test("in-memory trainer sustains 1000+ exact merges on a vocabulary-rich corpus") {
    // the production-depth claim: a corpus whose vocabulary supports
    // >= 1000 merges trains that deep, byte-exact vs the naive
    // reference (the testdata documents corpus exhausts at ~89, so this
    // synthetic one carries the deep-k pin)
    val rnd = new scala.util.Random(90210)
    val alphabet = "abcdefghijklmnop"
    val vocab = (0 until 1500).map { _ =>
      (0 until (3 + rnd.nextInt(8)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    val texts = (0 until 300).map { _ =>
      (0 until 40).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val k = 1000
    val ledger = texts.flatMap(_.split(" ").filter(_.nonEmpty))
      .groupBy(identity).toArray
      .map { case (w, occ) => (occ.length.toLong, w.split("").filter(_.nonEmpty)) }
    val t0 = System.nanoTime()
    val got = CorpusStats.bpeTrainInMemory(ledger, k)
    val wallSec = (System.nanoTime() - t0) / 1e9
    assert(got.size == k, s"corpus exhausted at ${got.size} < $k merges")
    val want = naiveBpe(texts, k)
    assert(got.map(m => (m._2, m._3, m._5)) == want)
    // per-merge wall far under the r12 distributed 0.088 s/merge
    assert(wallSec / k < 0.01, s"deep training too slow: $wallSec s for $k merges")
  }

  test("bpeTrainMergesDeep equals the batched distributed trainer end-to-end") {
    import spark.implicits._
    val texts = Seq(
      "the cat sat on the mat the cat sat",
      "a banana and a bandana in havana",
      "abc abc abd abd abe abe abc")
    val deep = CorpusStats.bpeTrainMergesDeep(texts.toDF("text"), "text", 200)
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4))).toSeq
    val batched = CorpusStats.bpeTrainMergesCapped(texts.toDF("text"), "text", 200)
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4))).toSeq
    assert(deep == batched)
    assert(deep.nonEmpty && deep.size < 200, "corpus should exhaust under budget")
  }

  test("symbol-disjoint merges batch into one distributed round") {
    import spark.implicits._
    // six 2-char words with distinct counts: every merge is pairwise
    // symbol-disjoint, and merging a 2-symbol word creates NO new pairs,
    // so the whole k=6 training must commit as a single speculative batch
    val words = Seq("ab" -> 50, "cd" -> 49, "ef" -> 48,
      "gh" -> 47, "ij" -> 46, "kl" -> 45)
    val texts = words.flatMap { case (w, n) => Seq.fill(n)(w) }
    val (merges, _, distRounds) =
      CorpusStats.bpeTrainCore(texts.toDF("text"), "text", k = 6, sep = "\u0001")
    assert(merges.map(m => (m._2, m._3, m._5)) ==
      words.map { case (w, n) => (w(0).toString, w(1).toString, n.toLong) })
    assert(distRounds == 1,
      s"disjoint merges must batch into one distributed round, ran $distRounds")
  }

  test("batch truncation on a created pair that outranks the speculation") {
    import spark.implicits._
    // pre-batch ledger: (a,b)=40 then (x,y)=30 — disjoint, so both are
    // speculated together. But merging (a,b) creates ("ab","c") with
    // count 35 > 30, which sequential training picks SECOND; the replay
    // validation must truncate the batch and emit ("ab","c") as round 2.
    val texts = Seq.fill(35)("abc") ++ Seq.fill(5)("zab") ++ Seq.fill(30)("xy")
    val got = CorpusStats.bpeTrainMerges(texts.toDF("text"), "text", k = 3)
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2), r.getLong(4))).toSeq
    assert(got == naiveBpe(texts, 3).map(m => (m._1, m._2, m._3)),
      s"truncation path diverged: $got")
    assert(got(1) == (("ab", "c", 35L)))
  }

  test("merge-round cap and zero rounds are refused loudly") {
    import spark.implicits._
    val df = Seq("aa bb").toDF("text")
    assert(intercept[IllegalArgumentException] {
      CorpusStats.bpeTrainMerges(df, "text", 0)
    }.getMessage.contains("merge rounds"))
    assert(intercept[IllegalArgumentException] {
      CorpusStats.bpeTrainMerges(df, "text", 1025)
    }.getMessage.contains("merge rounds"))
  }
}
