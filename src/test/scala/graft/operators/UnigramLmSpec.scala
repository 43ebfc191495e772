package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** The distributed unigram-LM trainer must equal a direct in-memory
  * reference — same seeding, same StrictMath scores, same
  * longest-last-piece tie-break — on random corpora (tiny alphabet:
  * maximal substring overlap and tie stress). */
class UnigramLmSpec extends SparkSpec {

  private def forAllSeeded[A](gen: Gen[A], n: Int)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(9042L + i)))
    }

  private val corpusGen: Gen[Seq[String]] = for {
    nDocs <- Gen.choose(1, 4)
    docs <- Gen.listOfN(nDocs, for {
      nWords <- Gen.choose(1, 10)
      ws <- Gen.listOfN(nWords, for {
        len <- Gen.choose(1, 7)
        cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c'))
      } yield cs.mkString)
    } yield ws.mkString(" "))
  } yield docs

  // ---- in-memory reference: the algorithm restated from the paper ----

  private def refWords(texts: Seq[String]): Map[String, Long] =
    texts.flatMap(_.split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, o) => w -> o.length.toLong }

  private def refSeed(words: Map[String, Long], maxLen: Int,
                      topK: Int): Map[String, Long] = {
    val subs = collection.mutable.HashMap.empty[String, Long]
    for ((w, c) <- words; i <- 0 until w.length;
         l <- 1 to math.min(maxLen, w.length - i)) {
      val p = w.substring(i, i + l)
      subs(p) = subs.getOrElse(p, 0L) + c
    }
    val top = subs.toSeq.sortBy { case (p, n) => (-n, p) }.take(topK).map(_._1)
    val keep = top.toSet ++ subs.keysIterator.filter(_.length == 1)
    subs.filter { case (p, _) => keep(p) }.toMap
  }

  private def refViterbi(w: String, scores: Map[String, Double],
                         maxLen: Int): List[String] = {
    val n = w.length
    val dp = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = new Array[Int](n + 1)
    dp(0) = 0.0
    for (i <- 1 to n; l <- 1 to math.min(maxLen, i))
      scores.get(w.substring(i - l, i)).foreach { s =>
        val cand = dp(i - l) + s
        if (cand >= dp(i)) { dp(i) = cand; back(i) = l }
      }
    if (dp(n) == Double.NegativeInfinity) return null
    var out = List.empty[String]; var p = n
    while (p > 0) { out = w.substring(p - back(p), p) :: out; p -= back(p) }
    out
  }

  private def refTrain(texts: Seq[String], vocabSize: Int, emRounds: Int,
                       maxLen: Int, seedK: Int): Seq[(String, Long)] = {
    val words = refWords(texts)
    var counts = refSeed(words, maxLen, seedK)
    for (_ <- 1 to emRounds) {
      val total = counts.values.sum
      val logZ = StrictMath.log(total.toDouble)
      val scores = counts.map { case (p, c) =>
        p -> (StrictMath.log(c.toDouble) - logZ) }
      val next = collection.mutable.HashMap.empty[String, Long]
      for ((w, c) <- words; p <- refViterbi(w, scores, maxLen))
        next(p) = next.getOrElse(p, 0L) + c
      counts = next.toMap ++
        counts.keysIterator.filter(p => p.length == 1 && !next.contains(p))
          .map(_ -> 1L).toMap
    }
    val kept = counts.toSeq.sortBy { case (p, c) => (-c, p) }
      .take(vocabSize).map(_._1).toSet ++
      counts.keysIterator.filter(_.length == 1)
    counts.filter { case (p, _) => kept(p) }
      .toSeq.sortBy { case (p, c) => (-c, p) }
  }

  test("distributed trainer equals the in-memory reference on random corpora") {
    forAllSeeded(Gen.zip(corpusGen, Gen.choose(1, 3)), 12) { case (texts, k) =>
      import spark.implicits._
      val got = UnigramLm.train(texts.toDF("text"), "text",
          vocabSize = 16, emRounds = k, maxPieceLen = 4, seedK = 32)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val want = refTrain(texts, 16, k, 4, 32)
      assert(got == want, s"corpus=$texts k=$k")
    }
  }

  // ---- full-EM reference: forward-backward restated from the paper ----

  private def refLse(a: Double, b: Double): Double =
    if (a == Double.NegativeInfinity) b
    else if (b == Double.NegativeInfinity) a
    else {
      val m = math.max(a, b)
      m + StrictMath.log(StrictMath.exp(a - m) + StrictMath.exp(b - m))
    }

  private def refExpected(w: String, scores: Map[String, Double],
                          maxLen: Int): Map[String, Double] = {
    val n = w.length
    val alpha = Array.fill(n + 1)(Double.NegativeInfinity)
    val beta = Array.fill(n + 1)(Double.NegativeInfinity)
    alpha(0) = 0.0
    for (i <- 1 to n; l <- 1 to math.min(maxLen, i))
      scores.get(w.substring(i - l, i)).foreach(s =>
        alpha(i) = refLse(alpha(i), alpha(i - l) + s))
    if (alpha(n) == Double.NegativeInfinity) return null
    beta(n) = 0.0
    for (i <- (n - 1) to 0 by -1; l <- 1 to math.min(maxLen, n - i))
      scores.get(w.substring(i, i + l)).foreach(s =>
        beta(i) = refLse(beta(i), s + beta(i + l)))
    val out = collection.mutable.HashMap.empty[String, Double]
    for (i <- 1 to n; l <- 1 to math.min(maxLen, i)) {
      val p = w.substring(i - l, i)
      scores.get(p).foreach { s =>
        val post = StrictMath.exp(alpha(i - l) + s + beta(i) - alpha(n))
        if (post > 0.0) out(p) = out.getOrElse(p, 0.0) + post
      }
    }
    out.toMap
  }

  private def refTrainFullEm(texts: Seq[String], emRounds: Int,
                             maxLen: Int, seedK: Int): Map[String, Double] = {
    val words = refWords(texts)
    var counts: Map[String, Double] =
      refSeed(words, maxLen, seedK).map { case (p, c) => p -> c.toDouble }
    for (_ <- 1 to emRounds) {
      val total = counts.values.sum
      val logZ = StrictMath.log(total)
      val scores = counts.map { case (p, c) =>
        p -> (StrictMath.log(c) - logZ) }
      val next = collection.mutable.HashMap.empty[String, Double]
      for ((w, c) <- words.toSeq.sortBy(_._1);
           (p, e) <- refExpected(w, scores, maxLen).toSeq.sortBy(_._1))
        next(p) = next.getOrElse(p, 0.0) + e * c
      counts = next.toMap ++
        counts.keysIterator.filter(p => p.length == 1 && !next.contains(p))
          .map(_ -> 1.0).toMap
    }
    counts
  }

  test("arc posteriors are a lattice partition: expected length == word length") {
    // every segmentation covers each character position exactly once, so
    // sum over pieces of E[count] * len(piece) must equal |w|
    forAllSeeded(corpusGen, 12) { texts =>
      val words = refWords(texts)
      val counts = refSeed(words, 4, 32)
      val total = counts.values.sum
      val scores = counts.map { case (p, c) =>
        p -> (StrictMath.log(c.toDouble) - StrictMath.log(total.toDouble)) }
      words.keysIterator.foreach { w =>
        val (ec, _) = UnigramLm.wordExpectedCounts(w, scores, 4)
        val expLen = ec.iterator.map { case (p, e) => p.length * e }.sum
        assert(math.abs(expLen - w.length) < 1e-9, s"word=$w expLen=$expLen")
      }
    }
  }

  test("full-EM trainer equals the in-memory forward-backward reference") {
    // vocabSize past the seed size keeps EVERY piece, so the comparison
    // is over the EM phase itself, insensitive to tie-breaks in the
    // pruning ranking (pruning determinism is pinned separately below)
    forAllSeeded(Gen.zip(corpusGen, Gen.choose(1, 3)), 10) { case (texts, k) =>
      import spark.implicits._
      val got = UnigramLm.trainFullEm(texts.toDF("text"), "text",
          vocabSize = 10000, emRounds = k, maxPieceLen = 4, seedK = 32)
        .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      val want = refTrainFullEm(texts, k, 4, 32)
      assert(got.keySet == want.keySet,
        s"piece sets diverge: corpus=$texts k=$k " +
          s"only_got=${got.keySet -- want.keySet} only_want=${want.keySet -- got.keySet}")
      got.foreach { case (p, e) =>
        val r = want(p)
        val tol = 1e-9 * math.max(1.0, math.max(math.abs(e), math.abs(r)))
        assert(math.abs(e - r) <= tol, s"piece=$p got=$e want=$r corpus=$texts")
      }
    }
  }

  test("likelihood-loss pruning keeps chars and the costliest pieces") {
    import spark.implicits._
    // 'ab' dominates the corpus: removing it forces a+b at a much worse
    // score, so it must win the single multi-char slot of a vocabSize=1
    // prune; every other multi-char piece drops. Chars always stay.
    val docs = Seq("abab abab abca").toDF("text")
    val out = UnigramLm.trainFullEm(docs, "text", vocabSize = 1,
        emRounds = 2, maxPieceLen = 2, seedK = 32)
      .collect().map(r => r.getString(0)).toSet
    assert(Set("a", "b", "c").subsetOf(out))
    assert(out.filter(_.length > 1) == Set("ab"),
      s"expected 'ab' as the sole surviving multi-char piece: $out")
  }

  test("seed keeps every single character and the exact weighted top-K") {
    import spark.implicits._
    val seed = UnigramLm.seedPieces(Seq("abc abc xyz").toDF("text"), "text",
        maxLen = 3, topK = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // top-2 by (n desc, piece): a=2, ab=2 beat everything else at 2 by
    // lexicographic order; singles survive regardless of rank
    assert(Set("a", "b", "c", "x", "y", "z").subsetOf(seed.keySet))
    assert(seed("a") == 2L && seed("b") == 2L)
    assert(seed.contains("ab") && !seed.contains("bc"))
  }

  test("encoding covers the training corpus: no OOV, pieces bounded by chars") {
    import spark.implicits._
    val docs = Seq((1L, "abab cab"), (2L, "bca")).toDF("doc_id", "text")
    val pieces = UnigramLm.train(docs, "text", vocabSize = 8,
      emRounds = 2, maxPieceLen = 3, seedK = 16)
    val enc = UnigramLm.encodedCounts(docs, "doc_id", "text", pieces,
        maxPieceLen = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(enc.forall(_._4 == 0L), s"no OOV on the training corpus: $enc")
    assert(enc.forall(e => e._3 >= e._2), "at least one piece per token")
  }
}
