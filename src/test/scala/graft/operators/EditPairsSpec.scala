package graft.operators

import graft.SparkSpec

/** FastSS deletion-neighborhood pairs: candidates come from shared
  * variants, truth from the exact verify — shared-variant-but-
  * distance-2 coincidences must NOT survive. */
class EditPairsSpec extends SparkSpec {

  private def pairs(vocab: Seq[(String, Long)]): Set[(String, String)] = {
    import spark.implicits._
    EditPairs.distanceOnePairs(vocab.toDF("w", "c"), "w", "c")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
  }

  test("substitution, deletion and insertion pairs are all found") {
    // car–cat share variant "ca" (substitution pair); cat–ct share "ct"
    // itself (deletion pair); car–ct share nothing and are at distance 2
    val p = pairs(Seq("cat" -> 5L, "car" -> 3L, "ct" -> 1L, "dog" -> 9L))
    assert(p == Set(("car", "cat"), ("cat", "ct")))
  }

  test("shared variant at distance 2 is rejected by the verify") {
    // ab -> {b, a, ab}; ba -> {a, b, ba}: share variants "a" AND "b",
    // but levenshtein(ab, ba) = 2 — the exact verify must kill it
    val p = pairs(Seq("ab" -> 1L, "ba" -> 1L))
    assert(p.isEmpty)
  }

  test("exact Scala levenshtein cross-check on every emitted pair") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val vocab = Seq("spark", "spork", "spar", "sparks", "stark", "shark",
      "park", "dark", "darkk", "bark", "ark", "arc", "art")
      .zipWithIndex.map { case (w, i) => w -> (i + 1).toLong }
    val found = pairs(vocab)
    // soundness: everything emitted is truly at distance 1
    found.foreach { case (a, b) => assert(lev(a, b) == 1, s"($a, $b)") }
    // completeness: every true distance-1 pair is emitted (FastSS
    // neighborhood sharing is exact for k = 1, not a heuristic)
    val all = for {
      a <- vocab.map(_._1); b <- vocab.map(_._1)
      if a < b && lev(a, b) == 1
    } yield (a, b)
    assert(found == all.toSet)
  }

  test("counts ride along with their words") {
    import spark.implicits._
    val out = EditPairs.distanceOnePairs(
      Seq(("cat", 7L), ("cut", 2L)).toDF("w", "c"), "w", "c")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(("cat", "cut", 7L, 2L)))
  }
}
