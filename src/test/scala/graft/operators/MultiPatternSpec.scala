package graft.operators

import scala.util.Random

import graft.SparkSpec

/** Aho-Corasick vs a naive per-pattern sliding-window scan: every
  * occurrence, overlapping included, self-overlapping patterns
  * included, nested patterns included — exact equality on random
  * inputs; plus the DataFrame surfaces and the loud pattern cap. */
class MultiPatternSpec extends SparkSpec {

  private def naive(text: String, p: String): Long =
    (0 to text.length - p.length)
      .count(i => text.regionMatches(i, p, 0, p.length)).toLong

  test("automaton counts == naive overlapping counts (fuzz)") {
    val rnd = new Random(19)
    (0 until 50).foreach { _ =>
      val alpha = "ab "
      val text = Seq.fill(200)(alpha(rnd.nextInt(alpha.length))).mkString
      val pats = (Seq("aa", "ab", "a b", "ba", "b", "aba", "ab ab") ++
        Seq.fill(3)(Seq.fill(1 + rnd.nextInt(4))(
          alpha(rnd.nextInt(alpha.length))).mkString))
        .distinct.filter(_.nonEmpty)
      val ac = MultiPattern.buildAutomaton(pats)
      val got = ac.scan(text)
      pats.zipWithIndex.foreach { case (p, i) =>
        assert(got(i) == naive(text, p),
          s"pattern '$p' in '$text': got ${got(i)}, want ${naive(text, p)}")
      }
    }
  }

  test("scanCounts and patternCensus aggregate the same scan") {
    import spark.implicits._
    val docs = Seq((1L, "spark spark fast"), (2L, "slow"), (3L, "spark slow"))
      .toDF("doc_id", "text")
    val pats = Seq("spark", "slow", "absent").toDF("p")
    val counts = MultiPattern.scanCounts(docs, "doc_id", "text", pats)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(counts == Set((1L, 2L, 1L), (2L, 1L, 1L), (3L, 2L, 2L)))
    val census = MultiPattern.patternCensus(docs, "text", pats)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(census == Set(("spark", 2L, 3L), ("slow", 2L, 2L)))
  }

  test("pattern cap fails loudly, not with an executor OOM") {
    val err = intercept[IllegalArgumentException] {
      MultiPattern.buildAutomaton(
        Seq.tabulate(MultiPattern.MaxPatterns + 1)(i => s"p$i"))
    }
    assert(err.getMessage.contains("cap"))
  }
}
