package graft.operators

import graft.SparkSpec

/** Span-level exact-substring dedup (Dedup.duplicateSpanCoverage /
  * removeDuplicateSpans) and the boilerplate report that inspects what
  * the df caps drop. */
class DedupSpanSpec extends SparkSpec {

  private val dup = (1 to 8).map(i => s"D$i").mkString(" ") // the shared 8-gram

  test("duplicated spans are cut from every occurrence, order preserved") {
    import spark.implicits._
    val docs = Seq(
      (1L, s"u1 u2 u3 u4 $dup v1 v2 v3 v4"),
      (2L, s"w1 w2 w3 w4 $dup x1 x2 x3 x4"),
      (3L, "entirely unique text that shares no eight token window at all")
    ).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(docs, "doc_id", "text", k = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((16L, 8L, "u1 u2 u3 u4 v1 v2 v3 v4")))
    assert(out(2L) == ((16L, 8L, "w1 w2 w3 w4 x1 x2 x3 x4")))
    // untouched doc passes through whole
    assert(out(3L)._2 == out(3L)._1 && out(3L)._3.startsWith("entirely"))
  }

  test("a fully self-duplicated doc cleans to empty; short docs are exempt") {
    import spark.implicits._
    val docs = Seq(
      (1L, s"$dup $dup"),     // window at 0 == window at 8 → all 16 covered
      (2L, "too short for k") // < k tokens: no windows, nothing can be cut
    ).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(docs, "doc_id", "text", k = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((16L, 0L, "")))
    assert(out(2L) == ((4L, 4L, "too short for k")))
  }

  test("coverage and removal agree: kept_tokens == n_tokens - covered_tokens") {
    import spark.implicits._
    val docs = Seq(
      (1L, s"a1 a2 $dup b1 b2 $dup"),
      (2L, s"c1 $dup c2"),
      (3L, "nothing shared here at all beyond doubt truly")
    ).toDF("doc_id", "text")
    val cov = Dedup.duplicateSpanCoverage(docs, "doc_id", "text", k = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val rem = Dedup.removeDuplicateSpans(docs, "doc_id", "text", k = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    cov.keySet.foreach { id =>
      val (n, covered) = cov(id)
      assert(rem(id) == ((n, n - covered)), s"doc $id")
    }
  }

  test("linear mask cut equals the brute-force per-token check, incl. saturated docs") {
    import spark.implicits._
    // deterministic pseudo-random corpus with heavy overlap: a small
    // closed vocabulary forces many duplicated 4-gram windows, including
    // boilerplate-SATURATED docs (every position covered) — the shape the
    // old O(tokens x starts) exists() was slowest on
    val rnd = new scala.util.Random(4242)
    val vocab = Vector("a", "b", "c")
    val docs = (1L to 40L).map { id =>
      val n = 4 + rnd.nextInt(60)
      (id, (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val k = 4
    val out = Dedup.removeDuplicateSpans(docs.toDF("doc_id", "text"), "doc_id",
        "text", k = k)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // brute-force reference: global window counts, per-token covered test
    val tokens = docs.map { case (id, t) => id -> t.split("\\s+").toVector }.toMap
    val winCount = tokens.values.flatMap(tk =>
      tk.sliding(k).filter(_.size == k).map(_.mkString(" ")))
      .groupBy(identity).map { case (w, os) => w -> os.size }
    docs.foreach { case (id, _) =>
      val tk = tokens(id)
      val dupStarts = (0 to tk.size - k).filter(s =>
        winCount(tk.slice(s, s + k).mkString(" ")) >= 2)
      val kept = tk.zipWithIndex.collect {
        case (t, i) if !dupStarts.exists(s => s <= i && i <= s + k - 1) => t
      }
      assert(out(id) == ((tk.size.toLong, kept.size.toLong, kept.mkString(" "))),
        s"doc $id: starts=$dupStarts")
    }
    // the corpus really exercised the corner: at least one saturated doc
    assert(out.values.exists(v => v._1 >= 8 && v._2 == 0L),
      "expected at least one fully-covered doc in the saturated corpus")
  }

  test("boilerplate report finds shingles over the df fraction, with exact bp") {
    import spark.implicits._
    val docs = (1L to 8L).map(i => (i, s"common three gram unique$i tail$i")) ++
      Seq((9L, "no overlap with anything here"), (10L, "also fully distinct text"))
    val out = CorpusStats.boilerplateShingles(docs.toDF("doc_id", "text"),
        "doc_id", "text", n = 3, minDfFrac = 0.5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // "common three gram" appears in 8/10 docs → df 8, 8000 bp; every
    // other shingle carries a doc-unique token and stays under the bar
    assert(out == Set(("common three gram", 8L, 8000L)))
  }

  test("boilerplate never force-broadcasts the viral set (tiny minDfFrac degrades)") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, ResolvedHint}
    // a legal-but-tiny threshold makes EVERY distinct shingle "viral";
    // the operator must still answer correctly and must not carry a
    // broadcast HINT on that side — AQE sizing (viral is checkpointed)
    // is the only broadcast path, so a huge survivor set plans a
    // hash-only shuffle join instead of OOMing the driver
    val docs = (1L to 6L).map(i => (i, s"shared pair here plus unique$i"))
      .toDF("doc_id", "text")
    val out = CorpusStats.boilerplateShingles(docs, "doc_id", "text",
      n = 2, minDfFrac = 1e-7)
    val hints = out.queryExecution.analyzed.collect { case r: ResolvedHint => r }
    hints.foreach { h =>
      val ok = h.child match {
        case a: Aggregate => a.groupingExpressions.isEmpty
        case _ => false
      }
      assert(ok, s"boilerplate force-broadcasts a non-1-row side: ${h.child.nodeName}")
    }
    // everything is viral at 1e-7: 4 bigrams/doc, 3 shared across all
    // 6 docs ("shared pair"/"pair here"/"here plus") + 1 doc-unique each
    val rows = out.collect()
    assert(rows.length == 3 + 6)
    assert(rows.filter(_.getLong(1) == 6L).map(_.getString(0)).toSet ==
      Set("shared pair", "pair here", "here plus"))
  }
}
