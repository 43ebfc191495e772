package graft.operators

import graft.SparkSpec

/** KWIC snippets: first-hit selection across multiple terms, window
  * clamping at both document edges, and absent rows for ranked docs
  * with no term hit. */
class SnippetsSpec extends SparkSpec {

  test("first hit wins, window clamps, missing hits drop") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "gamma starts here"),
      (3L, "tail ends with gamma"),
      (4L, "no match here"))
      .toDF("doc_id", "text")
    val ranked = Seq((7L, 1L), (7L, 2L), (7L, 3L), (7L, 4L))
      .toDF("query_id", "doc_id")
    val out = Retrieval.snippets(docs, "doc_id", "text", ranked,
      Seq(7L -> Seq("gamma", "delta")), context = 2)
      .collect().map(r => r.getLong(1) -> ((r.getLong(2), r.getString(3))))
      .toMap
    // doc 1: gamma at 3 beats delta at 4; window 1..5
    assert(out(1L) == ((3L, "alpha beta gamma delta epsilon")))
    // doc 2: hit at 1 -> window clamps left to 1..3
    assert(out(2L) == ((1L, "gamma starts here")))
    // doc 3: hit at 4 of 4 -> clamps right to 2..4
    assert(out(3L) == ((4L, "ends with gamma")))
    // doc 4: ranked but no hit -> absent
    assert(!out.contains(4L))
  }
}
