package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Distribution cosine and token lift: identical distributions score
  * cos² = 1, orthogonal ones 0, and lift lands on the exact
  * rationals. */
class DistributionSpec extends SparkSpec {

  test("distribution cosine: identical, scaled, and disjoint groups") {
    import spark.implicits._
    val rows =
      Seq.fill(2)(("a", "x")) ++ Seq(("a", "y")) ++ // a: x:2 y:1
        Seq.fill(4)(("b", "x")) ++ Seq.fill(2)(("b", "y")) ++ // b = 2·a
        Seq(("c", "z")) // disjoint
    val m = Profile.distributionCosine(rows.toDF("g", "item"), "g",
      col("item"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // scaled copies: cos² exactly 1 (dot=2·4+1·2=10; 5·20=100=10²)
    assert(m(("a", "b")) == ((10L, 1000000L)))
    // disjoint pairs share no item -> no row at all (dot would be 0)
    assert(!m.contains(("a", "c")) && !m.contains(("b", "c")))
  }

  test("token lift: exact rational, minDocs prunes, repeats count once") {
    import spark.implicits._
    // docs: {p q} x3, {p} x1, {q} x1, {p q q q} (repeats collapse)
    val docs = Seq(
      (1L, "p q"), (2L, "p q"), (3L, "p q"),
      (4L, "p"), (5L, "q"), (6L, "p q q q"))
      .toDF("doc_id", "text")
    val m = NgramModel.tokenLift(docs, "doc_id", "text", minDocs = 2L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // c(pq)=4, c(p)=5, c(q)=5, N=6 -> lift = 4*6/25 = 0.96
    assert(m(("p", "q")) == ((4L, 960000L)))
    assert(m.size == 1)
  }
}
