package graft.operators

import graft.SparkSpec

/** The rollup's merge law: percentiles of the merged histogram must be
  * exactly the percentiles of the union (what "exact histograms merge
  * losslessly" buys over a quantile sketch), and the per-key level must
  * agree with the standalone byRank operator. */
class PercentileRollupSpec extends SparkSpec {

  private val ps = Seq("p50" -> 0.5, "p90" -> 0.9)

  private def data = {
    import spark.implicits._
    Seq(("a", 1L), ("a", 5L), ("a", 5L), ("a", 9L),
      ("b", 2L), ("b", 4L), ("b", 100L),
      ("c", 7L)).toDF("k", "v")
  }

  test("per-key level == byRank; global level == byRank on a constant key") {
    import spark.implicits._
    val out = Percentiles.rollup(data, "k", "v", ps)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

    val perKey = Percentiles.byRank(data, "k", "v", ps)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    for ((k, v) <- perKey) assert(out(k) == v, s"key $k")

    val global = Percentiles.byRank(
        data.withColumn("k", org.apache.spark.sql.functions.lit("g")),
        "k", "v", ps)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).head
    assert(out("__ALL__") == global)
    assert(out.size == 4) // a, b, c, __ALL__
  }

  test("global percentiles come from the union, not an average of key results") {
    import spark.implicits._
    // p50 of the union (1,2,2,2,9,9) is 2; p50 per key is 1 resp. 9 —
    // any combine-the-answers shortcut would get this wrong
    val df = Seq(("x", 1L), ("x", 2L), ("x", 2L),
      ("y", 2L), ("y", 9L), ("y", 9L)).toDF("k", "v")
    val out = Percentiles.rollup(df, "k", "v", Seq("p50" -> 0.5))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("__ALL__") == 2L)
    assert(out("x") == 2L && out("y") == 9L) // rank floor((3-1)*.5)+1 = 2
  }

  test("null values are excluded at both levels; n_rows counts non-null") {
    import spark.implicits._
    val df = Seq(("a", Some(3L)), ("a", None), ("b", Some(5L)))
      .toDF("k", "v")
    val out = Percentiles.rollup(df, "k", "v", Seq("p50" -> 0.5))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("a") == ((3L, 1L)))
    assert(out("__ALL__")._2 == 2L)
  }
}
