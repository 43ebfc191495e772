package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Gini diversity: uniform distributions approach (k−1)/k, a
  * single-item group is exactly 0, and the rationals floor exactly. */
class GiniSpec extends SparkSpec {

  private def run(rows: Seq[(String, String)]): Map[String, (Long, Long, Long)] = {
    import spark.implicits._
    Profile.giniDiversity(rows.toDF("g", "item"), "g", col("item"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
  }

  test("concentration extremes and an exact mixed case") {
    val rows =
      Seq.fill(5)(("mono", "only")) ++
        Seq(("uni", "a"), ("uni", "b"), ("uni", "c"), ("uni", "d")) ++
        Seq(("mix", "a"), ("mix", "a"), ("mix", "b"))
    val m = run(rows)
    assert(m("mono") == ((5L, 1L, 0L)))
    // uniform over 4: 1 - 4/16 = 3/4
    assert(m("uni") == ((4L, 4L, 750000L)))
    // counts 2,1: 1 - 5/9 = 4/9 -> floor(4444444.44/10) = 444444
    assert(m("mix") == ((3L, 2L, 444444L)))
  }
}
