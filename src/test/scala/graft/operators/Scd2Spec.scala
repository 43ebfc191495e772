package graft.operators

import graft.SparkSpec

/** SCD2 interval building: change compression drops no-op log rows,
  * intervals chain over the COMPRESSED sequence, nulls compare
  * null-safe, and duplicate versions fail loudly. */
class Scd2Spec extends SparkSpec {

  private def run(rows: Seq[(Long, Long, Option[String], Long)]): Set[(Long, Long, Option[Long], Option[String], Long)] = {
    import spark.implicits._
    Scd2.intervals(rows.toDF("k", "v", "a", "b"), "k", "v", Seq("a", "b"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        Option(r.getString(3)), r.getLong(4))).toSet
  }

  test("no-op changes compress; intervals chain over survivors") {
    val got = run(Seq(
      (1L, 1L, Some("x"), 10L),
      (1L, 2L, Some("x"), 10L), // no-op: dropped
      (1L, 3L, Some("y"), 10L), // real change
      (1L, 5L, Some("y"), 20L), // real change (gap in versions is fine)
      (2L, 1L, Some("z"), 7L)))
    assert(got == Set(
      (1L, 1L, Some(2L), Some("x"), 10L), // valid through the dropped v2
      (1L, 3L, Some(4L), Some("y"), 10L),
      (1L, 5L, None, Some("y"), 20L),
      (2L, 1L, None, Some("z"), 7L)))
  }

  test("null attributes compare null-safe in compression") {
    val got = run(Seq(
      (1L, 1L, None, 10L),
      (1L, 2L, None, 10L), // null == null: no-op, dropped
      (1L, 3L, Some("x"), 10L))) // null -> x: real change
    assert(got == Set(
      (1L, 1L, Some(2L), None, 10L),
      (1L, 3L, None, Some("x"), 10L)))
  }

  test("point-in-time read picks the covering interval, open interval included") {
    import spark.implicits._
    val history = Scd2.intervals(Seq(
      (1L, 1L, Some("x"), 10L), (1L, 3L, Some("y"), 20L),
      (2L, 2L, Some("z"), 7L))
      .toDF("k", "v", "a", "b"), "k", "v", Seq("a", "b"))
    val facts = Seq((1L, 1L), (1L, 2L), (1L, 3L), (1L, 9L),
      (2L, 1L), (2L, 2L)).toDF("k", "asof_v")
    val got = Scd2.pointInTime(history, "k", facts, "asof_v", Seq("a", "b"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getString(2), r.getLong(3))).toSet
    assert(got == Set(
      (1L, 1L, "x", 10L), (1L, 2L, "x", 10L), // interval [1,2]
      (1L, 3L, "y", 20L), (1L, 9L, "y", 20L), // open current interval
      (2L, 2L, "z", 7L))) // asof 1 predates key 2's history: absent
  }

  test("duplicate versions for one key fail loudly") {
    val ex = intercept[Exception] {
      run(Seq((1L, 1L, Some("x"), 1L), (1L, 1L, Some("y"), 2L)))
    }
    assert(ex.getMessage != null)
  }
}
