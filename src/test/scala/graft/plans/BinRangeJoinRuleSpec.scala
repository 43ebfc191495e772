package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{GraftExtensions, SparkTuning}

/** The injected optimizer rule must turn a bare-BETWEEN inner join
  * into a hash join (no BNLJ, no cartesian) with UNCHANGED results —
  * including negative values (floor-division binning) and bins wider
  * than intervals — and must leave joins that already carry an
  * equi-key untouched. */
class BinRangeJoinRuleSpec extends AnyFunSuite {

  // own session: the rule only exists where the extensions are injected.
  // builder().getOrCreate() CANNOT provide that here — when this suite
  // runs after a SparkSpec suite in the same JVM it either returns the
  // shared session unchanged, or (default cleared) builds on the
  // EXISTING SparkContext and resolves spark.sql.extensions from the
  // context's conf, where it is absent. The graftx Bridge constructs
  // the session with the extensions instance applied directly, on
  // whatever context exists (creating one only if none does).
  private lazy val spark: SparkSession = {
    val sc = org.apache.spark.SparkContext.getOrCreate(
      new org.apache.spark.SparkConf()
        .setMaster("local[4]").setAppName("BinRangeJoinRuleSpec")
        .set("spark.ui.enabled", "false"))
    org.apache.spark.sql.graftx.Bridge.sessionWithExtensions(
      sc, new GraftExtensions().apply(_), Map(
        "spark.sql.shuffle.partitions" -> "4",
        "spark.sql.session.timeZone" -> "UTC",
        SparkTuning.ExcludedRulesKey -> SparkTuning.ExcludedRules,
        BinRangeJoinRule.BinWidthKey -> "10"))
  }

  private def points = {
    import spark.implicits._
    Seq((1L, -25L), (2L, -10L), (3L, 0L), (4L, 7L), (5L, 19L), (6L, 100L))
      .toDF("pid", "p")
  }
  private def intervals = {
    import spark.implicits._
    Seq((10L, -30L, -20L), (20L, -5L, 5L), (30L, 0L, 50L), (40L, 98L, 99L))
      .toDF("iid", "lo", "hi")
  }

  private def expected = Set(
    (1L, 10L), // -25 in [-30,-20]
    (3L, 20L), (3L, 30L), // 0 in [-5,5] and [0,50]
    (4L, 30L), // 7 in [0,50] only (7 > 5)
    (5L, 30L)) // 19 in [0,50]; 100 matches nothing (40 ends at 99)

  test("bare BETWEEN join plans as a hash join with unchanged results") {
    val joined = points.join(intervals,
      col("p") >= col("lo") && col("p") <= col("hi"))
    val plan = joined.queryExecution.executedPlan.toString
    Seq("BroadcastNestedLoopJoin", "CartesianProduct").foreach(bad =>
      assert(!plan.contains(bad), s"rule did not fire — $bad in:\n$plan"))
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"))
    val got = joined.select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
  }

  test("swapped sides (intervals on the left) rewrite too") {
    val joined = intervals.join(points,
      col("p") >= col("lo") && col("p") <= col("hi"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    val got = joined.select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
  }

  test("strict bounds keep their exclusive semantics through the rewrite") {
    val joined = points.join(intervals,
      col("p") > col("lo") && col("p") < col("hi"))
    assert(!joined.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
    val got = joined.select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // (3,30) drops: 0 is NOT strictly inside (0,50); the rest survive
    assert(got == Set((1L, 10L), (3L, 20L), (4L, 30L), (5L, 30L)))
  }

  test("a join already carrying an equi-key is left untouched") {
    import spark.implicits._
    val l = Seq((1L, 5L), (2L, 15L)).toDF("k", "p")
    val r = Seq((1L, 0L, 10L), (2L, 0L, 10L)).toDF("k2", "lo", "hi")
    val joined = l.join(r, col("k") === col("k2") &&
      col("p") >= col("lo") && col("p") <= col("hi"))
    val plan = joined.queryExecution.optimizedPlan.toString
    assert(!plan.contains("__graft_bin"), s"rule fired needlessly:\n$plan")
    assert(joined.collect().map(_.getLong(0)).toSet == Set(1L))
  }

  test("extra residual predicates survive the rewrite") {
    val joined = points.join(intervals,
      col("p") >= col("lo") && col("p") <= col("hi") && col("iid") =!= 30L)
    assert(!joined.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
    val got = joined.select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected.filter(_._2 != 30L))
  }

  test("inverted intervals (lo > hi) match nothing instead of crashing") {
    import spark.implicits._
    // before the clamp, Sequence(bin(lo), bin(hi)) threw 'Illegal
    // sequence boundaries' on such rows — an optimizer rule must never
    // change a query's failure behavior
    val ivals = Seq((10L, -30L, -20L), (20L, -5L, 5L), (66L, 50L, -50L))
      .toDF("iid", "lo", "hi") // 66 is inverted: zero matches, no throw
    val joined = points.join(ivals,
      col("p") >= col("lo") && col("p") <= col("hi"))
    val got = joined.select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (3L, 20L)))
  }

  test("maxBinsPerInterval bounds the bin COUNT: exactly maxBins bins " +
    "pass, one more refuses loudly") {
    import spark.implicits._
    spark.conf.set(BinRangeJoinRule.MaxBinsKey, "3")
    try {
      // binWidth=10: [0,29] spans bins {0,1,2} = exactly 3 — allowed
      val ok = Seq((1L, 0L, 29L)).toDF("iid", "lo", "hi")
      val got = points.join(ok,
          col("p") >= col("lo") && col("p") <= col("hi"))
        .select("pid").collect().map(_.getLong(0)).toSet
      assert(got == Set(3L, 4L, 5L))
      // [0,39] spans bins {0,1,2,3} = 4 — one over; the pre-fix guard
      // (difference > maxBins) let this through silently
      val wide = Seq((1L, 0L, 39L)).toDF("iid", "lo", "hi")
      val e = intercept[Throwable] {
        points.join(wide,
          col("p") >= col("lo") && col("p") <= col("hi")).collect()
      }
      def chain(t: Throwable): String =
        if (t == null) "" else t.toString + chain(t.getCause)
      assert(chain(e).contains("BinRangeJoinRule"),
        s"expected the loud wide-interval refusal, got: ${chain(e)}")
    } finally spark.conf.set(BinRangeJoinRule.MaxBinsKey, "1048576")
  }

  test("binWidth 0 disables the rewrite (runtime conf, per-session)") {
    spark.conf.set(BinRangeJoinRule.BinWidthKey, "0")
    try {
      val plan = points.join(intervals,
          col("p") >= col("lo") && col("p") <= col("hi"))
        .queryExecution.optimizedPlan.toString
      assert(!plan.contains("__graft_bin"))
    } finally spark.conf.set(BinRangeJoinRule.BinWidthKey, "10")
  }
}
