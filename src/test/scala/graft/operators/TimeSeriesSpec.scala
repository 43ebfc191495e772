package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Gap-fill semantics: every bucket in the observed range appears for
  * every key, zeros where nothing happened, and the range is the
  * DATA's min..max (no phantom buckets outside it). */
class TimeSeriesSpec extends SparkSpec {

  private def t(h: Long, s: Long = 0) = new Timestamp((h * 3600 + s) * 1000L)

  test("missing buckets appear as zeros for every key; range is min..max") {
    import spark.implicits._
    // hours 10, 11, 13 observed (12 silent); key b only ever at hour 10
    val df = Seq(("a", t(10)), ("a", t(10, 30)), ("a", t(11)),
      ("a", t(13)), ("b", t(10))).toDF("k", "ts")
    val out = TimeSeries.gapFill(df, "k", "ts", 3600L)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out.size == 8) // 2 keys x hours 10..13
    assert(out(("a", 10L)) == 2L && out(("a", 11L)) == 1L)
    assert(out(("a", 12L)) == 0L && out(("a", 13L)) == 1L)
    assert(out(("b", 10L)) == 1L && out(("b", 12L)) == 0L)
    assert(!out.contains(("a", 9L)) && !out.contains(("a", 14L)))
  }

  test("bucket width honored; degenerate single-bucket input") {
    import spark.implicits._
    val df = Seq(("x", t(5, 10)), ("x", t(5, 20))).toDF("k", "ts")
    val out = TimeSeries.gapFill(df, "k", "ts", 60L)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // 60s buckets: both events land in minute bucket (5*3600+10)/60 =
    // 300, so the dense range is that single bucket
    assert(out == Map(300L -> 2L))
  }

  test("decayed feature: halving weights, floor per term, frame cap") {
    import spark.implicits._
    val df = Seq(
      (1L, 7L, t(0, 1), 1.0), // cents 100
      (2L, 7L, t(0, 2), 0.5), // cents 50
      (3L, 7L, t(0, 3), 0.07), // cents 7
      (4L, 9L, t(0, 1), -0.03)) // cents -3, separate key
      .toDF("event_id", "user_id", "ts", "value")
    val out = TimeSeries.decayedFeatures(df, "user_id", "ts", "event_id",
      "value", depth = 16)
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4))))
      .toMap
    assert(out(1L) == ((1L, 100L)))
    assert(out(2L) == ((2L, 100L))) // 100 div 2 + 50
    assert(out(3L) == ((3L, 57L))) // 100 div 4 + 50 div 2 + 7
    assert(out(4L) == ((1L, -3L)))
  }

  test("decayed feature truncates negative cents toward zero like DuckDB's //") {
    import spark.implicits._
    val df = Seq(
      (1L, 7L, t(0, 1), -0.03), // cents -3
      (2L, 7L, t(0, 2), 0.08)) // cents 8
      .toDF("event_id", "user_id", "ts", "value")
    val out = TimeSeries.decayedFeatures(df, "user_id", "ts", "event_id",
      "value", depth = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    // -3 trunc-div 2 = -1 (DuckDB // semantics; floor would give -2), +8 = 7
    assert(out(2L) == 7L)
  }

  test("anomaly buckets: a spike past 3 sigma flags, quiet buckets do not") {
    import spark.implicits._
    // one event in hour 0, thirty in hour 11, hours 1-10 zero-filled:
    // m=12, s1=31, s2=901; spike dev=329, 329^2=108241 > 9*9851=88659
    val rows = Seq(("k", t(0, 1))) ++ (1 to 30).map(_ => ("k", t(11, 30)))
    val out = TimeSeries.anomalyBuckets(rows.toDF("k", "ts"), "k", "ts",
      bucketSec = 3600L, sigmas = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((11L, 30L, 1L)))
  }

  test("rolling distinct: trailing-hour category cardinality, inclusive boundary") {
    import spark.implicits._
    val df = Seq(
      (1L, 7L, t(0, 0), "a"),
      (2L, 7L, t(0, 1800), "b"),
      (3L, 7L, t(1, 0), "a"), // frame back to t=0: {a, b}
      (4L, 7L, t(2, 1), "c"), // 0 and 1800 fell out; t(1,0) is 3601 s back -> out
      (5L, 9L, t(0, 0), "z"))
      .toDF("event_id", "user_id", "ts", "cat")
    val out = TimeSeries.rollingDistinct(df, "user_id", "ts", "event_id",
      "cat", windowSec = 3600L)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L, 5L -> 1L))
  }

  test("covered time: overlaps merge, touching intervals merge, gaps split") {
    import spark.implicits._
    val df = Seq(
      ("u", 0L, 100L), ("u", 50L, 150L), // overlap -> one island [0,150]
      ("u", 150L, 200L), // touching -> same island [0,200]
      ("u", 300L, 400L), // gap -> second island
      ("v", 0L, 10L), ("v", 0L, 10L)) // duplicate interval: one island
      .toDF("k", "s", "e")
    val out = TimeSeries.coveredTime(df, "k", "s", "e")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("u") == ((4L, 2L, 300L))) // 200 + 100
    assert(out("v") == ((2L, 1L, 10L)))
  }

  test("covered time: a contained interval never extends its island") {
    import spark.implicits._
    // [0,1000] contains [10,20]; a later [500,600] is also contained —
    // the running-max formulation must not let the short intervals
    // close the island early
    val df = Seq(("k", 0L, 1000L), ("k", 10L, 20L), ("k", 500L, 600L),
      ("k", 2000L, 2100L)).toDF("k", "s", "e")
    val out = TimeSeries.coveredTime(df, "k", "s", "e").head()
    assert((out.getLong(1), out.getLong(2), out.getLong(3)) ==
      ((4L, 2L, 1100L)))
  }

  test("anomaly buckets: a flat series flags nothing") {
    import spark.implicits._
    val rows = (0 to 9).map(h => ("k", t(h.toLong, 1)))
    val out = TimeSeries.anomalyBuckets(rows.toDF("k", "ts"), "k", "ts",
      bucketSec = 3600L, sigmas = 3)
    assert(out.isEmpty)
  }
}
