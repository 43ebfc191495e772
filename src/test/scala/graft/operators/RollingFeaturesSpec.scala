package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Trailing RANGE-frame semantics: inclusive boundaries, tie-order
  * independence (peers share one frame), exact cent flooring, and the
  * total-order gap feature. */
class RollingFeaturesSpec extends SparkSpec {

  private def t(s: Long) = new Timestamp(s * 1000L)

  private def run(rows: Seq[(Long, Long, Timestamp, Double)]) = {
    import spark.implicits._
    TimeSeries.rollingFeatures(
      rows.toDF("event_id", "user_id", "ts", "value"),
      "user_id", "ts", "event_id", "value", windowSec = 3600L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
  }

  test("boundary at exactly windowSec is inclusive; one past is not") {
    val m = run(Seq(
      (1L, 7L, t(0), 1.0),
      (2L, 7L, t(3600), 2.0), // 0 is EXACTLY 3600 s back -> included
      (3L, 7L, t(7201), 4.0))) // 3600 is 3601 s back -> excluded
    assert(m(1L) == ((1L, 100L, 100L, -1L)))
    assert(m(2L) == ((2L, 300L, 200L, 3600000000L)))
    assert(m(3L) == ((1L, 400L, 400L, 3601000000L)))
  }

  test("timestamp ties are peers: both rows see the full tied frame") {
    val m = run(Seq(
      (1L, 7L, t(10), 1.0),
      (2L, 7L, t(10), 2.0))) // same ts — RANGE frame holds both for both
    assert(m(1L)._1 == 2L && m(2L)._1 == 2L)
    assert(m(1L)._2 == 300L && m(2L)._2 == 300L)
    // gap orders by (ts, event_id): 1 first (-1), 2 sees gap 0
    assert(m(1L)._4 == -1L && m(2L)._4 == 0L)
  }

  test("cents floor matches negative and fractional values exactly") {
    val m = run(Seq(
      (1L, 1L, t(0), -0.015), // floor(-1.5) = -2
      (2L, 2L, t(0), 0.019), // floor(1.9) = 1
      (3L, 3L, t(0), 9.999))) // floor(999.9...) = 999
    assert(m(1L)._2 == -2L)
    assert(m(2L)._2 == 1L)
    assert(m(3L)._2 == 999L)
  }

  test("keys never see each other") {
    val m = run(Seq(
      (1L, 1L, t(0), 1.0),
      (2L, 2L, t(1), 1.0)))
    assert(m(1L)._1 == 1L && m(2L)._1 == 1L)
    assert(m(2L)._4 == -1L)
  }
}
