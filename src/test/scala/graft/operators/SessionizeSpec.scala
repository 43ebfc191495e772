package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the gap-merge semantics of the native session_window shape:
  * INCLUSIVE boundary (a gap of exactly gapSec still merges — the fact
  * the DuckDB oracle's break predicate must mirror with `>`),
  * session_end = last_ts + gap, per-key isolation, and the funnel's
  * exact integer duration bucketing. */
class SessionizeSpec extends SparkSpec {

  private def t(sec: Long) = new Timestamp(sec * 1000L)

  private def events = {
    import spark.implicits._
    // u1: 0,50,99,199 ONE session (199 - 99 == gap: equality merges);
    // 400 opens a new one (gap 201 > 100); u2: single event
    Seq(("u1", 0L, "view"), ("u1", 50L, "click"), ("u1", 99L, "purchase"),
        ("u1", 199L, "view"), ("u1", 400L, "click"), ("u2", 40L, "view"))
      .map { case (u, s, e) => (u, t(s), e) }
      .toDF("user", "ts", "etype")
  }

  test("gap boundary is inclusive: gap == threshold merges, greater splits") {
    val got = Sessionize.sessions(events, Seq("user"), "ts", gapSec = 100)
      .select("user", "session_start", "session_end", "n_events")
      .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime / 1000,
        r.getTimestamp(2).getTime / 1000, r.getLong(3))).toSet
    assert(got == Set(
      ("u1", 0L, 299L, 4L),   // end = last(199) + 100; 199 merged (== gap)
      ("u1", 400L, 500L, 1L), // gap 201 > 100 opens a new session
      ("u2", 40L, 140L, 1L)))
  }

  test("extra aggregates ride the same session grouping") {
    val got = Sessionize.sessions(events, Seq("user"), "ts", gapSec = 100,
        extraAggs = Seq(
          sum(when(col("etype") === "purchase", 1L).otherwise(0L)).as("n_conv"),
          countDistinct(col("etype")).as("n_types")))
      .select("user", "n_events", "n_conv", "n_types")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == Set(("u1", 4L, 1L, 3L), ("u1", 1L, 0L, 1L),
      ("u2", 1L, 0L, 1L)))
  }

  test("duration funnel buckets by exact active minutes with conversion bp") {
    val sess = Sessionize.sessions(events, Seq("user"), "ts", gapSec = 100,
      extraAggs = Seq(
        sum(when(col("etype") === "purchase", 1L).otherwise(0L)).as("n_conv")))
    val got = Sessionize.durationFunnel(sess, gapSec = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    // u1 session A: active 199 s -> minute 3, 4 events, converted;
    // u1 session B + u2: active 0 s -> minute 0, 1 event each, none
    assert(got == Set((3L, 1L, 4L, 10000L), (0L, 2L, 2L, 0L)))
  }
}
