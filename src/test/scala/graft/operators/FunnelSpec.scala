package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hand-built funnel/retention cases pinning the ordered semantics:
  * strictly-after (same-timestamp does not advance), earliest-valid
  * step times, and pre-anchor activity excluded from retention. */
class FunnelSpec extends SparkSpec {

  private def t(sec: Long) = new Timestamp(sec * 1000L)

  private def events = {
    import spark.implicits._
    Seq(
      // u1 completes in order
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      // u2: click BEFORE view -> funnel stops at view
      (2L, 50L, "click"), (2L, 60L, "view"),
      // u3: click at the SAME ts as view -> strictly-after rejects it
      (3L, 100L, "view"), (3L, 100L, "click"),
      // u4: two full passes; earliest valid chain wins
      (4L, 10L, "view"), (4L, 12L, "click"), (4L, 11L, "view"),
      (4L, 14L, "purchase"),
      // u5 never views
      (5L, 10L, "purchase"))
      .map { case (u, s, e) => (u, t(s), e) }.toDF("user_id", "ts", "event_type")
  }

  test("userSteps: strictly-after chaining with earliest valid times") {
    val got = Funnel.userSteps(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .collect().map(r => (r.getLong(0),
        Option(r.getTimestamp(1)).map(_.getTime / 1000),
        Option(r.getTimestamp(2)).map(_.getTime / 1000),
        Option(r.getTimestamp(3)).map(_.getTime / 1000))).toSet
    assert(got == Set(
      (1L, Some(10L), Some(20L), Some(30L)),
      (2L, Some(60L), None, None),
      (3L, Some(100L), None, None),
      (4L, Some(10L), Some(12L), Some(14L))))
  }

  test("card aggregates step counts and basis-point conversion") {
    val got = Funnel.card(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == Set(
      (0, "view", 4L, 10000L),
      (1, "click", 2L, 5000L),
      (2, "purchase", 2L, 5000L)))
  }

  test("retention: pre-anchor activity excluded, buckets by floor weeks") {
    import spark.implicits._
    val wk = 7L * 86400L
    val ev = Seq(
      (1L, wk * 10, "signup"), (1L, wk * 10 + 5, "view"),     // offset 0
      (1L, wk * 11 + 1, "view"),                              // offset 1
      (1L, wk * 10 - 5, "view"),                              // PRE-anchor: out
      (2L, wk * 11, "signup"), (2L, wk * 13, "click"),        // offset 2
      (3L, wk * 10, "view"))                                  // no anchor: out
      .map { case (u, s, e) => (u, t(s), e) }.toDF("user_id", "ts", "event_type")
    val got = Funnel.retention(ev, "user_id", "ts", "event_type", "signup")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      (10L, 0L, 1L), (10L, 1L, 1L), // u1's signup + same-week view; next week
      (11L, 0L, 1L), (11L, 2L, 1L))) // u2's signup week; activity 2 weeks on
  }

  test("frequentPaths == brute sliding-window reference; support prunes") {
    import spark.implicits._
    val raw = Seq( // (user, sec, id, type)
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"), (1L, 30L, 3L, "c"),
      (1L, 40L, 4L, "a"), (1L, 50L, 5L, "b"), (1L, 60L, 6L, "c"),
      (2L, 10L, 7L, "a"), (2L, 20L, 8L, "b"), (2L, 30L, 9L, "c"),
      (2L, 30L, 10L, "d"), // tie on ts: id breaks it deterministically
      (3L, 10L, 11L, "x"), (3L, 20L, 12L, "y")) // too short for k=3
    val ev = raw.map { case (u, s, i, e) => (u, t(s), i, e) }
      .toDF("user_id", "ts", "event_id", "event_type")
    def brute(minSupport: Long): Map[String, (Long, Long)] = raw
      .groupBy(_._1).toSeq
      .flatMap { case (u, es) =>
        es.sortBy(e => (e._2, e._3)).map(_._4).sliding(3)
          .filter(_.size == 3).map(w => u -> w.mkString(">")).toSeq
      }
      .groupBy(_._2).view
      .mapValues(v => (v.size.toLong, v.map(_._1).distinct.size.toLong))
      .filter(_._2._1 >= minSupport).toMap
    Seq(1L, 2L, 3L).foreach { s =>
      val got = Funnel.frequentPaths(ev, "user_id", "ts", "event_id",
          "event_type", k = 3, minSupport = s)
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      assert(got == brute(s), s"minSupport $s")
    }
    // the guard: a type containing the separator must fail loudly
    val bad = Seq((1L, t(10), 1L, "a>b"), (1L, t(20), 2L, "c"),
      (1L, t(30), 3L, "d")).toDF("user_id", "ts", "event_id", "event_type")
    intercept[Exception] {
      Funnel.frequentPaths(bad, "user_id", "ts", "event_id", "event_type",
        k = 3, minSupport = 1L).collect()
    }
    // a NULL event type mid-window: concat_ws would silently emit the
    // (k-1)-gram 'a>b' and alias a real shorter path — every window
    // crossing the NULL must drop instead (the oracle's || concatenation
    // null-propagates)
    val withNull = Seq(
      (1L, t(10), 1L, Some("a")), (1L, t(20), 2L, None),
      (1L, t(30), 3L, Some("b")), (1L, t(40), 4L, Some("c")),
      (1L, t(50), 5L, Some("d")))
      .toDF("user_id", "ts", "event_id", "event_type")
    val gotNull = Funnel.frequentPaths(withNull, "user_id", "ts",
        "event_id", "event_type", k = 3, minSupport = 1L)
      .collect().map(_.getString(0)).toSet
    assert(gotNull === Set("b>c>d"))
  }
}
