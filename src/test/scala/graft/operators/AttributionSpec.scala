package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Last-touch attribution: latest touch wins, exact-timestamp touches
  * count, lookback expiry and no-touch conversions fall to 'direct',
  * ties resolve to the highest event id. */
class AttributionSpec extends SparkSpec {

  private def t(s: Long) = new Timestamp(s * 1000L)

  private def run(rows: Seq[(Long, Long, Timestamp, String, Double)]): Map[String, (Long, Long)] = {
    import spark.implicits._
    AsOfMatch.lastTouchAttribution(
      rows.toDF("event_id", "user_id", "ts", "event_type", "value"),
      "user_id", "ts", "event_id", "value", "event_type",
      convType = "purchase", touchTypes = Seq("view", "click"),
      lookbackUs = 100L * 1000000L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
  }

  test("latest touch wins; direct when expired or absent; same-ts touch counts") {
    val m = run(Seq(
      // user 1: view@10, click@20, purchase@25 -> click credited
      (1L, 1L, t(10), "view", 0.0), (2L, 1L, t(20), "click", 0.0),
      (3L, 1L, t(25), "purchase", 2.0),
      // user 2: view@10, purchase@111 -> 101 s > 100 s lookback: direct
      (4L, 2L, t(10), "view", 0.0), (5L, 2L, t(111), "purchase", 3.0),
      // user 3: no touches at all -> direct
      (6L, 3L, t(50), "purchase", 5.0),
      // user 4: view at EXACTLY the purchase ts -> credited (inclusive)
      (7L, 4L, t(40), "view", 0.0), (8L, 4L, t(40), "purchase", 7.0)))
    assert(m == Map(
      "click" -> ((1L, 200L)),
      "direct" -> ((2L, 800L)),
      "view" -> ((1L, 700L))))
  }

  test("tie at one timestamp resolves to the highest touch event id") {
    val m = run(Seq(
      (1L, 1L, t(10), "view", 0.0),
      (2L, 1L, t(10), "click", 0.0), // same ts, higher id -> wins
      (3L, 1L, t(15), "purchase", 1.0)))
    assert(m == Map("click" -> ((1L, 100L))))
    val m2 = run(Seq(
      (2L, 1L, t(10), "view", 0.0), // higher id this time
      (1L, 1L, t(10), "click", 0.0),
      (3L, 1L, t(15), "purchase", 1.0)))
    assert(m2 == Map("view" -> ((1L, 100L))))
  }

  test("a later touch AFTER the purchase is never credited") {
    val m = run(Seq(
      (1L, 1L, t(30), "purchase", 1.0),
      (2L, 1L, t(31), "click", 0.0)))
    assert(m == Map("direct" -> ((1L, 100L))))
  }
}
