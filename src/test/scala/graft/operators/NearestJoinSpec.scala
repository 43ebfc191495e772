package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

/** Nearest-in-time join: closest match on either side, backward
  * preference on equal distance, exact-timestamp matches, per-side tie
  * orders, and null when no right row exists. */
class NearestJoinSpec extends SparkSpec {

  private def t(s: Long) = new Timestamp(s * 1000L)

  private def run(left: Seq[(Long, Long, Timestamp)],
                  right: Seq[(Long, Long, Timestamp)]): Map[Long, (Option[Long], Option[Long])] = {
    import spark.implicits._
    val l = left.toDF("event_id", "user_id", "ts")
    val r = right.toDF("event_id", "user_id", "ts")
      .withColumn("err_id", org.apache.spark.sql.functions.col("event_id"))
    AsOfMatch.nearestJoin(l, r, Seq("user_id"), "ts", "event_id",
      Seq("err_id"))
      .collect().map { row =>
        // columns: event_id, user_id, ts, nearest_ts, dt_us, err_id
        row.getLong(0) -> ((
          if (row.isNullAt(5)) None else Some(row.getLong(5)),
          if (row.isNullAt(4)) None else Some(row.getLong(4))))
      }.toMap
  }

  test("closest side wins; equal distance prefers backward; missing is null") {
    val m = run(
      left = Seq((1L, 7L, t(100)), (2L, 7L, t(200)), (3L, 9L, t(50))),
      right = Seq((10L, 7L, t(90)), (11L, 7L, t(104)), (12L, 7L, t(260))))
    // purchase@100: errors at 90 (d=10) and 104 (d=4 after) -> 104
    assert(m(1L) == ((Some(11L), Some(-4000000L))))
    // purchase@200: 104 (d=96 back) vs 260 (d=60 fwd) -> 260
    assert(m(2L) == ((Some(12L), Some(-60000000L))))
    // user 9 has no errors
    assert(m(3L) == ((None, None)))
  }

  test("equal distance both sides prefers the backward candidate") {
    val m = run(
      left = Seq((1L, 7L, t(100))),
      right = Seq((10L, 7L, t(95)), (11L, 7L, t(105))))
    assert(m(1L) == ((Some(10L), Some(5000000L))))
  }

  test("exact-timestamp right row matches at distance zero") {
    val m = run(
      left = Seq((1L, 7L, t(100))),
      right = Seq((10L, 7L, t(100)), (11L, 7L, t(99))))
    assert(m(1L) == ((Some(10L), Some(0L))))
  }

  test("per-side tie orders: backward takes highest id, forward lowest") {
    // two rights at t=90 (backward of left@100): highest id credited
    val mb = run(
      left = Seq((1L, 7L, t(100))),
      right = Seq((10L, 7L, t(90)), (11L, 7L, t(90))))
    assert(mb(1L)._1 == Some(11L))
    // two rights at t=110 (forward): lowest id credited
    val mf = run(
      left = Seq((1L, 7L, t(100))),
      right = Seq((20L, 7L, t(110)), (21L, 7L, t(110))))
    assert(mf(1L)._1 == Some(20L))
  }
}
