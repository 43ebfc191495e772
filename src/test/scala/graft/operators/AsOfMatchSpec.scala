package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

case class MatchEv(key: Long, ts: Timestamp, eid: Long, kind: String)

class AsOfMatchSpec extends SparkSpec {
  private def t(s: Long) = new Timestamp(s * 1000)

  private def run(evs: Seq[MatchEv]) = {
    import spark.implicits._
    AsOfMatch.deltas(evs.toDF(), keyCols = Seq("key"), tsCol = "ts",
        tieBreak = "eid",
        isQuery = col("kind") === "q", isResponse = col("kind") === "r")
      .select(col("key"), col("eid"), col("delta_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("response matches the most recent preceding query on its key") {
    val out = run(Seq(
      MatchEv(1, t(100), 1, "q"), MatchEv(1, t(105), 2, "r"),   // 5 s
      MatchEv(2, t(100), 3, "q"), MatchEv(1, t(200), 4, "q"),
      MatchEv(1, t(201), 5, "r")))                              // 1 s, newest q
    assert(out == Set((1L, 2L, 5000000L), (1L, 5L, 1000000L)))
  }

  test("newer query overwrites older (collision rule); unmatched responses drop") {
    val out = run(Seq(
      MatchEv(1, t(10), 1, "q"), MatchEv(1, t(20), 2, "q"),
      MatchEv(1, t(25), 3, "r"),            // matches t(20), not t(10)
      MatchEv(2, t(5), 4, "r")))            // no preceding query: dropped
    assert(out == Set((1L, 3L, 5000000L)))
  }

  test("ties on ts resolve by the unique tie-break column") {
    val out = run(Seq(
      MatchEv(1, t(50), 1, "q"), MatchEv(1, t(50), 2, "r")))
    assert(out == Set((1L, 2L, 0L)))
  }

  // ----- general payload-carrying asOfJoin -----

  private def asof(left: Seq[(Long, Long, Long)], right: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    AsOfMatch.asOfJoin(
      left.map { case (k, s, e) => (k, t(s), e) }.toDF("key", "ts", "eid"),
      right.map { case (k, s, e) => (k, t(s), e, e * 10) }
        .toDF("key", "ts", "eid", "payload"),
      keys = Seq("key"), tsCol = "ts", tieBreak = "eid",
      rightPayload = Seq("payload"))
      .select(col("eid"), col("asof_ts"), col("payload"))
      .collect().map(r => (r.getLong(0),
        Option(r.getTimestamp(1)).map(_.getTime / 1000),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
  }

  test("asOfJoin picks the latest right at-or-before, left-outer on misses") {
    val out = asof(
      left = Seq((1L, 100L, 1L), (1L, 200L, 2L), (2L, 50L, 3L)),
      right = Seq((1L, 90L, 10L), (1L, 150L, 11L), (2L, 60L, 12L)))
    assert(out == Set(
      (1L, Some(90L), Some(100L)),   // latest right <= 100
      (2L, Some(150L), Some(110L)),  // 150 beats 90
      (3L, None, None)))             // right at 60 is AFTER left 50
  }

  test("asOfJoin equal-ts right rows match (<=), max tie-break wins") {
    val out = asof(
      left = Seq((1L, 100L, 1L)),
      right = Seq((1L, 100L, 10L), (1L, 100L, 11L), (1L, 40L, 12L)))
    assert(out == Set((1L, Some(100L), Some(110L))))
  }

  test("asOfJoin rejects payload names colliding with left columns") {
    import spark.implicits._
    val l = Seq((1L, t(1), 1L)).toDF("key", "ts", "eid")
    val r = Seq((1L, t(1), 9L)).toDF("key", "ts", "eid")
    val err = intercept[IllegalArgumentException] {
      AsOfMatch.asOfJoin(l, r, Seq("key"), "ts", "eid", Seq("eid"))
    }
    assert(err.getMessage.contains("collides"))
  }
}
