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
}
