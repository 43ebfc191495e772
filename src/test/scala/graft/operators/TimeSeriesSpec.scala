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
}
