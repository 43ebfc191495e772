package graft.functions

import graft.SparkSpec

/** floordiv must match DuckDB's `//` (floor toward -inf) for ALL longs,
  * including the two places the old double path broke: negative
  * operands (truncation vs floor) and |v| > 2^53 (double rounding). */
class IntMathSpec extends SparkSpec {

  test("floordiv floors toward negative infinity and stays exact past 2^53") {
    import spark.implicits._
    val vs = Seq(-5L, 5L, -10L, 10L, -11L, 0L, -1L,
      (1L << 53) + 1L, -(1L << 53) - 1L, Long.MaxValue, Long.MinValue + 10L,
      9007199254740993L, -9007199254740993L)
    val got = vs.toDF("v")
      .select(IntMath.floordiv(org.apache.spark.sql.functions.col("v"), 10L))
      .as[Long].collect().toSeq
    val want = vs.map(v => Math.floorDiv(v, 10L))
    assert(got == want, s"got=$got want=$want")
    // a divisor that exposes representability boundaries
    val got7 = vs.toDF("v")
      .select(IntMath.floordiv(org.apache.spark.sql.functions.col("v"), 7L))
      .as[Long].collect().toSeq
    assert(got7 == vs.map(v => Math.floorDiv(v, 7L)))
  }

  test("floordiv rejects non-positive divisors") {
    intercept[IllegalArgumentException] {
      IntMath.floordiv(org.apache.spark.sql.functions.lit(1L), 0L)
    }
  }
}
