package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Equal-frequency binning: the banded two-phase rank must land on the
  * exact ⌊nBins·(rank−1)/n⌋ formula a naive single window states. */
class FeatureBinsSpec extends SparkSpec {

  test("bins match the naive rank formula across band widths") {
    import spark.implicits._
    val df = (1L to 97L).map(i => (i, s"g${i % 3}", (i * 37) % 61))
      .toDF("id", "g", "v")
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("v"), col("id"))
    val wN = org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
    val expected = df
      .withColumn("rk", row_number().over(wRank).cast("long"))
      .withColumn("n", count(lit(1)).over(wN))
      .withColumn("bin", expr("(4L * (rk - 1)) div n"))
      .select(col("id"), col("bin"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (bw <- Seq(1L, 4L, 100L)) {
      val got = Sampling.equalFreqBins(df, "g", "v", "id", nBins = 4,
        bandWidth = bw)
        .select(col("id"), col("bin"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"bandWidth=$bw")
    }
  }

  test("tiny groups: fewer rows than bins still covers 0-based bins") {
    import spark.implicits._
    val df = Seq((1L, "g", 5L), (2L, "g", 9L)).toDF("id", "g", "v")
    val got = Sampling.equalFreqBins(df, "g", "v", "id", nBins = 10,
      bandWidth = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    // rank 1 of 2 -> bin 0; rank 2 -> bin 5
    assert(got == Set((1L, 0L), (2L, 5L)))
  }
}
