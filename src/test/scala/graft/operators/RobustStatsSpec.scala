package graft.operators

import graft.SparkSpec

/** Winsorized card: bounds from the exact nearest-rank fold, clipping
  * immunizes the mean against a single outlier, clip counts are
  * exact. */
class RobustStatsSpec extends SparkSpec {

  test("an outlier moves the raw mean but not the winsorized one") {
    import spark.implicits._
    // 9 values of 10 and one 10000: p10 bound=10 (rank floor(9*.1)+1=1),
    // p90 bound=10 (rank floor(9*.9)+1=9) -> everything clips to 10
    val df = ((1L to 9L).map(i => (i, "g", 10L)) :+ ((10L, "g", 10000L)))
      .toDF("id", "g", "v")
    val r = Percentiles.winsorizedCard(df, "g", "v", 0.1, 0.9).head()
    assert(r.getLong(1) == 10L) // n_rows
    assert((r.getLong(2), r.getLong(3)) == ((10L, 10L))) // lo, hi
    assert(r.getLong(4) == (9L * 10 + 10000) / 10) // raw mean floor: 1009
    assert(r.getLong(5) == 10L) // winsorized mean
    assert(r.getLong(6) == 1L) // exactly the outlier clipped
  }

  test("no clipping when bounds straddle all values") {
    import spark.implicits._
    val df = Seq((1L, "g", 5L), (2L, "g", 6L), (3L, "g", 7L))
      .toDF("id", "g", "v")
    val r = Percentiles.winsorizedCard(df, "g", "v", 0.0, 0.9).head()
    // lo = rank 1 = 5, hi = rank floor(2*0.9)+1 = 2 -> 6: value 7 clips
    assert((r.getLong(2), r.getLong(3), r.getLong(6)) == ((5L, 6L, 1L)))
    assert(r.getLong(5) == (5L + 6 + 6) / 3)
  }

  test("robustScale == brute reference; IQR-0 key yields NULL scaled") {
    import spark.implicits._
    // g1: 1..8 -> p25 = rank floor(7*.25)+1 = 2 -> 2, median rank 4 -> 4,
    // p75 rank floor(7*.75)+1 = 6 -> 6; IQR 4. Negative numerators
    // exercise the truncation rule. g2: constant -> IQR 0 -> NULL
    val df = ((1L to 8L).map(i => (i, "g1", i)) ++
      Seq((20L, "g2", 7L), (21L, "g2", 7L), (22L, "g2", 7L)))
      .toDF("id", "g", "v")
    val got = Percentiles.robustScale(df, "g", "v")
      .collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("p25"), r.getAs[Long]("median"), r.getAs[Long]("p75"),
          Option(r.getAs[java.lang.Long]("scaled_micro")).map(_.toLong))))
      .toMap
    (1L to 8L).foreach { i =>
      val want = 1000000L * (i - 4L) / 4L // Long division truncates like DIV
      assert(got(i) == ((2L, 4L, 6L, Some(want))), s"id $i: ${got(i)}")
    }
    Seq(20L, 21L, 22L).foreach { i =>
      assert(got(i) == ((7L, 7L, 7L, None)), s"id $i: ${got(i)}")
    }
    // the card side is a broadcast join: no shuffle of the row stream
    // beyond the histogram aggregation
    val plan = Percentiles.robustScale(df, "g", "v")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"robustScale card should broadcast:\n$plan")
  }

  test("robustScale: a key with only NULL values passes through with " +
    "NULL scaled, not silent row deletion") {
    import spark.implicits._
    val df = Seq((1L, "g1", Some(4L)), (2L, "g1", Some(8L)),
      (3L, "gnull", None), (4L, "gnull", None))
      .toDF("id", "g", "v")
    val got = Percentiles.robustScale(df, "g", "v").collect()
      .map(r => r.getAs[Long]("id") ->
        Option(r.getAs[java.lang.Long]("scaled_micro"))).toMap
    // every input row survives; the card-less key scores NULL
    assert(got.keySet === Set(1L, 2L, 3L, 4L))
    assert(got(3L).isEmpty && got(4L).isEmpty)
  }
}
