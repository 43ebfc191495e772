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
}
