package graft.operators

import graft.SparkSpec

/** The skew card must rank the hot key first and size its salt factor
  * to level it against the mean key. */
class SkewDiagSpec extends SparkSpec {
  import spark.implicits._

  test("hot key ranks first with a mean-leveling salt suggestion") {
    // 1 key with 80 rows, 20 keys with 1 row: total 100, distinct 21
    val rows = Seq.fill(80)(999L) ++ (1L to 20L)
    val card = SkewAgg.keySkewCard(rows.toDF("k"), "k", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(card.head._1 == 999L)
    assert(card.head._2 == 80L)
    assert(card.head._3 == 8000L) // 80% in basis points
    assert(card.head._4 == 1680L) // 80·21/100 = 16.8× the mean key
    assert(card.head._5 == 17L) // ceil(16.8): salts to level to the mean
    // cold keys: share 1%, ~0.2× mean, salt 1 — and deterministic ties
    assert(card(1) == ((1L, 1L, 100L, 21L, 1L)))
    assert(card(2) == ((2L, 1L, 100L, 21L, 1L)))
  }

  test("uniform keys need no salting") {
    val rows = (1L to 10L) ++ (1L to 10L)
    val card = SkewAgg.keySkewCard(rows.toDF("k"), "k", k = 10).collect()
    card.foreach { r =>
      assert(r.getLong(3) == 100L, "every key is exactly the mean")
      assert(r.getLong(4) == 1L, "no salt needed")
    }
  }
}
