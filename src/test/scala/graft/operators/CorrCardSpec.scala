package graft.operators

import graft.SparkSpec

/** Integer-exact correlation card: perfect/anti/partial correlation
  * land on exact rationals, constants degrade to (0, 0), and groups
  * are independent. */
class CorrCardSpec extends SparkSpec {

  private def run(rows: Seq[(String, Long, Long)]): Map[String, (Long, Long, Long)] = {
    import spark.implicits._
    Profile.corrCard(rows.toDF("g", "x", "y"), "g", "x", "y")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
  }

  test("perfect, anti, partial and constant correlation in one frame") {
    val rows =
      (1L to 10L).map(i => ("lin", i, 2 * i + 5)) ++
        (1L to 10L).map(i => ("anti", i, 100 - 3 * i)) ++
        Seq(("part", 0L, 0L), ("part", 1L, 1L), ("part", 2L, 1L)) ++
        (1L to 5L).map(i => ("const", i, 42L))
    val m = run(rows.map { case (g, x, y) => (g, x, y) })
    assert(m("lin") == ((10L, 1000000L, 1L)))
    assert(m("anti") == ((10L, 1000000L, -1L)))
    // n=3 sx=3 sy=2 sxy=3 sxx=5 syy=2: num=3, dx=6, dy=2
    // corr2 = 1e6·9/12 = 750000
    assert(m("part") == ((3L, 750000L, 1L)))
    assert(m("const") == ((5L, 0L, 0L)))
  }

  test("zero covariance with nonconstant margins is (0, 0)") {
    // symmetric cross: corr exactly 0 though both vary
    val m = run(Seq(("g", 0L, 0L), ("g", 0L, 2L), ("g", 2L, 0L), ("g", 2L, 2L)))
    assert(m("g") == ((4L, 0L, 0L)))
  }

  test("large values stay exact through the decimal lane") {
    // x ~ 1e6 scale: Σx² ~ 1.4e14 and num² ~ 4.8e28 — far beyond what
    // a float corr could represent exactly, comfortably inside the
    // DECIMAL(38,0) lane; the perfect linear fit must land on exactly
    // 1e6 with no off-by-one from rounding
    val m = run((1L to 7L).map(i => ("big", i * 1000000L, i * 999937L)))
    assert(m("big") == ((7L, 1000000L, 1L)))
  }
}
