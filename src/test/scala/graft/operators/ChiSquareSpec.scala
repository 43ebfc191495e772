package graft.operators

import graft.SparkSpec

/** χ² association card: perfectly independent tables score zero in
  * every cell, a deterministic association lands on the hand-computed
  * exact rationals, and marginals come from the observed cells. */
class ChiSquareSpec extends SparkSpec {

  private def run(rows: Seq[(String, String)]): Map[(String, String), (Long, Long)] = {
    import spark.implicits._
    Profile.chiSquareCard(rows.toDF("a", "b"), "a", "b")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3))))
      .toMap
  }

  test("independence scores exactly zero everywhere") {
    // counts O(a_i, b_j) = r_i * c_j / N exactly: 2x2 with O = 2,4,3,6
    val rows =
      Seq.fill(2)(("a1", "b1")) ++ Seq.fill(4)(("a1", "b2")) ++
        Seq.fill(3)(("a2", "b1")) ++ Seq.fill(6)(("a2", "b2"))
    val m = run(rows)
    assert(m.values.forall(_._2 == 0L), m.toString)
    assert(m(("a1", "b1"))._1 == 2L && m(("a2", "b2"))._1 == 6L)
  }

  test("a deterministic association lands on the exact floored rationals") {
    // 2x2 diagonal: O = 3,1,1,3; N=8, R=C=4 everywhere
    // num = O*8 - 16 -> diag 8, off-diag -8; num^2 = 64
    // chi_micro = floor(1e6 * 64 / (8*4*4)) = 500000 per cell
    val rows =
      Seq.fill(3)(("x", "p")) ++ Seq.fill(1)(("x", "q")) ++
        Seq.fill(1)(("y", "p")) ++ Seq.fill(3)(("y", "q"))
    val m = run(rows)
    assert(m.values.forall(_._2 == 500000L), m.toString)
  }
}
