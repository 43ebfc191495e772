package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group 2-D Pareto frontier (skyline) — the multi-objective
  * shortlist every catalog/selection pipeline asks for ("the parts no
  * other part beats on BOTH price and size", "the checkpoints no other
  * checkpoint beats on both loss and cost"): a point survives iff no
  * other point in its group is ≤ on the cost axis AND ≥ on the gain
  * axis with at least one strict inequality.
  *
  * Algorithm: the sort-scan skyline. Collapse to DISTINCT (group,
  * cost, gain) points first (duplicates of one point never dominate
  * each other — they survive or fall together, carrying their
  * multiplicity), then order each group by (cost asc, gain desc): any
  * dominator of a point sorts STRICTLY before it (cheaper, or
  * equal-cost with more gain), so the frontier is exactly the points
  * whose gain exceeds the running max gain of all predecessors — one
  * window pass, no pairwise comparison. The naive NOT EXISTS
  * enumeration the oracle runs is quadratic; the two derivations
  * selecting the IDENTICAL point set is the correctness certificate
  * (the triangle-counting convention).
  *
  * Scale: one map-side-combined distinct-point count (the only
  * data-sized work — raw rows never reach the window), then one
  * exchange on the group key and one sort over DISTINCT points — the
  * window partition is value-domain-sized (|distinct (cost, gain)
  * pairs in the group|), not row-count-sized, the same boundedness
  * argument as the ≤64-row band histograms. Integer axes only (exact
  * comparisons; floats would make "dominates" engine-dependent at
  * boundary equality).
  *
  * @return one row per frontier point: (groupCol, costCol, gainCol,
  *         n_points) with n_points the point's duplicate multiplicity. */
object Skyline {

  def paretoFront(df: DataFrame, groupCol: String, costCol: String,
                  gainCol: String): DataFrame = {
    val pts = df.groupBy(col(groupCol), col(costCol), col(gainCol))
      .agg(count(lit(1)).as("n_points"))
    val wPrev = Window.partitionBy(col(groupCol))
      .orderBy(col(costCol).asc, col(gainCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    pts
      .withColumn("__pmax", max(col(gainCol)).over(wPrev))
      .filter(col("__pmax").isNull || col(gainCol) > col("__pmax"))
      .select(col(groupCol), col(costCol), col(gainCol), col("n_points"))
  }
}
