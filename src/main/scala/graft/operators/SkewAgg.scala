package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted two-phase aggregation — the skew-control primitive for hot
  * grouping keys (one client address producing a large share of all
  * traffic is the common DNS-telemetry pathology).
  *
  * Phase 1 aggregates on (key, salt), spreading a hot key over `salts`
  * reducers; phase 2 merges the partials on the key alone. The result is
  * identical to a direct groupBy — the only difference is that no single
  * reducer ever owns a whole hot key. The salt derives from the physical
  * partition id: free to compute, and rows of one input partition agree on
  * it, so phase 1 stays a near-map-side combine.
  *
  * Use when AQE's runtime skew handling isn't available (streaming
  * foreachBatch on older clusters) or the skew is known up front;
  * otherwise prefer plain groupBy + AQE.
  */
object SkewAgg {

  /** count + per-column sums by `keys`, salted over `salts` buckets. */
  def countSumBy(df: DataFrame, keys: Seq[String], sumCols: Seq[String],
                 salts: Int = 16): DataFrame = {
    val phase1 = df
      .withColumn("__salt", pmod(spark_partition_id(), lit(salts)))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(count(lit(1)).as("__n"),
        sumCols.map(c => sum(col(c)).as(s"__sum_$c")): _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__n")).as("n"),
        sumCols.map(c => sum(col(s"__sum_$c")).as(s"sum_$c")): _*)
  }

  /** Join-key SKEW DIAGNOSTIC — the "why is this shuffle stuck at
    * 199/200 tasks" report, run BEFORE committing a join/groupBy key at
    * scale. One map-side-combined aggregation over the key (the
    * key-count table is vocabulary-bounded, never the stream), a 1-row
    * global-stats aggregate broadcast back into the plan, and a
    * TakeOrdered for the top offenders — no window, no full sort.
    *
    * Output, one row per top-`k` hottest key: the key's row count, its
    * share of all rows in basis points, its ratio vs the MEAN key in
    * percent (both integer-exact: floor of cross-multiplied counts),
    * and the salt factor that would level it to the mean
    * (ceil(n_key·distinct/total) — what [[countSumBy]]'s `salts` or an
    * AQE skew threshold should at least be). */
  def keySkewCard(df: DataFrame, keyCol: String, k: Int = 10): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n_rows"))
    val stats = counts.agg(sum(col("n_rows")).as("__total"),
      count(lit(1)).as("__distinct"))
    counts.crossJoin(broadcast(stats))
      .select(col(keyCol), col("n_rows"),
        floor(col("n_rows") * 10000 / col("__total")).as("share_bp"),
        floor(col("n_rows") * 100 * col("__distinct") / col("__total"))
          .as("vs_mean_pct"),
        ceil(col("n_rows") * col("__distinct") / col("__total"))
          .cast("long").as("suggested_salts"))
      .orderBy(col("n_rows").desc, col(keyCol))
      .limit(k)
  }
}
