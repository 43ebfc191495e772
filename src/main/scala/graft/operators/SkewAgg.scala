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
}
