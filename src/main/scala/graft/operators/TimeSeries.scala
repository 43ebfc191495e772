package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dense time-series gap-fill — the dashboard/monitoring primitive the
  * q9/q10 sparse series lack: a (key, bucket) count series where EVERY
  * bucket in the observed range appears, zero-filled, so downstream
  * movers (rate-of-change, anomaly windows, chart axes) never trip on
  * missing rows.
  *
  * Scale shape: the only data-sized work is one map-side-combined
  * (key, bucket) count. The dense axis is GENERATED, not scanned —
  * sequence() over a 1-row min/max aggregate, cross-joined with the
  * distinct key set — so its size is |keys| × |calendar buckets|,
  * bounded by wall-clock time and key cardinality, independent of row
  * count; at 100 TB the axis for a year of hours and a thousand keys
  * is ~9M rows, trivia next to the scan. After the count aggregation
  * every frame in the plan is axis-sized.
  */
object TimeSeries {

  /** Zero-filled per-`keyCol` counts in `bucketSec`-wide buckets over
    * the data's observed [min, max] bucket range. Output: (keyCol,
    * bucket_id, n_events) with bucket_id = ⌊epoch_seconds/bucketSec⌋ —
    * integer floor division on both engines. */
  def gapFill(df: DataFrame, keyCol: String, tsCol: String,
              bucketSec: Long): DataFrame = {
    require(bucketSec >= 1, s"bucketSec must be positive, got $bucketSec")
    val b = df.select(col(keyCol),
      expr(s"CAST(${tsCol} AS LONG) DIV ${bucketSec}L").as("bucket_id"))
    val counts = b.groupBy(col(keyCol), col("bucket_id"))
      .agg(count(lit(1)).as("__n"))
    val range = b.agg(min(col("bucket_id")).as("lo"),
      max(col("bucket_id")).as("hi"))
    val keys = df.select(col(keyCol)).distinct()
    val axis = keys.crossJoin(broadcast(range))
      .select(col(keyCol),
        explode(sequence(col("lo"), col("hi"))).as("bucket_id"))
    axis.join(counts, Seq(keyCol, "bucket_id"), "left")
      .select(col(keyCol), col("bucket_id"),
        coalesce(col("__n"), lit(0L)).as("n_events"))
  }
}
