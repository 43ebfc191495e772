package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch analog of the reference's stateful query↔response latency matcher
  * (`AggregateResponseTimeSample`,
  * /root/reference/src/aggregator/aggregator.go:352-409): match each
  * response row to the most recent query row with the same key at or before
  * it, and emit the time delta in microseconds.
  *
  * Spark-first shape: an **as-of join expressed as one window pass** — the
  * two sides are already one DataFrame (discriminated by predicate), so
  * `last(queryTs, ignoreNulls) OVER (PARTITION BY key ORDER BY ts ROWS
  * UNBOUNDED PRECEDING TO 1 PRECEDING)` finds the partner with a single
  * shuffle on the match key and zero joins. At 100 TB this beats a
  * range/inequality self-join (which Spark would plan as BNL or a skewed
  * sort-merge): one exchange + one sort, fully pipelined, and the key
  * partitioning can be reused by the downstream per-identity aggregation.
  *
  * Collision semantics (aggregator.go:383-388): a newer query overwrites an
  * older unmatched one — `last(...)` gives exactly that. Single-partner
  * consumption and the size-8 state cap are streaming-only concerns handled
  * by the streaming matcher (graft.streaming.LatencyMatcher).
  */
object AsOfMatch {

  /** @param tieBreak  unique column making (ts, tieBreak) a total order
    * @return input response rows + `matched_query_ts`, `delta_us` */
  def deltas(df: DataFrame, keyCols: Seq[String], tsCol: String,
             tieBreak: String, isQuery: Column, isResponse: Column): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col(tieBreak))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("matched_query_ts",
        last(when(isQuery, col(tsCol)), ignoreNulls = true).over(w))
      .filter(isResponse && col("matched_query_ts").isNotNull)
      .withColumn("delta_us",
        unix_micros(col(tsCol)) - unix_micros(col("matched_query_ts")))
  }

  /** Per-identity average latency (A4, aggregator.go:485-528): integer
    * division — floor() in both Spark and the DuckDB oracle (CAST semantics
    * differ: DuckDB rounds, Spark truncates; floor is unambiguous). */
  def avgByIdentity(deltas: DataFrame, identityCol: String): DataFrame =
    deltas.groupBy(col(identityCol))
      .agg(floor(sum(col("delta_us")) / count(lit(1))).as("avg_delta_us"),
           count(lit(1)).as("n_samples"))
}
