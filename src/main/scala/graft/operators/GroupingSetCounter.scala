package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-grouping-set deduplicating counter — the reference's core
  * aggregation (`AggregateQuery`/`AggregateResponse`,
  * /root/reference/src/aggregator/aggregator.go:240-330): each input row is
  * counted under up to three groupings simultaneously, with collapsed
  * columns replaced by the sentinel `__ANY__` (aggregator.go:32).
  *
  * Spark-first shape: a single native GROUPING SETS aggregation — Catalyst
  * plans one `Expand` (×|sets| rows) feeding a partial `HashAggregate`
  * before the shuffle, so the map-side combine collapses duplicates before
  * any network movement; far cheaper at scale than a union of three
  * groupBys (3 scans / 3 shuffles).
  *
  * Semantics notes (SURVEY §2.5):
  *   - counter is `count(*)` of input rows (ingest seeds counter=1, P8);
  *   - timestamp is `min(ts)` — the reference keeps the first-seen arrival
  *     timestamp (aggregator.go:229-238); `min` is the deterministic,
  *     replay-safe equivalent;
  *   - the reference's crosswise config flags are preserved:
  *     `groupbyQuestion=true` collapses the question columns,
  *     `groupbyQueryAddress=true` collapses the address columns.
  */
object GroupingSetCounter {
  val AnyTag = "__ANY__"

  /** @param fixed    key columns present in every grouping set (identity;
    *                 plus response_status for responses — never collapsed)
    * @param address  address key columns (collapsed in the by-question set)
    * @param question question key columns (collapsed in the by-address set)
    */
  def apply(df: DataFrame,
            fixed: Seq[String], address: Seq[String], question: Seq[String],
            tsCol: String, tsOut: String = "first_seen",
            writeUngrouped: Boolean = true,
            groupbyQuestion: Boolean = true,
            groupbyQueryAddress: Boolean = true): DataFrame = {
    val all = fixed ++ address ++ question
    val collapsible = address ++ question
    val sets: Seq[Seq[String]] = Seq(
      if (writeUngrouped) Some(all) else None,
      if (groupbyQuestion) Some(fixed ++ address) else None,
      if (groupbyQueryAddress) Some(fixed ++ question) else None).flatten
    require(sets.nonEmpty, "at least one grouping set must be enabled")

    // grouping() is only valid inside the aggregate, so emit one flag per
    // collapsible column and substitute the sentinel in a post-projection.
    val aggs = count(lit(1)).as("counter") +: min(col(tsCol)).as(tsOut) +:
      collapsible.map(c => grouping(col(c)).as(s"__g_$c"))
    df.groupingSets(sets.map(_.map(col)), all.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(fixed.map(col) ++
        collapsible.map(c =>
          when(col(s"__g_$c") === 1, lit(AnyTag)).otherwise(col(c)).as(c)) ++
        Seq(col("counter"), col(tsOut)): _*)
  }
}
