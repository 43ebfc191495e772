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

  /** General as-of join: each left row picks the LATEST right row with
    * the same key and `right.ts <= left.ts` — the time-series join
    * (trade↔quote, event↔most-recent-state) that a naive formulation
    * makes an inequality join (BNL or a skewed sort-merge at scale).
    *
    * Same one-window-pass shape as [[deltas]], generalized to two
    * DataFrames and an arbitrary carried payload: the sides are tagged
    * and unioned (schema aligned via typed-null struct columns — a
    * union is a zero-cost narrow op), then ONE window partitioned by
    * the key and ordered by `(ts, side, tieBreak)` finds each left
    * row's partner with `last(right_struct, ignoreNulls)`. Right rows
    * sort BEFORE left rows at equal timestamps, so "at or before"
    * includes ties — DuckDB `ASOF JOIN ... ON r.ts <= l.ts` semantics
    * exactly; among right rows sharing one (key, ts), the max
    * `tieBreak` wins (deterministic, and what the oracle's windowed
    * dedupe replays).
    *
    * Scale (100 TB): one exchange on the key + one partition-local
    * sort, fully pipelined — no join node at all, so there is nothing
    * for the planner to degrade to a nested loop, and the key
    * partitioning is reusable downstream. Unmatched left rows survive
    * with NULLs (left-outer semantics).
    *
    * @param rightPayload right columns carried to the output (must not
    *                     collide with left column names; the matched
    *                     right timestamp lands as `asof_ts`)
    * @return all left columns + `asof_ts` + `rightPayload` */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, tieBreak: String,
               rightPayload: Seq[String]): DataFrame = {
    val dup = rightPayload.toSet.intersect(left.columns.toSet)
    require(dup.isEmpty, s"rightPayload collides with left columns: $dup")
    require(!left.columns.contains("asof_ts"),
      "left already has an asof_ts column (chained as-of joins must " +
        "rename it first) — the output would carry two")
    val keyCols = keys.map(col)
    val lpStruct = struct(left.columns.map(col): _*)
    val rpStruct = struct(col(tsCol).as("asof_ts") +: rightPayload.map(col): _*)
    val lpType = left.select(lpStruct).schema.head.dataType
    val rpType = right.select(rpStruct).schema.head.dataType
    val leftTagged = left.select(keyCols ++ Seq(col(tsCol).as("__ts"),
      col(tieBreak).as("__tb"), lit(1).as("__side"), lpStruct.as("__lp"),
      lit(null).cast(rpType).as("__rp")): _*)
    val rightTagged = right.select(keyCols ++ Seq(col(tsCol).as("__ts"),
      col(tieBreak).as("__tb"), lit(0).as("__side"),
      lit(null).cast(lpType).as("__lp"), rpStruct.as("__rp")): _*)
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("__ts"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    leftTagged.unionByName(rightTagged)
      .withColumn("__m", last(col("__rp"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.map(c => col(s"__lp.$c")) ++
        (col("__m.asof_ts") +: rightPayload.map(c => col(s"__m.$c"))): _*)
  }

  /** Nearest-in-time join — [[asOfJoin]]'s bidirectional sibling (the
    * sensor-alignment / diagnostics shape: "the closest error to each
    * purchase", either side of it): every left row matches the right
    * row minimizing |Δt|, ties preferring the backward (at-or-before)
    * candidate. Two window passes over ONE tagged union sharing ONE
    * key exchange — backward is last(right) over preceding rows with
    * rights sorting before lefts at equal ts (exact-ts rights match),
    * forward is first(right) over following rows with lefts sorting
    * first (so an exact-ts right is also visible forward); no join
    * node exists to degrade. Among multiple rights at one timestamp
    * the backward pick is the highest tiebreak id, the forward pick
    * the lowest — both total orders, both replayed by the oracle.
    *
    * @return left columns + `nearest_ts` + `dt_us` (signed: positive
    *         when the match is before the left row, negative after,
    *         null when no right row exists) + `rightPayload` */
  def nearestJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                  tsCol: String, tieBreak: String,
                  rightPayload: Seq[String]): DataFrame = {
    val dup = rightPayload.toSet.intersect(left.columns.toSet)
    require(dup.isEmpty, s"rightPayload collides with left columns: $dup")
    val keyCols = keys.map(col)
    val lpStruct = struct(left.columns.map(col): _*)
    val rpStruct = struct(col(tsCol).as("nearest_ts") +: rightPayload.map(col): _*)
    val lpType = left.select(lpStruct).schema.head.dataType
    val rpType = right.select(rpStruct).schema.head.dataType
    val leftTagged = left.select(keyCols ++ Seq(col(tsCol).as("__ts"),
      col(tieBreak).as("__tb"), lit(1).as("__side"), lpStruct.as("__lp"),
      lit(null).cast(rpType).as("__rp")): _*)
    val rightTagged = right.select(keyCols ++ Seq(col(tsCol).as("__ts"),
      col(tieBreak).as("__tb"), lit(0).as("__side"),
      lit(null).cast(lpType).as("__lp"), rpStruct.as("__rp")): _*)
    val wBack = Window.partitionBy(keyCols: _*)
      .orderBy(col("__ts"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = Window.partitionBy(keyCols: _*)
      .orderBy(col("__ts"), (lit(1) - col("__side")).asc, col("__tb"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val us = (c: Column) => unix_micros(c.getField("nearest_ts"))
    val lts = unix_micros(col("__ts"))
    val picked = leftTagged.unionByName(rightTagged)
      .withColumn("__b", last(col("__rp"), ignoreNulls = true).over(wBack))
      .withColumn("__f", first(col("__rp"), ignoreNulls = true).over(wFwd))
      .filter(col("__side") === 1)
      .withColumn("__m",
        when(col("__b").isNull, col("__f"))
          .when(col("__f").isNull, col("__b"))
          .when(lts - us(col("__b")) <= us(col("__f")) - lts, col("__b"))
          .otherwise(col("__f")))
    picked.select(left.columns.map(c => col(s"__lp.$c")) ++
      Seq(col("__m.nearest_ts"),
        (lts - unix_micros(col("__m.nearest_ts"))).as("dt_us")) ++
      rightPayload.map(c => col(s"__m.$c")): _*)
  }

  /** Last-touch attribution — [[asOfJoin]] applied to the marketing
    * question: each `convType` event credits the latest `touchTypes`
    * event of the same user at-or-before it and within `lookbackUs`,
    * else the 'direct' channel; the card sums conversions and cents
    * per credited channel. Ties at one timestamp resolve to the
    * highest event id (the asOfJoin (ts, side, tiebreak) order).
    * One window pass over the tagged union — no join node exists for
    * the planner to degrade. */
  def lastTouchAttribution(events: DataFrame, userCol: String,
                           tsCol: String, idCol: String, valueCol: String,
                           typeCol: String, convType: String,
                           touchTypes: Seq[String],
                           lookbackUs: Long): DataFrame = {
    require(lookbackUs >= 1, s"lookbackUs must be positive, got $lookbackUs")
    require(touchTypes.nonEmpty, "need at least one touch type")
    val conv = events.filter(col(typeCol) === convType)
      .select(col(idCol), col(userCol), col(tsCol),
        floor(col(valueCol) * 100).cast("long").as("__cents"))
    val touches = events.filter(col(typeCol).isin(touchTypes: _*))
      .select(col(userCol), col(tsCol), col(idCol),
        col(typeCol).as("__ch"))
    asOfJoin(conv, touches, Seq(userCol), tsCol, tieBreak = idCol,
        rightPayload = Seq("__ch"))
      .select(col("__cents"),
        when(col("asof_ts").isNull ||
          unix_micros(col(tsCol)) - unix_micros(col("asof_ts")) > lookbackUs,
          lit("direct")).otherwise(col("__ch")).as("channel"))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_conv"), sum(col("__cents")).as("cents"))
  }

  /** Per-identity average latency (A4, aggregator.go:485-528): integer
    * division — floor() in both Spark and the DuckDB oracle (CAST semantics
    * differ: DuckDB rounds, Spark truncates; floor is unambiguous). */
  def avgByIdentity(deltas: DataFrame, identityCol: String): DataFrame =
    deltas.groupBy(col(identityCol))
      .agg(floor(sum(col("delta_us")) / count(lit(1))).as("avg_delta_us"),
           count(lit(1)).as("n_samples"))
}
