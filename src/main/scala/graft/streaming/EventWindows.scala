package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time windowed aggregation for unbounded streams — the engine's
  * general-purpose streaming analytics surface beyond the reference's
  * processing-time pipeline (the §2.9 time-series queries in streaming
  * form): watermark-bounded state, append-mode emission when a window
  * closes, late data beyond the watermark dropped by the state store.
  *
  * Scale: state is keyed by (window, keys) in the executor state store;
  * the watermark bounds state size to (active windows × keys), and the
  * aggregation is a standard partial/final pair — late-arrival handling
  * costs nothing extra.
  */
object EventWindows {

  /** Event-time windowed multi-grouping-set counter: the reference's core
    * A1 aggregation (GroupingSetCounter semantics, `__ANY__` sentinel) as
    * a watermarked tumbling-window streaming aggregation — the event-time
    * upgrade of the pipeline's processing-time clear-on-flush cadence:
    * late rows inside the watermark still land in their true window, and
    * a window's rows emit once, when the watermark passes it (append
    * mode), rather than once per flush interval.
    *
    * Same single-Expand plan as the batch operator (one shuffle, map-side
    * partial agg); streaming state is keyed by (window, expanded keys)
    * and bounded by the watermark. Works identically over a batch frame
    * (no watermark state, same results) — asserted in EventWindowsSpec.
    */
  def groupingSetCounts(events: DataFrame, tsCol: String, windowLen: String,
                        watermark: String, fixed: Seq[String],
                        address: Seq[String], question: Seq[String]): DataFrame = {
    val all = fixed ++ address ++ question
    val collapsible = address ++ question
    val win = window(col(tsCol), windowLen)
    val sets: Seq[Seq[Column]] = Seq(all, fixed ++ address, fixed ++ question)
      .map(s => win +: s.map(col))
    val aggs = count(lit(1)).as("counter") +: min(col(tsCol)).as("first_seen") +:
      collapsible.map(c => grouping(col(c)).as(s"__g_$c"))
    val stream = if (events.isStreaming) events.withWatermark(tsCol, watermark)
                 else events
    stream
      .groupingSets(sets, win +: all.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(col("window.start").as("w_start") +: col("window.end").as("w_end") +:
        (fixed.map(col) ++
          // collapsed keys render as STRING so the sentinel unifies with
          // any key type without an ANSI cast failure
          collapsible.map(c =>
            when(col(s"__g_$c") === 1, lit(graft.operators.GroupingSetCounter.AnyTag))
              .otherwise(col(c).cast("string")).as(c)) ++
          Seq(col("counter"), col("first_seen"))): _*)
  }

  /** Per-window top-`k` finisher for a CLOSED-window count stream (the
    * output of [[tumbling]] in append mode): rank keys by (count desc,
    * keys asc) within each (w_start, w_end) and keep the top k.
    *
    * Streaming cannot chain a second aggregation/window after the
    * watermarked count in append mode, so windowed heavy hitters run as
    * a two-stage composition: `tumbling(...)` emits each window's final
    * counts exactly once (when the watermark closes it), and this
    * finisher ranks them inside `foreachBatch` — exact, because every
    * closed window arrives complete in one batch. The rank window
    * partitions on the window bounds, so state is one window's keys,
    * never the stream. Batch-equivalence is asserted in
    * EventWindowsSpec. */
  def rankWindows(closed: DataFrame, keys: Seq[String], k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("w_start"), col("w_end"))
      .orderBy(desc("n") +: keys.map(c => asc(c)): _*)
    closed.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }

  /** Event-time curation health: per (window, source) ingest counts,
    * rule-gate pass counts, and total hashed-BoW model score — the live
    * ops dashboard behind the batch data card (q107): "did the quality
    * of feed X fall off a cliff in the last hour". All quality metrics
    * are scan-level expressions (qualityGate, bowScore), so the plan is
    * exactly one watermarked windowed aggregation — state per
    * (window, source), no second stateful stage, append emission on
    * window close. Integer-exact outputs (counts and a raw score sum);
    * rate/threshold math belongs to the dashboard. Works identically
    * over a batch frame — asserted in EventWindowsSpec. */
  def curationHealth(docs: DataFrame, tsCol: String, srcCol: String,
                     textCol: String, windowLen: String, watermark: String,
                     weights: Seq[Int], minTokens: Long = 20,
                     maxTokens: Long = 2000): DataFrame = {
    val tk = graft.operators.TextAnalysis.tokens(col(textCol))
    val stream = if (docs.isStreaming) docs.withWatermark(tsCol, watermark)
                 else docs
    stream
      // materialize the token array once per row before the metric
      // lambdas reference it (the shinglesOfTokens/qualityGate contract)
      .withColumn("__tk", tk)
      .select(col(tsCol), col(srcCol),
        when(graft.operators.TextAnalysis.qualityGate(col("__tk"),
          minTokens, maxTokens), 1L).otherwise(0L).as("__pass"),
        graft.operators.TextAnalysis.bowScore(col("__tk"), weights).as("__score"),
        size(col("__tk")).cast("long").as("__ntok"))
      .groupBy(window(col(tsCol), windowLen), col(srcCol))
      .agg(count(lit(1)).as("n_docs"), sum(col("__pass")).as("n_pass"),
        sum(col("__score")).as("score_sum"), sum(col("__ntok")).as("n_tokens"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
        col(srcCol), col("n_docs"), col("n_pass"), col("score_sum"),
        col("n_tokens"))
  }

  /** Tumbling event-time window with per-key counts and an optional sum.
    * Works identically over batch and streaming frames (same plan shape;
    * streaming adds watermark state). */
  def tumbling(events: DataFrame, tsCol: String, keys: Seq[String],
               windowLen: String, watermark: String,
               sumCol: Option[String] = None): DataFrame = {
    val aggs: Seq[Column] = count(lit(1)).as("n") +:
      sumCol.map(c => sum(col(c)).as(s"sum_$c")).toSeq
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen) +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(col("window.start").as("w_start") +: col("window.end").as("w_end") +:
        (keys.map(col) ++ (col("n") +: sumCol.map(c => col(s"sum_$c")).toSeq)): _*)
  }
}
