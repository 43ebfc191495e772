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
