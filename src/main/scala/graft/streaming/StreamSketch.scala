package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.HeavyHitters

/** Streaming count-min sketch maintenance — the stream-side counterpart
  * of [[HeavyHitters]]: the d×w cell grid is an ADDITIVE aggregate, so
  * a stream can maintain it incrementally and any reader can merge the
  * emitted partials by plain cell addition (the q144 rollup idiom) —
  * heavy-hitter queries then run on demand against the merged grid
  * without ever rescanning the stream's history.
  *
  * The production shape is the WINDOWED form: each event-time window
  * owns a partial grid, the watermark closes it, and append mode emits
  * it exactly once — finalized, immutable partials that land in a
  * sketch store (≤ d·w rows per window, whatever the traffic). State
  * in the store is bounded by (windows in flight × d·w), never by
  * stream cardinality — the only sketch shape that survives unbounded
  * ingestion. StreamSketchSpec pins the batch equivalence: summed
  * windowed partials == the batch grid over the same rows, and heavy
  * hitters derived from merged streaming partials == the batch
  * operator's answer. */
object StreamSketch {

  /** Per-event-time-window CMS partial grids of a token stream.
    * Output: (window, depth, bucket, n) in append mode once the
    * watermark closes each window. */
  def windowedCells(stream: DataFrame, itemCol: String, tsCol: String,
                    windowDur: String, watermark: String,
                    depth: Int = 4, width: Int = 512): DataFrame = {
    require(depth >= 1 && width >= 1 &&
      depth.toLong * width <= HeavyHitters.MaxSketchCells,
      s"sketch grid d=$depth w=$width exceeds MaxSketchCells")
    stream
      .withWatermark(tsCol, watermark)
      // pre-hash the item into a real column (the cellStructs contract,
      // r19): batch and stream share the hash-once cell layout
      .select(col(tsCol), xxhash64(col(itemCol)).as("__ih"))
      .select(col(tsCol), explode(
        HeavyHitters.cellStructs(col("__ih"), depth, width)).as("__c"))
      .groupBy(window(col(tsCol), windowDur),
        col("__c.depth").as("depth"), col("__c.bucket").as("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  /** Merge emitted partial grids (any window/source slicing) into one
    * grid by cell addition — batch-side, for the on-demand heavy-hitter
    * query over accumulated partials. */
  def mergeCells(partials: DataFrame): DataFrame =
    partials.groupBy(col("depth"), col("bucket"))
      .agg(sum(col("n")).as("n"))
}
