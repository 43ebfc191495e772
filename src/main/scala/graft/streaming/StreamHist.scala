package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact-histogram maintenance — the stream-side counterpart
  * of [[graft.operators.Percentiles]]: a (key, value) histogram is an
  * ADDITIVE aggregate (the same lossless-merge law the q179 rollup
  * exploits), so each event-time window owns a partial histogram, the
  * watermark closes it, and append mode emits it exactly once —
  * finalized immutable partials that land in a stats store. Any reader
  * merges accumulated partials by cell addition and folds EXACT
  * percentiles on demand ([[graft.operators.Percentiles.fromHistogram]])
  * without rescanning stream history — and because the merge is
  * lossless, those are exactly the percentiles of all rows ever
  * ingested, not a sketch estimate.
  *
  * State in the store is bounded by (windows in flight × keys ×
  * distinct values); for unbounded value domains pass `bucket` > 1
  * (the byRank knob — values floor to bucket boundaries BEFORE the
  * histogram, the documented resolution trade). StreamHistSpec pins
  * merged streaming partials == the batch histogram, and percentiles
  * folded from them == the batch byRank answer. */
object StreamHist {

  /** Per-event-time-window (key, value) histogram partials. Output:
    * (window, keyCol, __v, __cnt), append mode once the watermark
    * closes each window. */
  def windowedHist(stream: DataFrame, keyCol: String, valCol: String,
                   tsCol: String, windowDur: String, watermark: String,
                   bucket: Long = 1L): DataFrame = {
    // the ONE bucket-floor definition shared with the batch operators —
    // StreamHistSpec's stream == batch equalities depend on it
    val v = graft.operators.Percentiles.bucketedValue(col(valCol), bucket)
    stream
      .withWatermark(tsCol, watermark)
      .filter(col(valCol).isNotNull)
      .select(col(tsCol), col(keyCol), v.as("__v"))
      .groupBy(window(col(tsCol), windowDur), col(keyCol), col("__v"))
      .agg(count(lit(1)).as("__cnt"))
  }

  /** Merge emitted partials (any window/source slicing) back into one
    * (key, __v, __cnt) histogram by cell addition — batch-side, ready
    * for [[graft.operators.Percentiles.fromHistogram]]. */
  def mergeHist(partials: DataFrame, keyCol: String): DataFrame =
    partials.groupBy(col(keyCol), col("__v"))
      .agg(sum(col("__cnt")).as("__cnt"))
}
