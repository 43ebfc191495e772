package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TopKPriorityFunctions.topk_priority_agg
import graft.operators.Sampling

/** Streaming weighted sampling — the stream-side counterpart of
  * [[graft.operators.Sampling.groupedPrioritySample]], on the
  * [[StreamHist]] partials-then-merge law: priority sampling's k-ledger
  * is a MERGEABLE bounded aggregate (top-k of a union == top-k of
  * per-slice top-ks — rows outside a slice's top k can never enter the
  * union's), so each event-time window owns a ≤ k partial ledger per
  * key, the watermark closes it, append mode emits it exactly once, and
  * any reader re-aggregates accumulated partials into the all-time
  * sample without rescanning stream history.
  *
  * The priority draw is [[Sampling.priorityDraw]] — deterministic
  * hash-derived, NOT rand() — which is what makes the merged streaming
  * sample provably equal to the batch sample over the same rows
  * (StreamPrioritySampleSpec pins it); a random draw would make every
  * replay a different sample and batch equivalence unfalsifiable.
  *
  * State per (window, key) is the serialized ≤ k ledger — bounded by
  * construction, not by watermark horizon. */
object StreamPrioritySample {

  /** Per-window per-key top-k partial ledgers. Output: (window, keyCol,
    * sample: array<struct<doc_id, w>>), append-once on window close. */
  def windowedSample(stream: DataFrame, keyCol: String, idCol: String,
                     weightCol: String, tsCol: String, windowDur: String,
                     watermark: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    stream
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur), col(keyCol))
      .agg(topk_priority_agg(col(idCol).cast("long"),
        col(weightCol).cast("long"),
        // draw from the LONG-CAST weight — the value the ledger stores
        // and mergeSamples re-derives from (fractional raw weights
        // would break the merge law at the k boundary)
        Sampling.priorityDraw(col(idCol), col(weightCol).cast("long")),
        k).as("sample"))
  }

  /** Merge emitted partials (any window slicing) back into the one
    * all-time per-key sample — batch-side: explode the ledgers,
    * re-derive each row's deterministic priority from (doc_id, w), and
    * re-aggregate. Output matches groupedPrioritySample's
    * (keyCol, doc_id, w, rank). */
  def mergeSamples(partials: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    Sampling.groupedPrioritySample(
      partials.select(col(keyCol), explode(col("sample")).as("__e"))
        .select(col(keyCol), col("__e.doc_id").as("doc_id"),
          col("__e.w").as("w")),
      "doc_id", "w", keyCol, k)
  }
}
