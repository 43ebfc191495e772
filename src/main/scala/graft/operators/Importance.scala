package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection with Importance Resampling — DSIR (Xie et al.,
  * NeurIPS 2023, public algorithm): score every RAW document by the
  * log-likelihood ratio of its hashed unigram features under the
  * TARGET distribution vs the raw distribution, then keep the top-k —
  * the published recipe for "select web data that looks like the
  * curated set" without training a classifier.
  *
  * Scale shape (the 100 TB story):
  *   - both feature distributions are B-bounded aggregations (token →
  *     xxhash64 mod B bucket, count) with map-side combine — the only
  *     shuffles are ≤ B rows each, whatever the corpus size;
  *   - the per-bucket log-ratio table collects under a loud require
  *     (B ≤ 2²⁰) and rides back as a broadcast literal map, so SCORING
  *     is one narrow map-side pass: per document a fold over its
  *     tokens, no join, no shuffle of text;
  *   - selection is top-k by (score DESC, id ASC) — a TakeOrdered,
  *     never a full sort.
  *
  * Determinism: bucket counts are exact integers; the log-ratio table
  * is computed ONCE driver-side with StrictMath.log (bit-identical
  * across JVMs) and add-one smoothing, so each document's score is a
  * fixed-order left-to-right double sum of table constants — replay-
  * stable. Floats still bar a cross-engine SQL oracle (DuckDB ln ≠
  * JVM log), so the family registers rows-only, pinned by
  * ImportanceSpec against an in-memory reference. */
object Importance {

  /** Loud bound on the collected per-bucket ratio table. */
  val MaxBuckets: Int = 1 << 20

  /** Hashed-unigram bucket counts of a corpus: (bucket, n), ≤ B rows. */
  private def bucketCounts(df: DataFrame, textCol: String, buckets: Int): Array[(Long, Long)] =
    df.select(explode(TextAnalysis.tokens(col(textCol))).as("__t"))
      .select(pmod(xxhash64(col("__t")), lit(buckets.toLong)).as("__b"))
      .groupBy(col("__b")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))

  /** Per-document DSIR importance score of every `raw` document:
    * Σ_tokens log P̂_target(bucket) − log P̂_raw(bucket), add-one
    * smoothed. Output: (idCol, n_tokens, score). */
  def dsirScores(raw: DataFrame, target: DataFrame, idCol: String,
                 textCol: String, buckets: Int = 4096): DataFrame = {
    require(buckets >= 1 && buckets <= MaxBuckets,
      s"buckets must be in [1, $MaxBuckets], got $buckets")
    val tgt = bucketCounts(target, textCol, buckets).toMap
    val rawC = bucketCounts(raw, textCol, buckets).toMap
    val tgtTot = tgt.valuesIterator.sum + buckets.toLong
    val rawTot = rawC.valuesIterator.sum + buckets.toLong
    val logTot = StrictMath.log(rawTot.toDouble) - StrictMath.log(tgtTot.toDouble)
    // log ((tgt[b]+1)/tgtTot) − log ((raw[b]+1)/rawTot), only for
    // buckets where it differs from the both-unseen constant
    val ratio: Map[Long, Double] = (tgt.keySet ++ rawC.keySet).iterator.map { b =>
      b -> (StrictMath.log(tgt.getOrElse(b, 0L) + 1.0) -
        StrictMath.log(rawC.getOrElse(b, 0L) + 1.0) + logTot)
    }.toMap
    val m = typedLit(ratio)
    val tk = TextAnalysis.tokens(col(textCol))
    raw.select(col(idCol), tk.as("__tk"))
      .select(col(idCol), size(col("__tk")).cast("long").as("n_tokens"),
        aggregate(col("__tk"), lit(0.0d), (acc, t) =>
          acc + coalesce(
            element_at(m, pmod(xxhash64(t), lit(buckets.toLong))),
            lit(logTot))).as("score"))
  }

  /** Top-`k` raw documents by importance (score DESC, id ASC — total
    * deterministic order). The published DSIR sampler draws Gumbel-
    * perturbed ranks; the deterministic argmax-k variant keeps the
    * pipeline replay-stable and is what a curation run wants pinned. */
  def dsirSelect(raw: DataFrame, target: DataFrame, idCol: String,
                 textCol: String, k: Int, buckets: Int = 4096): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    dsirScores(raw, target, idCol, textCol, buckets)
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}
