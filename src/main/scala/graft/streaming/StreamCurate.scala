package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** The full row-local curation front end as ONE streaming stage:
  * rule gate ([[TextAnalysis.qualityGate]]) → model score
  * ([[TextAnalysis.bowScore]], integer cross-multiplied threshold) →
  * decontaminate-and-redact ([[StreamScrub.scrub]]). Every step is a
  * scan-level expression, so the composite runs identically in batch
  * and in append-mode streaming with zero state — arriving documents
  * are accepted/cleaned/rejected before anything stateful (dedup,
  * aggregation) ever sees them, which is exactly where a 100 TB ingest
  * wants its cheapest, most selective filters.
  *
  * Threshold semantics: keep documents with
  * `bowScore * 1000 >= minScoreMilliPerToken * n_tokens` — integer
  * cross-multiplication, no float division (the q100/q104 discipline).
  */
object StreamCurate {

  def curate(docs: DataFrame, evalHashes: Array[Long], textCol: String,
             weights: Seq[Int], minScoreMilliPerToken: Long,
             minTokens: Long = 20, maxTokens: Long = 2000,
             shingleN: Int = 5): DataFrame = {
    val gated = docs
      .withColumn("__tk", TextAnalysis.tokens(col(textCol)))
      .filter(TextAnalysis.qualityGate(col("__tk"), minTokens, maxTokens))
      .filter(TextAnalysis.bowScore(col("__tk"), weights) * 1000 >=
        lit(minScoreMilliPerToken) * size(col("__tk")).cast("long"))
      .drop("__tk")
    StreamScrub.scrub(gated, evalHashes, textCol, shingleN)
  }
}
