package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reference-corpus n-gram language-model scoring — the CCNet-style
  * quality gate (Wenzek et al., "CCNet: Extracting High Quality
  * Monolingual Datasets from Web Crawl Data", LREC 2020): train a cheap
  * n-gram model on a trusted corpus, score candidate documents by how
  * much of their content the model has seen, and keep/bucket candidates
  * by that score. CCNet uses a KenLM perplexity; here the model is the
  * raw integer count table and the score is integer match statistics — a
  * monotone stand-in for log-probability that stays dialect-portable
  * (hash-exact against a SQL oracle) where floating log sums would not.
  */
object NgramModel {

  /** Score `candidates` against a token-n-gram count model built from
    * `reference`.
    *
    * Scale (100 TB): the model is one hash aggregation keyed by a
    * portable 60-bit n-gram hash — map-side combine collapses repeats
    * before the shuffle, and only (hash, count) pairs ever move, never
    * n-gram text. Scoring is one equi-join on the hash (AQE broadcasts
    * the model side when it is small — not forced, so a huge reference
    * vocabulary degrades to a sort-merge join instead of an OOM) plus one
    * aggregation. Everything is codegen'd column expressions; no UDFs.
    *
    * @return one row per candidate doc:
    *         (doc_id, total_ngrams, matched_ngrams, model_mass) where
    *         matched_ngrams counts candidate n-gram occurrences present
    *         in the model and model_mass sums the model's count for each
    *         occurrence (higher = more like the reference corpus).
    */
  def ngramCommonness(candidates: DataFrame, reference: DataFrame,
                      idCol: String, textCol: String,
                      n: Int = 3): DataFrame = {
    def grams(df: DataFrame): DataFrame = df
      .select(col(idCol).as("doc_id"),
        TextAnalysis.tokens(col(textCol)).as("__tk"))
      .select(col("doc_id"),
        explode(TextAnalysis.shinglesOfTokens(col("__tk"), n)).as("__g"))
      .select(col("doc_id"), Dedup.baseHash60(col("__g")).as("gh"))
    val model = grams(reference).groupBy(col("gh"))
      .agg(count(lit(1)).as("__mc"))
    val scored = grams(candidates)
      .join(model, Seq("gh"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("total_ngrams"),
        count(col("__mc")).as("matched_ngrams"),
        sum(coalesce(col("__mc"), lit(0L))).as("model_mass"))
    // docs with fewer than n tokens emit no n-grams — re-attach as zeros
    // so the score surface covers every candidate
    candidates.select(col(idCol).as("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("total_ngrams"), lit(0L)).as("total_ngrams"),
        coalesce(col("matched_ngrams"), lit(0L)).as("matched_ngrams"),
        coalesce(col("model_mass"), lit(0L)).as("model_mass"))
  }
}
