package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines.
  *
  * Scale notes (the 100 TB story):
  *   - exact dedup is a single hash aggregation on a digest — map-side
  *     partial agg collapses duplicates before the shuffle, and the digest
  *     (16 bytes) rather than the document body is what shuffles;
  *   - n-gram jaccard uses the inverted-index (shingle → doc) join: only
  *     docs sharing a shingle ever meet, so cost scales with true overlap,
  *     not |docs|². Shingle hashes (xxhash64), not shingle strings, shuffle.
  *     Frequency-capping drops degenerate shingles (df > maxShingleDf) that
  *     would otherwise create quadratic hot keys — classic skew control.
  */
object Dedup {

  /** Exact dedup by content digest: one row per distinct text with the
    * surviving (minimum) id and the duplicate count. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol).cast("binary")).as("content_hash"))
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("n_docs"))

  /** Near-duplicate pairs by n-gram (token-shingle) Jaccard similarity,
    * via inverted-index join + per-pair intersection count.
    *
    * @param maxShingleDf drop shingles appearing in more than this many
    *        docs (0 = keep all): skew guard for degenerate content.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, threshold: Double = 0.5,
                        maxShingleDf: Long = 0L): DataFrame = {
    val sh0 = df
      .select(col(idCol).as("doc"), explode(TextAnalysis.shingles(col(textCol), n)).as("sg"))
      .distinct()
    val sh =
      if (maxShingleDf <= 0) sh0
      else {
        val dfreq = sh0.groupBy("sg").agg(count(lit(1)).as("df"))
          .filter(col("df") <= maxShingleDf).select("sg")
        sh0.join(dfreq, "sg")
      }
    val sizes = sh.groupBy(col("doc")).agg(count(lit(1)).as("sz"))
    val inter = sh.as("a")
      .join(sh.as("b"), col("a.sg") === col("b.sg") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      .agg(count(lit(1)).as("c"))
    inter
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc"))
      .select(col("doc_a"), col("doc_b"),
        (col("c") * lit(1.0) / (col("sa.sz") + col("sb.sz") - col("c"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
