package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance-1 vocabulary pair mining via the FastSS deletion
  * neighborhood — the typo/variant detector of a corpus-cleaning
  * pipeline (OCR noise, tokenizer damage, spelling drift), and the
  * classic demonstration that a metric join does NOT need a metric
  * index: two words are within one edit iff they share a member of
  * their deletion neighborhoods {w} ∪ {delete_i(w)}, so the all-pairs
  * Levenshtein join collapses to an equi-join on generated variants
  * plus an exact verify on the survivors.
  *
  * Scale (100 TB corpus, vocabulary-sized input): the pair search
  * never touches the corpus — it runs over the VOCABULARY (words ×
  * counts), which is bounded (≈ millions of rows at web scale, after
  * the corpus-sized groupBy that builds it map-side combines). Each
  * word emits len+1 variants (one narrow generator, no shuffle
  * amplification beyond ×(len+1)); the candidate self-join is an equi
  * hash join on a 60-bit variant hash, and a variant key's bucket is
  * structurally bounded — a variant of length L is reachable from at
  * most (L+1)·|alphabet|+1 words — so no key can skew. Hash
  * collisions and same-neighborhood-but-distance-2 coincidences are
  * both killed by the exact `levenshtein ≤ 1` verify, which runs on
  * candidate pairs only (the join did the pruning, the verify does
  * the truth — the CMS/PPJoin candidate-verify discipline).
  */
object EditPairs {

  /** All unordered word pairs at Levenshtein distance exactly 1 from a
    * (word, cnt) vocabulary: (w1, w2, c1, c2) with w1 < w2. */
  def distanceOnePairs(vocab: DataFrame, wordCol: String,
                       cntCol: String): DataFrame = {
    val v = vocab.select(col(wordCol).as("w"), col(cntCol).as("c"))
    // deletion neighborhood: i = 0 keeps the word, i >= 1 deletes char i
    val variants = v.select(col("w"), col("c"),
        explode(sequence(lit(0), length(col("w")))).as("i"))
      .select(col("w"), col("c"),
        when(col("i") === 0, col("w"))
          .otherwise(concat(
            expr("substring(w, 1, i - 1)"),
            expr("substring(w, i + 1, 2147483647)"))).as("var"))
      .select(col("w"), col("c"), Dedup.baseHash60(col("var")).as("vh"))
      .distinct()
    val left = variants.select(col("vh"), col("w").as("w1"), col("c").as("c1"))
    val right = variants.select(col("vh"), col("w").as("w2"), col("c").as("c2"))
    left.join(right, Seq("vh"))
      .filter(col("w1") < col("w2"))
      .select(col("w1"), col("w2"), col("c1"), col("c2"))
      .distinct()
      .filter(levenshtein(col("w1"), col("w2")) <= 1)
  }
}
