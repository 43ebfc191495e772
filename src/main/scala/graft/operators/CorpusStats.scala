package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level curation analytics for a training-data pipeline: token
  * rarity scoring (a unigram-LM perplexity proxy that stays integer-exact)
  * and cross-source duplication overlap.
  *
  * Scale notes (the 100 TB story):
  *   - rarity scoring is two token-keyed shuffles (frequency count, then
  *     frequency join-back) + one doc-keyed aggregation — the vocabulary
  *     is NEVER broadcast or collected, so a web-scale term dictionary
  *     flows through ordinary hash partitioning;
  *   - source overlap joins 16-byte digests, not bodies, and its per-key
  *     fan-out is bounded by the number of sources squared (sources are
  *     O(dozens) in practice), so no digest can go quadratic in |docs|.
  */
object CorpusStats {

  /** Per-document token-rarity stats: a quality signal in the spirit of a
    * unigram language model (documents dominated by corpus-rare tokens are
    * disproportionately OCR noise / gibberish; documents with none are
    * boilerplate-heavy). All integer arithmetic — no log() — so the result
    * is bit-portable across engines (see q58's DuckDB oracle).
    *
    * Output: (id, n_tokens, n_rare, rare_bp) where `n_rare` counts token
    * OCCURRENCES whose corpus-wide frequency is below `rareBelow` and
    * `rare_bp` = floor(n_rare * 10000 / n_tokens) basis points. Documents
    * with zero tokens produce no row (they have no token occurrences). */
  def rareTokenStats(df: DataFrame, idCol: String, textCol: String,
                     rareBelow: Long = 10L): DataFrame = {
    // materialize the token array before exploding — inlining tokens()
    // into the generator re-evaluates the split per element (O(tokens²))
    val toks = df
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__tk"))
      .select(col(idCol), explode(col("__tk")).as("__tok"))
    val cf = toks.groupBy(col("__tok")).agg(count(lit(1)).as("__cf"))
    toks.join(cf, "__tok")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__cf") < rareBelow, 1L).otherwise(0L)).as("n_rare"))
      .withColumn("rare_bp", floor(col("n_rare") * 10000 / col("n_tokens")))
  }

  /** Split documents into fixed-size token windows — the max-seq-len
    * chunking step between curation and tokenization (long docs become
    * several training sequences; the final short window is kept, not
    * padded — padding/packing is [[Packing]]'s job). Entirely row-local:
    * one scan, a generate over ceil(n/seqLen) indices per doc, and an
    * array slice per chunk. No shuffle at any size. Token-empty docs
    * produce no chunks. */
  def chunk(df: DataFrame, idCol: String, textCol: String,
            seqLen: Int): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    df.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__tk"))
      .withColumn("__n", size(col("__tk")))
      .filter(col("__n") > 0)
      .select(col(idCol), col("__tk"), col("__n"),
        explode(sequence(lit(0),
          ((col("__n") - 1) / lit(seqLen)).cast("int"))).as("__i"))
      .select(col(idCol), col("__i").cast("long").as("chunk_idx"),
        array_join(slice(col("__tk"), col("__i") * seqLen + 1, lit(seqLen)),
          " ").as("chunk_text"),
        least(lit(seqLen), col("__n") - col("__i") * seqLen).cast("long")
          .as("chunk_tokens"))
  }

  /** Cross-source duplication matrix: for each unordered source pair, how
    * many distinct n-token shingles appear in BOTH — the "is source B
    * scraping the same sites as source A / leaking the eval set" curation
    * question, at n-gram rather than whole-document granularity (exact
    * mirrors rarely survive re-crawling; shared shingles do). 8-byte
    * shingle hashes shuffle, never text (collisions ~n²/2^65, the q21
    * idiom). No self-join: ONE shingle-keyed aggregation collects each
    * shingle's source set (bounded by the source count, O(dozens)), and
    * unordered pairs are emitted by a pure array expression — per-shingle
    * cost is sources², never |docs|². */
  def sourceOverlap(df: DataFrame, textCol: String, srcCol: String,
                    n: Int = 5): DataFrame = {
    val sh = df
      .select(col(srcCol).as("__src"),
        TextAnalysis.tokens(col(textCol)).as("__tk"))
      .select(col("__src"),
        explode(TextAnalysis.shinglesOfTokens(col("__tk"), n)).as("__sg"))
      .select(col("__src"), xxhash64(col("__sg")).as("__h"))
      .distinct()
    // sorted source set per shingle → (a, b) pairs with a < b by position
    val pairs = flatten(transform(col("__ss"), (x, i) =>
      transform(slice(col("__ss"), i + lit(2),
          greatest(size(col("__ss")) - i - 1, lit(0))),
        y => struct(x.as("a"), y.as("b")))))
    sh.groupBy(col("__h"))
      .agg(sort_array(collect_set(col("__src"))).as("__ss"))
      .filter(size(col("__ss")) >= 2)
      .select(explode(pairs).as("__p"))
      .groupBy(col("__p.a").as("src_a"), col("__p.b").as("src_b"))
      .agg(count(lit(1)).as("shared_shingles"))
  }
}
