package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  // -------------------------------------------------------------------
  // MinHash + LSH and SimHash — the sketch-based scale paths. Both build
  // on a 32-bit base hash chosen to be reproducible in any SQL dialect
  // (oracle parity): the first 8 hex chars of md5, read as an integer.
  // -------------------------------------------------------------------

  /** Dialect-portable 32-bit content hash. */
  def baseHash32(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 8), 16, 10).cast("long")

  /** Mersenne prime 2^31-1: universal-hash modulus small enough that
    * `a*h+b` stays inside 63 bits for 31-bit `a`, `h`. */
  val MinHashP: Long = 2147483647L

  /** Fixed universal-hash coefficients (a, b) — k = 12 permutations,
    * grouped into 4 bands of 3 for LSH banding. Deterministic so results
    * are stable under replay and reproducible by the oracle. */
  val MinHashCoeffs: Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(0x5eedL)
    Seq.fill(12)((rnd.nextInt(Int.MaxValue - 1).toLong + 1L,
                  rnd.nextInt(Int.MaxValue).toLong))
  }

  /** Near-duplicate pairs via MinHash signatures + banded LSH:
    * shingle → 32-bit hash → k permutation-min signature → band buckets →
    * candidate pairs where any band collides → exact Jaccard verify.
    *
    * Scale: the signature is one hash-aggregate over the inverted index
    * (k mins computed map-side), the bucket join only shuffles
    * (band, bandValue) keys, and the exact verify touches candidate pairs
    * only — never |docs|². This is the standard web-scale dedup shape
    * (the verify step bounds false positives from banding).
    */
  def minHashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, rowsPerBand: Int = 3,
                      threshold: Double = 0.3): DataFrame = {
    val sh = df
      .select(col(idCol).as("doc"), explode(TextAnalysis.shingles(col(textCol), n)).as("sg"))
      .distinct()
    val hashed = sh.select(col("doc"), (baseHash32(col("sg")) % MinHashP).as("h"))
    val mins = MinHashCoeffs.zipWithIndex.map { case ((a, b), i) =>
      min((col("h") * lit(a) + lit(b)) % lit(MinHashP)).as(s"m$i")
    }
    val sig = hashed.groupBy(col("doc")).agg(mins.head, mins.tail: _*)
    val nBands = MinHashCoeffs.length / rowsPerBand
    val bandCols = (0 until nBands).map { bIdx =>
      concat_ws(",",
        (0 until rowsPerBand).map(r => col(s"m${bIdx * rowsPerBand + r}")): _*)
    }
    val banded = sig
      .select(col("doc"), posexplode(array(bandCols: _*)).as(Seq("band", "bv")))
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      .distinct()
    // exact verify restricted to candidates (bounded by LSH recall)
    val sizes = sh.groupBy(col("doc")).agg(count(lit(1)).as("sz"))
    val inter = cand
      .join(sh.as("sa"), col("doc_a") === col("sa.doc"))
      .join(sh.as("sb"), col("doc_b") === col("sb.doc") && col("sa.sg") === col("sb.sg"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("c"))
    inter
      .join(sizes.as("za"), col("doc_a") === col("za.doc"))
      .join(sizes.as("zb"), col("doc_b") === col("zb.doc"))
      .select(col("doc_a"), col("doc_b"),
        (col("c") * lit(1.0) / (col("za.sz") + col("zb.sz") - col("c"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** 32-bit SimHash over distinct whitespace tokens: bit j of the
    * fingerprint is set when more token hashes have bit j set than clear.
    * One explode + one hash-aggregate (32 map-side sums); docs with no
    * tokens produce no fingerprint. */
  def simHash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df
      .select(col(idCol).as("doc_id"), explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .distinct()
      .select(col("doc_id"), baseHash32(col("tok")).as("h"))
    val sums = (0 until 32).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"s$j")
    }
    toks.groupBy(col("doc_id")).agg(sums.head, sums.tail: _*)
      .select(col("doc_id"),
        (0 until 32).map(j =>
          when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** Near-duplicate pairs by SimHash hamming distance, with byte-band
    * blocking: docs sharing any of the four 8-bit bands are candidates
    * (a fingerprint pair within hamming 3 always agrees on at least one
    * byte — pigeonhole), then the exact popcount filter runs on
    * candidates only. */
  def simHashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val s = simHash(df, idCol, textCol)
    val banded = s.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("simhash"), 8 * b).bitwiseAND(lit(255L))): _*))
        .as(Seq("band", "bv")))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.simhash").as("sim_a"), col("b.simhash").as("sim_b"))
      .distinct()
      .withColumn("hamming",
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }
}
