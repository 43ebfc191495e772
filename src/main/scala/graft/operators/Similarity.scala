package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Similarity search over an ARRAY<FLOAT> embedding column.
  *
  * Scale design:
  *   - brute-force top-k: probes broadcast, one streaming pass over the
  *     corpus, per-probe top-k — the exact baseline. Corpus never shuffles.
  *   - LSH-bucketed ANN: corpus and probes partitioned by a sign-bit
  *     bucket; candidate generation is an equi-join on the bucket, so at
  *     100 TB each executor only scores its bucket's slice (recall traded
  *     for a |corpus|/|bucket| cost cut, standard hyperplane-LSH).
  */
object Similarity {

  /** Exact top-k neighbors of each probe by cosine similarity. */
  def knnBruteForce(corpus: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    val scored = corpus
      .crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        VectorFunctions.cosine_similarity(col("pe"), col("embedding")).as("cosine"))
    val w = Window.partitionBy(col("probe_id")).orderBy(desc("cosine"), asc("vec_id"))
    scored.withColumn("rn", row_number().over(w).cast("long")).filter(col("rn") <= k)
  }

  /** Approximate top-k: candidates restricted to the probe's LSH bucket. */
  def annLshBucketed(corpus: DataFrame, probes: DataFrame, k: Int,
                     bits: Int = 6): DataFrame = {
    val cb = corpus.withColumn("bucket",
      VectorFunctions.signBucket(col("embedding"), bits))
    val pb = probes.withColumn("pbucket",
      VectorFunctions.signBucket(col("pe"), bits))
    val scored = cb
      .join(broadcast(pb), col("bucket") === col("pbucket") &&
        col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        VectorFunctions.cosine_similarity(col("pe"), col("embedding")).as("cosine"))
    val w = Window.partitionBy(col("probe_id")).orderBy(desc("cosine"), asc("vec_id"))
    scored.withColumn("rn", row_number().over(w).cast("long")).filter(col("rn") <= k)
  }

  /** IVF-style ANN: the corpus is partitioned into cells by nearest
    * centroid, and each probe scores only its own cell — the coarse
    * quantizer of a classic IVF index. Centroids here are a deterministic
    * sample (the first `nCells` corpus vectors); a real pipeline would
    * k-means them, but the assignment/search machinery — broadcast
    * centroids, one narrow argmax pass per side, cell-equi-join — is
    * identical, and at 100 TB each executor scores |corpus|/nCells. */
  def annIvf(corpus: DataFrame, probes: DataFrame, k: Int,
             nCells: Int = 8): DataFrame = {
    val cents = corpus.filter(col("vec_id") < nCells)
      .select(col("vec_id").as("cell"), col("embedding").as("ce"))
    def assign(df: DataFrame, id: String, emb: String): DataFrame = {
      val w = Window.partitionBy(col(id)).orderBy(desc("ccos"), asc("cell"))
      df.crossJoin(broadcast(cents))
        .withColumn("ccos", VectorFunctions.cosine_similarity(col(emb), col("ce")))
        .withColumn("crn", row_number().over(w))
        .filter(col("crn") === 1)
        .drop("ce", "ccos", "crn")
    }
    val ca = assign(corpus, "vec_id", "embedding")
    val pa = assign(probes, "probe_id", "pe").withColumnRenamed("cell", "pcell")
    val scored = ca
      .join(broadcast(pa), col("cell") === col("pcell") &&
        col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        VectorFunctions.cosine_similarity(col("pe"), col("embedding")).as("cosine"))
    val w = Window.partitionBy(col("probe_id")).orderBy(desc("cosine"), asc("vec_id"))
    scored.withColumn("rn", row_number().over(w).cast("long")).filter(col("rn") <= k)
  }

  /** Embedding-cosine near-duplicate pairs (brute force, i<j).
    *
    * TEST-ONLY recall oracle: a pure inequality join plans as a
    * nested-loop/cartesian — O(n²) at any scale. Production dedup goes
    * through [[embeddingCosinePairsBucketed]]; this form exists so tests
    * can measure that path's recall on small corpora. */
  def embeddingCosinePairs(corpus: DataFrame, threshold: Double): DataFrame = {
    val b = corpus.select(col("vec_id").as("vec_b"), col("embedding").as("eb"))
    corpus.join(b, col("vec_id") < col("vec_b"))
      .select(col("vec_id").as("vec_a"), col("vec_b"),
        VectorFunctions.cosine_similarity(col("embedding"), col("eb")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Embedding-cosine near-duplicate pairs, sign-bucket blocked — the
    * scale path. Both sides are keyed by the hyperplane-LSH bucket of
    * [[graft.functions.VectorFunctions.signBucket]], so candidate
    * generation is an equi-join: only vectors in the same bucket ever
    * pair, and each of the 2^bits buckets is an independent shuffle
    * partition. Cost drops from O(n²) to O(sum of bucket²) — with the
    * recall trade that a pair split across buckets (some leading
    * dimension flips sign) is missed; high-cosine pairs rarely are,
    * and [[embeddingCosinePairs]] measures exactly that recall in tests.
    * `bits` tunes the cost/recall trade: +1 bit halves expected bucket
    * size (quartering pair-generation work) and lowers recall. */
  def embeddingCosinePairsBucketed(corpus: DataFrame, threshold: Double,
                                   bits: Int = 6): DataFrame = {
    val a = corpus.select(col("vec_id"), col("embedding"),
      VectorFunctions.signBucket(col("embedding"), bits).as("bucket"))
    val b = a.select(col("vec_id").as("vec_b"), col("embedding").as("eb"),
      col("bucket").as("bucket_b"))
    a.join(b, col("bucket") === col("bucket_b") && col("vec_id") < col("vec_b"))
      .select(col("vec_id").as("vec_a"), col("vec_b"),
        VectorFunctions.cosine_similarity(col("embedding"), col("eb")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
