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

  /** Embedding-cosine near-duplicate pairs (brute force, i<j). The scale
    * path blocks by [[graft.functions.VectorFunctions.signBucket]] first;
    * this exact variant is the recall oracle for it. */
  def embeddingCosinePairs(corpus: DataFrame, threshold: Double): DataFrame = {
    val b = corpus.select(col("vec_id").as("vec_b"), col("embedding").as("eb"))
    corpus.join(b, col("vec_id") < col("vec_b"))
      .select(col("vec_id").as("vec_a"), col("vec_b"),
        VectorFunctions.cosine_similarity(col("embedding"), col("eb")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}
