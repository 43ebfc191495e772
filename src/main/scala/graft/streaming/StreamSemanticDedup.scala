package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.operators.Similarity

/** Streaming admission control for embedding ingest: flag arriving
  * vectors whose cosine similarity to the STATIC reference corpus
  * exceeds a threshold — the micro-batch form of
  * [[graft.operators.Similarity.semanticDedupIncremental]] ("is this
  * new document semantically already in the training set?").
  *
  * Shape: a stream-static INNER join on the IVF cell — natively
  * supported by Structured Streaming in append mode, no watermark or
  * state store needed (the static side is re-broadcast per micro-batch
  * plan; each batch is an independent probe). Cell assignment must be a
  * scalar expression here: window functions are illegal on streaming
  * DataFrames, which is exactly why
  * [[graft.operators.Similarity.cellAssignExpr]] exists as a literal
  * argmax. Per micro-batch cost is |batch| x |corpus|/nCells cosine
  * evaluations, streamed over the corpus scan — the corpus never
  * shuffles, in batch or in streaming.
  */
object StreamSemanticDedup {

  /** Emit (stream columns..., dup_of, cosine) for every arriving vector
    * with a same-cell corpus neighbor at or above `threshold`. The
    * stream side must carry an `embedding ARRAY<FLOAT>` column; the
    * corpus side `(vec_id, embedding)`. */
  def probe(stream: DataFrame, corpus: DataFrame,
            cents: Array[(Long, Array[Float])], threshold: Double): DataFrame = {
    val ca = corpus
      .select(col("vec_id").as("dup_of"), col("embedding").as("__c_emb"))
      .withColumn("__c_cell", Similarity.cellAssignExpr(cents, col("__c_emb")))
    stream
      .withColumn("__cell", Similarity.cellAssignExpr(cents, col("embedding")))
      .join(ca, col("__cell") === col("__c_cell"))
      .withColumn("cosine",
        VectorFunctions.cosine_similarity(col("embedding"), col("__c_emb")))
      .filter(col("cosine") >= threshold)
      .drop("__c_emb", "__c_cell", "__cell")
  }
}
