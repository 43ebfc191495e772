package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Retrieval

/** Streaming inverted-index maintenance — the freshness leg of the
  * q182 artifact: every micro-batch of NEW documents becomes one
  * additive index delta (postings/lengths appended, corpus stats
  * re-summed), written under its own batch directory via `foreachBatch`
  * — the [[StreamMerge]] pattern applied to the retrieval index. The
  * additive merge law is what makes the index streamable at all: a
  * delta never touches base files, and the serve-side
  * [[readMerged]] reconstructs the exact index a batch build over all
  * documents would produce (StreamIndexSpec pins it, including the
  * df/avgdl drift the new docs cause).
  *
  * CONTRACT: arriving doc_ids are NEW (the q61/q138 admission
  * discipline) — the same disjointness [[Retrieval.mergeParts]]
  * requires. */
object StreamIndex {

  /** Maintain `path` from a stream of documents. Each micro-batch
    * writes one delta index at `path/delta=<batchId>`. The checkpoint
    * is REQUIRED: batch ids must survive restarts, or a restarted
    * stream would begin again at batch 0 and mode("overwrite") would
    * silently replace an earlier run's delta with different documents.
    * With the checkpoint, a replayed batch id re-delivers the SAME
    * rows, so overwriting its own delta directory is the idempotent
    * recovery Structured Streaming's foreachBatch contract asks for. */
  def maintain(docs: DataFrame, idCol: String, textCol: String,
               path: String, checkpoint: String): StreamingQuery = {
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty)
          Retrieval.writeIndex(Retrieval.indexParts(batch, idCol, textCol),
            s"$path/delta=$batchId")
        ()
      }
      .start()
  }

  /** Serve-side: merge every delta under `path` into one index. The
    * per-delta parts stay tiny (one micro-batch each); a periodic
    * compaction would re-write them as one part via the same
    * writeIndex — the q169/Compaction discipline, not repeated here. */
  def readMerged(spark: SparkSession, path: String): Retrieval.IndexParts = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val deltas = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("delta="))
      .map(_.getPath.toString).sorted
    require(deltas.nonEmpty, s"no index deltas under $path")
    deltas.map(d => Retrieval.readIndex(spark, d))
      .reduce(Retrieval.mergeParts)
  }
}
