package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sinks.MergeInto

/** Streaming table maintenance — a CDC-shaped change stream applied to
  * the [[graft.sinks.MergeInto]] copy-on-write table via
  * `foreachBatch`: the standard "stream into a mutable table" pattern
  * (the sink Structured Streaming itself doesn't ship for plain
  * parquet). Each micro-batch becomes ONE merge — partition-pruned
  * rewrite cost proportional to the batch, exactly the property that
  * makes the batch operator streamable.
  *
  * Change rows carry the full table schema plus `op` ('upsert' |
  * 'delete') and a monotonically increasing `seq`. Within a batch the
  * LATEST `seq` per key wins (ties broken by the larger seq being the
  * later event; equal-seq duplicates are undefined input), and a
  * delete at the winning seq deletes. Across batches, ordering is
  * arrival order — the usual CDC contract. StreamMergeSpec pins the
  * final table equal to a sequential in-memory replay of the same ops,
  * including same-key churn inside one batch and across batches.
  */
object StreamMerge {

  def maintain(changes: DataFrame, path: String, keyCol: String,
               nParts: Int): StreamingQuery = {
    changes.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val w = Window.partitionBy(col(keyCol))
          .orderBy(col("seq").desc)
        // persist the deduped frame: the two isEmpty probes plus
        // mergeInto's own actions would otherwise recompute the
        // row_number window shuffle up to five times per trigger (the
        // StreamMediaAudit multi-action convention)
        val last = batch
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
          .persist()
        try {
          val ups = last.filter(col("op") === "upsert").drop("op", "seq")
          val dels = last.filter(col("op") === "delete").select(col(keyCol))
          if (!(ups.isEmpty && dels.isEmpty))
            MergeInto.mergeInto(batch.sparkSession, path, keyCol, nParts,
              ups, dels)
        } finally { last.unpersist(); () }
        ()
      }
      .start()
  }
}
