package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.MediaCodec

/** Streaming decode-audit ledger: every micro-batch of a media-bearing
  * stream runs the [[MediaCodec.audit]] aggregation alongside the real
  * sink write, folding its counts into the shared [[StatsReporter]]
  * counters — so the rows the decoders DROP (no parser accepted the
  * payload) surface in the periodic stats line instead of silently
  * vanishing, which is the audit's whole contract, carried from batch
  * into streaming.
  *
  * Shape: [[withLedger]] wraps a `foreachBatch` writer. The micro-batch
  * is persisted for the duration (the documented Spark pattern for
  * multiple actions inside foreachBatch), the audit aggregation runs
  * first — its result is at most one row per sniffable format plus
  * `corrupt`, a bounded collect by construction — and then the wrapped
  * writer runs unchanged. Audit cost is one map-side-combined pass over
  * data the batch already materialized; payload bytes never shuffle
  * (the 4-to-6-row hash aggregate is all that moves).
  */
object StreamMediaAudit {

  /** Wrap a foreachBatch writer with the per-batch audit ledger.
    * `batch` must carry (`idCol` LONG, `mediaCol` BINARY) columns. */
  def withLedger(counters: StatsReporter.Counters, idCol: String = "doc_id",
                 mediaCol: String = "media")
                (write: (DataFrame, Long) => Unit): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      batch.persist()
      try {
        val spark = batch.sparkSession
        import spark.implicits._
        val audit = MediaCodec.audit(
            batch.select(col(idCol).cast("long").as("doc_id"),
              col(mediaCol).as("media")).as[MediaCodec.MediaRow])
          .collect() // ≤ one row per format + "corrupt": bounded by design
        audit.foreach { r =>
          val nDocs = r.getLong(1)
          counters.mediaDocs.addAndGet(nDocs)
          if (r.getString(0) == "corrupt") counters.mediaCorrupt.addAndGet(nDocs)
        }
        write(batch, batchId)
      } finally { batch.unpersist(); () }
    }
}
