package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming deduplication for unbounded ingestion — the training-data
  * dedup operators' stream-side counterpart: exactly-once row identity
  * within a watermark-bounded horizon.
  *
  * `dropDuplicatesWithinWatermark` keys the state store by `idCols` and
  * expires entries once the watermark passes them, so state stays bounded
  * by (arrival rate × watermark) instead of growing with the stream. At
  * 100 TB/day of ingest this is the only dedup shape that survives: exact
  * global dedup over an unbounded stream is unbounded state by definition
  * (run the batch operators over at-rest partitions for that).
  */
object StreamDedup {

  /** Drop rows whose `idCols` were already seen within the watermark
    * horizon of `tsCol`. */
  def withinWatermark(df: DataFrame, idCols: Seq[String], tsCol: String,
                      watermark: String): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(idCols)
}
