package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.Importance

/** Streaming DSIR scoring — the stream-side counterpart of
  * [[Importance]]: the ratio table is trained ONCE batch-side (the
  * distributions need the at-rest corpora; an unbounded stream has no
  * "raw distribution" to aggregate), frozen, and applied to every
  * arriving document as the same stateless narrow fold — no join, no
  * state store, no shuffle. The production split every importance
  * sampler uses: train on the snapshot, score the firehose.
  * StreamImportanceSpec pins stream == batch scores on the same rows. */
object StreamImportance {

  /** Score an unbounded document stream with a frozen ratio table.
    * Output: (idCol, n_tokens, score), append mode, stateless. */
  def score(stream: DataFrame, idCol: String, textCol: String,
            table: Importance.RatioTable): DataFrame =
    Importance.scoreWith(stream, idCol, textCol, table)
}
