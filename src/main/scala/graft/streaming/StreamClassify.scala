package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.operators.Classifier

/** Streaming quality-gate scoring — the frozen [[Classifier]] model
  * over the firehose: train batch-side on the labeled snapshot (the
  * multi-pass gradient loop needs an at-rest corpus; an unbounded
  * stream has no second pass), ship the weights (driver object or the
  * q178 parquet artifact via [[Classifier.readModel]]), and score every
  * arriving document with the same stateless typed map — no join, no
  * state store, no shuffle, so micro-batch slicing cannot change a
  * score. The [[StreamImportance]] split applied to the trained gate:
  * fit on the snapshot, gate the firehose. StreamClassifySpec pins
  * stream == batch scores on the same rows. */
object StreamClassify {

  /** Score an unbounded document stream with a frozen model. Output:
    * (idCol, p_micro, pred), append mode, stateless. */
  def score(stream: DataFrame, idCol: String, textCol: String,
            model: Classifier.LogRegModel): DataFrame =
    Classifier.scoreWith(stream, idCol, textCol, model)
}
