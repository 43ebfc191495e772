package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}

import graft.operators.Sessionize

/** Streaming leg of gap-based sessionization — the SAME native
  * `session_window` expression [[graft.operators.Sessionize]] declares
  * for batch, run under Structured Streaming. That identity is the
  * whole design: one declarative session definition, two physical
  * executions, with batch-equivalence pinned by StreamSessionizeSpec.
  *
  * Semantics in append mode: a session row is emitted exactly once,
  * when the event-time watermark passes its close (`last_ts + gap`) —
  * which makes `session_end` literally "the time this row became
  * final". State is bounded the same way: an open session's state
  * lives only until the watermark crosses its current end, so the
  * per-key state footprint is one in-progress session per active key,
  * independent of stream length. Late events inside the watermark
  * re-open/extend a session (the merge the native operator handles);
  * events later than the watermark are dropped, the standard
  * append-mode contract.
  */
object StreamSessionize {

  def sessions(events: DataFrame, keyCols: Seq[String], tsCol: String,
               gapSec: Long, watermark: String,
               extraAggs: Seq[Column] = Nil): DataFrame =
    Sessionize.sessions(events.withWatermark(tsCol, watermark),
      keyCols, tsCol, gapSec, extraAggs)
}
