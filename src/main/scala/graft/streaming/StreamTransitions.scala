package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming Markov transition pairs — the online form of
  * [[graft.operators.Funnel.transitionMatrix]]'s adjacency extraction:
  * each event emits its (previous type → this type) pair at event
  * time, so the behavior matrix (an ADDITIVE count — any downstream
  * window/merge aggregation serves it, the StreamHist law) stays
  * fresh without replaying user histories.
  *
  * State per user is ONE (last type, ts, id) triple, advanced
  * MONOTONICALLY in (ts, id) — a redelivered or out-of-order event
  * at-or-before the chain head is skipped outright (emitting from it
  * would rewrite adjacency the batch lag already fixed). The triple
  * is kept across idle periods like RollingFeatures' lastTs (a chain
  * must survive a quiet user), which is the documented 24-byte-per-
  * user state floor. Equivalence (spec-pinned): emitted pairs
  * aggregate to exactly the batch matrix's counts under in-order
  * delivery; within a batch the replay sorts (ts, id) — the batch
  * lag's total order. */
object StreamTransitions {

  final case class TransIn(key: Long, id: Long, ch: String, tsUs: Long,
                           ts: Timestamp)
  final case class LastType(ch: String, tsUs: Long, id: Long)
  final case class Transition(key: Long, event_id: Long, ts_us: Long,
                              from_type: String, to_type: String)

  def pairs(events: DataFrame, userCol: String, tsCol: String,
            idCol: String, typeCol: String,
            watermark: String): Dataset[Transition] = {
    val spark = events.sparkSession
    import spark.implicits._
    val prepared = events
      .withWatermark(tsCol, watermark)
      .select(col(userCol).cast("long").as("key"),
        col(idCol).cast("long").as("id"),
        col(typeCol).as("ch"),
        unix_micros(col(tsCol)).as("tsUs"),
        col(tsCol).as("ts"))
      .as[TransIn]
    prepared
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: Long, events: Iterator[TransIn], state: GroupState[LastType]) => {
          val wmMs = state.getCurrentWatermarkMs()
          var last = state.getOption
          val out = List.newBuilder[Transition]
          val ordered = events.toSeq
            .filter(_.ts.getTime >= wmMs)
            .sortBy(e => (e.tsUs, e.id))
          ordered.foreach { e =>
            // MONOTONE chain: an event at-or-before the chain head is a
            // redelivery or out-of-order straggler — emitting from it
            // would rewrite history the batch lag already fixed; skip
            // it entirely (no emission, no state regression)
            if (!last.exists(l => l.tsUs > e.tsUs ||
                (l.tsUs == e.tsUs && l.id >= e.id))) {
              last.foreach(l =>
                out += Transition(key, e.id, e.tsUs, l.ch, e.ch))
              last = Some(LastType(e.ch, e.tsUs, e.id))
            }
          }
          last.foreach(state.update)
          out.result().iterator
        })
  }
}
