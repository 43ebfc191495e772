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
  * State per user is ONE (last type, last id) pair. Equivalence
  * (spec-pinned): emitted pairs aggregate to exactly the batch
  * matrix's counts under in-order delivery; within a batch the replay
  * sorts (ts, id) — the batch lag's total order. Consecutive
  * redelivery of an event id within a batch emits once; cross-batch
  * redelivery composes with an upstream [[StreamDedup]] like the
  * other legs. */
object StreamTransitions {

  final case class TransIn(key: Long, id: Long, ch: String, tsUs: Long,
                           ts: Timestamp)
  final case class LastType(ch: String, id: Long)
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
            if (!last.exists(_.id == e.id)) { // same-batch redelivery
              last.foreach(l =>
                out += Transition(key, e.id, e.tsUs, l.ch, e.ch))
              last = Some(LastType(e.ch, e.id))
            }
          }
          last.foreach(state.update)
          out.result().iterator
        })
  }
}
