package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming last-touch attribution — the online form of
  * [[graft.operators.AsOfMatch.lastTouchAttribution]]: conversions are
  * credited AT EVENT TIME against the user's latest in-lookback touch,
  * so the marketing dashboard sees credit within a micro-batch of the
  * purchase instead of at the nightly batch join.
  *
  * State per user is ONE (channel, ts, id) triple — the max-(ts, id)
  * touch seen — plus nothing else: the as-of semantics need no ledger
  * because only the latest touch can ever win, and updates are
  * MONOTONE in (ts, id) so a within-watermark late touch from a later
  * micro-batch cannot overwrite a newer one. State expires once the
  * watermark passes the touch's lookback horizon (it can never win
  * another credit), bounding the store by active users. Equivalence contract (spec-pinned):
  * per-conversion credits aggregate to exactly the batch card when
  * events arrive in event-time order (same-timestamp tie groups
  * unsplit); the within-batch replay sorts (ts, touches-before-
  * conversions, id), the batch operator's exact tagged-union order.
  * Late rows drop against the watermark; a redelivered conversion
  * within one batch dedups by id (cross-batch conversion redelivery
  * needs an upstream [[StreamDedup]], the composition the scaladocs
  * of the other legs also assume). */
object StreamAttribution {

  final case class AttrIn(key: Long, id: Long, kind: Int, ch: String,
                          cents: Long, tsUs: Long, ts: Timestamp)
  final case class TouchState(ch: String, tsUs: Long, id: Long)
  final case class Credit(event_id: Long, key: Long, ts_us: Long,
                          channel: String, cents: Long)

  /** Per-conversion credit stream. `kind` ordering inside a timestamp
    * tie is touches (0) before conversions (1) — a touch at exactly
    * the conversion's timestamp is credited, like batch. */
  def lastTouch(events: DataFrame, userCol: String, tsCol: String,
                idCol: String, valueCol: String, typeCol: String,
                convType: String, touchTypes: Seq[String],
                lookbackUs: Long, watermark: String): Dataset[Credit] = {
    require(lookbackUs >= 1, s"lookbackUs must be positive, got $lookbackUs")
    require(touchTypes.nonEmpty, "need at least one touch type")
    val spark = events.sparkSession
    import spark.implicits._
    val prepared = events
      .withWatermark(tsCol, watermark)
      .filter(col(typeCol) === convType || col(typeCol).isin(touchTypes: _*))
      .select(col(userCol).cast("long").as("key"),
        col(idCol).cast("long").as("id"),
        when(col(typeCol) === convType, 1).otherwise(0).as("kind"),
        col(typeCol).as("ch"),
        floor(col(valueCol) * 100).cast("long").as("cents"),
        unix_micros(col(tsCol)).as("tsUs"),
        col(tsCol).as("ts"))
      .as[AttrIn]
    prepared
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: Long, events: Iterator[AttrIn], state: GroupState[TouchState]) => {
          val wmMs = state.getCurrentWatermarkMs()
          var touch = state.getOption
          val out = List.newBuilder[Credit]
          if (state.hasTimedOut) {
            // a touch the watermark has pushed past its lookback can
            // never win another credit — expired state drops, bounding
            // the store by ACTIVE users instead of all users ever seen
            state.remove()
          } else {
            val seenConv = scala.collection.mutable.Set.empty[Long]
            val ordered = events.toSeq
              .filter(_.ts.getTime >= wmMs)
              .sortBy(e => (e.tsUs, e.kind, e.id))
            ordered.foreach { e =>
              if (e.kind == 0) {
                // MONOTONE update: a within-watermark late touch from a
                // later micro-batch must not overwrite a newer one —
                // the batch winner is the max-(ts, id) touch, so only
                // that order advances state
                if (!touch.exists(t => t.tsUs > e.tsUs ||
                    (t.tsUs == e.tsUs && t.id >= e.id)))
                  touch = Some(TouchState(e.ch, e.tsUs, e.id))
              } else if (!seenConv.contains(e.id)) {
                seenConv += e.id
                val channel = touch match {
                  case Some(t) if t.tsUs <= e.tsUs &&
                    e.tsUs - t.tsUs <= lookbackUs => t.ch
                  case _ => "direct"
                }
                out += Credit(e.id, key, e.tsUs, channel, e.cents)
              }
            }
            touch match {
              case Some(t) =>
                val horizonMs = t.tsUs / 1000L + lookbackUs / 1000L + 1L
                if (horizonMs <= wmMs) {
                  // the stored touch is already past its lookback horizon
                  // (a batch can deliver a conversion for the key and
                  // preempt the pending timeout) — re-arming with a
                  // timestamp <= watermark would throw in GroupStateImpl,
                  // so drop the state inline: it can never win a credit
                  if (state.exists) state.remove()
                } else {
                  state.update(t)
                  state.setTimeoutTimestamp(horizonMs)
                }
              case None =>
            }
          }
          out.result().iterator
        })
  }
}
