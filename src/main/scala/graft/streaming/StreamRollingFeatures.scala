package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming trailing-window features — the stream-side counterpart of
  * [[graft.operators.TimeSeries.rollingFeatures]], for the models that
  * consume these features ONLINE (fraud scores at event time, not at
  * end of day). Window functions cannot run on a stream; the trailing
  * RANGE frame becomes a per-key state ledger bounded by the window
  * width: every event joins the ledger, reads its frame (count /
  * cent-sum / max over entries within `windowSec`), and the watermark
  * evicts entries once no future in-time event can reach them
  * (entry.ts + window < watermark).
  *
  * Equivalence contract (StreamRollingFeaturesSpec pins it): output
  * equals the batch operator row-for-row when events arrive in event-
  * time order across micro-batches AND no same-timestamp tie group
  * splits across a batch boundary (peers must enter the ledger
  * together, or the earlier batch's row cannot see its later peer the
  * way a batch RANGE frame does). Under cross-batch REORDERING the
  * batch RANGE frame is retroactive (an early-timestamped late arrival
  * joins the frames of already-emitted later events) — a stream cannot
  * retro-update emitted rows, so the streaming answer is the
  * no-hindsight one; within a batch, ties and order are handled
  * exactly like batch ((ts, id)-sorted replay, tie peers share one
  * frame — the LatencyMatcher discipline). Duplicate event ids
  * re-delivered within the horizon are dropped against the ledger.
  *
  * State per key: the ≤ (rate × window) entry ledger, plus ONE long
  * (the last event time, kept after the ledger drains so the gap
  * feature stays exact across idle periods — 16 bytes per ever-seen
  * key is the price of batch-equal gaps). */
object StreamRollingFeatures {

  final case class LedgerEntry(id: Long, tsUs: Long, cents: Long)
  final case class RollState(entries: List[LedgerEntry], lastTs: Long)
  final case class RollIn(key: Long, id: Long, tsUs: Long, cents: Long,
                          ts: java.sql.Timestamp)
  final case class RollFeat(event_id: Long, key: Long, ts_us: Long,
                            n_win: Long, cents_win: Long,
                            max_cents_win: Long, gap_us: Long)

  /** Per-key trailing features over `(idCol, keyCol, tsCol, valueCol)`
    * rows; append-mode `RollFeat` output, one row per in-time event. */
  def perKey(stream: DataFrame, keyCol: String, idCol: String,
             tsCol: String, valueCol: String, windowSec: Long,
             watermark: String): Dataset[RollFeat] = {
    require(windowSec >= 1, s"windowSec must be positive, got $windowSec")
    val spark = stream.sparkSession
    import spark.implicits._
    val winUs = windowSec * 1000000L
    val prepared = stream
      .withWatermark(tsCol, watermark)
      .select(col(keyCol).cast("long").as("key"),
        col(idCol).cast("long").as("id"),
        unix_micros(col(tsCol)).as("tsUs"),
        floor(col(valueCol) * lit(100.0)).cast("long").as("cents"),
        col(tsCol).as("ts"))
      .as[RollIn]
    prepared
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: Long, events: Iterator[RollIn], state: GroupState[RollState]) => {
          val wmMs = state.getCurrentWatermarkMs()
          val st = state.getOption.getOrElse(RollState(Nil, -1L))
          var entries = st.entries.filter(_.tsUs + winUs >= wmMs * 1000L)
          var prevTs = st.lastTs
          val out = List.newBuilder[RollFeat]
          if (!state.hasTimedOut) {
            // deterministic replay order regardless of arrival order
            val ordered = events.toSeq
              .filter(_.ts.getTime >= wmMs) // late rows drop
              .sortBy(e => (e.tsUs, e.id))
            // tie groups enter the ledger TOGETHER before any of them
            // emits: RANGE-frame peers see each other both ways, which
            // is what makes the output tie-order-free like batch
            ordered.groupBy(_.tsUs).toSeq.sortBy(_._1).foreach {
              case (ts, group) =>
                val fresh = group
                  .filterNot(e => entries.exists(_.id == e.id))
                  .distinctBy(_.id) // same-batch redelivery
                entries = entries ++
                  fresh.map(e => LedgerEntry(e.id, e.tsUs, e.cents))
                fresh.sortBy(_.id).foreach { e =>
                  val frame = entries
                    .filter(x => x.tsUs <= ts && x.tsUs >= ts - winUs)
                  out += RollFeat(e.id, key, ts,
                    frame.size.toLong,
                    frame.map(_.cents).sum,
                    frame.map(_.cents).max,
                    if (prevTs == -1L) -1L else ts - prevTs)
                  prevTs = ts
                }
            }
          }
          // the ledger drains by watermark; lastTs stays so gaps across
          // idle periods match batch. But a key whose ONLY delivered rows
          // were late-filtered must not write state: RollState(Nil, -1)
          // arms no timeout and would live forever (the StreamAbUnits
          // zombie class)
          if (entries.nonEmpty || prevTs >= 0L || state.exists)
            state.update(RollState(entries, prevTs))
          if (entries.nonEmpty)
            state.setTimeoutTimestamp(math.max(
              entries.map(_.tsUs / 1000L).max + windowSec * 1000L + 1L,
              state.getCurrentWatermarkMs() + 1L))
          out.result().iterator
        })
  }
}
