package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ordered funnel over tumbling event-time windows — the
  * stream-side of [[graft.operators.Funnel]].
  *
  * Exactness strategy: an ordered funnel is NOT incrementally
  * computable under out-of-order arrival (a late-arriving earlier
  * 'view' can legalize a 'click' that was already rejected), so the
  * leg does what every exact streaming aggregation of this class does:
  * buffer the (user, window)'s step events in state — BOUNDED by
  * window length × per-user step-event rate — and run the exact batch
  * chain once, when the watermark passes the window end (event-time
  * timeout). One result row per (user, window), emitted exactly once;
  * late events beyond the watermark drop, the standard append-mode
  * contract. StreamFunnelSpec pins stream == batch chain on
  * out-of-order and cross-micro-batch arrivals.
  */
object StreamFunnel {

  final case class FEvent(user: Long, win: Long, step: Int, tsMs: Long,
                          ts: Timestamp)
  final case class FBuf(items: List[(Int, Long)])
  final case class FunnelRow(user_id: Long, window_start: Timestamp,
                             steps_reached: Int)

  /** The exact batch chain over one buffered (user, window): earliest
    * step-0 time, then earliest strictly-after time per later step. */
  private[streaming] def chain(items: Seq[(Int, Long)], nSteps: Int): Int = {
    var reached = 0
    var prev = Long.MinValue
    var i = 0
    var continue = true
    while (i < nSteps && continue) {
      val cand = items.iterator
        .filter { case (s, t) => s == i && (i == 0 || t > prev) }
        .map(_._2)
      if (cand.isEmpty) continue = false
      else { prev = cand.min; reached += 1 }
      i += 1
    }
    reached
  }

  def windowed(events: DataFrame, userCol: String, tsCol: String,
               typeCol: String, steps: Seq[String], windowSec: Long,
               watermark: String): Dataset[FunnelRow] = {
    require(steps.nonEmpty && windowSec >= 1)
    val spark = events.sparkSession
    import spark.implicits._
    val winMs = windowSec * 1000L
    val nSteps = steps.size
    // column ops only (an object-level map would strip the watermark
    // tag from the event-time column)
    val stepExpr = steps.zipWithIndex.foldLeft(lit(-1)) {
      case (acc, (s, i)) => when(col(typeCol) === s, lit(i)).otherwise(acc)
    }
    val src = events
      .withWatermark(tsCol, watermark)
      .filter(col(typeCol).isin(steps: _*))
      .select(col(userCol).cast("long").as("user"),
        graft.functions.IntMath.floordiv(unix_millis(col(tsCol)), winMs)
          .as("win"),
        stepExpr.as("step"),
        unix_millis(col(tsCol)).as("tsMs"),
        col(tsCol).as("ts"))
      .as[FEvent]
    src.groupByKey(e => (e.user, e.win))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(
        (key: (Long, Long), it: Iterator[FEvent], state: GroupState[FBuf]) => {
          val wm = state.getCurrentWatermarkMs()
          if (state.hasTimedOut) {
            val items = state.getOption.map(_.items).getOrElse(Nil)
            state.remove()
            Iterator.single(FunnelRow(key._1,
              new Timestamp(key._2 * winMs), chain(items, nSteps)))
          } else {
            val fresh = it.filter(_.tsMs >= wm).map(e => (e.step, e.tsMs)).toList
            val items = state.getOption.map(_.items).getOrElse(Nil) ++ fresh
            if (items.nonEmpty) {
              state.update(FBuf(items))
              // fire once the watermark passes the window end — CLAMPED
              // above the current watermark: under continuous arrival a
              // straggler for an expired window passes Spark's late
              // filter (which lags one batch behind the eviction
              // watermark, SPARK-42376) and reaches this branch; an
              // unclamped re-arm below the watermark throws in
              // GroupStateImpl and kills the query (the
              // StreamAttribution crash class)
              state.setTimeoutTimestamp(
                math.max((key._2 + 1L) * winMs, wm + 1L))
            }
            Iterator.empty
          }
        })
  }
}
