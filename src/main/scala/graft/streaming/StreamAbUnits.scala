package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming experiment-unit finalization — the stream side of
  * [[graft.operators.Profile.abWelchCard]]: the Welch card needs each
  * UNIT's final metric total (the per-user Σcents that gets squared
  * into Σx²), so per-unit totals cannot aggregate additively across
  * micro-batches the way plain counts do — a unit must CLOSE before it
  * contributes. This leg keys state by (metric, unit), accumulates the
  * integer-cent total online, and emits one final `AbUnit` row when the
  * watermark passes the unit's last activity by `quietSec` (event-time
  * timeout) — append-once, after which the batch-side sufficient-stats
  * aggregation (n, Σx, Σx² per arm) IS additive and the card serves
  * incrementally.
  *
  * Equivalence contract (StreamAbUnitsSpec pins it): emitted units
  * equal the batch per-unit totals exactly when each unit's whole
  * activity span fits inside one quiet horizon (an experiment-scoped
  * horizon: pick quietSec past the exposure window). A unit
  * re-activating AFTER its emission would emit a second partial row —
  * the documented horizon contract, same shape as sessionization's gap
  * assumption. Late rows below the watermark drop (watermark law);
  * same-id redelivery within the horizon is dropped against a
  * watermark-pruned id ledger.
  *
  * State per (metric, unit): one running long + the ≤ (rate ×
  * quietSec) recent-id ledger; cleared at emission. */
object StreamAbUnits {

  final case class AbKey(metric: String, unit: Long)
  final case class AbIn(metric: String, unit: Long, id: Long, tsUs: Long,
                        ts: java.sql.Timestamp, cents: Long)
  final case class AbState(cents: Long, lastTsUs: Long,
                           seen: List[(Long, Long)])
  final case class AbUnit(metric: String, unit: Long, cents: Long)

  /** Finalize per-(metric, unit) integer-cent totals from
    * `(metricCol, unitCol, idCol, tsCol, valueCol)` rows; append-mode
    * one `AbUnit` per closed unit. */
  def finalizedUnits(stream: DataFrame, metricCol: String, unitCol: String,
                     idCol: String, tsCol: String, valueCol: String,
                     quietSec: Long, watermark: String): Dataset[AbUnit] = {
    require(quietSec >= 1, s"quietSec must be positive, got $quietSec")
    val spark = stream.sparkSession
    import spark.implicits._
    val quietUs = quietSec * 1000000L
    val prepared = stream
      .withWatermark(tsCol, watermark)
      .select(col(metricCol).cast("string").as("metric"),
        col(unitCol).cast("long").as("unit"),
        col(idCol).cast("long").as("id"),
        unix_micros(col(tsCol)).as("tsUs"),
        col(tsCol).as("ts"),
        // value → cents HERE, one deterministic floor per row, so the
        // state holds integers only (the batch operator's lane)
        floor(col(valueCol) * lit(100.0)).cast("long").as("cents"))
      .as[AbIn]
    prepared
      .groupByKey(r => AbKey(r.metric, r.unit))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: AbKey, rows: Iterator[AbIn],
         state: GroupState[AbState]) => {
          val wmMs = state.getCurrentWatermarkMs()
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator.single(AbUnit(key.metric, key.unit, st.cents))
          } else {
            val st = state.getOption.getOrElse(AbState(0L, -1L, Nil))
            var seen = st.seen.filter(_._2 + quietUs >= wmMs * 1000L)
            var cents = st.cents
            var lastTs = st.lastTsUs
            rows.toSeq.sortBy(r => (r.tsUs, r.id)).foreach { r =>
              if (r.ts.getTime >= wmMs && !seen.exists(_._1 == r.id)) {
                seen = (r.id, r.tsUs) :: seen
                cents += r.cents
                if (r.tsUs > lastTs) lastTs = r.tsUs
              }
            }
            if (lastTs >= 0L) {
              state.update(AbState(cents, lastTs, seen))
              // re-arm clamped above the watermark (the StreamAttribution
              // crash class: a quiet horizon already below the watermark
              // must still fire, not throw)
              state.setTimeoutTimestamp(
                math.max(lastTs / 1000L + quietSec * 1000L + 1L, wmMs + 1L))
            } else if (state.exists) {
              // nothing accepted this batch but prior state exists —
              // unreachable in practice (prior state implies lastTs >= 0),
              // kept as the defensive arm of the invariant below
              state.update(AbState(cents, lastTs, seen))
            }
            // else: every delivered row was late (below the watermark)
            // for a key with NO prior state — writing state here would
            // create a zombie entry no timeout ever clears (lastTs = -1
            // arms nothing), an unbounded leak under recurring
            // late-only keys; accept nothing, store nothing
            Iterator.empty
          }
        })
  }

  /** The serving-side Welch sufficient statistics over finalized units
    * — additive by construction (closed units only append), so the
    * batch [[graft.operators.Profile.abWelchCard]] decision arithmetic
    * runs unchanged on the accumulated frame. */
  def sufficientStats(units: DataFrame, armOf: org.apache.spark.sql.Column): DataFrame =
    units
      .withColumn("__xd", col("cents").cast("decimal(38,0)"))
      .groupBy(col("metric"), armOf.as("arm"))
      .agg(count(lit(1)).as("n"),
        sum(col("__xd")).as("sx"),
        sum(expr("__xd * __xd")).as("sxx"))
}
