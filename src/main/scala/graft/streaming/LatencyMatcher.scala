package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The reference's symmetric, stateful query↔response matcher
  * (`AggregateResponseTimeSample`, /root/reference/src/aggregator/
  * aggregator.go:352-409), as a `flatMapGroupsWithState` operator — SURVEY
  * §2.6 "faithful option".
  *
  * Per join key `(identity, queryAddress, queryPort, id)` the state is the
  * first unmatched arrival's timestamp (the reference map stores only a
  * timestamp, not which side it came from — aggregator.go:367-371; the
  * quirks that follow from that are reproduced deliberately):
  *   - second arrival computes `delta = responseSide − querySide` in µs;
  *   - `delta < 0` ⇒ collision with a stale partner: discard the stored
  *     entry, store the new arrival (aggregator.go:383-388);
  *   - a match consumes the state (single-partner semantics);
  *   - unmatched entries are evicted by processing-time timeout
  *     (= `ResponseTimeAggregationInterval` purge, aggregator.go:510-515).
  *
  * Events inside a batch are processed in (time, isResponse) order so the
  * result is deterministic under replay regardless of partition-internal
  * arrival order.
  *
  * Scale: state is keyed and lives in the executor state store (RocksDB/
  * HDFS-backed on a cluster) — the shuffle on the match key is the only
  * exchange, and the reference's global 8-entry cap is replaced by
  * horizontal state partitioning + TTL (see AdaptiveSampler scaladoc).
  */
object LatencyMatcher {

  final case class MatchKey(identity: String, queryAddress: String,
                            queryPort: Int, id: Int)
  final case class MatchEvent(identity: String, queryAddress: String,
                              queryPort: Int, id: Int,
                              timeMicros: Long, isResponse: Boolean)
  final case class Pending(timeMicros: Long)
  /** One matched sample: the response side's event time + delta in µs. */
  final case class Sample(responseTime: Timestamp, identity: String,
                          deltaMicros: Long)

  def matchFunction(ttlMs: Long)(key: MatchKey, events: Iterator[MatchEvent],
                                 state: GroupState[Pending]): Iterator[Sample] = {
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      val out = Vector.newBuilder[Sample]
      var pending: Option[Pending] = state.getOption
      events.toVector.sortBy(e => (e.timeMicros, e.isResponse)).foreach { e =>
        pending match {
          case None => pending = Some(Pending(e.timeMicros))
          case Some(p) =>
            val delta =
              if (e.isResponse) e.timeMicros - p.timeMicros
              else p.timeMicros - e.timeMicros
            if (delta < 0) {
              pending = Some(Pending(e.timeMicros)) // collision: keep newer
            } else {
              val respMicros = if (e.isResponse) e.timeMicros else p.timeMicros
              out += Sample(tsFromMicros(respMicros), key.identity, delta)
              pending = None // match consumes the entry
            }
        }
      }
      pending match {
        case Some(p) =>
          state.update(p)
          state.setTimeoutDuration(ttlMs)
        case None => if (state.exists) state.remove()
      }
      out.result().iterator
    }
  }

  def tsFromMicros(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  def micros(t: Timestamp): Long = {
    val i = t.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  /** Wire the matcher over a stream of match events. */
  def samples(spark: SparkSession, events: Dataset[MatchEvent],
              ttlMs: Long): Dataset[Sample] = {
    implicit val keyEnc = Encoders.product[MatchKey]
    implicit val stEnc = Encoders.product[Pending]
    implicit val outEnc = Encoders.product[Sample]
    events
      .groupByKey(e => MatchKey(e.identity, e.queryAddress, e.queryPort, e.id))
      .flatMapGroupsWithState[Pending, Sample](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout)(
        matchFunction(ttlMs))
  }
}
