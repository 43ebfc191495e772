package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.IntMath

/** Watermarked STREAM-STREAM interval join — the join shape Spark's
  * own machinery is hardest to hold right at scale: two live event
  * streams pairing on a time window (`r.ts ∈ [l.ts+before, l.ts+after]`)
  * with optional key equality, in append mode with bounded state.
  *
  * Two scale obligations meet here:
  *
  *   1. NEVER a nested loop. A bare time-range predicate (no equi
  *      condition) would leave Spark without a hash key — the batch
  *      planner falls to BroadcastNestedLoopJoin and streaming rejects
  *      it outright. The binned-replication trick the batch
  *      [[graft.operators.RangeJoin]] uses provides the equi key: the
  *      RIGHT row hashes to its single time bin, the LEFT row
  *      replicates to every bin its window overlaps
  *      (ceil(window/binWidth)+1 rows), and (keys..., bin) carries the
  *      join through StreamingSymmetricHashJoin. A pair can only meet
  *      in the right row's bin, so no post-join distinct is needed.
  *
  *   2. BOUNDED state. Both sides carry event-time watermarks and the
  *      join keeps the time-range predicate in native TIMESTAMP ±
  *      INTERVAL form — the shape Spark's
  *      StreamingJoinHelper.extractStateValueWatermark recognizes — so
  *      each side's state expires as the opposite watermark passes it.
  *      The range predicate re-checked as the join residual keeps the
  *      result exactly the binned batch join's.
  *
  * Returns left.* then right.* minus the join keys; both timestamp
  * column names must differ. `beforeSec` may be negative (a window
  * reaching back), `beforeSec <= afterSec`. `binWidthSec` near the
  * typical window length keeps replication low (the batch cost model).
  */
object StreamIntervalJoin {

  def eventIntervalJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                        ltsCol: String, rtsCol: String,
                        beforeSec: Long, afterSec: Long, binWidthSec: Long,
                        watermark: String): DataFrame = {
    require(ltsCol != rtsCol,
      s"left and right timestamp column names must differ (both '$ltsCol')")
    require(beforeSec <= afterSec,
      s"window is empty: beforeSec=$beforeSec > afterSec=$afterSec")
    require(binWidthSec >= 1, s"binWidthSec must be >= 1, got $binWidthSec")
    def bin(c: Column) = IntMath.floordiv(c, binWidthSec)
    val lb = left.withWatermark(ltsCol, watermark)
      .withColumn("__bin", explode(sequence(
        bin(col(ltsCol).cast("long") + lit(beforeSec)),
        bin(col(ltsCol).cast("long") + lit(afterSec)))))
    val rb = right.withWatermark(rtsCol, watermark)
      .withColumn("__bin", bin(col(rtsCol).cast("long")))
    // native INTERVAL arithmetic, not epoch casts: the state-cleanup
    // analyzer only extracts time bounds from timestamp ± interval
    val lo = lb(ltsCol) + expr(s"INTERVAL '$beforeSec' SECOND")
    val hi = lb(ltsCol) + expr(s"INTERVAL '$afterSec' SECOND")
    val cond = (keys.map(k => lb(k) === rb(k)) :+ (lb("__bin") === rb("__bin")))
      .reduce(_ && _) && rb(rtsCol) >= lo && rb(rtsCol) <= hi
    val joined = lb.join(rb, cond)
    (keys.map(rb(_)) :+ rb("__bin")).foldLeft(joined)((d, c) => d.drop(c))
      .drop("__bin")
  }
}
