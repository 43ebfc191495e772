package graft.streaming

import java.util.concurrent.ConcurrentHashMap

/** Feedback-controlled sampling of the latency matcher (O5, reference
  * `isSample`/`tuneMask`, /root/reference/src/aggregator/aggregator.go:
  * 332-337,455-483): a row participates iff its DNS transaction id matches
  * a random reference value under a widening/narrowing bit mask.
  *
  * Control law (reference semantics, re-based for a scalable state store):
  * after each sample interval the mask widens by one bit (halving the
  * sample rate) when the interval produced more than
  * `maxSamplesPerInterval` matches OR the matcher's pending state exceeds
  * `maxPendingState` — the reference's overflow trigger
  * (`QueryResponseTimeSampleMapSizeExceeds`, aggregator.go:339-351,
  * 455-467): its map is hard-capped at 8 in-flight entries and insert
  * rejections force a widen even when the match rate is low. Our state
  * store is horizontally partitioned, so the analog pressure signal is
  * the streaming query's `stateOperators.numRowsTotal` (unmatched entries
  * awaiting a partner or the TTL purge), with a much larger bound. The
  * mask narrows only when there was NO state pressure this interval and
  * fewer than `minSamplesPerInterval` matches — exactly the reference's
  * `MapSizeExceeds == 0` guard.
  *
  * The driver updates the mask between micro-batches (foreachBatch runs on
  * the driver); executors read it through [[AdaptiveSampler.registry]] —
  * same-JVM visible in local mode. On a multi-node cluster the mask would
  * ride a per-batch config/broadcast refresh instead.
  */
final class AdaptiveSampler(seed: Long = System.nanoTime(),
                            minSamplesPerInterval: Long = 32,
                            maxSamplesPerInterval: Long = 256,
                            maxMaskBits: Int = 16,
                            maxPendingState: Long = 4096) extends Serializable {
  private val matchValue: Int = new java.util.Random(seed).nextInt(1 << 16)
  @volatile private var maskBits: Int = 0

  def accepts(id: Int): Boolean = {
    val mask = (1 << maskBits) - 1
    (id & mask) == (matchValue & mask)
  }

  /** Driver-side feedback step, once per sample interval.
    *
    * @param samples      matches produced in the interval
    * @param pendingState unmatched entries held by the matcher (id-churn
    *        pressure: queries that never met a response accumulate here
    *        until TTL; the overflow-widen bounds that growth between
    *        purges, aggregator.go:455-467)
    */
  def observeInterval(samples: Long, pendingState: Long = 0L): Unit = {
    val overflow = pendingState > maxPendingState
    if ((overflow || samples > maxSamplesPerInterval) && maskBits < maxMaskBits)
      maskBits += 1
    else if (!overflow && samples < minSamplesPerInterval && maskBits > 0)
      maskBits -= 1
  }

  def currentMaskBits: Int = maskBits
  def currentSampleRate: Double = 1.0 / (1L << maskBits)
}

object AdaptiveSampler {
  /** Executor-visible registry (local-mode shared JVM). */
  val registry = new ConcurrentHashMap[String, AdaptiveSampler]()

  /** An always-pass sampler (mask 0 matches every id). */
  def passthrough: AdaptiveSampler =
    new AdaptiveSampler(seed = 0, maxMaskBits = 0)
}
