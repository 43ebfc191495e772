package graft.streaming

import java.util.concurrent.ConcurrentHashMap

/** Feedback-controlled sampling of the latency matcher (O5, reference
  * `isSample`/`tuneMask`, /root/reference/src/aggregator/aggregator.go:
  * 332-337,455-483): a row participates iff its DNS transaction id matches
  * a random reference value under a widening/narrowing bit mask.
  *
  * Control law (reference semantics, re-based for a scalable state store):
  * after each sample interval, if the interval produced more than
  * `maxSamplesPerInterval` matches the mask widens by one bit (halving the
  * sample rate); fewer than `minSamplesPerInterval` narrows it. The
  * reference additionally widens on state-map overflow — its map is
  * hard-capped at 8 in-flight entries; our state store is horizontally
  * scalable so that trigger is intentionally absent (documented divergence,
  * SURVEY §2.6 option 2).
  *
  * The driver updates the mask between micro-batches (foreachBatch runs on
  * the driver); executors read it through [[AdaptiveSampler.registry]] —
  * same-JVM visible in local mode. On a multi-node cluster the mask would
  * ride a per-batch config/broadcast refresh instead.
  */
final class AdaptiveSampler(seed: Long = System.nanoTime(),
                            minSamplesPerInterval: Long = 32,
                            maxSamplesPerInterval: Long = 256,
                            maxMaskBits: Int = 16) extends Serializable {
  private val matchValue: Int = new java.util.Random(seed).nextInt(1 << 16)
  @volatile private var maskBits: Int = 0

  def accepts(id: Int): Boolean = {
    val mask = (1 << maskBits) - 1
    (id & mask) == (matchValue & mask)
  }

  /** Driver-side feedback step, once per sample interval. */
  def observeInterval(samples: Long): Unit = {
    if (samples > maxSamplesPerInterval && maskBits < maxMaskBits) maskBits += 1
    else if (samples < minSamplesPerInterval && maskBits > 0) maskBits -= 1
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
