package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.MediaCodec

/** Streaming MULTIMODAL near-dup detection — the stream-side
  * counterpart of the q119 (image dHash) / q121 (audio fingerprint)
  * banded-hamming joins, in the watermark-bounded band-state shape of
  * [[StreamDedup]] / [[LatencyMatcher]]:
  *
  *   - arriving media decodes and fingerprints PARTITION-LOCALLY (the
  *     narrow [[graft.operators.MediaCodec.dHashes]] /
  *     [[graft.operators.MediaCodec.audioFingerprints]] maps — pixels
  *     and samples never shuffle, only (id, 8-byte fingerprint, ts));
  *   - each fingerprint explodes into the SAME 21-bit × 3 bands as the
  *     batch join ([[graft.operators.Dedup.hammingPairs63]]) and
  *     shuffles once on (band, bandValue) — the state-store key;
  *   - per band bucket, `flatMapGroupsWithState` holds the fingerprints
  *     seen within the watermark horizon and emits a pair the moment a
  *     new arrival lands within `maxHamming` of a held one. The
  *     canonical-band rule (emit only where every lower band differs)
  *     is recomputed from the two fingerprints, so a pair meeting in
  *     several bands still emits exactly once — identical to batch;
  *   - state per bucket is bounded by `bucketCap` entries (the
  *     [[LatencyMatcher]] collision-cap discipline: a pathological
  *     constant-fingerprint stream degrades by dropping candidates
  *     LOUDLY-documented here, never by unbounded state) and expires by
  *     event-time timeout once the watermark passes an entry.
  *
  * Batch equivalence: on any bounded prefix whose events all fit inside
  * the watermark horizon and whose buckets stay under `bucketCap`, the
  * emitted pair set equals the batch join's (StreamMediaDedupSpec pins
  * both modalities); late rows (ts below the current watermark) are
  * dropped without polluting state, exactly like every other stateful
  * operator here.
  *
  * Scale: state = (arrival rate × horizon) fingerprints × 3 bands, each
  * 24 bytes — executor state store (RocksDB on a cluster), partitioned
  * by bucket. Exact global image dedup over an unbounded stream is
  * unbounded state by definition; run the batch operators over at-rest
  * partitions for that.
  */
object StreamMediaDedup {

  final case class BandedFp(band: Int, bv: Long, doc_id: Long, fp: Long,
                            ts: Timestamp)
  final case class BucketEntry(doc_id: Long, fp: Long, tsMs: Long)
  /** Cap-overflow ghost: a doc_id whose pairs were emitted but whose
    * fingerprint could not be stored (bucket at cap) — remembered so a
    * REDELIVERY of that doc_id does not re-emit its pairs. Bounded at
    * 4× the entry cap (FIFO); a redelivery arriving after its ghost was
    * evicted re-emits — the bounded-state trade, documented. */
  final case class BucketGhost(doc_id: Long, tsMs: Long)
  final case class Bucket(entries: List[BucketEntry],
                          ghosts: List[BucketGhost] = Nil)
  final case class PairHit(doc_a: Long, doc_b: Long, hamming: Long)

  val Bands = 3
  val BandBits = 21

  private def bandOf(fp: Long, b: Int): Long =
    (fp >>> (BandBits * b)) & ((1L << BandBits) - 1)

  /** Event-time horizon of a Spark watermark string ("10 minutes") in
    * milliseconds — used for the state timeout that mirrors the
    * watermark's own expiry. */
  private[streaming] def horizonMs(watermark: String): Long = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(watermark))
    require(iv.months == 0, s"month-sized watermarks are not supported: $watermark")
    iv.days * 86400000L + iv.microseconds / 1000L
  }

  /** Streaming banded-hamming pairs over precomputed 63-bit
    * fingerprints `(idCol, fpCol, tsCol)` — the shared core of
    * [[imagePairs]] and [[audioPairs]]. Append-mode output
    * `(doc_a, doc_b, hamming)` with `doc_a < doc_b`. */
  def hammingPairs63(fps: DataFrame, idCol: String, fpCol: String,
                     tsCol: String, watermark: String, maxHamming: Int = 2,
                     bucketCap: Int = 64): Dataset[PairHit] = {
    require(maxHamming >= 0 && maxHamming <= 2,
      s"21-bit x 3 banding guarantees recall only for maxHamming <= 2 (got $maxHamming)")
    val spark = fps.sparkSession
    import spark.implicits._
    val horizon = horizonMs(watermark)
    val banded = fps
      .select(col(idCol).cast("long").as("doc_id"),
        col(fpCol).cast("long").as("fp"), col(tsCol).as("ts"))
      .withWatermark("ts", watermark)
      .select(col("doc_id"), col("fp"), col("ts"),
        posexplode(array((0 until Bands).map(b =>
          shiftright(col("fp"), BandBits * b)
            .bitwiseAND(lit((1L << BandBits) - 1))): _*)).as(Seq("band", "bv")))
      .select(col("band"), col("bv"), col("doc_id"), col("fp"), col("ts"))
      .as[BandedFp]
    banded
      .groupByKey(e => (e.band, e.bv))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: (Int, Long), events: Iterator[BandedFp], state: GroupState[Bucket]) => {
          val wmMs = state.getCurrentWatermarkMs()
          var entries = state.getOption.map(_.entries).getOrElse(Nil)
            .filter(_.tsMs + horizon >= wmMs)
          var ghosts = state.getOption.map(_.ghosts).getOrElse(Nil)
            .filter(_.tsMs + horizon >= wmMs)
          if (state.hasTimedOut && entries.isEmpty && ghosts.isEmpty) {
            state.remove()
            Iterator.empty
          } else {
            val out = List.newBuilder[PairHit]
            // deterministic replay order regardless of partition-internal
            // arrival order (the LatencyMatcher discipline)
            val ordered = events.toSeq.sortBy(e => (e.ts.getTime, e.doc_id))
            ordered.foreach { e =>
              // late rows drop (state untouched); a doc_id the bucket
              // already holds is a redelivery — its pairs were emitted
              // when it first arrived, so re-emitting would duplicate
              // output under at-least-once upstream delivery and break
              // the batch-join equivalence the scaladoc promises
              if (e.ts.getTime >= wmMs &&
                  !entries.exists(_.doc_id == e.doc_id) &&
                  !ghosts.exists(_.doc_id == e.doc_id)) {
                entries.foreach { s =>
                  val lowerDiffer = (0 until key._1).forall(j =>
                    bandOf(s.fp, j) != bandOf(e.fp, j))
                  if (lowerDiffer) {
                    val h = java.lang.Long.bitCount(s.fp ^ e.fp)
                    if (h <= maxHamming)
                      out += PairHit(math.min(s.doc_id, e.doc_id),
                        math.max(s.doc_id, e.doc_id), h.toLong)
                  }
                }
                if (entries.size < bucketCap)
                  entries = entries :+ BucketEntry(e.doc_id, e.fp, e.ts.getTime)
                else
                  // emitted but not stored: ghost it so a redelivery
                  // doesn't re-emit (the cap-overflow redelivery hole)
                  ghosts = (ghosts :+ BucketGhost(e.doc_id, e.ts.getTime))
                    .takeRight(4 * bucketCap)
              }
            }
            if (entries.isEmpty && ghosts.isEmpty) state.remove()
            else {
              state.update(Bucket(entries, ghosts))
              state.setTimeoutTimestamp(
                (entries.map(_.tsMs) ++ ghosts.map(_.tsMs)).max + horizon)
            }
            out.result().iterator
          }
        })
  }

  /** Streaming image near-dup: `(doc_id, media, ts)` rows carrying REAL
    * PNG bytes decode and dHash partition-locally (box-filter
    * standardization, q119's exact arithmetic), then pair through the
    * band state. Undecodable media drops, as in batch. */
  def imagePairs(media: DataFrame, watermark: String, maxHamming: Int = 2,
                 bucketCap: Int = 64): Dataset[PairHit] = {
    val spark = media.sparkSession
    import spark.implicits._
    val fps = media
      .select(col("doc_id").cast("long"), col("media"), col("ts"))
      .as[(Long, Array[Byte], Timestamp)]
      .mapPartitions(_.flatMap { case (id, bytes, ts) =>
        MediaCodec.decodePngPixels(bytes).map { case (w, h, px) =>
          (id, MediaCodec.dHash63(w, h, px), ts)
        }
      }).toDF("doc_id", "fp", "ts")
    hammingPairs63(fps, "doc_id", "fp", "ts", watermark, maxHamming, bucketCap)
  }

  /** Streaming audio near-dup: `(doc_id, media, ts)` rows carrying REAL
    * WAV bytes decode to PCM and fingerprint partition-locally (q120's
    * exact arithmetic), then pair through the band state. */
  def audioPairs(media: DataFrame, watermark: String, maxHamming: Int = 2,
                 bucketCap: Int = 64): Dataset[PairHit] = {
    val spark = media.sparkSession
    import spark.implicits._
    val fps = media
      .select(col("doc_id").cast("long"), col("media"), col("ts"))
      .as[(Long, Array[Byte], Timestamp)]
      .mapPartitions(_.flatMap { case (id, bytes, ts) =>
        MediaCodec.wavPcmSamples(bytes).map(s =>
          (id, MediaCodec.audioFingerprint(s), ts))
      }).toDF("doc_id", "fp", "ts")
    hammingPairs63(fps, "doc_id", "fp", "ts", watermark, maxHamming, bucketCap)
  }
}
