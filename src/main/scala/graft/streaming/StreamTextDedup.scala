package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.{Dedup, TextAnalysis}

/** Streaming TEXT near-dup detection (r19, VERDICT #8) — the stream-side
  * twin of the crawl funnel's MinHash-LSH stage (q26/q263,
  * [[graft.operators.Dedup.minHashLshPairs]]): the landing-directory
  * stream ([[StreamWarc.textRecords]] → [[StreamCurate]]) previously
  * only exact-deduped; this leg emits the same near-dup pairs the batch
  * funnel discovers, in the watermark-bounded band-state shape of
  * [[StreamMediaDedup]]:
  *
  *   - each arriving document computes its shingle-hash set and 12-min
    *   MinHash signature ROW-LOCALLY, with the exact batch expressions
  *     ([[TextAnalysis.tokens]] → [[TextAnalysis.shinglesOfTokens]] →
  *     [[Dedup.baseHash60]] → the [[Dedup.MinHashCoeffs]] permutation
  *     mins as `array_min` over the distinct hash array) — same
  *     tokenizer, same hashes, same coefficients, so stream and batch
  *     CANNOT drift; nothing shuffles until the band key;
  *   - the signature explodes into the same 4 bands of 3 rows
  *     (q26's banding) and shuffles once on (band, bandValue) — the
  *     state-store key;
  *   - per band bucket, `flatMapGroupsWithState` holds the documents
  *     seen within the watermark horizon (signature + sorted distinct
  *     shingle-hash set) and, when a new arrival lands in a held doc's
  *     bucket, runs the batch verify IN STATE: the size-ratio prune,
  *     then exact Jaccard over the two hash sets, emitting `(doc_a,
  *     doc_b, jaccard)` iff `jaccard >= threshold`. The canonical-band
  *     rule (emit only where every lower band differs, recomputed from
  *     the two signatures) makes a pair meeting in several bands emit
  *     exactly once — identical to the batch candidate-distinct;
  *   - state per bucket is bounded by `bucketCap` entries plus the
  *     ghost ledger (the [[StreamMediaDedup]] cap-overflow discipline)
  *     and expires by event-time timeout once the watermark passes.
  *
  * Batch equivalence: on any bounded prefix whose events fit inside the
  * watermark horizon and whose buckets stay under `bucketCap`, the
  * emitted pair set equals [[Dedup.minHashLshPairs]] over the same rows
  * (StreamTextDedupSpec pins it across arrival waves). Docs with fewer
  * than `n` tokens have no shingles and vanish from both sides.
  *
  * Scale: state = (arrival rate × horizon) docs × 4 bands, each
  * carrying its shingle-hash set — bounded per doc by the curation
  * gate's token ceiling (a 2 000-token doc is ~16 KB/band). Exact
  * global near-dup over an unbounded stream is unbounded state by
  * definition; the at-rest batch operators (q263) own that, this leg
  * owns the landing window.
  */
object StreamTextDedup {

  final case class BandedDoc(band: Int, bv: String, doc_id: Long,
                             sig: Array[Long], sh: Array[Long],
                             ts: Timestamp)
  final case class DocEntry(doc_id: Long, sig: Array[Long],
                            sh: Array[Long], tsMs: Long)
  final case class DocGhost(doc_id: Long, tsMs: Long)
  final case class Bucket(entries: List[DocEntry],
                          ghosts: List[DocGhost] = Nil)
  final case class TextPairHit(doc_a: Long, doc_b: Long, jaccard: Double)

  /** Intersection size of two SORTED long arrays — the exact-verify
    * merge, allocation-free. */
  private def intersectCount(a: Array[Long], b: Array[Long]): Long = {
    var i = 0; var j = 0; var c = 0L
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { c += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    c
  }

  /** Band slice equality of two signatures (rowsPerBand mins each). */
  private def bandEq(a: Array[Long], b: Array[Long], band: Int,
                     rowsPerBand: Int): Boolean = {
    var k = band * rowsPerBand
    val end = k + rowsPerBand
    while (k < end && a(k) == b(k)) k += 1
    k == end
  }

  /** Streaming MinHash-LSH near-dup pairs over `(idCol, textCol,
    * tsCol)` rows. Append-mode output `(doc_a, doc_b, jaccard)` with
    * `doc_a < doc_b`, `jaccard >= threshold` exact over distinct
    * shingle hashes — the batch verify's arithmetic. */
  def minHashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      tsCol: String, watermark: String, n: Int = 3,
                      rowsPerBand: Int = 3, threshold: Double = 0.3,
                      bucketCap: Int = 64): Dataset[TextPairHit] = {
    require(Dedup.MinHashCoeffs.length % rowsPerBand == 0,
      s"rowsPerBand=$rowsPerBand must divide k=${Dedup.MinHashCoeffs.length}")
    val spark = docs.sparkSession
    import spark.implicits._
    val horizon = StreamMediaDedup.horizonMs(watermark)
    val nBands = Dedup.MinHashCoeffs.length / rowsPerBand
    // row-local signature pipeline — the BATCH expressions verbatim
    val sigCols = Dedup.MinHashCoeffs.map { case (a, b) =>
      array_min(transform(col("sh"),
        h => (h % lit(Dedup.MinHashP) * lit(a) + lit(b)) %
          lit(Dedup.MinHashP)))
    }
    val bandCols = (0 until nBands).map { bIdx =>
      concat_ws(",", (0 until rowsPerBand).map(r =>
        element_at(col("sig"), bIdx * rowsPerBand + r + 1)): _*)
    }
    val banded = docs
      .select(col(idCol).cast("long").as("doc_id"),
        TextAnalysis.tokens(col(textCol)).as("tk"), col(tsCol).as("ts"))
      .withWatermark("ts", watermark)
      .select(col("doc_id"), col("ts"),
        array_sort(array_distinct(transform(
          TextAnalysis.shinglesOfTokens(col("tk"), n),
          s => Dedup.baseHash60(s)))).as("sh"))
      .filter(size(col("sh")) > 0) // < n tokens: no shingles, no pairs
      .withColumn("sig", array(sigCols: _*))
      .select(col("doc_id"), col("sig"), col("sh"), col("ts"),
        posexplode(array(bandCols: _*)).as(Seq("band", "bv")))
      .select(col("band"), col("bv"), col("doc_id"), col("sig"),
        col("sh"), col("ts"))
      .as[BandedDoc]
    banded
      .groupByKey(e => (e.band, e.bv))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: (Int, String), events: Iterator[BandedDoc],
         state: GroupState[Bucket]) => {
          val wmMs = state.getCurrentWatermarkMs()
          var entries = state.getOption.map(_.entries).getOrElse(Nil)
            .filter(_.tsMs + horizon >= wmMs)
          var ghosts = state.getOption.map(_.ghosts).getOrElse(Nil)
            .filter(_.tsMs + horizon >= wmMs)
          if (state.hasTimedOut && entries.isEmpty && ghosts.isEmpty) {
            state.remove()
            Iterator.empty
          } else {
            val out = List.newBuilder[TextPairHit]
            // deterministic replay order regardless of arrival order
            val ordered = events.toSeq.sortBy(e => (e.ts.getTime, e.doc_id))
            ordered.foreach { e =>
              if (e.ts.getTime >= wmMs &&
                  !entries.exists(_.doc_id == e.doc_id) &&
                  !ghosts.exists(_.doc_id == e.doc_id)) {
                entries.foreach { s =>
                  // canonical band: this bucket emits only when every
                  // lower band differs (a multi-band pair still emits
                  // exactly once — the batch candidate-distinct)
                  val lowerDiffer = (0 until key._1).forall(j =>
                    !bandEq(s.sig, e.sig, j, rowsPerBand))
                  if (lowerDiffer) {
                    val (sza, szb) = (s.sh.length.toLong, e.sh.length.toLong)
                    // size-ratio prune before the merge — the batch
                    // verify's bound: jaccard >= t ⇒ min >= t*max
                    if (math.min(sza, szb) >=
                        threshold * math.max(sza, szb)) {
                      val c = intersectCount(s.sh, e.sh)
                      val jac = c * 1.0 / (sza + szb - c)
                      if (jac >= threshold)
                        out += TextPairHit(math.min(s.doc_id, e.doc_id),
                          math.max(s.doc_id, e.doc_id), jac)
                    }
                  }
                }
                if (entries.size < bucketCap)
                  entries = entries :+ DocEntry(e.doc_id, e.sig, e.sh,
                    e.ts.getTime)
                else
                  ghosts = (ghosts :+ DocGhost(e.doc_id, e.ts.getTime))
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
}
