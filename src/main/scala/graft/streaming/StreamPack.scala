package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming concat-and-chunk packing — the online form of
  * [[graft.operators.Packing.concatChunks]]: as documents are ADMITTED
  * to a stream (one token stream per key, the q255 discipline), each
  * emits its chunk spans immediately, so the packing manifest stays
  * fresh batch-over-batch instead of being rebuilt from the whole
  * corpus.
  *
  * State per stream is ONE running token offset (8 bytes) — packing is
  * a prefix-sum, so nothing else is needed; the measured-bounds spec
  * pins `numRowsTotal == |streams|` under document churn. Admission
  * order IS packing order: within a batch documents sort by (doc_id),
  * and a document at-or-below the stream's high-water doc_id is a
  * redelivery/straggler and is NOT packed (packing it would repack
  * history — the StreamTransitions monotone-chain rule). A skip is
  * never silent (the WarcFiles/JsonlIngest counted-never-dropped
  * discipline): each skipped document emits one SENTINEL span with
  * `chunk_id = -1` (start/len zeroed), so a legitimately-new-but-late
  * document surfaces in the manifest as a quarantine row a monitor can
  * alert on; manifest consumers read `chunk_id >= 0`. Token-less
  * documents are excluded, the batch operator's own convention.
  * Equivalence (spec-pinned): under in-order admission the emitted
  * spans equal `Packing.concatChunks` over the accumulated corpus,
  * chunk for chunk. */
object StreamPack {

  final case class PackIn(stream: String, doc_id: Long, n_toks: Long)
  final case class PackState(nextOff: Long, lastId: Long)
  final case class Span(stream: String, chunk_id: Long, doc_id: Long,
                        start_in_chunk: Long, n_toks_in_chunk: Long)

  def chunkSpans(docs: DataFrame, streamCol: String, idCol: String,
                 lenCol: String, capacity: Long): Dataset[Span] = {
    require(capacity > 0, "capacity must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(streamCol).as("stream"),
        col(idCol).cast("long").as("doc_id"),
        col(lenCol).cast("long").as("n_toks"))
      .as[PackIn]
      .groupByKey(_.stream)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (stream: String, it: Iterator[PackIn],
         state: GroupState[PackState]) => {
          var st = state.getOption.getOrElse(PackState(0L, Long.MinValue))
          val out = List.newBuilder[Span]
          it.toSeq.sortBy(_.doc_id).foreach { d =>
            if (d.doc_id > st.lastId) {
              if (d.n_toks > 0L) {
                val start = st.nextOff
                var k = start / capacity
                val lastK = (start + d.n_toks - 1L) / capacity
                while (k <= lastK) {
                  out += Span(stream, k, d.doc_id,
                    math.max(start, k * capacity) - k * capacity,
                    math.min((k + 1L) * capacity, start + d.n_toks) -
                      math.max(k * capacity, start))
                  k += 1L
                }
                st = PackState(start + d.n_toks, d.doc_id)
              } else st = PackState(st.nextOff, d.doc_id)
            } else
              // redelivery/straggler: repacking history is worse, but a
              // silent drop is unobservable — emit the quarantine row
              out += Span(stream, -1L, d.doc_id, 0L, 0L)
          }
          // a stream with only skipped redeliveries and no prior state
          // stores nothing (the zombie-state guard)
          if (state.exists || st.lastId != Long.MinValue) state.update(st)
          out.result().iterator
        })
  }
}
