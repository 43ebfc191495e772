package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.operators.Dedup

/** The streaming MinHash-LSH text near-dup leg must emit exactly the
  * batch operator's pair set over every fed prefix — including pairs
  * whose two documents arrive in DIFFERENT waves — with bounded
  * per-bucket state (r19, VERDICT #8). */
class StreamTextDedupSpec extends SparkSpec {

  private val t0 = 1700000000000L
  private def ts(offSec: Int) = new Timestamp(t0 + offSec * 1000L)

  // near-dup families: high-overlap token streams (Jaccard of 3-shingle
  // sets >= 0.5 within a family, ~0 across families)
  private val famA = Seq(
    "alpha beta gamma delta epsilon zeta eta theta iota kappa",
    "alpha beta gamma delta epsilon zeta eta theta iota lambda",
    "alpha beta gamma delta epsilon zeta eta theta mu nu")
  private val famB = Seq(
    "one two three four five six seven eight nine ten",
    "one two three four five six seven eight nine eleven")
  private val lone = "completely different words nothing shared here at all"

  private def batchPairs(rows: Seq[(Long, String)],
                         threshold: Double): Set[(Long, Long, Double)] = {
    import spark.implicits._
    Dedup.minHashLshPairs(rows.toDF("doc_id", "text"), "doc_id", "text",
        n = 3, rowsPerBand = 3, threshold = threshold)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.rint(r.getDouble(2) * 1e9) / 1e9)).toSet
  }

  private def runStream(waves: Seq[Seq[(Long, String, Timestamp)]],
                        threshold: Double, bucketCap: Int = 64,
                        perWave: Set[(Long, Long, Double)] => Unit = _ => ())
  : Set[(Long, Long, Double)] = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val pairs = StreamTextDedup.minHashLshPairs(
      mem.toDF().toDF("doc_id", "text", "ts"), "doc_id", "text", "ts",
      watermark = "10 minutes", threshold = threshold,
      bucketCap = bucketCap)
    val query = pairs.writeStream.format("memory")
      .queryName("text_dedup_pairs").outputMode("append").start()
    try {
      waves.foreach { w =>
        mem.addData(w)
        query.processAllAvailable()
        perWave(collected())
      }
      collected()
    } finally query.stop()
  }

  private def collected(): Set[(Long, Long, Double)] =
    spark.table("text_dedup_pairs").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.rint(r.getDouble(2) * 1e9) / 1e9)).toSet

  test("stream == batch pair set across arrival waves, cross-wave pairs " +
    "included; jaccard values match the exact verify") {
    val docs = Seq(
      1L -> famA(0), 2L -> famA(1), 3L -> famB(0), 4L -> lone,
      5L -> famA(2), 6L -> famB(1), 7L -> famA(0))
    val byId = docs.toMap
    // wave 1: one member of each family; wave 2: their near-dups (the
    // cross-wave case); wave 3: an exact dup of doc 1 (jaccard 1.0)
    val waves = Seq(
      Seq((1L, byId(1L), ts(0)), (3L, byId(3L), ts(1)), (4L, byId(4L), ts(2))),
      Seq((2L, byId(2L), ts(30)), (5L, byId(5L), ts(31)), (6L, byId(6L), ts(32))),
      Seq((7L, byId(7L), ts(60))))
    val expectedFull = batchPairs(docs, threshold = 0.3)
    assert(expectedFull.nonEmpty, "fixture families produced no pairs")
    assert(expectedFull.exists(p => p._1 == 1L && p._2 == 7L && p._3 == 1.0),
      "exact-dup pair missing from the batch oracle")
    // cumulative prefix equality after every wave — the stream may
    // never emit a pair batch wouldn't, nor miss one it would
    var fed = Vector.empty[(Long, String)]
    val waveChecks = waves.iterator
    val got = runStream(waves, threshold = 0.3, perWave = { streamed =>
      fed = fed ++ waveChecks.next().map(w => (w._1, w._2))
      assert(streamed === batchPairs(fed, threshold = 0.3),
        s"prefix of ${fed.length} docs diverged from batch")
    })
    assert(got === expectedFull)
  }

  test("docs with fewer than n tokens vanish from both sides; disjoint " +
    "texts pair with nothing") {
    val docs = Seq(10L -> "one two", 11L -> "one two", 12L -> lone,
      13L -> famB(0))
    assert(batchPairs(docs, threshold = 0.3) === Set.empty)
    val got = runStream(
      Seq(docs.map { case (id, t) => (id, t, ts(id.toInt)) }),
      threshold = 0.3)
    assert(got === Set.empty)
  }

  test("bounded state: a pathological same-text flood under a tiny " +
    "bucketCap degrades by DROPPING candidates, never by growing state " +
    "or crashing; redeliveries of a held doc_id re-emit nothing") {
    val text = famA(0)
    val docs = (0 until 20).map(i => (100L + i, text, ts(i)))
    // redelivery of an already-held id inside a later wave
    val waves = Seq(docs.take(10), Seq((100L, text, ts(50))) ++ docs.drop(10))
    val got = runStream(waves, threshold = 0.3, bucketCap = 4)
    // cap 4 per bucket: each doc pairs with at most the 4 held entries
    // (all 20 are mutual near-dups — uncapped would emit 190 pairs)
    assert(got.nonEmpty, "capped bucket must still emit early pairs")
    assert(got.size < 190, s"cap did not bound emission: ${got.size}")
    assert(got.forall(_._3 === 1.0))
    // every emitted pair is a REAL batch pair (soundness under the cap:
    // candidates are dropped, never invented)
    val full = batchPairs(docs.map(d => (d._1, d._2)), threshold = 0.3)
    assert(got.subsetOf(full))
  }
}
