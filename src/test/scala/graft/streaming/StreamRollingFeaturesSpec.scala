package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TimeSeries

case class RollEvt(event_id: Long, user_id: Long, ts: Timestamp,
                   value: Double)

/** Streaming trailing features == batch RANGE-frame features under
  * in-order delivery (the equivalence contract), plus the stream-only
  * behaviors: redelivery dedup and late-row drop. */
class StreamRollingFeaturesSpec extends SparkSpec {

  private def t(s: Long) = new Timestamp(s * 1000L)

  // timeline starts at t=10, NOT epoch 0: Spark's stateful-operator
  // late filter drops rows at exactly the initial watermark (0), which
  // no real pipeline hits but an epoch-0 test row would
  private val events = Seq(
    RollEvt(1L, 7L, t(10), 1.0),
    RollEvt(2L, 7L, t(1810), 2.5),
    RollEvt(3L, 7L, t(3610), 4.0), // exactly 3600 s after e1: inclusive
    RollEvt(4L, 7L, t(3610), 0.5), // tie with e3 — peers share the frame
    RollEvt(5L, 7L, t(7211), 8.0), // e3/e4 fall out (3601 s back)
    RollEvt(6L, 9L, t(110), 3.0)) // second key, isolated

  private def runStream(batches: Seq[Seq[RollEvt]]): Set[(Long, Long, Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[RollEvt]
    val out = StreamRollingFeatures.perKey(mem.toDF(), "user_id",
      "event_id", "ts", "value", windowSec = 3600L, watermark = "10 seconds")
    val query = out.writeStream.format("memory").queryName("roll_stream")
      .outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b: _*); query.processAllAvailable() }
    } finally query.stop()
    spark.table("roll_stream").collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
      r.getLong(6))).toSet
  }

  private def runBatch(evts: Seq[RollEvt]): Set[(Long, Long, Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    TimeSeries.rollingFeatures(evts.toDF(), "user_id", "ts", "event_id",
      "value", windowSec = 3600L)
      .select(col("event_id"), col("user_id").cast("long"), col("ts_us"),
        col("n_win"), col("cents_win"), col("max_cents_win"), col("gap_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSet
  }

  test("one batch == batch operator (ties, inclusive boundary, gaps)") {
    assert(runStream(Seq(events)) == runBatch(events))
  }

  test("late-only rows for an unknown key leave NO state behind " +
    "(zombie guard: RollState(Nil, -1) arms no timeout)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[RollEvt]
    val out = StreamRollingFeatures.perKey(mem.toDF(), "user_id",
      "event_id", "ts", "value", windowSec = 3600L, watermark = "10 seconds")
    val query = out.writeStream.format("memory").queryName("roll_zombie")
      .outputMode("append").start()
    try {
      // batch 1 pushes the watermark far ahead
      mem.addData(RollEvt(1L, 999L, t(50000), 1.0))
      query.processAllAvailable()
      // batch 2: a NEW key whose only row is far below the watermark
      mem.addData(RollEvt(2L, 50L, t(10), 1.0))
      query.processAllAvailable()
      val stateRows = query.lastProgress.stateOperators.head.numRowsTotal
      assert(stateRows === 1L,
        s"expected only the live key's state, got $stateRows rows")
    } finally query.stop()
    assert(spark.table("roll_zombie")
      .filter(col("key") === 50L).count() === 0L)
  }

  test("in-order delivery across micro-batches == batch operator") {
    // the split respects GLOBAL event-time order (e6 at t=110 goes in
    // batch 1) and does not divide a tie group — the two conditions of
    // the equivalence contract
    val batch1 = Seq(events(0), events(5), events(1))
    val batch2 = Seq(events(2), events(3), events(4))
    assert(runStream(Seq(batch1, batch2)) == runBatch(events))
  }

  test("redelivered event ids emit once") {
    val dup = events ++ Seq(events(2)) // e3 delivered twice in one batch
    val got = runStream(Seq(dup))
    assert(got == runBatch(events))
  }

  test("rows behind the watermark drop instead of corrupting frames") {
    // batch 1 advances the watermark to 7201 - 10 s; a very old row in
    // batch 2 must vanish (no output row, no ledger entry)
    val got = runStream(Seq(events, Seq(RollEvt(99L, 7L, t(10), 1.0))))
    assert(got == runBatch(events))
  }
}
