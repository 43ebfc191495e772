package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Profile

case class AbEvt(event_id: Long, user_id: Long, ts: Timestamp,
                 event_type: String, value: Double)

/** Streamed per-unit finalization equals the batch per-unit totals, and
  * the Welch card computed from finalized units equals the batch card —
  * the additivity the closed-unit emission exists to buy. */
class StreamAbUnitsSpec extends SparkSpec {

  private def t(s: Long) = new Timestamp(s * 1000L)

  private val events = Seq(
    AbEvt(1L, 1L, t(10), "m", 1.00),
    AbEvt(2L, 1L, t(20), "m", 2.50),
    AbEvt(3L, 2L, t(15), "m", 4.00),
    AbEvt(4L, 3L, t(30), "m", 1.25),
    AbEvt(5L, 4L, t(12), "m", 3.75),
    AbEvt(6L, 2L, t(40), "x", 2.00))

  // quiet horizon 60 s; two far-future pusher batches advance the
  // watermark past every horizon so all units close and emit
  private def flushers(n: Long) = Seq(
    Seq(AbEvt(90L + n, 999L, t(5000 + n * 100), "wm", 0.0)))

  private def runStream(batches: Seq[Seq[AbEvt]]): Map[(String, Long), Long] = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[AbEvt]
    val out = StreamAbUnits.finalizedUnits(mem.toDF(), "event_type",
      "user_id", "event_id", "ts", "value", quietSec = 60L,
      watermark = "5 seconds")
    val query = out.writeStream.format("memory").queryName("ab_units")
      .outputMode("append").start()
    try {
      (batches ++ flushers(1) ++ flushers(2)).foreach { b =>
        mem.addData(b: _*); query.processAllAvailable()
      }
    } finally query.stop()
    spark.table("ab_units")
      .filter(col("metric") =!= "wm")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
  }

  private def batchTotals: Map[(String, Long), Long] = {
    import spark.implicits._
    events.toDF()
      .groupBy(col("event_type"), col("user_id"))
      .agg(sum(floor(col("value") * 100).cast("long")).as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
  }

  test("late-only rows for an unknown key leave NO state behind " +
    "(zombie guard: a lastTs=-1 entry would never time out)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[AbEvt]
    val out = StreamAbUnits.finalizedUnits(mem.toDF(), "event_type",
      "user_id", "event_id", "ts", "value", quietSec = 60L,
      watermark = "5 seconds")
    val query = out.writeStream.format("memory").queryName("ab_zombie")
      .outputMode("append").start()
    try {
      // batch 1 pushes the watermark to ~4995 s
      mem.addData(AbEvt(1L, 999L, t(5000), "wm", 0.0))
      query.processAllAvailable()
      // batch 2: a NEW key whose only row is far below the watermark —
      // it must be dropped without creating state
      mem.addData(AbEvt(2L, 50L, t(10), "m", 1.0))
      query.processAllAvailable()
      val stateRows = query.lastProgress.stateOperators.head.numRowsTotal
      assert(stateRows === 1L, // the wm key only; 2 would be the zombie
        s"expected only the watermark key's state, got $stateRows rows")
    } finally query.stop()
    // and the late key never emits a unit
    assert(spark.table("ab_zombie")
      .filter(col("metric") === "m").count() === 0L)
  }

  test("one batch: finalized units equal the batch per-unit totals") {
    assert(runStream(Seq(events)) == batchTotals)
  }

  test("a unit spanning micro-batches inside its horizon closes once, " +
    "with the full total") {
    val (a, b) = events.partition(_.ts.getTime <= 15000L)
    assert(runStream(Seq(a, b)) == batchTotals)
  }

  test("same-id redelivery within the horizon is dropped") {
    assert(runStream(Seq(events, Seq(events(1)))) == batchTotals)
  }

  test("Welch card over finalized units equals the batch card") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[AbEvt]
    val out = StreamAbUnits.finalizedUnits(mem.toDF(), "event_type",
      "user_id", "event_id", "ts", "value", quietSec = 60L,
      watermark = "5 seconds")
    val query = out.writeStream.format("memory").queryName("ab_units_card")
      .outputMode("append").start()
    try {
      (Seq(events) ++ flushers(1) ++ flushers(2)).foreach { b =>
        mem.addData(b: _*); query.processAllAvailable()
      }
    } finally query.stop()
    val units = spark.table("ab_units_card").filter(col("metric") =!= "wm")
    // units are already per-unit finals: the batch operator's per-unit
    // aggregation over them is the identity, so one code path serves both
    val fromStream = Profile.abWelchCard(units, "metric", "unit",
      pmod(col("unit"), lit(2)), col("cents"))
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    val fromBatch = Profile.abWelchCard(events.toDF(), "event_type",
      "user_id", pmod(col("user_id"), lit(2)),
      floor(col("value") * 100).cast("long"))
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(fromStream == fromBatch)
  }
}
