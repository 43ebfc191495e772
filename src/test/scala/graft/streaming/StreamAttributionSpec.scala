package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.AsOfMatch

case class MktEvt(event_id: Long, user_id: Long, ts: Timestamp,
                  event_type: String, value: Double)

/** Streaming credits aggregate to exactly the batch attribution card
  * under in-order delivery; conversions credit across micro-batches
  * from retained touch state; same-batch conversion redelivery emits
  * once. */
class StreamAttributionSpec extends SparkSpec {

  private def t(s: Long) = new Timestamp(s * 1000L)

  private val events = Seq(
    MktEvt(1L, 1L, t(10), "view", 0.0),
    MktEvt(2L, 1L, t(20), "click", 0.0),
    MktEvt(3L, 1L, t(25), "purchase", 2.0), // click credited
    MktEvt(4L, 2L, t(10), "view", 0.0),
    MktEvt(5L, 2L, t(200), "purchase", 3.0), // 190 s > 100 s: direct
    MktEvt(6L, 3L, t(50), "purchase", 5.0), // no touch: direct
    MktEvt(7L, 4L, t(40), "view", 0.0),
    MktEvt(8L, 4L, t(40), "purchase", 7.0)) // exact-ts view credited

  private def runStream(batches: Seq[Seq[MktEvt]]): Map[String, (Long, Long)] = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[MktEvt]
    val out = StreamAttribution.lastTouch(mem.toDF(), "user_id", "ts",
      "event_id", "value", "event_type", convType = "purchase",
      touchTypes = Seq("view", "click"), lookbackUs = 100L * 1000000L,
      watermark = "10 seconds")
    val query = out.writeStream.format("memory").queryName("attr_stream")
      .outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b: _*); query.processAllAvailable() }
    } finally query.stop()
    spark.table("attr_stream")
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_conv"), sum(col("cents")).as("cents"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
  }

  private val batchCard = {
    import spark.implicits._
    () => AsOfMatch.lastTouchAttribution(events.toDF(), "user_id", "ts",
      "event_id", "value", "event_type", convType = "purchase",
      touchTypes = Seq("view", "click"), lookbackUs = 100L * 1000000L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
  }

  test("one batch: credits aggregate to the batch card") {
    assert(runStream(Seq(events)) == batchCard())
  }

  test("touch state carries across micro-batches (in-order split)") {
    // user-sorted in-order split: all t<=40 rows first, late rows after
    val early = events.filter(_.ts.getTime <= 40000L)
    val late = events.filterNot(_.ts.getTime <= 40000L)
    assert(runStream(Seq(early, late)) == batchCard())
  }

  test("same-batch redelivered conversion emits once") {
    assert(runStream(Seq(events :+ events(2))) == batchCard())
  }

  test("conversion preempting an overdue timeout drops stale touch, no crash") {
    // batch 1 arms user 5's touch (horizon t=110s) and pushes the
    // watermark to 290s via another key; batch 2 delivers user 5's
    // conversion, which preempts the pending timeout (hasTimedOut is
    // false) — re-arming the t=110s timeout below the 290s watermark
    // would throw in GroupStateImpl, so the stale touch must drop
    // inline and the credit is 'direct'
    val out = runStream(Seq(
      Seq(MktEvt(20L, 5L, t(10), "view", 0.0),
        MktEvt(21L, 9L, t(300), "view", 0.0)),
      Seq(MktEvt(22L, 5L, t(295), "purchase", 2.0))))
    assert(out == Map("direct" -> ((1L, 200L))))
  }
}
