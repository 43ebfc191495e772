package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Funnel

case class TransEvt(event_id: Long, user_id: Long, ts: Timestamp,
                    event_type: String)

/** Streaming transition pairs aggregate to exactly the batch matrix's
  * counts; chains continue across micro-batches; consecutive
  * redelivery emits once. */
class StreamTransitionsSpec extends SparkSpec {

  private def t(s: Long) = new Timestamp(s * 1000L)

  private val events = Seq(
    TransEvt(1L, 1L, t(10), "a"), TransEvt(2L, 1L, t(20), "b"),
    TransEvt(3L, 1L, t(30), "a"), TransEvt(4L, 2L, t(10), "a"),
    TransEvt(5L, 2L, t(25), "c"), TransEvt(6L, 3L, t(40), "z"))

  private def runStream(batches: Seq[Seq[TransEvt]]): Map[(String, String), Long] = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[TransEvt]
    val out = StreamTransitions.pairs(mem.toDF(), "user_id", "ts",
      "event_id", "event_type", watermark = "10 seconds")
    val query = out.writeStream.format("memory").queryName("trans_stream")
      .outputMode("append").start()
    try {
      batches.foreach { b => mem.addData(b: _*); query.processAllAvailable() }
    } finally query.stop()
    spark.table("trans_stream")
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
  }

  private def batchCounts: Map[(String, String), Long] = {
    import spark.implicits._
    Funnel.transitionMatrix(events.toDF(), "user_id", "ts", "event_id",
      "event_type")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
  }

  test("one batch: pairs aggregate to the batch matrix counts") {
    assert(runStream(Seq(events)) == batchCounts)
  }

  test("chains continue across micro-batches") {
    val split = Seq(events.filter(_.ts.getTime <= 20000L),
      events.filterNot(_.ts.getTime <= 20000L))
    assert(runStream(split) == batchCounts)
  }

  test("consecutive same-batch redelivery emits once") {
    // sorted replay sees event 2 twice consecutively: its pair emits
    // once and the chain continues to event 3 unbroken
    val dup = Seq(events(0), events(1), events(1), events(2))
    assert(runStream(Seq(dup)) ==
      Map(("a", "b") -> 1L, ("b", "a") -> 1L))
  }
}
