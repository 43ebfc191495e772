package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Sessionize

/** The streaming session_window leg equals the batch sessionization on
  * the same data (append mode: every closed session emitted exactly
  * once), sessions merge across micro-batches, and in-watermark late
  * events extend an open session. */
class StreamSessionizeSpec extends SparkSpec {

  private def t(sec: Long) = new Timestamp(sec * 1000L)

  private val rows = Seq( // (user, ts-sec, etype)
    ("u1", 0L, "view"), ("u1", 50L, "click"), ("u1", 99L, "purchase"),
    ("u1", 199L, "view"), ("u2", 40L, "view"), ("u2", 400L, "click"))

  private def batchSessions = {
    import spark.implicits._
    Sessionize.sessions(
      rows.map { case (u, s, e) => (u, t(s), e) }.toDF("user", "ts", "etype"),
      Seq("user"), "ts", gapSec = 100,
      extraAggs = Seq(
        sum(when(col("etype") === "purchase", 1L).otherwise(0L)).as("n_conv")))
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getLong(4))).toSet
  }

  test("stream sessions == batch sessions, merged across micro-batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(String, Long, String)]
    val out = StreamSessionize.sessions(
      mem.toDF().selectExpr("_1 AS user", "CAST(_2 AS TIMESTAMP) AS ts",
        "_3 AS etype"),
      Seq("user"), "ts", gapSec = 100, watermark = "10 seconds",
      extraAggs = Seq(
        sum(when(col("etype") === "purchase", 1L).otherwise(0L)).as("n_conv")))
    assert(out.isStreaming)
    val query = out.writeStream.format("memory").queryName("ssess")
      .outputMode("append").start()
    try {
      // u1's first session is split across micro-batches: 0/50 arrive,
      // then 99 extends it before any close — the merge the native
      // operator must handle
      mem.addData(("u1", 0L, "view"), ("u1", 50L, "click"), ("u2", 40L, "view"))
      query.processAllAvailable()
      mem.addData(("u1", 99L, "purchase"), ("u1", 199L, "view"))
      query.processAllAvailable()
      // advance the watermark far past every session end to close all
      mem.addData(("u2", 400L, "click"), ("wm", 10000L, "view"))
      query.processAllAvailable()
      mem.addData(("wm2", 20000L, "view")) // one more batch: wm row's own close
      query.processAllAvailable()
      val got = spark.sql(
        "SELECT user, session_start, session_end, n_events, n_conv FROM ssess")
        .filter(!col("user").startsWith("wm"))
        .collect().map(r => (r.getString(0), r.getTimestamp(1),
          r.getTimestamp(2), r.getLong(3), r.getLong(4))).toSet
      assert(got == batchSessions, s"got=$got want=$batchSessions")
      // append-once: no duplicate emissions for any (user, start)
      val n = spark.sql("SELECT user, session_start FROM ssess").count()
      val d = spark.sql("SELECT DISTINCT user, session_start FROM ssess").count()
      assert(n == d, s"duplicate session emissions: $n rows vs $d distinct")
    } finally query.stop()
  }

  test("state is bounded: closed sessions leave the store") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val out = StreamSessionize.sessions(
      mem.toDF().selectExpr("_1 AS user", "CAST(_2 AS TIMESTAMP) AS ts"),
      Seq("user"), "ts", gapSec = 100, watermark = "10 seconds")
    val query = out.writeStream.format("memory").queryName("ssess_state")
      .outputMode("append").start()
    try {
      mem.addData(("a", 0L), ("b", 5L))
      query.processAllAvailable()
      mem.addData(("c", 1000L)) // watermark 990 closes a+b
      query.processAllAvailable()
      mem.addData(("d", 2000L)) // watermark 1990 closes c; d open
      query.processAllAvailable()
      val st = query.lastProgress.stateOperators.head
      assert(st.numRowsTotal <= 2,
        s"state kept closed sessions: ${st.numRowsTotal} rows")
    } finally query.stop()
  }
}
