package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.SparkSpec

/** MEASURED state bounds (r14, VERDICT item 4): the streaming legs
  * document their state-store footprint ("one pending row per
  * unmatched key", "one open session per active key", "one bucket row
  * per touched band value — never per document"); these tests read
  * `StreamingQueryProgress.stateOperators.numRowsTotal` under
  * multi-batch feeds and assert the documented bound as a number, not
  * a design claim. */
class StreamStateBoundsSpec extends SparkSpec {

  private def t(sec: Long) = new Timestamp(sec * 1000L)

  /** Poll lastProgress until the summed state-store row count satisfies
    * `want` (the async listener bus is avoided on purpose — lastProgress
    * is written synchronously by the stream-execution thread). Returns
    * the maximum row count OBSERVED while waiting, so callers can also
    * assert the bound was never exceeded in between. */
  private def awaitState(q: StreamingQuery, deadlineSec: Int = 90)
                        (want: Long => Boolean): Long = {
    val deadline = System.nanoTime() + deadlineSec * 1000000000L
    var maxSeen = -1L
    var last = -1L
    while (System.nanoTime() < deadline) {
      q.exception.foreach(e => throw e)
      val p = q.lastProgress
      if (p != null && p.stateOperators.nonEmpty) {
        last = p.stateOperators.map(_.numRowsTotal).sum
        maxSeen = math.max(maxSeen, last)
        if (want(last)) return maxSeen
      }
      Thread.sleep(50)
    }
    fail(s"state row count never satisfied the bound; last=$last max=$maxSeen")
  }

  test("LatencyMatcher state rows == live unmatched keys, 0 after matching") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[LatencyMatcher.MatchEvent]
    val out = LatencyMatcher.samples(spark, mem.toDS(), ttlMs = 600000L)
    val query = out.writeStream.format("memory").queryName("sb_match")
      .outputMode("append").start()
    try {
      // 20 unmatched queries on 20 distinct keys -> exactly 20 state rows
      mem.addData((1 to 20).map(i => LatencyMatcher.MatchEvent(
        "ns1", "10.0.0.1", 1000 + i, i, 1000000L * i, isResponse = false)))
      awaitState(query)(_ == 20L)
      // their 20 responses: every match consumes its row -> 0 state rows
      mem.addData((1 to 20).map(i => LatencyMatcher.MatchEvent(
        "ns1", "10.0.0.1", 1000 + i, i, 1000000L * i + 500000L,
        isResponse = true)))
      val maxSeen = awaitState(query)(_ == 0L)
      assert(maxSeen <= 20L, s"state exceeded the unmatched-key bound: $maxSeen")
      val n = spark.sql("SELECT * FROM sb_match").count()
      assert(n == 20L)
    } finally query.stop()
  }

  test("StreamSessionize state scales with open sessions, not events") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(String, Long, String)]
    val out = StreamSessionize.sessions(
      mem.toDF().selectExpr("_1 AS user", "CAST(_2 AS TIMESTAMP) AS ts",
        "_3 AS etype"),
      Seq("user"), "ts", gapSec = 100, watermark = "10 seconds")
    val query = out.writeStream.format("memory").queryName("sb_sess")
      .outputMode("append").start()
    try {
      // 30 events, 3 users, each one open session (10s apart, gap 100s)
      mem.addData((0 until 30).map(i => (s"u${i % 3}", 10L + 10L * i, "view")))
      query.processAllAvailable()
      val p1 = query.lastProgress.stateOperators.map(_.numRowsTotal).sum
      // 30 more events EXTENDING the same 3 sessions: state must not grow
      mem.addData((0 until 30).map(i => (s"u${i % 3}", 320L + 10L * i, "view")))
      query.processAllAvailable()
      val p2 = query.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(p1 >= 3L && p1 <= 6L,
        s"open-session state should be session-sized (3 sessions), got $p1")
      assert(p2 <= p1,
        s"state grew with events while sessions stayed open: $p1 -> $p2")
      // watermark far past every session end: all sessions close + purge
      mem.addData(("wm", 100000L, "view"))
      query.processAllAvailable()
      mem.addData(("wm2", 200000L, "view"))
      query.processAllAvailable()
      val closed = spark.sql("SELECT * FROM sb_sess").count()
      assert(closed >= 3L)
      val pEnd = query.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(pEnd <= 2L, // at most the wm rows' own open sessions
        s"closed sessions were not purged from the state store: $pEnd")
    } finally query.stop()
  }

  test("StreamScd2 state rows == keys, never versions (history length)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[StreamScd2.ChangeIn]
    val out = StreamScd2.intervals(mem.toDF(), "key", "ts", "attrs",
      watermark = "10 seconds")
    val query = out.writeStream.format("memory").queryName("sb_scd2")
      .outputMode("append").start()
    try {
      // 200 versions over 4 keys, attrs changing — hundreds of closed
      // intervals emit, but per key the state is ONE row (open run +
      // in-horizon buffer live INSIDE it): 4 rows, not 200
      mem.addData((0 until 200).map(i => StreamScd2.ChangeIn(
        i % 4, t(10 + i), s"a${i % 3}")))
      query.processAllAvailable()
      awaitState(query)(_ == 4L)
      // 200 MORE versions on the same keys: churn must not grow state
      mem.addData((0 until 200).map(i => StreamScd2.ChangeIn(
        i % 4, t(400 + i), s"b${i % 3}")))
      query.processAllAvailable()
      val maxSeen = awaitState(query)(_ == 4L)
      assert(maxSeen <= 4L,
        s"SCD2 state grew past the key count under version churn: $maxSeen")
      assert(spark.sql("SELECT * FROM sb_scd2").count() >= 100L,
        "the closed-interval stream stalled while state stayed bounded")
    } finally query.stop()
  }

  test("StreamFunnel state rows == open (user, window) groups, purged " +
    "when the watermark fires them") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String)]
    val out = StreamFunnel.windowed(
      mem.toDF().selectExpr("_1 AS user", "CAST(_2 AS TIMESTAMP) AS ts",
        "_3 AS etype"),
      "user", "ts", "etype", steps = Seq("view", "click"),
      windowSec = 100, watermark = "10 seconds")
    val query = out.writeStream.format("memory").queryName("sb_funnel")
      .outputMode("append").start()
    try {
      // 60 step events from 3 users, all inside window 0: state is 3
      // buffered groups — per (user, window), never per event
      mem.addData((0 until 60).map(i =>
        (i % 3L, i.toLong, if (i % 2 == 0) "view" else "click")))
      query.processAllAvailable()
      val maxSeen = awaitState(query)(_ == 3L)
      assert(maxSeen <= 3L,
        s"funnel state exceeded the open-group bound: $maxSeen")
      // watermark far past the window end: the 3 groups fire (one exact
      // funnel row each) and PURGE; only the watermark-driver events'
      // own fresh groups may remain
      mem.addData((99L, 100000L, "view"))
      query.processAllAvailable()
      mem.addData((98L, 200000L, "view"))
      query.processAllAvailable()
      awaitState(query)(_ <= 2L)
      val fired = spark.sql(
        "SELECT * FROM sb_funnel WHERE user_id < 3").count()
      assert(fired == 3L, s"expected 3 fired funnel rows, got $fired")
    } finally query.stop()
  }

  // StreamIndex is NOT listed here by design: it keeps no state store
  // (foreachBatch writes additive delta directories; the bounded
  // quantity is the directory count, which StreamIndexSpec measures
  // around compactDeltas).

  test("StreamMediaDedup state rows == touched buckets, never per doc") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Timestamp)]
    val out = StreamMediaDedup.hammingPairs63(
      mem.toDF().toDF("doc_id", "fp", "ts"),
      "doc_id", "fp", "ts", watermark = "10 seconds", maxHamming = 2,
      bucketCap = 8)
    val query = out.writeStream.format("memory").queryName("sb_media")
      .outputMode("append").start()
    try {
      // 50 docs with the SAME fingerprint: 3 band buckets total — the
      // cap bounds per-bucket entries (8) + ghosts (32); state ROWS stay
      // 3 regardless of doc count
      val fp = 0x123456789ABL
      mem.addData((1L to 50L).map(i => (i, fp, t(20 + i))))
      query.processAllAvailable()
      val maxSeen = awaitState(query)(_ == 3L)
      assert(maxSeen <= 3L, s"bucket state exceeded 3 band rows: $maxSeen")
      // watermark far past the horizon: the 3 old buckets expire; the
      // closer doc's own fingerprint occupies exactly 3 fresh buckets
      mem.addData((999L, 0x7F0F0F0F0F0F0FL, t(100000)))
      query.processAllAvailable()
      mem.addData((998L, 0x70AA55AA55AA55L, t(200000))) // no band shared
      query.processAllAvailable()
      awaitState(query)(_ <= 6L)
      // first 8 docs pair fully (8 choose 2 = 28); overflow docs emitted
      // pairs against the 8 stored before ghosting: exactly cap pairs
      val pairs = spark.sql("SELECT * FROM sb_media").count()
      assert(pairs == 28L + 42L * 8L,
        s"pair emission under cap overflow drifted: $pairs")
    } finally query.stop()
  }
}
