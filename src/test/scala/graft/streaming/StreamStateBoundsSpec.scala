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

  test("StreamAttribution state rows == users with a live touch, " +
    "expired once the watermark passes the lookback horizon") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String, Double, Long)]
    val out = StreamAttribution.lastTouch(
      mem.toDF().selectExpr("_1 AS user", "_2 AS id", "_3 AS etype",
        "_4 AS value", "CAST(_5 AS TIMESTAMP) AS ts"),
      "user", "ts", "id", "value", "etype",
      convType = "purchase", touchTypes = Seq("ad"),
      lookbackUs = 60L * 1000000L, watermark = "10 seconds")
    val query = out.writeStream.format("memory").queryName("sb_attr")
      .outputMode("append").start()
    try {
      // 100 touches over 10 users: ONE max-(ts,id) triple per user
      mem.addData((0 until 100).map(i =>
        (i % 10L, i.toLong, "ad", 0.0, 10L + i)))
      query.processAllAvailable()
      val maxSeen = awaitState(query)(_ == 10L)
      assert(maxSeen <= 10L,
        s"attribution state exceeded the active-user bound: $maxSeen")
      // 10 conversions inside the lookback: credits emit, state stays 10
      mem.addData((0 until 10).map(i =>
        (i.toLong, 1000L + i, "purchase", 5.0, 115L)))
      query.processAllAvailable()
      awaitState(query)(_ == 10L)
      assert(spark.sql(
        "SELECT * FROM sb_attr WHERE channel = 'ad'").count() == 10L)
      // watermark far past every touch's lookback horizon: expired
      // state drops; the driver conversion itself stores no touch
      mem.addData((999L, 9999L, "purchase", 1.0, 100000L))
      query.processAllAvailable()
      mem.addData((998L, 9998L, "purchase", 1.0, 200000L))
      query.processAllAvailable()
      awaitState(query)(_ == 0L)
    } finally query.stop()
  }

  test("StreamTransitions state rows == distinct users (the documented " +
    "per-user chain-head floor), flat under event churn") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String, Long)]
    val out = StreamTransitions.pairs(
      mem.toDF().selectExpr("_1 AS user", "_2 AS id", "_3 AS etype",
        "CAST(_4 AS TIMESTAMP) AS ts"),
      "user", "ts", "id", "etype", watermark = "10 seconds")
    val query = out.writeStream.format("memory").queryName("sb_trans")
      .outputMode("append").start()
    try {
      // 200 events over 5 users -> 5 chain heads, not 200 rows
      mem.addData((0 until 200).map(i =>
        (i % 5L, i.toLong, if (i % 2 == 0) "a" else "b", 10L + i)))
      query.processAllAvailable()
      val maxSeen = awaitState(query)(_ == 5L)
      assert(maxSeen <= 5L,
        s"transition state exceeded the chain-head bound: $maxSeen")
      // 200 MORE events on the same users: churn must not grow state
      mem.addData((0 until 200).map(i =>
        (i % 5L, 1000L + i, if (i % 3 == 0) "a" else "c", 300L + i)))
      query.processAllAvailable()
      awaitState(query)(_ == 5L)
      // 40 events per user per wave: 39 pairs each in wave 1, 40 in
      // wave 2 (the chain head survives across batches)
      assert(spark.sql("SELECT * FROM sb_trans").count() === 395L)
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
