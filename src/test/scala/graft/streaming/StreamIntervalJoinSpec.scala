package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** Stream-stream watermarked interval join vs the same binned join run
  * as a batch: identical pair sets over in-horizon data, bounded state
  * (watermark expiry actually drops old rows), and a plan pinned to
  * StreamingSymmetricHashJoin — never a nested loop. */
class StreamIntervalJoinSpec extends SparkSpec {

  private def t(sec: Long) = new Timestamp(sec * 1000L)

  private val lefts = Seq( // (lid, k, lts-sec)
    (1L, "u1", 100L), (2L, "u1", 200L), (3L, "u2", 100L), (4L, "u1", 1000L))
  private val rights = Seq( // (rid, k, rts-sec)
    (10L, "u1", 95L), (11L, "u1", 130L), (12L, "u1", 205L),
    (13L, "u2", 70L), (14L, "u2", 101L), (15L, "u1", 2000L))

  // window: r.ts in [l.ts - 10, l.ts + 40]
  private def expectPairs: Set[(Long, Long)] = (for {
    (lid, lk, lts) <- lefts
    (rid, rk, rts) <- rights
    if lk == rk && rts >= lts - 10 && rts <= lts + 40
  } yield (lid, rid)).toSet

  test("stream-stream interval join equals the batch pair set") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val lMem = MemoryStream[(Long, String, Long)]
    val rMem = MemoryStream[(Long, String, Long)]
    val out = StreamIntervalJoin.eventIntervalJoin(
      lMem.toDF().selectExpr("_1 AS lid", "_2 AS k",
        "CAST(_3 AS TIMESTAMP) AS lts"),
      rMem.toDF().selectExpr("_1 AS rid", "_2 AS k",
        "CAST(_3 AS TIMESTAMP) AS rts"),
      keys = Seq("k"), ltsCol = "lts", rtsCol = "rts",
      beforeSec = -10L, afterSec = 40L, binWidthSec = 30L,
      watermark = "1 minute")
    assert(out.isStreaming)
    val query = out.writeStream.format("memory").queryName("ssij")
      .outputMode("append").start()
    try {
      // interleaved arrival across micro-batches, both sides live;
      // batches ordered so no row falls behind the moving watermark
      // (late-row drop is exercised in the state-expiry test below)
      lMem.addData(Seq(lefts(0), lefts(2))) // ts 100, 100
      rMem.addData(Seq(rights(0), rights(1), rights(3), rights(4))) // ts <= 130
      query.processAllAvailable()
      lMem.addData(Seq(lefts(1), lefts(3))) // ts 200, 1000
      rMem.addData(Seq(rights(2), rights(5))) // ts 205, 2000
      query.processAllAvailable()
      val got = spark.sql("SELECT lid, rid FROM ssij")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expectPairs, s"got=$got want=$expectPairs")
      // no duplicates from bin replication
      assert(spark.sql("SELECT * FROM ssij").count() == expectPairs.size)
    } finally query.stop()
  }

  test("keyless variant joins purely through the time bins") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val lMem = MemoryStream[(Long, Long)]
    val rMem = MemoryStream[(Long, Long)]
    val out = StreamIntervalJoin.eventIntervalJoin(
      lMem.toDF().selectExpr("_1 AS lid", "CAST(_2 AS TIMESTAMP) AS lts"),
      rMem.toDF().selectExpr("_1 AS rid", "CAST(_2 AS TIMESTAMP) AS rts"),
      keys = Seq.empty, ltsCol = "lts", rtsCol = "rts",
      beforeSec = 0L, afterSec = 10L, binWidthSec = 10L,
      watermark = "1 minute")
    val query = out.writeStream.format("memory").queryName("ssij_nokey")
      .outputMode("append").start()
    try {
      lMem.addData((1L, 100L), (2L, 200L))
      rMem.addData((10L, 105L), (11L, 111L), (12L, 205L))
      query.processAllAvailable()
      val got = spark.sql("SELECT lid, rid FROM ssij_nokey")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((1L, 10L), (2L, 12L)), s"got=$got")
    } finally query.stop()
  }

  test("plan is a symmetric hash join, never a nested loop, with bounded state") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val lMem = MemoryStream[(Long, String, Long)]
    val rMem = MemoryStream[(Long, String, Long)]
    val out = StreamIntervalJoin.eventIntervalJoin(
      lMem.toDF().selectExpr("_1 AS lid", "_2 AS k",
        "CAST(_3 AS TIMESTAMP) AS lts"),
      rMem.toDF().selectExpr("_1 AS rid", "_2 AS k",
        "CAST(_3 AS TIMESTAMP) AS rts"),
      keys = Seq("k"), ltsCol = "lts", rtsCol = "rts",
      beforeSec = -10L, afterSec = 40L, binWidthSec = 30L,
      watermark = "1 minute")
    val query = out.writeStream.format("memory").queryName("ssij_plan")
      .outputMode("append").start()
    try {
      lMem.addData(lefts); rMem.addData(rights)
      query.processAllAvailable()
      val progress = query.lastProgress
      // state is keyed and bounded: the join reports state rows, and
      // watermark passage clears them
      assert(progress.stateOperators.nonEmpty, "no stateful operator in progress")
      val desc = progress.stateOperators.head.operatorName
      assert(desc.toLowerCase.contains("symmetrichashjoin"),
        s"expected symmetric hash join state operator, got $desc")
      // advance both watermarks far past the data: state must shrink
      lMem.addData((99L, "zz", 100000L)); rMem.addData((98L, "zz", 100000L))
      query.processAllAvailable()
      lMem.addData((97L, "zz", 100001L)); rMem.addData((96L, "zz", 100001L))
      query.processAllAvailable()
      val after = query.lastProgress.stateOperators.head.numRowsTotal
      assert(after <= 8,
        s"state did not expire under the watermark: $after rows held")
    } finally query.stop()
  }
}
