package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

case class Ev(ts: Timestamp, user: String, v: Long)

class EventWindowsSpec extends SparkSpec {

  private def t(min: Int) = new Timestamp(3600_000L + min * 60_000L)

  test("watermarked tumbling windows emit on close and drop late data") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val out = EventWindows.tumbling(mem.toDF(), "ts", Seq("user"),
      windowLen = "10 minutes", watermark = "5 minutes", sumCol = Some("v"))
    val query = out.writeStream.format("memory").queryName("ev_windows")
      .outputMode("append").start()
    try {
      // window [60,70): two events for alice, one for bob
      mem.addData(Ev(t(2), "alice", 10), Ev(t(4), "bob", 5), Ev(t(9), "alice", 1))
      query.processAllAvailable()
      // nothing emitted yet: watermark hasn't passed the window end
      assert(spark.sql("SELECT * FROM ev_windows").count() == 0)

      // advance event time far enough to close [60,70), then try a late row
      mem.addData(Ev(t(31), "carol", 7))
      query.processAllAvailable()
      mem.addData(Ev(t(3), "alice", 100)) // behind the watermark: dropped
      query.processAllAvailable()

      val rows = spark.sql(
        "SELECT user, n, sum_v FROM ev_windows WHERE w_start = timestamp'1970-01-01 01:00:00'")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(rows == Set(("alice", 2L, 11L), ("bob", 1L, 5L)))
    } finally query.stop()
  }

  test("windowed heavy hitters: foreachBatch rank over closed windows equals batch") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val events = (0 until 60).map { i =>
      Ev(t(i % 8), s"u${i % 5}", i.toLong) // window [60,70): skewed key counts
    } :+ Ev(t(31), "closer", 0L)           // advances watermark past the window
    val mem = MemoryStream[Ev]
    val counts = EventWindows.tumbling(mem.toDF(), "ts", Seq("user"),
      windowLen = "10 minutes", watermark = "5 minutes")
    val got = scala.collection.mutable.Set.empty[(String, Long, Long)]
    val query = counts.writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        EventWindows.rankWindows(batch, Seq("user"), k = 3)
          .collect().foreach(r => got.synchronized {
            got += ((r.getString(2), r.getLong(3), r.getLong(4)))
          })
        ()
      }.start()
    try {
      val (a, b) = events.splitAt(40)
      mem.addData(a); query.processAllAvailable()
      mem.addData(b); query.processAllAvailable()
    } finally query.stop()
    // batch reference: same rank over the batch tumbling counts
    val closed = EventWindows.tumbling(
      events.toDF().filter(org.apache.spark.sql.functions.col("ts") < t(10)),
      "ts", Seq("user"), "10 minutes", "5 minutes")
    val want = EventWindows.rankWindows(closed, Seq("user"), k = 3)
      .collect().map(r => (r.getString(2), r.getLong(3), r.getLong(4))).toSet
    assert(want.nonEmpty && got.toSet == want,
      s"stream/batch divergence: got=$got want=$want")
  }

  test("driver events table streams through the file source into windows") {
    // the file-stream source needs a directory: stage the driver table
    val src = java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-ev-stream")
    java.nio.file.Files.copy(src, dir.resolve("events.parquet"))
    // normalize the driver's ts encoding exactly as Tables.load does:
    // TIMESTAMP(NANOS) reads as long (nanosAsLong), TIMESTAMP(MICROS)
    // isAdjustedToUTC=false reads as TIMESTAMP_NTZ
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(src.toString).schema
    val raw = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir.toString)
    val stream = schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ => raw.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
    }
    val out = EventWindows.tumbling(stream, "ts", Seq("event_type"),
      windowLen = "1 hour", watermark = "1 minute")
    val query = out.writeStream.format("memory").queryName("ev_file_stream")
      .outputMode("update").start()
    try {
      query.processAllAvailable()
      val n = spark.sql("SELECT count(*) FROM ev_file_stream").collect()(0).getLong(0)
      assert(n > 0) // windows materialized from the parquet-backed stream
    } finally query.stop()
  }

  test("streaming grouping sets: one Expand under a watermark, __ANY__ emitted on close") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val out = EventWindows.groupingSetCounts(mem.toDF(), "ts",
      windowLen = "10 minutes", watermark = "5 minutes",
      fixed = Nil, address = Seq("user"), question = Seq("v"))
    val query = out.writeStream.format("memory").queryName("ev_gs")
      .outputMode("append").start()
    try {
      mem.addData(Ev(t(2), "alice", 10), Ev(t(4), "alice", 7), Ev(t(6), "bob", 10))
      query.processAllAvailable()
      mem.addData(Ev(t(31), "carol", 1)) // advance watermark past [60,70)
      query.processAllAvailable()
      val rows = spark.sql(
        """SELECT user, v, counter FROM ev_gs
          |WHERE w_start = timestamp'1970-01-01 01:00:00'""".stripMargin)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      // ungrouped + by-address (__ANY__ question) + by-question (__ANY__ address)
      assert(rows == Set(
        ("alice", "10", 1L), ("alice", "7", 1L), ("bob", "10", 1L),
        ("alice", "__ANY__", 2L), ("bob", "__ANY__", 1L),
        ("__ANY__", "10", 2L), ("__ANY__", "7", 1L)))
    } finally query.stop()
  }

  test("grouping sets over a batch frame produce identical set semantics") {
    import spark.implicits._
    val batch = Seq(Ev(t(2), "alice", 10), Ev(t(4), "alice", 7)).toDF()
    val out = EventWindows.groupingSetCounts(batch, "ts", "10 minutes",
      "5 minutes", Nil, Seq("user"), Seq("v"))
    assert(out.columns.toSeq ==
      Seq("w_start", "w_end", "user", "v", "counter", "first_seen"))
    assert(out.count() == 5) // 2 ungrouped + 1 by-address + 2 by-question
  }

  test("same operator runs in batch mode with identical shape") {
    import spark.implicits._
    val batch = Seq(Ev(t(2), "alice", 10), Ev(t(4), "bob", 5)).toDF()
    val out = EventWindows.tumbling(batch, "ts", Seq("user"),
      "10 minutes", "5 minutes", Some("v"))
    assert(out.columns.toSeq == Seq("w_start", "w_end", "user", "n", "sum_v"))
    assert(out.count() == 2)
  }

  test("curationHealth: streaming window metrics equal the batch run") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val w = Seq.fill(8)(100) // every bucket positive: score = 100 * n_tokens
    val clean = "the " + (1 to 25).map(i => s"w$i").mkString(" ") + " of to in"
    val rows = Seq(
      TsDoc(t(2), "srcA", clean),          // passes the gate
      TsDoc(t(4), "srcA", "too short"),    // fails length floor
      TsDoc(t(6), "srcB", clean))
    val batch = EventWindows.curationHealth(rows.toDF(), "ts", "source",
      "text", "10 minutes", "5 minutes", w)
      .collect().map(r => (r.getString(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6))).toSet

    val mem = MemoryStream[TsDoc]
    val out = EventWindows.curationHealth(mem.toDF(), "ts", "source",
      "text", "10 minutes", "5 minutes", w)
    val query = out.writeStream.format("memory").queryName("cur_health")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*)
      query.processAllAvailable()
      mem.addData(TsDoc(t(31), "srcC", clean)) // close the first window
      query.processAllAvailable()
      val streamed = spark.sql(
        """SELECT source, n_docs, n_pass, score_sum, n_tokens FROM cur_health
          |WHERE w_start = timestamp'1970-01-01 01:00:00'""".stripMargin)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      assert(streamed == batch)
      // and the metrics mean what they say: srcA ingested 2, passed 1
      val a = streamed.find(_._1 == "srcA").get
      assert(a._2 == 2L && a._3 == 1L)
      // all-positive weights: score_sum == 100 * n_tokens exactly
      streamed.foreach(s => assert(s._4 == 100L * s._5))
    } finally query.stop()
  }
}

case class TsDoc(ts: Timestamp, source: String, text: String)
