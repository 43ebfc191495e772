package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

case class Seen(ts: Timestamp, key: String, v: Long)

class StreamDedupSpec extends SparkSpec {
  private def t(min: Int) = new Timestamp(3600_000L + min * 60_000L)

  test("duplicates within the watermark horizon are dropped across batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[Seen]
    val out = StreamDedup.withinWatermark(mem.toDF(), Seq("key"), "ts", "10 minutes")
    val query = out.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      mem.addData(Seen(t(0), "a", 1), Seen(t(1), "a", 2), Seen(t(2), "b", 3))
      query.processAllAvailable()
      mem.addData(Seen(t(3), "a", 4)) // cross-batch duplicate, inside horizon
      query.processAllAvailable()
      val vals = spark.sql("SELECT v FROM dedup_stream").collect()
        .map(_.getLong(0)).toSet
      assert(vals == Set(1L, 3L)) // first arrival per key survives
    } finally query.stop()
  }
}

class RocksDbStateStoreSpec extends SparkSpec {
  private def t(min: Int) = new Timestamp(3600_000L + min * 60_000L)

  test("the RocksDB provider the app defaults to runs the dedup state end-to-end") {
    // GraftConfigSpec proves the knob propagates; this proves the
    // provider class it names actually LOADS and serves streaming state
    // (rocksdbjni is a runtime dependency that a classpath change could
    // silently drop — the config would then fail only at first deploy)
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, graft.config.GraftConfig.RocksDbProvider)
    try {
      val mem = MemoryStream[Seen]
      val out = StreamDedup.withinWatermark(mem.toDF(), Seq("key"), "ts", "10 minutes")
      val query = out.writeStream.format("memory").queryName("dedup_rocks")
        .outputMode("append").start()
      try {
        mem.addData(Seen(t(0), "a", 1), Seen(t(1), "b", 2))
        query.processAllAvailable()
        mem.addData(Seen(t(2), "a", 3), Seen(t(3), "c", 4)) // dup + new key
        query.processAllAvailable()
        val vals = spark.sql("SELECT v FROM dedup_rocks").collect()
          .map(_.getLong(0)).toSet
        assert(vals == Set(1L, 2L, 4L))
      } finally query.stop()
    } finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}

class SkewAggSpec extends SparkSpec {
  test("salted two-phase aggregation equals direct groupBy") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = (1 to 1000).map(i => (if (i % 10 == 0) "hot" else s"k${i % 37}", i.toLong))
      .toDF("key", "v").repartition(8)
    val salted = graft.operators.SkewAgg
      .countSumBy(df, Seq("key"), Seq("v"), salts = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val direct = df.groupBy("key")
      .agg(count(lit(1)).as("n"), sum("v").as("sum_v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == direct)
  }
}
