package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.sinks.MergeInto

/** The CDC stream applied through foreachBatch merges must leave the
  * table equal to a sequential replay of the ops — same-key churn
  * inside one micro-batch (latest seq wins, delete wins at the winning
  * seq) and across batches included. */
class StreamMergeSpec extends SparkSpec {

  // (op, key, value, seq)
  private val batch1 = Seq(
    ("upsert", 1L, "a1", 1L), ("upsert", 2L, "b1", 2L),
    ("upsert", 1L, "a2", 3L),               // same-key churn in-batch: a2 wins
    ("upsert", 3L, "c1", 4L), ("delete", 3L, "", 5L)) // delete at winning seq
  private val batch2 = Seq(
    ("delete", 2L, "", 6L),                 // cross-batch delete
    ("upsert", 3L, "c2", 7L),               // re-insert after delete
    ("upsert", 4L, "d1", 8L))

  private def replay(ops: Seq[(String, Long, String, Long)]): Map[Long, String] =
    ops.sortBy(_._4).foldLeft(Map.empty[Long, String]) {
      case (m, ("upsert", k, v, _)) => m + (k -> v)
      case (m, ("delete", k, _, _)) => m - k
      case (m, _) => m
    }

  test("streamed merges equal the sequential replay") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val dir = Files.createTempDirectory("graft-stream-merge").toString
    // seed the table with one row the stream later overwrites
    MergeInto.writePartitioned(
      Seq((1L, "seed"), (9L, "keep")).toDF("k", "v"), dir, "k", nParts = 4)
    val mem = MemoryStream[(String, Long, String, Long)]
    val q = StreamMerge.maintain(
      mem.toDF().toDF("op", "k", "v", "seq"), dir, "k", nParts = 4)
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      val got = MergeInto.readTable(spark, dir)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val want = Map(9L -> "keep") ++ replay(batch1 ++ batch2)
      assert(got == want, s"got=$got want=$want")
    } finally q.stop()
  }
}
