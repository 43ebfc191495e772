package graft.sinks

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MergeIntoSpec extends SparkSpec {

  private def mkTable() = {
    import spark.implicits._
    val df = (0L until 1000L).map(i => (i, s"v$i", i * 10)).toDF("k", "s", "n")
    val dir = Files.createTempDirectory("graft-merge").toString
    MergeInto.writePartitioned(df, dir, "k", nParts = 8)
    dir
  }

  private def partFiles(dir: String): Map[String, Set[(String, Long)]] =
    new File(dir).listFiles().filter(_.getName.startsWith("__part="))
      .map(d => d.getName ->
        d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getName, f.lastModified())).toSet).toMap

  test("upsert replaces, inserts, deletes remove; delete wins on overlap") {
    import spark.implicits._
    val dir = mkTable()
    val upserts = Seq((5L, "NEW5", 555L), (2000L, "INS", 1L),
      (7L, "NEW7", 777L)).toDF("k", "s", "n")
    val dels = Seq(3L, 7L, 9999L).toDF("k") // 7 also upserted: delete wins
    MergeInto.mergeInto(spark, dir, "k", 8, upserts, dels)
    val got = MergeInto.readTable(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val want = (0L until 1000L).filterNot(k => k == 3L || k == 7L || k == 5L)
      .map(i => (i, s"v$i", i * 10)).toSet ++
      Set((5L, "NEW5", 555L), (2000L, "INS", 1L))
    assert(got == want)
  }

  test("untouched partitions keep their files byte-for-byte") {
    import spark.implicits._
    val dir = mkTable()
    val before = partFiles(dir)
    // change a single key -> exactly one partition rewritten
    MergeInto.mergeInto(spark, dir, "k", 8,
      Seq((5L, "X", 0L)).toDF("k", "s", "n"),
      spark.emptyDataFrame.select(lit(0L).as("k")).filter(lit(false)))
    val after = partFiles(dir)
    val changed = before.keySet.filter(p => before(p) != after(p))
    assert(changed.size == 1, s"expected 1 rewritten partition, got $changed")
    assert((before.keySet -- changed).forall(p => before(p) == after(p)))
  }

  test("deleting every row of a partition removes its directory") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, s"v$i")).toDF("k", "s")
    val dir = Files.createTempDirectory("graft-merge-del").toString
    MergeInto.writePartitioned(df, dir, "k", nParts = 4)
    val parts0 = partFiles(dir).keySet
    assert(parts0.size == 4)
    // every key of ONE physical partition (read back with its part id)
    val full = spark.read.parquet(dir)
    val victim = full.select(col("__part")).head().getInt(0)
    // materialize: these rows' FILES are about to be deleted
    val victimKeys = full.filter(col("__part") === victim).select(col("k"))
      .collect().map(_.getLong(0)).toSeq
    MergeInto.mergeInto(spark, dir, "k", 4, df.filter(lit(false)),
      victimKeys.toDF("k"))
    assert(partFiles(dir).keySet == parts0 - s"__part=$victim")
    assert(MergeInto.readTable(spark, dir).count() ==
      100L - victimKeys.size)
  }

  test("replaying the same change batch is idempotent") {
    import spark.implicits._
    // the operational property that makes at-least-once upstream
    // delivery safe: upsert-by-key replaces, delete-by-key is absent
    // either way — applying a batch twice equals applying it once
    val dir = mkTable()
    val ups = Seq((5L, "NEW5", 555L), (2000L, "INS", 1L)).toDF("k", "s", "n")
    val dels = Seq(3L).toDF("k")
    MergeInto.mergeInto(spark, dir, "k", 8, ups, dels)
    val once = MergeInto.readTable(spark, dir)
      .collect().map(_.toSeq).toSet
    MergeInto.mergeInto(spark, dir, "k", 8, ups, dels)
    val twice = MergeInto.readTable(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(twice == once)
  }

  test("empty change batch is a no-op") {
    import spark.implicits._
    val dir = mkTable()
    val before = partFiles(dir)
    MergeInto.mergeInto(spark, dir, "k", 8,
      Seq.empty[(Long, String, Long)].toDF("k", "s", "n"),
      Seq.empty[Long].toDF("k"))
    assert(partFiles(dir) == before)
    assert(MergeInto.readTable(spark, dir).count() == 1000L)
  }
}
