package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VersionedTableSpec extends SparkSpec {

  private def mk() = {
    import spark.implicits._
    val df = (0L until 500L).map(i => (i, s"v$i")).toDF("k", "s")
    val dir = Files.createTempDirectory("graft-versioned").toString
    VersionedTable.create(df, dir, "k", nParts = 8)
    (df, dir)
  }

  private def snapshot(dir: String, v: Int): Map[Long, String] =
    VersionedTable.read(spark, dir, Some(v))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("time travel: every version stays readable after later merges") {
    import spark.implicits._
    val (df, dir) = mk()
    val v1 = VersionedTable.merge(spark, dir, "k", 8,
      Seq((5L, "NEW5"), (900L, "INS")).toDF("k", "s"), Seq(3L).toDF("k"))
    val v2 = VersionedTable.merge(spark, dir, "k", 8,
      Seq.empty[(Long, String)].toDF("k", "s"), Seq(5L, 900L).toDF("k"))
    assert((v1, v2) == (1, 2))
    val base = (0L until 500L).map(i => i -> s"v$i").toMap
    assert(snapshot(dir, 0) == base)
    val want1 = base - 3L + (5L -> "NEW5") + (900L -> "INS")
    assert(snapshot(dir, 1) == want1)
    assert(snapshot(dir, 2) == want1 - 5L - 900L)
    assert(VersionedTable.latestVersion(spark, dir) == 2)
    assert(VersionedTable.read(spark, dir).count() == (want1 - 5L - 900L).size)
  }

  test("diff: added/removed/changed with null-safe cells; unchanged filtered") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b"), (3L, null.asInstanceOf[String]),
      (4L, "d")).toDF("k", "s")
    val dir = Files.createTempDirectory("graft-versioned-diff").toString
    VersionedTable.create(df, dir, "k", nParts = 4)
    // v1: change k=1, null->value k=3, delete k=4, insert k=9
    VersionedTable.merge(spark, dir, "k", 4,
      Seq((1L, "A"), (3L, "c"), (9L, "ins")).toDF("k", "s"),
      Seq(4L).toDF("k"))
    val out = VersionedTable.diff(spark, dir, "k", 0, 1, Seq("s"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getString(3))))
      .toMap
    assert(out == Map(
      1L -> (("changed", "a", "A")),
      3L -> (("changed", null, "c")), // null -> value IS a change (<=>)
      4L -> (("removed", "d", null)),
      9L -> (("added", null, "ins"))))
    // k=2 unchanged: filtered before leaving the join
    assert(!out.contains(2L))
  }

  test("untouched partitions share PHYSICAL files across versions") {
    import spark.implicits._
    val (_, dir) = mk()
    VersionedTable.merge(spark, dir, "k", 8,
      Seq((5L, "X")).toDF("k", "s"), Seq.empty[Long].toDF("k"))
    val log = spark.read.parquet(s"$dir/_graft_log/versions")
    val v0 = log.filter(col("version") === 0).select("file")
      .collect().map(_.getString(0)).toSet
    val v1 = log.filter(col("version") === 1).select("file")
      .collect().map(_.getString(0)).toSet
    val shared = v0.intersect(v1)
    assert(shared.nonEmpty, "no storage sharing between versions")
    assert((v1 -- v0).nonEmpty, "merge produced no new file")
    // exactly one partition's files changed
    def parts(fs: Set[String]) =
      fs.map(f => f.split("/").takeRight(2).head).groupBy(identity)
    assert(parts(v0).keySet == parts(v1).keySet ||
      parts(v1).keySet.subsetOf(parts(v0).keySet))
  }

  test("vacuum reclaims only pre-retention files; retained versions read") {
    import spark.implicits._
    val (_, dir) = mk()
    VersionedTable.merge(spark, dir, "k", 8,
      Seq((5L, "X")).toDF("k", "s"), Seq.empty[Long].toDF("k"))
    VersionedTable.merge(spark, dir, "k", 8,
      Seq((6L, "Y")).toDF("k", "s"), Seq.empty[Long].toDF("k"))
    val removed = VersionedTable.vacuum(spark, dir, keepFrom = 2)
    assert(removed > 0, "vacuum reclaimed nothing")
    // latest still reads completely
    val m = snapshot(dir, 2)
    assert(m(5L) == "X" && m(6L) == "Y" && m.size == 500)
    // vacuumed version is gone from the log
    assert(spark.read.parquet(s"$dir/_graft_log/versions")
      .filter(col("version") === 0).count() == 0L)
  }

  test("deleting a whole partition keeps the version readable (no dir tricks)") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, i * 2)).toDF("k", "n")
    val dir = Files.createTempDirectory("graft-versioned-del").toString
    VersionedTable.create(df, dir, "k", nParts = 4)
    val full = spark.read.parquet(dir)
    val victim = full.select(col("__part")).head().getInt(0)
    val victimKeys = full.filter(col("__part") === victim).select(col("k"))
      .collect().map(_.getLong(0)).toSeq
    val v1 = VersionedTable.merge(spark, dir, "k", 4,
      df.filter(lit(false)), victimKeys.toDF("k"))
    assert(VersionedTable.read(spark, dir, Some(v1)).count() ==
      100L - victimKeys.size)
    assert(VersionedTable.read(spark, dir, Some(0)).count() == 100L)
  }
}
