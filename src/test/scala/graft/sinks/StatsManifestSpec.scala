package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class StatsManifestSpec extends SparkSpec {

  private def writeTable() = {
    import spark.implicits._
    // key clustered; "corr" correlated with key (stats selectivity for
    // free), "noise" uncorrelated payload
    val df = (0L until 50000L)
      .map(i => (i % 1000L, (i % 1000L) * 2 + (i % 7), i))
      .toDF("key", "corr", "noise")
    val dir = Files.createTempDirectory("graft-manifest").toString
    StatsManifest.writeWithManifest(df, dir, clusterCol = "key",
      statsCols = Seq("key", "corr"), numPartitions = 20)
    (df, dir)
  }

  test("pruned read equals the full-scan filter while opening fewer files") {
    val (df, dir) = writeTable()
    val ranges = Seq(("key", 100L, 140L))
    val want = df.filter(col("key").between(100, 140))
      .agg(count(lit(1)), sum(col("noise"))).collect().head
    val got = StatsManifest.prunedRead(spark, dir, ranges)
      .agg(count(lit(1)), sum(col("noise"))).collect().head
    assert(got == want)
    val total = StatsManifest.manifest(spark, dir).count()
    val opened = StatsManifest.selectFiles(spark, dir, ranges).size
    assert(total == 20L, s"expected 20 data files, manifest has $total")
    assert(opened * 4 <= total,
      s"manifest did not prune: opened $opened of $total files")
  }

  test("conjunctive ranges prune on every column, correlated stats included") {
    val (df, dir) = writeTable()
    val ranges = Seq(("key", 0L, 999L), ("corr", 400L, 440L))
    val want = df.filter(col("key").between(0, 999) &&
      col("corr").between(400, 440)).count()
    assert(StatsManifest.prunedRead(spark, dir, ranges).count() == want)
    val opened = StatsManifest.selectFiles(spark, dir, ranges).size
    assert(opened * 4 <= 20,
      s"correlated-column stats did not prune: opened $opened of 20")
  }

  test("empty survivor set returns zero rows with the table schema") {
    val (df, dir) = writeTable()
    val out = StatsManifest.prunedRead(spark, dir, Seq(("key", 5000L, 6000L)))
    assert(out.columns.toSeq == df.columns.toSeq)
    assert(out.count() == 0L)
    assert(StatsManifest.selectFiles(spark, dir, Seq(("key", 5000L, 6000L))).isEmpty)
  }

  test("manifest directory is invisible to plain parquet readers") {
    val (df, dir) = writeTable()
    assert(spark.read.parquet(dir).count() == df.count())
  }
}
