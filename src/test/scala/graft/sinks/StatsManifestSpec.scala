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

  test("bloom index prunes point lookups where min/max cannot") {
    import spark.implicits._
    // hash-scattered key: every file spans the full range, so range
    // stats are useless — exactly the bloom case
    val df = (0L until 40000L).map(i => (i * 2654435761L % 100000L, i))
      .toDF("key", "payload")
    val dir = Files.createTempDirectory("graft-bloom").toString
    StatsManifest.writeWithManifest(df, dir, clusterCol = "payload",
      statsCols = Seq("key", "payload"), numPartitions = 20)
    StatsManifest.addBloomIndex(df, dir, "key")
    // mid-range keys (an extreme value would let min/max prune by luck)
    val targets = Seq(1000L, 15000L, 33000L)
      .map(i => (i * 2654435761L) % 100000L)
    val want = df.filter(col("key").isin(targets: _*))
      .collect().map(_.toSeq).toSet
    val got = StatsManifest.prunedReadIn(spark, dir, "key", targets)
    assert(got.collect().map(_.toSeq).toSet == want)
    // range stats on `key` cannot prune this lookup...
    val rangeSurvivors = StatsManifest.selectFiles(spark, dir,
      targets.map(v => ("key", v, v)).take(1))
    assert(rangeSurvivors.size >= 15,
      s"expected min/max near-useless here, pruned to ${rangeSurvivors.size}")
    // ...the bloom read opens only a few files: re-derive its survivor
    // count from the same probe the read used
    val opened = {
      val vs = targets.toArray
      spark.read.parquet(s"$dir/_graft_bloom_key")
        .as[(String, Array[Byte])].collect().count { case (_, b) =>
          val bf = org.apache.spark.util.sketch.BloomFilter
            .readFrom(new java.io.ByteArrayInputStream(b))
          vs.exists(bf.mightContainLong)
        }
    }
    assert(opened * 2 <= 20, s"bloom did not prune: opened $opened of 20")
    // absent key: zero rows, schema intact
    val none = StatsManifest.prunedReadIn(spark, dir, "key", Seq(999999L))
    assert(none.count() == 0L && none.columns.toSeq == df.columns.toSeq)
  }
}
