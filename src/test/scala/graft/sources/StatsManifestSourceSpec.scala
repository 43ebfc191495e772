package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, In, IsNotNull, LessThanOrEqual}

import graft.SparkSpec
import graft.sinks.StatsManifest

/** The registered data source: pushed filters prune the file list
  * inside Spark's scan planning — results identical to a plain read,
  * range filters prune via min/max, point filters via bloom, unknown
  * filter shapes prune nothing (conservative), and everything is
  * re-applied above the scan so pruning can never change semantics. */
class StatsManifestSourceSpec extends SparkSpec {

  private lazy val (df, dir): (DataFrame, String) = {
    import spark.implicits._
    val d = (0L until 50000L)
      .map(i => (i % 1000L, (i * 2654435761L) % 100000L, i))
      .toDF("rng", "key", "payload")
    val out = Files.createTempDirectory("graft-src").toString
    StatsManifest.writeWithManifest(d, out, clusterCol = "rng",
      statsCols = Seq("rng"), numPartitions = 20)
    StatsManifest.addBloomIndex(d, out, "key")
    (d, out)
  }

  private def viaSource: DataFrame =
    spark.read.format("graft.sources.StatsManifestSource").load(dir)

  private def relation = new StatsManifestRelation(spark.sqlContext, dir)

  test("range query through the source equals the plain read") {
    val got = viaSource.filter(col("rng").between(100, 150))
      .groupBy(col("rng")).agg(count(lit(1)).as("n"), sum(col("payload")).as("s"))
    val want = df.filter(col("rng").between(100, 150))
      .groupBy(col("rng")).agg(count(lit(1)).as("n"), sum(col("payload")).as("s"))
    assert(got.collect().toSet == want.collect().toSet)
  }

  test("pushed range filters prune the file list") {
    val survivors = relation.selectedFiles(Array[Filter](
      org.apache.spark.sql.sources.GreaterThanOrEqual("rng", 100L),
      LessThanOrEqual("rng", 150L)))
    assert(survivors.size * 4 <= 20,
      s"range pushdown did not prune: ${survivors.size} of 20")
  }

  test("point filters probe the bloom index") {
    val target = (1234L * 2654435761L) % 100000L
    val got = viaSource.filter(col("key") === target)
      .collect().map(_.toSeq).toSet
    val want = df.filter(col("key") === target).collect().map(_.toSeq).toSet
    assert(got == want)
    val survivors = relation.selectedFiles(Array[Filter](EqualTo("key", target)))
    assert(survivors.size * 2 <= 20,
      s"bloom pushdown did not prune: ${survivors.size} of 20")
    // IN probes too
    val inSurvivors = relation.selectedFiles(
      Array[Filter](In("key", Array[Any](target, target))))
    assert(inSurvivors.size * 2 <= 20)
  }

  test("unknown filters prune nothing and stay correct") {
    assert(relation.selectedFiles(
      Array[Filter](IsNotNull("payload"))).size == 20)
    val got = viaSource.filter(col("payload") % 7 === 0).count()
    assert(got == df.filter(col("payload") % 7 === 0).count())
  }

  test("bounds intersect and empty intervals yield zero files and rows") {
    val b = relation.bounds(Array[Filter](
      GreaterThan("rng", 10L), LessThanOrEqual("rng", 5L)))
    assert(b("rng")._1 > b("rng")._2)
    assert(relation.selectedFiles(Array[Filter](
      GreaterThan("rng", 10L), LessThanOrEqual("rng", 5L))).isEmpty)
    assert(viaSource.filter(col("rng") > 10 && col("rng") <= 5).count() == 0L)
  }

  test("count(*) (empty projection) works through the source") {
    assert(viaSource.count() == 50000L)
  }
}
