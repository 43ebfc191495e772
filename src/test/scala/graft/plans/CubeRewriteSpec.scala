package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The cube-routing rule: supported aggregates over the registered base
  * rewrite to the cube (scan provably moves), results stay IDENTICAL on
  * randomized data, and every bail guard leaves unsupported queries
  * untouched and correct. */
class CubeRewriteSpec extends SparkSpec {

  private lazy val (baseDir, cubeDir): (String, String) = {
    import spark.implicits._
    val df = (0 until 20000).map { i =>
      (s"k${i % 7}", (i % 13).toLong, (i % 1009).toLong, i.toLong)
    }.toDF("d1", "d2", "m", "other")
    val b = Files.createTempDirectory("graft-cube-base").toString
    val c = Files.createTempDirectory("graft-cube-cube").toString
    df.write.mode("overwrite").parquet(b)
    CubeRewrite.install(spark)
    CubeRewrite.buildCube(spark, b, c, dims = Seq("d1", "d2"),
      sumCols = Seq("m"), minMaxCols = Seq("m"))
    (b, c)
  }

  private def base: DataFrame = { baseDir; spark.read.parquet(baseDir) }

  // routing is a LOGICAL rewrite; the optimized plan shows the scan it
  // chose (the physical plan hides under the AQE wrapper)
  private def scannedPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(_.toString)
          case _ => Nil
        }
    }.flatten

  private def assertRouted(df: DataFrame, routed: Boolean): Unit = {
    val paths = scannedPaths(df)
    assert(paths.nonEmpty)
    val hitsCube = paths.exists(_.contains(cubeDir))
    assert(hitsCube == routed,
      s"expected routed=$routed, scans=$paths\n${df.queryExecution.optimizedPlan}")
  }

  test("grouped count/sum/min/max route to the cube with identical results") {
    val q = base.groupBy(col("d1"))
      .agg(count(lit(1)).as("n"), sum(col("m")).as("s"),
        min(col("m")).as("mn"), max(col("m")).as("mx"))
    assertRouted(q, routed = true)
    val direct = spark.read.parquet(baseDir).groupBy(col("d1"))
      .agg(count(lit(1)).as("n"), sum(col("m")).as("s"),
        min(col("m")).as("mn"), max(col("m")).as("mx"))
      .withColumn("__off", lit(1)) // different shape: not routed-vs-routed
    assert(q.collect().toSet == direct.drop("__off").collect().toSet)
  }

  test("partial-dimension grouping re-aggregates the cube") {
    val q = base.groupBy(col("d2")).agg(count(lit(1)).as("n"))
    assertRouted(q, routed = true)
    assert(q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      (0L until 13L).map(d2 => d2 -> (20000L / 13 +
        (if (d2 < 20000 % 13) 1 else 0))).toSet)
  }

  test("global aggregate routes, count keeps its 0-on-empty contract") {
    val q = base.agg(count(lit(1)).as("n"), sum(col("m")).as("s"))
    assertRouted(q, routed = true)
    val r = q.collect().head
    assert(r.getLong(0) == 20000L)
    assert(r.getLong(1) == (0 until 20000).map(i => (i % 1009).toLong).sum)
  }

  test("dimension filters move onto the cube scan") {
    val q = base.filter(col("d1") === "k3" && col("d2") > 5)
      .groupBy(col("d1")).agg(count(lit(1)).as("n"))
    assertRouted(q, routed = true)
    val want = base.withColumn("__x", lit(1)).filter(col("d1") === "k3" &&
      col("d2") > 5).groupBy(col("d1")).count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(q.collect().map(r => (r.getString(0), r.getLong(1))).toSet == want)
  }

  test("bails: measure filter, non-dim grouping, distinct, unsupported agg") {
    // filter on a measure cannot be answered post-aggregation
    assertRouted(base.filter(col("m") > 100).groupBy(col("d1"))
      .agg(count(lit(1))), routed = false)
    // grouping by a non-dimension column
    assertRouted(base.groupBy(col("other")).agg(count(lit(1))), routed = false)
    // distinct aggregate
    assertRouted(base.groupBy(col("d1")).agg(countDistinct(col("m"))),
      routed = false)
    // aggregate of an unregistered column
    assertRouted(base.groupBy(col("d1")).agg(sum(col("other"))), routed = false)
    // avg is not mergeable as-is
    assertRouted(base.groupBy(col("d1")).agg(avg(col("m"))), routed = false)
    // a NON-DETERMINISTIC filter has no column references yet filters
    // rows — a cube cannot replay it
    assertRouted(base.filter(rand(7) < 0.5).groupBy(col("d1"))
      .agg(count(lit(1))), routed = false)
    // non-deterministic output expressions bail too
    assertRouted(base.groupBy(col("d1"))
      .agg((count(lit(1)) + (rand(7) * 0)).as("n")), routed = false)
  }

  test("runtime conf gate disables routing per session") {
    spark.conf.set(CubeRewrite.EnabledKey, "false")
    try assertRouted(base.groupBy(col("d1")).agg(count(lit(1))),
      routed = false)
    finally spark.conf.set(CubeRewrite.EnabledKey, "true")
    assertRouted(base.groupBy(col("d1")).agg(count(lit(1))), routed = true)
  }

  test("post-aggregation expressions collapse in and still route") {
    // CollapseProject folds the outer cast/arithmetic into the
    // aggregate list: Alias(Cast(Sum(...))) must still map
    val q = base.groupBy(col("d1"))
      .agg(sum(col("m")).as("__s"), count(lit(1)).as("__n"))
      .select(col("d1"), (col("__s") * 2).cast("double").as("x"),
        (col("__n") + 1).as("n1"))
    assertRouted(q, routed = true)
    val want = spark.read.parquet(baseDir).groupBy(col("d1"))
      .agg((sum(col("m")) * 2).cast("double").as("x"),
        (count(lit(1)) + 1).as("n1")).withColumn("__z", lit(0))
    assert(q.collect().toSet ==
      want.select(col("d1"), col("x"), col("n1")).collect().toSet)
  }

  test("additive refresh equals a full rebuild, new dim combos included") {
    import spark.implicits._
    val mk = (r: Range, tag: String) => r.map { i =>
      (s"$tag${i % 5}", (i % 9).toLong, (i % 101).toLong, i.toLong)
    }.toDF("d1", "d2", "m", "other")
    val part1 = mk(0 until 5000, "k")
    val delta = mk(5000 until 8000, "n") // entirely NEW d1 values too
    val b = Files.createTempDirectory("graft-cube-rb").toString
    val c = Files.createTempDirectory("graft-cube-rc").toString
    part1.write.mode("overwrite").parquet(b)
    CubeRewrite.install(spark)
    CubeRewrite.buildCube(spark, b, c, dims = Seq("d1", "d2"),
      sumCols = Seq("m"), minMaxCols = Seq("m"))
    delta.write.mode("append").parquet(b)
    CubeRewrite.refreshCubeAdditive(spark, b, delta)
    // the refreshed cube equals a from-scratch rebuild of the full base
    val rb = Files.createTempDirectory("graft-cube-rb2").toString
    val full = spark.read.parquet(b)
    full.groupBy(col("d1"), col("d2"))
      .agg(count(lit(1)).as("cnt"), sum(col("m")).as("sum_m"),
        min(col("m")).as("min_m"), max(col("m")).as("max_m"))
      .write.mode("overwrite").parquet(rb)
    val refreshed = spark.read.parquet(c).collect().map(_.toSeq).toSet
    val rebuilt = spark.read.parquet(rb).collect().map(_.toSeq).toSet
    assert(refreshed == rebuilt)
    // and routing over the appended base still answers correctly
    // (this test has its OWN cube dir; assertRouted checks the suite's)
    val q = spark.read.parquet(b).groupBy(col("d1"))
      .agg(count(lit(1)).as("n"), max(col("m")).as("mx"))
    assert(scannedPaths(q).exists(_.contains(c)), "not routed to this cube")
    val got = q.collect().toSet
    // reference computed with routing OFF (the same query would route)
    spark.conf.set(CubeRewrite.EnabledKey, "false")
    val want = try full.groupBy(col("d1"))
      .agg(count(lit(1)).as("n"), max(col("m")).as("mx")).collect().toSet
    finally spark.conf.set(CubeRewrite.EnabledKey, "true")
    assert(got == want)
  }

  test("rebuild over a registered base does not route to the stale cube") {
    import spark.implicits._
    val b = Files.createTempDirectory("graft-cube-stale-b").toString
    val c = Files.createTempDirectory("graft-cube-stale-c").toString
    (0 until 100).map(i => (s"k${i % 3}", i.toLong, i.toLong))
      .toDF("d1", "d2", "m").write.mode("overwrite").parquet(b)
    CubeRewrite.install(spark)
    CubeRewrite.buildCube(spark, b, c, Seq("d1", "d2"), sumCols = Seq("m"))
    // REWRITE the base (deletes — the documented rebuild case)...
    (0 until 50).map(i => (s"k${i % 3}", i.toLong, i.toLong))
      .toDF("d1", "d2", "m").write.mode("overwrite").parquet(b)
    // ...and rebuild: the internal aggregate must read the NEW base,
    // not route to the stale cube it is replacing
    CubeRewrite.buildCube(spark, b, c, Seq("d1", "d2"), sumCols = Seq("m"))
    val q = spark.read.parquet(b).groupBy(col("d1")).agg(count(lit(1)).as("n"))
    assert(scannedPaths(q).exists(_.contains(c)))
    assert(q.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("k0", 17L), ("k1", 17L), ("k2", 16L)))
  }

  test("two routed aggregates in one query get independent cube instances") {
    val a = base.groupBy(col("d1")).agg(count(lit(1)).as("n"))
    val b = base.groupBy(col("d1")).agg(sum(col("m")).as("s"))
    val j = a.join(b, "d1")
    assert(scannedPaths(j).count(_.contains(cubeDir)) == 2)
    assert(j.collect().length == 7)
  }
}
