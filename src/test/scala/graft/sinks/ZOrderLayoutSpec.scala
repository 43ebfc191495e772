package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class ZOrderLayoutSpec extends SparkSpec {

  /** Rows the parquet scan actually DECODED for `pred` over `path` —
    * i.e. rows in the row groups whose min/max footers survived
    * pushdown. The whole point of the z-layout is making this number
    * collapse for 2-D range predicates. */
  private def scannedRows(path: String,
                          pred: org.apache.spark.sql.Column): Long = {
    val q = spark.read.parquet(path).filter(pred)
    q.collect() // execute THIS plan so its scan metrics populate
    val scans = q.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty, "no parquet scan in the plan")
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("z-ordered parquet skips row groups under 2-D range predicates") {
    import spark.implicits._
    // two de-correlated uniform dimensions over [0, 1024)
    val df = (0L until 120000L).map { i =>
      ((i * 2654435761L >>> 7) % 1024L, (i * 1099511628211L >>> 9) % 1024L, i)
    }.toDF("a", "b", "payload")
    val zDir = Files.createTempDirectory("graft-zord").toString
    val rDir = Files.createTempDirectory("graft-rand").toString
    // 32 files, one row group each: file footers ARE the skip index
    ZOrderLayout.layout(df, "a", "b", numPartitions = 32)
      .write.mode("overwrite").parquet(zDir)
    df.repartition(32).write.mode("overwrite").parquet(rDir)

    // a ~4%-per-dimension box: ~0.16% of rows actually match
    val pred = col("a").between(100, 140) && col("b").between(200, 240)
    val want = df.filter(pred).count()
    val zRows = scannedRows(zDir, pred)
    val rRows = scannedRows(rDir, pred)
    // correctness first: both layouts return identical results
    assert(spark.read.parquet(zDir).filter(pred).count() == want)
    assert(spark.read.parquet(rDir).filter(pred).count() == want)
    // the unclustered layout decodes everything (every file spans the
    // full value range, nothing prunes)...
    assert(rRows >= 119000L, s"random layout unexpectedly pruned: $rRows")
    // ...while the z-layout's per-file min/max on BOTH columns prune
    // most row groups: decoded rows collapse by at least 4x
    assert(zRows * 4 <= rRows,
      s"z-layout did not skip: scanned $zRows of $rRows unclustered")
  }

  test("zValue2 interleaves bits exactly (even = a, odd = b)") {
    import spark.implicits._
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L),
      (0xFFFFFFFFL, 0L), (0L, 0xFFFFFFFFL), (123456789L, 987654321L))
    def refZ(a: Long, b: Long): Long = {
      var z = 0L
      for (i <- 0 until 32) {
        z |= ((a >> i) & 1L) << (2 * i)
        z |= ((b >> i) & 1L) << (2 * i + 1)
      }
      z
    }
    val got = rows.toDF("a", "b")
      .select(ZOrderLayout.zValue2(
        org.apache.spark.sql.functions.col("a"),
        org.apache.spark.sql.functions.col("b")))
      .collect().map(_.getLong(0)).toSeq
    assert(got == rows.map { case (a, b) => refZ(a, b) })
  }

  test("layout yields disjoint per-partition z-ranges (the skipping contract)") {
    import spark.implicits._
    val df = (0L until 4000L)
      .map(i => (i % 97, (i * 31) % 89)).toDF("a", "b")
    val laid = ZOrderLayout.layout(df, "a", "b", numPartitions = 8)
    val ranges = laid
      .select(ZOrderLayout.zValue2(
        org.apache.spark.sql.functions.col("a"),
        org.apache.spark.sql.functions.col("b")).as("z"))
      .rdd.glom().collect()
      .filter(_.nonEmpty)
      .map(p => (p.map(_.getLong(0)).min, p.map(_.getLong(0)).max))
      .sortBy(_._1)
    assert(ranges.length > 1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) =>
        assert(hi <= lo, s"overlapping partition z-ranges: $hi > $lo")
      case _ => ()
    }
    // every partition internally sorted by z
    laid.select(ZOrderLayout.zValue2(
        org.apache.spark.sql.functions.col("a"),
        org.apache.spark.sql.functions.col("b")).as("z"))
      .rdd.glom().collect().foreach { p =>
        val zs = p.map(_.getLong(0))
        assert(zs.sameElements(zs.sorted))
      }
  }
}
