package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Date-partitioned at-rest layout: time-range queries must prune
  * partitions at planning time (the §2.9 Grafana queries are all
  * time-ranged — at 100 TB the pruned partitions are the query cost). */
class PartitionPruningSpec extends SparkSpec {

  test("date-partitioned write + time filter scans only matching partitions") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-part").toString
    val df = (0 until 1000).map { i =>
      (new java.sql.Timestamp(86400_000L * (i % 10) + 1000L * i), i.toLong)
    }.toDF("ts", "v").withColumn("day", to_date(col("ts")))
    df.write.mode("overwrite").partitionBy("day").parquet(dir)

    val q = spark.read.parquet(dir).filter(col("day") === "1970-01-03")
    val scan = q.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    // partition filter reached the scan; only 1 of 10 day-partitions read
    assert(scan.metadata("PartitionFilters").contains("day"))
    assert(scan.selectedPartitions.partitionCount == 1)
    assert(q.count() == 100)
  }
}
