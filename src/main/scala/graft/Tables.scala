package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loader for the driver testdata layout (`TESTDATA.md`):
  * one parquet file per table under an sf directory. Filters and column
  * pruning push down to the parquet scan via Catalyst — callers should
  * select/filter on the returned DataFrame, never pre-collect.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.parquet has carried TIMESTAMP(NANOS) (which Spark's
    // vectorized reader rejects — read nanos as Long and convert) and
    // TIMESTAMP(MICROS) isAdjustedToUTC=false (reads as TIMESTAMP_NTZ)
    // across driver testdata generations; normalize either encoding to a
    // session-tz TimestampType (session tz is pinned UTC, so the NTZ
    // cast is value-preserving).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events") df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
    else df
  }

  def lineitem(spark: SparkSession, d: String): DataFrame = load(spark, d, "lineitem")
  def orders(spark: SparkSession, d: String): DataFrame = load(spark, d, "orders")
  def customer(spark: SparkSession, d: String): DataFrame = load(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = load(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = load(spark, d, "part")
  def nation(spark: SparkSession, d: String): DataFrame = load(spark, d, "nation")
  def region(spark: SparkSession, d: String): DataFrame = load(spark, d, "region")
  def events(spark: SparkSession, d: String): DataFrame = load(spark, d, "events")
  def documents(spark: SparkSession, d: String): DataFrame = load(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = load(spark, d, "embeddings")
}
