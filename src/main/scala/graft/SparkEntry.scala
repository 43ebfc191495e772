package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator from SURVEY.md §2 (or a
  * post-parity extension operator), expressed Spark-first over the driver
  * testdata tables; [[oracleSql]] carries the DuckDB-equivalent SQL used by
  * the correctness gate. Column names are aliased identically on both sides
  * (the driver sorts columns by name before hashing).
  *
  * Numeric determinism policy (Spark vs DuckDB must hash-match):
  *   - money/quantity sums go through exact DECIMAL arithmetic, cast to
  *     DOUBLE only at the end (one deterministic rounding);
  *   - averages are a single double division of exact parts;
  *   - integer-division latency semantics of the reference
  *     (aggregator.go:496) use floor() in both dialects (DuckDB CAST
  *     rounds, Spark CAST truncates — floor sidesteps both).
  */
object SparkEntry {

  /** Exact 2-dp decimal view of a double money/quantity column. */
  private def dec(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_lineitem_agg")(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------------
  // q1 — pricing-summary aggregation (TPC-H Q1 shape): the reference's
  // downstream-query surface is filter→groupBy→agg (SURVEY §2.9); this is
  // the canonical Spark form with pushed-down filter + partial aggregation.
  // ---------------------------------------------------------------------
  private def q1LineitemAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cutoff = java.sql.Timestamp.valueOf("1998-09-01 00:00:00")
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" <= lit(cutoff))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum(dec($"l_quantity")).cast("double").as("sum_qty"),
        sum(dec($"l_extendedprice")).cast("double").as("sum_base_price"),
        sum((dec($"l_extendedprice") * (lit(1) - dec($"l_discount")))
          .cast(DecimalType(18, 4))).cast("double").as("sum_disc_price"),
        sum((dec($"l_extendedprice") * (lit(1) - dec($"l_discount")) *
          (lit(1) + dec($"l_tax"))).cast(DecimalType(18, 6)))
          .cast("double").as("sum_charge"),
        (sum(dec($"l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
  }

  private val q1Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) * (1 + CAST(l_tax AS DECIMAL(12,2))) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_lineitem_agg" -> q1LineitemAgg,
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_lineitem_agg" -> q1Sql,
  )
}
