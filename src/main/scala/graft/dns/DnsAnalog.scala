package graft.dns

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic mapping from the driver's synthetic `events` table onto the
  * reference's DNS record model (SURVEY §1.1: Query / Response rows), so the
  * DNS pipeline operators — grouping-set aggregation, success-drop filter,
  * latency matching, the documented Grafana queries — can be exercised and
  * DuckDB-oracle-checked on driver testdata.
  *
  * Mapping (documented contract, mirrored in SparkEntry.oracleSql):
  *   identity        := event_type                      (DNS server identity)
  *   query_address   := CAST(user_id AS STRING)         (client address)
  *   question_name   := props →'$.k'                    (qname)
  *   question_type   := value<5 → 'A' | <10 → 'AAAA' | else 'MX'
  *   response_status := value<2 → 'NOERROR' | <10 → 'NXDOMAIN' | else 'SERVFAIL'
  *   ts              := event time; counter := 1        (P8 counter seed)
  */
object DnsAnalog {

  /** Query-record analog (reference Query struct, aggregator.go:55-64). */
  def queries(events: DataFrame): DataFrame = events.select(
    col("event_type").as("identity"),
    col("user_id").cast("string").as("query_address"),
    get_json_object(col("props"), "$.k").as("question_name"),
    when(col("value") < 5, "A").when(col("value") < 10, "AAAA").otherwise("MX")
      .as("question_type"),
    col("ts"),
    lit(1L).as("counter"))

  /** Response-record analog (reference Response struct, aggregator.go:75-86):
    * adds response_status and the is_success flag (P7, dnstap.go:345). */
  def responses(events: DataFrame): DataFrame = events.select(
    col("event_type").as("identity"),
    when(col("value") < 2, "NOERROR").when(col("value") < 10, "NXDOMAIN")
      .otherwise("SERVFAIL").as("response_status"),
    col("user_id").cast("string").as("query_address"),
    get_json_object(col("props"), "$.k").as("question_name"),
    when(col("value") < 5, "A").when(col("value") < 10, "AAAA").otherwise("MX")
      .as("question_type"),
    col("ts"),
    (when(col("value") < 2, true).otherwise(false)).as("is_success"),
    lit(1L).as("counter"))

  /** Shared oracle-SQL CTE implementing the same mapping for DuckDB. */
  val oracleCte: String =
    """WITH dns AS (
      |  SELECT event_type AS identity,
      |         CAST(user_id AS VARCHAR) AS query_address,
      |         json_extract_string(props, '$.k') AS question_name,
      |         CASE WHEN value < 5 THEN 'A' WHEN value < 10 THEN 'AAAA' ELSE 'MX' END AS question_type,
      |         CASE WHEN value < 2 THEN 'NOERROR' WHEN value < 10 THEN 'NXDOMAIN' ELSE 'SERVFAIL' END AS response_status,
      |         ts
      |  FROM events)""".stripMargin
}
