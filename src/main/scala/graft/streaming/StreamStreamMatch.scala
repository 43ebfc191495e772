package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The idiomatic stream-stream form of the query↔response latency match
  * (SURVEY §2.6 option 1): a watermarked inner join on the match key with
  * a time-range predicate — responses join queries that arrived within
  * `horizon` before them.
  *
  * Trade-off vs the faithful matcher (LatencyMatcher): this form is a
  * declarative join Catalyst fully owns — state cleanup from both
  * watermarks, codegen'd predicates, and the state store keyed by the
  * join key. It relaxes single-partner consumption (a query matches every
  * response inside the horizon, not just the first) and the
  * collision-discard rule; where those semantics matter use
  * LatencyMatcher, where throughput matters use this.
  */
object StreamStreamMatch {

  /** @param queries   stream with key cols + `queryTime` timestamp
    * @param responses stream with key cols + `responseTime` timestamp
    * @param keys      equality join columns present on both sides
    * @param horizon   max queryTime→responseTime distance, e.g. "10 seconds"
    * @param watermark max event-time disorder tolerated per side
    */
  def deltas(queries: DataFrame, responses: DataFrame, keys: Seq[String],
             horizon: String, watermark: String): DataFrame = {
    val q = queries.withWatermark("queryTime", watermark)
    val r = responses.withWatermark("responseTime", watermark)
      .select(keys.map(c => col(c).as(s"r_$c")) :+ col("responseTime"): _*)
    val keyEq = keys.map(c => col(c) === col(s"r_$c")).reduce(_ && _)
    q.join(r, keyEq &&
        col("responseTime") >= col("queryTime") &&
        col("responseTime") <= col("queryTime") + expr(s"INTERVAL $horizon"))
      .select(keys.map(col) :+ col("responseTime") :+
        (unix_micros(col("responseTime")) - unix_micros(col("queryTime")))
          .as("delta_us"): _*)
  }
}
