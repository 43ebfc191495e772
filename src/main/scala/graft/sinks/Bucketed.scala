package graft.sinks

import org.apache.spark.sql.DataFrame

/** Bucketed-table layout for co-located joins — the at-rest partitioning
  * strategy for fact-to-fact joins that would otherwise shuffle both sides
  * every query (SURVEY §1.4: tables exist at rest; at 100 TB the join key
  * layout IS the performance model).
  *
  * Writing both sides bucketed (and sorted) by the join key lets Spark
  * plan a sort-merge join with NO exchange on either side: each task reads
  * matching bucket files directly. One write-time shuffle amortizes over
  * every subsequent join/aggregation on that key.
  */
object Bucketed {

  /** Save as a bucketed+sorted managed table (parquet). */
  def save(df: DataFrame, table: String, keys: Seq[String],
           buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
}
