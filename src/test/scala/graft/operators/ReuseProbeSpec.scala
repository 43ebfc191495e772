package graft.operators

import graft.SparkSpec

/** Pins incrementalJaccardPairs' materialize-once plan shape: the capped
  * inverted index feeds four consumers (sizes and the candidate join,
  * each for both sides), and without the eager checkpoint Spark
  * duplicates the tokenize/explode/distinct/window subtree per consumer
  * (measured in round 6: 4 window evaluations, 12 table scans, no
  * exchange reuse because the joins broadcast). */
class ReuseProbeSpec extends SparkSpec {
  test("q61's join plan reads the checkpointed index, not re-derived scans") {
    val df = graft.SparkEntry.queries("q61_incremental_dedup")(
      spark, "/root/testdata/sf0.001")
    df.count()
    val fin = df.queryExecution.executedPlan.toString
    def n(s: String) = s.r.findAllIn(fin).length
    assert(n("Scan parquet") == 0,
      s"capped index re-derived from source: ${n("Scan parquet")} scans")
    assert(n("Window ") == 0,
      s"df-cap window re-evaluated in the join plan: ${n("Window ")} windows")
  }
}
