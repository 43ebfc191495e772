package graft.sinks

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

import graft.SparkSpec

class BucketedSpec extends SparkSpec {

  test("join of co-bucketed tables plans without a shuffle exchange") {
    import spark.implicits._
    val left = (1L to 1000L).map(i => (i, s"l$i")).toDF("k", "lv")
    val right = (1L to 1000L).map(i => (i, i * 2)).toDF("k", "rv")
    Bucketed.save(left, "bkt_left", Seq("k"), buckets = 4)
    Bucketed.save(right, "bkt_right", Seq("k"), buckets = 4)
    try {
      // forbid broadcast so the join must be sort-merge — the bucketed
      // layout then has to carry the co-location
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bkt_left").join(spark.table("bkt_right"), "k")
      val shuffles = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(shuffles.isEmpty,
        s"expected exchange-free co-located join, got:\n${joined.queryExecution.executedPlan}")
      assert(joined.count() == 1000)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS bkt_left")
      spark.sql("DROP TABLE IF EXISTS bkt_right")
    }
  }
}
