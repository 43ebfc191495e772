package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.RangeJoin

/** RangeJoin.pointInInterval over a STREAMING point side: the binned
  * equi-join is a plain stream-static inner join (bin + keys are
  * scalar columns), natively supported in append mode with no state
  * store — each micro-batch probes the static interval side. The
  * emitted rows must equal the batch join over the same points. */
class StreamRangeJoinSpec extends SparkSpec {

  test("streaming points x static intervals equals the batch range join") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ivals = Seq(("u1", 0L, 10L), ("u1", 95L, 130L), ("u2", -30L, -20L))
      .toDF("k", "lo", "hi")
    val points = Seq((1L, "u1", 0L), (2L, "u1", 9L), (3L, "u1", 100L),
      (4L, "u2", -25L), (5L, "u2", 50L))
    val want = RangeJoin.pointInInterval(points.toDF("pid", "k", "t"), ivals,
        Seq("k"), "t", "lo", "hi", binWidth = 10L)
      .select("pid", "lo").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.nonEmpty)
    val mem = MemoryStream[(Long, String, Long)]
    val out = RangeJoin.pointInInterval(mem.toDF().toDF("pid", "k", "t"),
      ivals, Seq("k"), "t", "lo", "hi", binWidth = 10L)
    assert(out.isStreaming)
    val query = out.writeStream.format("memory").queryName("srj")
      .outputMode("append").start()
    try {
      mem.addData(points.take(2): _*); query.processAllAvailable()
      mem.addData(points.drop(2): _*); query.processAllAvailable()
      val got = spark.sql("SELECT pid, lo FROM srj")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want, s"stream/batch divergence: got=$got want=$want")
    } finally query.stop()
  }
}
