package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The q133 sketch-rollup laws: merging per-shard partial HLL sketches
  * must equal the one-shot sketch EXACTLY (register maxima commute),
  * and the estimate must sit within HLL's error envelope of the exact
  * distinct count. */
class SketchRollupSpec extends SparkSpec {

  test("union of partial sketches equals the one-shot sketch estimate") {
    import spark.implicits._
    val df = (0L until 5000L)
      .map(i => (s"s${i % 4}", i % 1500)).toDF("source", "v")
    val oneShot = df.groupBy("source")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("v"))).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val merged = df.withColumn("shard", col("v") % 7)
      .groupBy("source", "shard").agg(hll_sketch_agg(col("v")).as("sk"))
      .groupBy("source")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == oneShot, s"merge law broken: $merged vs $oneShot")
    // error envelope: default lgConfigK=12 => ~1.6% stderr; allow 5%
    val exact = df.distinct().groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    oneShot.foreach { case (src, est) =>
      assert(math.abs(est - exact(src)) <= exact(src) * 0.05,
        s"$src: estimate $est vs exact ${exact(src)} out of envelope") }
  }
}
