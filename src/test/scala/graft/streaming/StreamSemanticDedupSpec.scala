package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.{Dedup, Similarity}

case class EmbRow(vec_id: Long, embedding: Seq[Float])

/** Stream-static semantic dedup must match its batch sibling
  * (semanticDedupIncremental) pair-for-pair across micro-batches. */
class StreamSemanticDedupSpec extends SparkSpec {

  test("streamed probe equals the batch incremental result across batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val e = Tables.embeddings(spark, "/root/testdata/sf0.01")
      .select(col("vec_id"), col("embedding"))
    val slice = pmod(Dedup.baseHash32(col("vec_id").cast("string")), lit(10))
    val corpusSide = e.filter(slice =!= 0)
    val batchSide = e.filter(slice === 0)
    val cents = Similarity.collectCentroids(
      e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cell"), col("embedding").as("ce")))

    val want = Similarity
      .semanticDedupIncremental(corpusSide, batchSide, cents = e
        .filter(col("vec_id") < 8)
        .select(col("vec_id").as("cell"), col("embedding").as("ce")),
        threshold = 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.nonEmpty)

    val batchRows = batchSide.collect()
      .map(r => EmbRow(r.getLong(0), r.getSeq[Float](1)))
    val (first, second) = batchRows.splitAt(batchRows.length / 2)

    val mem = MemoryStream[EmbRow]
    val out = StreamSemanticDedup.probe(mem.toDF(), corpusSide, cents, 0.35)
    val query = out.writeStream.format("memory").queryName("sem_dedup_stream")
      .outputMode("append").start()
    try {
      mem.addData(first.toIndexedSeq)
      query.processAllAvailable()
      mem.addData(second.toIndexedSeq)
      query.processAllAvailable()
      val got = spark.sql("SELECT vec_id, dup_of FROM sem_dedup_stream")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want,
        s"stream/batch divergence: extra=${got -- want}, missing=${want -- got}")
    } finally query.stop()
  }
}
