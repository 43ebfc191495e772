package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.Classifier

/** Streaming scoring with a frozen classifier must equal the batch
  * operator on the same rows — the typed map is stateless, so
  * micro-batch slicing cannot change a prediction. Also exercises the
  * artifact path: the streamed model goes through a parquet write +
  * reload first (the shape a real scoring job uses). */
class StreamClassifySpec extends SparkSpec {

  private val labeled = Seq(
    (1L, "good clean prose text", 1),
    (2L, "spam spam buy now", 0),
    (3L, "clean text about prose", 1),
    (4L, "buy spam now now now", 0),
    (5L, "prose text clean good", 1))

  private val arriving = Seq(
    RawDoc(10L, "clean prose"), RawDoc(11L, "spam buy now"),
    RawDoc(12L, ""), RawDoc(13L, "text now"))

  test("stream scores == batch scores with a parquet-roundtripped model") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val model = Classifier.trainLogReg(
      labeled.toDF("doc_id", "text", "label"), "text", "label",
      buckets = 64, iters = 10, lr = 0.5)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_stream_clf").toString
    Classifier.writeModel(spark, model, dir)
    val reloaded = Classifier.readModel(spark, dir)

    val rawDf = arriving.toDF()
    val batch = Classifier.scoreWith(rawDf, "doc_id", "text", reloaded)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap

    val mem = MemoryStream[RawDoc]
    val out = StreamClassify.score(mem.toDF(), "doc_id", "text", reloaded)
    assert(out.isStreaming)
    val query = out.writeStream.format("memory").queryName("clf_stream")
      .outputMode("append").start()
    try {
      mem.addData(arriving.take(2): _*)
      query.processAllAvailable()
      mem.addData(arriving.drop(2): _*)
      query.processAllAvailable()
      val streamed = spark.sql("SELECT doc_id, p_micro, pred FROM clf_stream")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
      assert(streamed == batch)
    } finally query.stop()

    // the gate learned the vocabulary split: clean prose in, spam out
    assert(batch(10L)._2 == 1 && batch(11L)._2 == 0)
  }
}
