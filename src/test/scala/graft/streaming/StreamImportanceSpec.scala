package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.Importance

case class RawDoc(doc_id: Long, text: String)

/** Streaming DSIR scoring with a frozen ratio table must equal the
  * batch operator on the same rows — the expression is stateless, so
  * micro-batch slicing cannot change a score. */
class StreamImportanceSpec extends SparkSpec {

  private val target = Seq("aa bb aa cc", "bb bb dd")
  private val arriving = Seq(
    RawDoc(1L, "aa bb cc"), RawDoc(2L, "xx yy zz"),
    RawDoc(3L, "aa aa aa bb"), RawDoc(4L, ""), RawDoc(5L, "dd xx"))

  test("stream scores == batch scores with the same frozen table") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val rawDf = arriving.toDF()
    val tgtDf = target.toDF("text")
    val table = Importance.ratioTable(rawDf, tgtDf, "text", buckets = 16)

    val batch = Importance.scoreWith(rawDf, "doc_id", "text", table)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

    val mem = MemoryStream[RawDoc]
    val out = StreamImportance.score(mem.toDF(), "doc_id", "text", table)
    assert(out.isStreaming)
    val query = out.writeStream.format("memory").queryName("dsir_stream")
      .outputMode("append").start()
    try {
      mem.addData(arriving.take(2): _*)
      query.processAllAvailable()
      mem.addData(arriving.drop(2): _*)
      query.processAllAvailable()
      val streamed = spark.sql("SELECT doc_id, n_tokens, score FROM dsir_stream")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(streamed == batch)
    } finally query.stop()

    // and the table steers as intended: the in-target-vocabulary doc
    // outranks the out-of-vocabulary one
    assert(batch(1L)._2 > batch(2L)._2)
  }
}
