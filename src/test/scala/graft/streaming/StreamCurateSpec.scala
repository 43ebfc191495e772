package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

class StreamCurateSpec extends SparkSpec {

  // positive weight on every bucket: any sufficiently long doc passes
  // the model floor; a negative-everything vector rejects all
  private val passAll = Seq.fill(8)(100)
  private val rejectAll = Seq.fill(8)(-100)

  private val eval = Seq("held out benchmark answer one two three four five")

  private def docsSeq = {
    val clean = ("the " + (1 to 30).map(i => s"w$i").mkString(" ")) + " and of to in a is"
    Seq(
      Doc(1L, clean),                                          // passes all
      Doc(2L, "too short"),                                    // gate: length
      Doc(3L, clean + " mail bob@example.com today"),          // passes, PII
      Doc(4L, "leak: held out benchmark answer one two three four five " +
        "the and of " + (1 to 20).map(i => s"x$i").mkString(" ")) // contaminated
    )
  }

  test("stream curate == batch curate; gate, model, scrub all apply") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val hashes = StreamScrub.evalShingleHashes(eval.toDF("text"), "text", n = 5)

    val batch = StreamCurate.curate(docsSeq.toDF("doc_id", "text"), hashes,
        "text", passAll, minScoreMilliPerToken = 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(batch.keySet == Set(1L, 3L))
    assert(batch(3L).contains("<EMAIL>"))

    val mem = MemoryStream[Doc]
    val out = StreamCurate.curate(mem.toDF(), hashes, "text", passAll,
      minScoreMilliPerToken = 1)
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("curate_stream")
      .outputMode("append").start()
    try {
      mem.addData(docsSeq: _*)
      q.processAllAvailable()
      val streamed = spark.sql("SELECT doc_id, text FROM curate_stream")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(streamed == batch)
    } finally q.stop()

    // the model floor actually bites: all-negative weights reject everything
    val none = StreamCurate.curate(docsSeq.toDF("doc_id", "text"), hashes,
      "text", rejectAll, minScoreMilliPerToken = 1)
    assert(none.count() == 0)
  }
}
