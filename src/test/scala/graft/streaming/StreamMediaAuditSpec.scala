package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.operators.MediaCodec

class StreamMediaAuditSpec extends SparkSpec {

  // ids straddle every doc_id % 5 format class and include corrupt rows
  // (0, 37, 74 are % 37 == 0)
  private val docs = (0L until 80L).map(i => Doc(i, s"payload number $i with text"))

  test("streaming ledger equals the batch audit and the writer still runs") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    // batch reference over the SAME docs
    val batchAudit = MediaCodec.audit(
        MediaCodec.attachMediaExt(docs.toDF("doc_id", "text")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val wantDocs = batchAudit.values.sum
    val wantCorrupt = batchAudit.getOrElse("corrupt", 0L)
    assert(wantCorrupt > 0L, "fixture must include corrupt rows")

    val counters = new StatsReporter.Counters
    val written = new java.util.concurrent.atomic.AtomicLong
    val mem = MemoryStream[Doc]
    val out = MediaCodec.attachMediaExt(mem.toDF()).toDF()
    assert(out.isStreaming)
    val query = out.writeStream
      .foreachBatch(StreamMediaAudit.withLedger(counters) {
        (batch: DataFrame, _: Long) => written.addAndGet(batch.count()); ()
      })
      .start()
    try {
      // two micro-batches: the ledger must ACCUMULATE across batches
      mem.addData(docs.take(30): _*)
      query.processAllAvailable()
      mem.addData(docs.drop(30): _*)
      query.processAllAvailable()
    } finally query.stop()

    assert(counters.mediaDocs.get == wantDocs)
    assert(counters.mediaCorrupt.get == wantCorrupt)
    // the wrapped writer saw every row, corrupt ones included (dropping
    // is the DECODER's job downstream; the ledger only observes)
    assert(written.get == docs.length.toLong)
    // and the ledger surfaces in the reporter line
    val line = StatsReporter.line(counters, 15)
    assert(line.contains(s"mediaDocs=$wantDocs"))
    assert(line.contains(s"mediaCorrupt=$wantCorrupt"))
  }

  test("video containers flow through the same ledger: mp4 counted, overruns corrupt") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // ids include % 47 == 0 rows (0, 47): the nested-box overrun slice
    val batchAudit = MediaCodec.audit(
        MediaCodec.attachVideo(docs.toDF("doc_id", "text")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(batchAudit.getOrElse("corrupt", 0L) == 2L)
    assert(batchAudit("mp4") == docs.length - 2L)

    val counters = new StatsReporter.Counters
    val mem = MemoryStream[Doc]
    val out = MediaCodec.attachVideo(mem.toDF()).toDF()
    val query = out.writeStream
      .foreachBatch(StreamMediaAudit.withLedger(counters) {
        (_: DataFrame, _: Long) => ()
      })
      .start()
    try {
      mem.addData(docs: _*)
      query.processAllAvailable()
    } finally query.stop()
    assert(counters.mediaDocs.get == docs.length.toLong)
    assert(counters.mediaCorrupt.get == 2L)
  }
}
