package graft.streaming

import graft.{PipelineThroughput, SparkSpec}

/** The BENCH throughput harness end-to-end at sf0.001: every generated
  * frame is fed through the unix-socket source, consumed by the W1
  * branch, and the aggregated output reaches both sinks. */
class PipelineThroughputSpec extends SparkSpec {

  test("all frames flow ingest→aggregate→sink and the rate is positive") {
    val r = PipelineThroughput.run(spark, "/root/testdata/sf0.001",
      targetFrames = 4000L, emitters = 2, deadlineSecs = 300)
    // 1000 events × 2 frames × 2 repeats
    assert(r.frames == 4000L)
    assert(r.rowsPerSec > 0)
    assert(r.batches >= 1)
    // both aggregation legs delivered rows (3 of 4 responses are NOERROR
    // and drop at Fl4; the quarter with NXDOMAIN must survive)
    assert(r.queryAggRows > 0)
    assert(r.responseAggRows > 0)
  }
}
