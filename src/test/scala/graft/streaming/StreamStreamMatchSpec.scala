package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

case class Qe(key: Long, queryTime: Timestamp)
case class Re(key: Long, responseTime: Timestamp)

class StreamStreamMatchSpec extends SparkSpec {
  private def t(s: Long) = new Timestamp(1000L * s)

  test("watermarked stream-stream join matches within the horizon only") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val qs = MemoryStream[Qe]
    val rs = MemoryStream[Re]
    val out = StreamStreamMatch.deltas(qs.toDF(), rs.toDF(), Seq("key"),
      horizon = "10 seconds", watermark = "1 minute")
    val query = out.writeStream.format("memory").queryName("ssj")
      .outputMode("append").start()
    try {
      qs.addData(Qe(1, t(100)), Qe(2, t(100)))
      rs.addData(
        Re(1, t(105)),  // inside horizon: match, 5 s
        Re(2, t(115)),  // beyond 10 s horizon: no match
        Re(3, t(104)))  // no query on key 3
      query.processAllAvailable()
      val got = spark.sql("SELECT key, delta_us FROM ssj").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((1L, 5000000L)))
    } finally query.stop()
  }
}
