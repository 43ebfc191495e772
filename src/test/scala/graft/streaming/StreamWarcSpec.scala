package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.Row

import graft.SparkSpec
import graft.sources.WarcFiles

/** The streaming WARC leg must equal the batch reader file-for-file
  * (shared decode map) across multi-micro-batch arrival, including the
  * torn and corrupt classes, and must never reprocess an already-seen
  * file. */
class StreamWarcSpec extends SparkSpec {

  private def docsDf(ids: Range) = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"src${i % 2}", s"text body $i " * (i % 5 + 1)))
      .toDF("doc_id", "source", "text")
  }

  private def rows(df: Array[Row]): Map[String, (String, Int, Long)] =
    df.map(r => r.getAs[String]("file") ->
      ((r.getAs[String]("status"), r.getAs[Int]("n_records"),
        r.getAs[Long]("body_chars")))).toMap

  test("stream == batch across two arrival waves, torn and corrupt " +
    "classes included, no reprocessing") {
    val dir = Files.createTempDirectory("stream_warc").toString
    // wave 1: 4 clean files (2 plain + 2 gzip)
    WarcFiles.writeArchiveDir(docsDf(0 until 8), dir, files = 4,
      tornEvery = 0)
    val query = StreamWarc.audit(spark, dir)
      .writeStream.format("memory").queryName("sw_audit")
      .outputMode("append").start()
    try {
      query.processAllAvailable()
      val wave1 = spark.sql("SELECT * FROM sw_audit").collect()
      assert(wave1.length === 4, s"wave 1 expected 4 files, got ${wave1.length}")
      assert(wave1.forall(_.getAs[String]("status") == "warc_ok"))
      // wave 2: a second generation lands — 10 docs over 10 files named
      // gen2-*, with f=0 torn plain and f=5 corrupt gzip
      val gen2 = Files.createTempDirectory("stream_warc_gen2").toString
      WarcFiles.writeArchiveDir(docsDf(100 until 110), gen2, files = 10,
        tornEvery = 5)
      java.nio.file.Files.list(java.nio.file.Paths.get(gen2)).forEach { p =>
        java.nio.file.Files.move(p,
          java.nio.file.Paths.get(dir, "gen2-" + p.getFileName.toString))
      }
      query.processAllAvailable()
      val all = spark.sql("SELECT * FROM sw_audit").collect()
      assert(all.length === 14, s"expected 4 + 10 rows, got ${all.length}")
      // no reprocessing: wave-1 files appear exactly once
      assert(all.map(_.getAs[String]("file"))
        .groupBy(identity).values.forall(_.length == 1))
      // stream == batch: the batch reader over the same directory
      // produces the identical per-file audit
      val batch = rows(WarcFiles.readAudit(spark, dir).collect())
      assert(rows(all) === batch)
      // the damage taxonomy surfaced through the stream
      val byStatus = all.groupBy(_.getAs[String]("status"))
        .view.mapValues(_.length).toMap
      assert(byStatus("warc_torn") === 1)
      assert(byStatus("warc_corrupt") === 1)
      assert(byStatus("warc_ok") === 12)
    } finally query.stop()
  }
}
