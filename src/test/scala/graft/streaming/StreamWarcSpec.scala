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

  test("record-extraction stream == batch: UTF-8 payloads served " +
    "bit-exact across arrival waves; corrupt files serve nothing") {
    import org.apache.spark.sql.functions.{col, md5}
    val dir = Files.createTempDirectory("stream_warc_rec").toString
    def utf8Docs(ids: Range) = {
      import spark.implicits._
      ids.map(i => (i.toLong, s"src${i % 2}", s"é→☃🎉 body $i"))
        .toDF("doc_id", "source", "text")
    }
    WarcFiles.writeUtf8ArchiveDir(utf8Docs(0 until 6), dir, files = 3)
    val query = StreamWarc.records(spark, dir)
      .select(col("file"), col("uri"), md5(col("body")).as("h"))
      .writeStream.format("memory").queryName("sw_records")
      .outputMode("append").start()
    try {
      query.processAllAvailable()
      assert(spark.sql("SELECT * FROM sw_records").count() === 6)
      // wave 2: three more UTF-8 files plus one corrupt gzip
      val gen2 = Files.createTempDirectory("stream_warc_rec2").toString
      WarcFiles.writeUtf8ArchiveDir(utf8Docs(100 until 106), gen2, files = 3)
      java.nio.file.Files.list(java.nio.file.Paths.get(gen2)).forEach { p =>
        java.nio.file.Files.move(p,
          java.nio.file.Paths.get(dir, "gen2-" + p.getFileName.toString))
      }
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, "junk.warc.gz"),
        Array[Byte](0, 0, 13, 37))
      query.processAllAvailable()
      val streamed = spark.sql("SELECT uri, h FROM sw_records").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      val batch = WarcFiles.readRecords(spark, dir)
        .select(col("uri"), md5(col("body")).as("h")).collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(streamed.size === 12, s"expected 12 records, got ${streamed.size}")
      assert(streamed === batch,
        "streamed record payloads diverged from the batch reader")
    } finally query.stop()
  }

  test("revisit stream == batch (r19): landed revisit markers serve " +
    "their dup edges across arrival waves through the shared map") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("stream_warc_rev").toString
    WarcFiles.writeRevisitArchiveDir(docsDf(0 until 9), dir, files = 3,
      revisitEvery = 3)
    val query = StreamWarc.revisits(spark, dir)
      .writeStream.format("memory").queryName("sw_revisits")
      .outputMode("append").start()
    try {
      query.processAllAvailable()
      val wave1 = spark.sql("SELECT uri, refers_to FROM sw_revisits")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(wave1.size === 3, s"ids 0/3/6 revisit, got ${wave1.size}")
      assert(wave1.values.toSet ===
        Set(0L, 3L, 6L).map(i => s"http://src${i % 2}/doc/$i"))
      // wave 2: more landed files with their own revisits
      val gen2 = Files.createTempDirectory("stream_warc_rev2").toString
      WarcFiles.writeRevisitArchiveDir(docsDf(100 until 106), gen2,
        files = 3, revisitEvery = 3)
      java.nio.file.Files.list(java.nio.file.Paths.get(gen2)).forEach { p =>
        java.nio.file.Files.move(p,
          java.nio.file.Paths.get(dir, "gen2-" + p.getFileName.toString))
      }
      query.processAllAvailable()
      val streamed = spark.sql("SELECT uri, refers_to FROM sw_revisits")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      val batch = WarcFiles.readRevisits(spark, dir)
        .select(col("uri"), col("refers_to")).collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(streamed === batch,
        "streamed revisit edges diverged from the batch reader")
      assert(streamed.size === 5) // 0,3,6 + 102,105... ids%3==0
    } finally query.stop()
  }

  test("text-dispatch stream == batch: the corpus-build front end " +
    "routes and extracts identically across arrival waves, drops " +
    "non-text records, keeps failed extractions countable") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("stream_warc_txt").toString
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    def typedRows(ids: Range) = ids.map { i =>
      val text = s"Ünicode→ body $i"
      val (body, ct) = (i % 4) match {
        case 0 => (graft.operators.HtmlExtract.encodePage(i.toLong, text)
          .getBytes(utf8), "text/html")
        case 1 => (graft.operators.PdfExtract.encodePdf(i.toLong, text),
          "application/pdf")
        case 2 => (text.getBytes(utf8), "text/plain; charset=utf-8")
        case _ => (Array[Byte](9, 8, 7), "application/octet-stream")
      }
      (i.toLong, s"src${i % 2}", body, ct)
    }
    WarcFiles.writeTypedArchiveDir(typedRows(0 until 8), dir, files = 2,
      tornFile = -1, corruptFile = -1)
    val query = StreamWarc.textRecords(spark, dir)
      .writeStream.format("memory").queryName("sw_text")
      .outputMode("append").start()
    try {
      query.processAllAvailable()
      // 8 docs, 2 of them binary -> 6 text rows
      assert(spark.sql("SELECT * FROM sw_text").count() === 6)
      // wave 2, including a truncated PDF (extraction fails, row stays)
      val tornPdf = graft.operators.PdfExtract.encodePdf(101L, "gone")
      val gen2 = Files.createTempDirectory("stream_warc_txt2").toString
      WarcFiles.writeTypedArchiveDir(
        typedRows(104 until 108) :+
          ((101L, "src1", java.util.Arrays.copyOfRange(
            tornPdf, 0, tornPdf.length / 2), "application/pdf")),
        gen2, files = 1, tornFile = -1, corruptFile = -1)
      java.nio.file.Files.list(java.nio.file.Paths.get(gen2)).forEach { p =>
        java.nio.file.Files.move(p,
          java.nio.file.Paths.get(dir, "gen2-" + p.getFileName.toString))
      }
      query.processAllAvailable()
      def keyed(rows: Array[Row]) = rows.map(r =>
        r.getAs[Long]("doc_id") -> ((r.getAs[String]("source"),
          r.getAs[Boolean]("ok"), r.getAs[String]("text")))).toMap
      val streamed = keyed(spark.sql(
        "SELECT doc_id, source, ok, text FROM sw_text").collect())
      val batch = keyed(WarcFiles.dispatchText(
          WarcFiles.readRecords(spark, dir))
        .select(col("doc_id"), col("source"), col("ok"), col("text"))
        .collect())
      assert(streamed.size === 10, s"expected 10 text rows, got ${streamed.size}")
      assert(streamed === batch,
        "streamed text dispatch diverged from the batch funnel")
      assert(streamed(101L) === (("src1", false, "")),
        "failed extraction must keep its countable ok=false row")
      assert(streamed(104L)._3 === "Ünicode→ body 104")
    } finally query.stop()
  }

  test("mediaRecords: streamed media sniffing == the batch q260 dispatch " +
    "across arrival waves; non-media yields no row, truncated media " +
    "keeps its ok=0 row") {
    val dir = Files.createTempDirectory("stream_warc_media").toString
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val payload = "stream media payload".getBytes(utf8)
    def wave(ids: Seq[Long]): Seq[(Long, String, Array[Byte], String)] =
      ids.map { i =>
        val (body, ct) = (i % 4) match {
          case 0 => (graft.operators.MediaCodec.encodePng(i, payload),
            "image/png")
          case 1 => (graft.operators.MediaCodec.encodeWav(i, payload),
            "audio/wav")
          case 2 => (graft.operators.MediaCodec
            .encodeMp4(i, payload).take(8), "video/mp4") // truncated
          case _ => (s"text $i".getBytes(utf8), "text/plain")
        }
        (i, s"src${i % 2}", body, ct)
      }
    WarcFiles.writeTypedArchiveDir(wave(0L until 8L), dir, files = 2,
      tornFile = -1, corruptFile = -1)
    val query = StreamWarc.mediaRecords(spark, dir)
      .writeStream.format("memory").queryName("sw_media")
      .outputMode("append").start()
    try {
      query.processAllAvailable()
      // 8 docs: 2 text rows excluded -> 6 media rows
      assert(spark.sql("SELECT * FROM sw_media").count() === 6)
      val gen2 = Files.createTempDirectory("stream_warc_media2").toString
      WarcFiles.writeTypedArchiveDir(wave(100L until 104L), gen2,
        files = 1, tornFile = -1, corruptFile = -1)
      java.nio.file.Files.list(java.nio.file.Paths.get(gen2)).forEach { p =>
        java.nio.file.Files.move(p,
          java.nio.file.Paths.get(dir, "gen2-" + p.getFileName.toString))
      }
      query.processAllAvailable()
      def keyed(rows: Array[Row]) = rows.map(r =>
        r.getAs[Long]("doc_id") -> ((r.getAs[String]("sniffed"),
          r.getAs[Int]("ok"), r.getAs[Long]("n_bytes")))).toMap
      val streamed = keyed(spark.sql(
        "SELECT doc_id, sniffed, ok, n_bytes FROM sw_media").collect())
      val batch = keyed(WarcFiles.dispatchMedia(
          WarcFiles.readRecords(spark, dir))
        .select("doc_id", "sniffed", "ok", "n_bytes")
        .collect())
      assert(streamed.size === 9, s"expected 9 media rows, got ${streamed.size}")
      assert(streamed === batch,
        "streamed media sniffing diverged from the batch dispatch")
      assert(streamed(2L) === (("", 0, 8L)),
        "truncated media must keep its countable ok=0 row")
      assert(streamed(100L)._1 === "png")
    } finally query.stop()
  }

  test("serveOversize stream == batch (r18): landed files past the " +
    "binaryFile ceiling serve their records and real statuses through " +
    "the SAME bounded walk as the batch reader") {
    val dir = Files.createTempDirectory("stream_warc_oversize").toString
    WarcFiles.writeArchiveDir(docsDf(0 until 8), dir, files = 4,
      tornEvery = 0)
    // ground truth before the ceiling drops
    val batchAudit = rows(WarcFiles.readAudit(spark, dir).collect())
    val key = "spark.sql.sources.binaryFile.maxLength"
    spark.conf.set(key, "8") // every file routes through the stream walk
    val query = StreamWarc.audit(spark, dir, serveOversize = true)
      .writeStream.format("memory").queryName("sw_oversize")
      .outputMode("append").start()
    try {
      query.processAllAvailable()
      val streamed = rows(spark.sql("SELECT * FROM sw_oversize").collect())
      assert(streamed === batchAudit,
        "streamed oversized audit diverges from the unconstrained batch")
      assert(streamed.values.forall(_._1 == "warc_ok"))
      // the records twin serves every record too
      val q2 = StreamWarc.records(spark, dir, serveOversize = true)
        .writeStream.format("memory").queryName("sw_oversize_recs")
        .outputMode("append").start()
      try {
        q2.processAllAvailable()
        val n = spark.sql("SELECT * FROM sw_oversize_recs").count()
        assert(n === 8L, s"expected 8 served response records, got $n")
      } finally q2.stop()
    } finally { query.stop(); spark.conf.unset(key) }
  }
}
