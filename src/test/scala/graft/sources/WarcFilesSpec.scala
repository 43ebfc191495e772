package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.Row

import graft.SparkSpec
import graft.operators.Warc

/** The real-file WARC source must read a directory of .warc/.warc.gz
  * files, keep complete records ahead of a tear, count (never throw on)
  * undecodable files, and replay the deterministic damage arithmetic
  * the q252 oracle pins. */
class WarcFilesSpec extends SparkSpec {

  private def docsDf = {
    import spark.implicits._
    // 10 docs over 4 files: f = doc_id % 4; f∈{1,3} gzipped;
    // tornEvery=2 damages f∈{0,2}: f=0 torn plain, f=2 torn plain,
    // none gzip-corrupt (0 and 2 are even) — a second fixture below
    // covers the corrupt-gzip class
    (0L until 10L).map(i => (i, s"src${i % 3}", s"body text $i " * (i.toInt + 1)))
      .toDF("doc_id", "source", "text")
  }

  private def audit(dir: String): Map[String, Row] =
    WarcFiles.readAudit(spark, dir).collect()
      .map(r => r.getAs[String]("file") -> r).toMap

  test("round trip: clean plain and gzip files certify all records and " +
    "the exact body volume") {
    val dir = Files.createTempDirectory("warcfiles_clean").toString
    WarcFiles.writeArchiveDir(docsDf, dir, files = 4, tornEvery = 0)
    val got = audit(dir)
    assert(got.keySet ===
      Set("part-0.warc", "part-1.warc.gz", "part-2.warc", "part-3.warc.gz"))
    val docs = docsDf.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2)))
    (0 until 4).foreach { f =>
      val mine = docs.filter(_._1 % 4 == f)
      val name = s"part-$f" + (if (f % 2 == 1) ".warc.gz" else ".warc")
      val row = got(name)
      assert(row.getAs[String]("status") === "warc_ok", name)
      assert(row.getAs[Int]("n_records") === 2 * mine.length, name)
      assert(row.getAs[Int]("n_responses") === mine.length, name)
      assert(row.getAs[Long]("body_chars") ===
        mine.map(_._3.length.toLong).sum, name)
    }
  }

  test("torn plain file: complete records ahead of the half-cut tear " +
    "are kept; the last doc's request survives iff the cut clears it") {
    val dir = Files.createTempDirectory("warcfiles_torn").toString
    WarcFiles.writeArchiveDir(docsDf, dir, files = 4, tornEvery = 2)
    val got = audit(dir)
    val docs = docsDf.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2)))
    Seq(0, 2).foreach { f =>
      val mine = docs.filter(_._1 % 4 == f).sortBy(_._1)
      val (lid, lsrc, ltext) = mine.last
      val lastArch = Warc.encodeArchive(lid, lsrc, ltext)
      // replay the cut in memory: request record length r1
      val r1 = lastArch.indexOf("WARC/1.0", 1)
      val reqKept = if (lastArch.length / 2 >= r1) 1 else 0
      val row = got(s"part-$f.warc")
      assert(row.getAs[String]("status") === "warc_torn")
      assert(row.getAs[Int]("n_records") === 2 * (mine.length - 1) + reqKept)
      assert(row.getAs[Int]("n_responses") === mine.length - 1)
      assert(row.getAs[Long]("body_chars") ===
        mine.init.map(_._3.length.toLong).sum)
    }
    // untouched gzip files still certify clean
    Seq(1, 3).foreach(f =>
      assert(got(s"part-$f.warc.gz").getAs[String]("status") === "warc_ok"))
  }

  test("corrupt gzip (zeroed magic) is COUNTED as a zero-record file, " +
    "never thrown") {
    import spark.implicits._
    val dir = Files.createTempDirectory("warcfiles_corrupt").toString
    // 10 files: f=5 is odd (gzip) AND divisible by 5 → corrupt class
    WarcFiles.writeArchiveDir(
      (0L until 10L).map(i => (i, "s", s"t$i")).toDF("doc_id", "source", "text"),
      dir, files = 10, tornEvery = 5)
    val got = audit(dir)
    val bad = got("part-5.warc.gz")
    assert(bad.getAs[String]("status") === "warc_corrupt")
    assert(bad.getAs[Int]("n_records") === 0)
    assert(bad.getAs[Long]("body_chars") === 0L)
    // f=0 is even and divisible by 5 → torn plain, single doc: the
    // half-cut never clears the request of a tiny archive? replay it
    val arch = Warc.encodeArchive(0L, "s", "t0")
    val reqKept = if (arch.length / 2 >= arch.indexOf("WARC/1.0", 1)) 1 else 0
    val torn = got("part-0.warc")
    assert(torn.getAs[String]("status") === "warc_torn")
    assert(torn.getAs[Int]("n_records") === reqKept)
    // the other 8 files are clean single-doc archives
    assert(got.values.count(_.getAs[String]("status") === "warc_ok") === 8)
  }

  test("a file past the binaryFile content ceiling is COUNTED as " +
    "warc_oversize — the job stays green and other files serve") {
    val dir = Files.createTempDirectory("warcfiles_oversize").toString
    WarcFiles.writeArchiveDir(docsDf, dir, files = 2, tornEvery = 0)
    val sizes = new java.io.File(dir).listFiles().map(f =>
      f.getName -> f.length()).toMap
    // a ceiling between the two file sizes: the larger file becomes the
    // oversize row, the smaller one still decodes — without the length
    // split the larger file's content read THROWS and fails the job
    val ceiling = (sizes.values.min + sizes.values.max) / 2
    val key = "spark.sql.sources.binaryFile.maxLength"
    spark.conf.set(key, ceiling.toString)
    try {
      val got = audit(dir)
      assert(got.keySet === Set("part-0.warc", "part-1.warc.gz"))
      val (bigName, _) = sizes.maxBy(_._2)
      val (smallName, _) = sizes.minBy(_._2)
      assert(got(bigName).getAs[String]("status") === "warc_oversize")
      assert(got(bigName).getAs[Int]("n_records") === 0)
      assert(got(bigName).getAs[Long]("body_chars") === 0L)
      assert(got(smallName).getAs[String]("status") === "warc_ok")
      // the serving path skips the oversized file instead of throwing
      val served = WarcFiles.readRecords(spark, dir).collect()
      assert(served.nonEmpty)
      assert(served.map(_.getAs[String]("file")).toSet === Set(smallName))
    } finally spark.conf.unset(key)
  }

  test("serveOversize (r18): files past the binaryFile ceiling serve " +
    "their COMPLETE records and real statuses through the bounded " +
    "stream walk — output equals the unconstrained read, plain and gz, " +
    "torn and corrupt included") {
    val dir = Files.createTempDirectory("warcfiles_chunked").toString
    // the full damage taxonomy: torn plain files (tornEvery=2) + one
    // corrupt gzip, so the streamed lane certifies every class
    WarcFiles.writeArchiveDir(docsDf, dir, files = 4, tornEvery = 2)
    val gzName = "part-1.warc.gz"
    val corrupt = Paths.get(dir, "part-3.warc.gz")
    val cBytes = Files.readAllBytes(corrupt)
    cBytes(0) = 0; cBytes(1) = 0
    Files.write(corrupt, cBytes)
    def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.toString).toSet
    // ground truth at the default (unconstrained) ceiling
    val auditFull = rows(WarcFiles.readAudit(spark, dir))
    val recsFull = WarcFiles.readRecords(spark, dir).collect()
      .map(r => (r.getAs[String]("file"), r.getAs[String]("uri"),
        java.util.Arrays.hashCode(r.getAs[Array[Byte]]("body")))).toSet
    assert(auditFull.exists(_.contains("warc_torn")) &&
      auditFull.exists(_.contains("warc_corrupt")),
      "fixture lost its damage classes")
    // ceiling below EVERY file: all four route through the stream walk
    val key = "spark.sql.sources.binaryFile.maxLength"
    spark.conf.set(key, "8")
    try {
      assert(rows(WarcFiles.readAudit(spark, dir, serveOversize = true))
        === auditFull, "streamed audit diverges from the full read")
      assert(WarcFiles.readRecords(spark, dir, serveOversize = true)
        .collect()
        .map(r => (r.getAs[String]("file"), r.getAs[String]("uri"),
          java.util.Arrays.hashCode(r.getAs[Array[Byte]]("body")))).toSet
        === recsFull, "streamed records diverge from the full read")
      // and the DEFAULT still audits them as warc_oversize (the
      // conservative census the q252 oracle pins)
      assert(rows(WarcFiles.readAudit(spark, dir))
        .forall(_.contains("warc_oversize")))
      assert(gzName.endsWith(".gz")) // fixture shape guard
    } finally spark.conf.unset(key)
  }

  test("content-type dispatch: parameterized types route to their base " +
    "format, failed extractions certify zero chars, unknown types count " +
    "raw bytes undecoded") {
    import spark.implicits._
    val dir = Files.createTempDirectory("warcfiles_dispatch").toString
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val torn = graft.operators.PdfExtract.encodePdf(3L, "pdf body text")
    WarcFiles.writeTypedArchiveDir(Seq(
      (0L, "s", graft.operators.HtmlExtract.encodePage(0L, "html body")
        .getBytes(utf8), "text/html"),
      (1L, "s", "héllo".getBytes(utf8), "text/plain; charset=utf-8"),
      (2L, "s", Array[Byte](1, 2, 3, 4, 5), "application/x-mystery"),
      // a half-cut PDF payload: extract must fail, record must count
      (3L, "s", java.util.Arrays.copyOfRange(torn, 0, torn.length / 2),
        "application/pdf")),
      dir, files = 1, tornFile = -1, corruptFile = -1)
    val got = WarcFiles.dispatchRecords(WarcFiles.readRecords(spark, dir))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("format"), r.getAs[Boolean]("ok"),
          r.getAs[Long]("n_chars")))).toMap
    assert(got(0L) === (("text/html", true, "html body".length.toLong)))
    // 5 CHARS, not 6 bytes: the text/* leg decodes UTF-8
    assert(got(1L) === (("text/plain; charset=utf-8", true, 5L)))
    assert(got(2L) === (("application/x-mystery", true, 5L)))
    assert(got(3L) === (("application/pdf", false, 0L)))
  }

  test("dispatchText serves the EXACT extracted text for every text " +
    "format, drops non-text records, and parses source from the URI") {
    val dir = Files.createTempDirectory("warcfiles_dtext").toString
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val torn = graft.operators.PdfExtract.encodePdf(3L, "pdf body text")
    WarcFiles.writeTypedArchiveDir(Seq(
      (0L, "srcA", graft.operators.HtmlExtract.encodePage(0L, "html Ünicode body")
        .getBytes(utf8), "text/html"),
      (1L, "srcB", "héllo plain".getBytes(utf8), "text/plain; charset=utf-8"),
      (2L, "srcA", Array[Byte](1, 2, 3, 4, 5), "application/x-mystery"),
      (3L, "srcB", java.util.Arrays.copyOfRange(torn, 0, torn.length / 2),
        "application/pdf"),
      (4L, "srcA", graft.operators.PdfExtract.encodePdf(4L, "pdf Ünicode"),
        "application/pdf")),
      dir, files = 1, tornFile = -1, corruptFile = -1)
    val got = WarcFiles.dispatchText(WarcFiles.readRecords(spark, dir))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("source"), r.getAs[Boolean]("ok"),
          r.getAs[String]("text")))).toMap
    // the binary record yields NO text row — it is dispatchRecords'
    // census, not corpus text
    assert(got.keySet === Set(0L, 1L, 3L, 4L))
    assert(got(0L) === (("srcA", true, "html Ünicode body")))
    assert(got(1L) === (("srcB", true, "héllo plain")))
    assert(got(3L) === (("srcB", false, ""))) // torn PDF: counted, empty
    assert(got(4L) === (("srcA", true, "pdf Ünicode")))
  }

  test("dispatch robustness: mixed-case Content-Type routes per RFC 2045 " +
    "and a real-crawl URI without a numeric id lands doc_id = -1 — " +
    "counted, never a null-decode crash") {
    import spark.implicits._
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    // hand-made record frame: writeTypedArchiveDir always emits
    // /doc/<id> URIs, but the serving path must survive what a REAL
    // crawl serves — uppercase media types and arbitrary URI shapes
    val recs = Seq(
      ("http://example.com/index.html",
        graft.operators.HtmlExtract.encodePage(7L, "upper html body")
          .getBytes(utf8), "Text/HTML; Charset=UTF-8"),
      ("http://example.com/a/trailing/", "plain body".getBytes(utf8),
        "TEXT/PLAIN"),
      ("http://src9/doc/42", "typed body".getBytes(utf8), "text/plain"))
      .toDF("uri", "body", "content_type")
    val census = WarcFiles.dispatchRecords(recs).collect()
      .map(r => r.getAs[String]("format") ->
        ((r.getAs[Long]("doc_id"), r.getAs[Boolean]("ok"),
          r.getAs[Long]("n_chars")))).toMap
    assert(census("Text/HTML; Charset=UTF-8") ===
      ((-1L, true, "upper html body".length.toLong)),
      "uppercase text/html fell through to the raw-bytes arm")
    assert(census("TEXT/PLAIN") === ((-1L, true, "plain body".length.toLong)))
    assert(census("text/plain") === ((42L, true, "typed body".length.toLong)))
    val text = WarcFiles.dispatchText(recs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"))).toSet
    assert(text === Set((-1L, "upper html body"), (-1L, "plain body"),
      (42L, "typed body")),
      "mixed-case text records must reach the training corpus")
  }

  test("dispatchMedia sniffs the BYTES (declared type kept for the " +
    "mismatch census), counts unparseable media with ok = 0, and " +
    "yields no row for non-media records") {
    import spark.implicits._
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val payload = "media payload bytes".getBytes(utf8)
    val png = graft.operators.MediaCodec.encodePng(10L, payload)
    val wav = graft.operators.MediaCodec.encodeWav(11L, payload)
    val recs = Seq(
      // declared JPEG, actually PNG: the sniffed column must say png
      ("http://s/doc/10", png, "image/jpeg"),
      // mixed-case declared type still routes to the media lane
      ("http://s/doc/11", wav, "Audio/WAV"),
      // truncated media: counted, sniffed empty, never a crash
      ("http://s/doc/12", png.take(8), "image/png"),
      // non-media: not this lane's row
      ("http://s/doc/13", "plain".getBytes(utf8), "text/plain"))
      .toDF("uri", "body", "content_type")
    val got = WarcFiles.dispatchMedia(recs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("declared"), r.getAs[String]("sniffed"),
          r.getAs[Int]("ok"), r.getAs[Long]("n_bytes")))).toMap
    assert(got.keySet === Set(10L, 11L, 12L))
    assert(got(10L) === (("image/jpeg", "png", 1, png.length.toLong)),
      "sniffing must certify the bytes, not the declared type")
    assert(got(11L) === (("Audio/WAV", "wav", 1, wav.length.toLong)))
    assert(got(12L) === (("image/png", "", 0, 8L)))
    val w = WarcFiles.dispatchMedia(recs).collect()
      .find(_.getAs[Long]("doc_id") == 11L).get
    assert(w.getAs[Int]("channels") ===
      graft.operators.MediaCodec.wavChannels(11L))
    assert(w.getAs[Int]("sample_rate") ===
      graft.operators.MediaCodec.wavSampleRate(11L))
  }

  test("dispatch fuzz (seeded): arbitrary bytes, content types, and URI " +
    "shapes never crash any lane — every record is censused exactly " +
    "once, media/text lanes partition by declared base type") {
    import spark.implicits._
    val rnd = new scala.util.Random(0x5eed17L)
    val typePool = Seq("", ";", "text/html", "TEXT/plain; charset=X",
      "application/pdf", "image/png", "Image/JPEG;x=y", "audio/wav",
      "video/mp4", "IMAGE/", "video/mp4;;charset=", "applica tion/pdf",
      "tëxt/plain", "text/", "image/png extra", "application/octet-stream",
      // charset garbage (r18): illegal names, empty values, non-ASCII
      // names, quotes, duplicate params — resolve() must fall back or
      // honor, never throw, on every one
      "text/plain; charset=", "text/plain; charset=\"\"",
      "text/plain; charset=仮名", "text/plain; CHARSET='utf-8'",
      "text/plain; charset=x y z", "text/html; a=b; charset=latin1;",
      "text/plain; charset=\"ISO-8859-1\"", "text/css; charset=!!!")
    val uriPool = Seq("http://s/doc/%d", "http://s/doc/%dx", "no-slash%d",
      "http://example.com/a/b/%d/", "%d", "http://s/doc/-%d")
    val recs = (0 until 200).map { i =>
      val body = new Array[Byte](rnd.nextInt(300))
      rnd.nextBytes(body)
      (uriPool(rnd.nextInt(uriPool.length)).format(i),
        body, typePool(rnd.nextInt(typePool.length)))
    }
    val df = recs.toDF("uri", "body", "content_type")
    // census lane: one row per record, whatever the input garbage
    val census = WarcFiles.dispatchRecords(df).collect()
    assert(census.length === recs.length)
    // media/text lanes: rows appear exactly for their declared base
    // types and never throw on garbage payloads
    def baseOf(ct: String) = ct.takeWhile(_ != ';').trim
      .toLowerCase(java.util.Locale.ROOT)
    val nMedia = recs.count(r => Seq("image/", "audio/", "video/")
      .exists(baseOf(r._3).startsWith))
    val nText = recs.count { r =>
      val b = baseOf(r._3)
      b == "text/html" || b == "application/pdf" || b.startsWith("text/")
    }
    assert(WarcFiles.dispatchMedia(df).collect().length === nMedia)
    val textRows = WarcFiles.dispatchText(df).collect()
    assert(textRows.length === nText)
    // charset certification (r18): every text-lane row lands in a legal
    // decode class with a JVM-canonical charset name; the PDF lane is
    // byte-domain (both columns empty)
    val legal = Set("ok", "replaced", "fallback", "fallback_replaced")
    textRows.foreach { r =>
      val (fmt, cs, dec) = (r.getString(2), r.getString(5), r.getString(6))
      if (baseOf(fmt) == "application/pdf") assert(cs == "" && dec == "")
      else { assert(cs.nonEmpty, s"no charset for $fmt")
        assert(legal(dec), s"illegal decode class '$dec' for $fmt") }
    }
  }

  test("charset fuzz (seeded, r19: >= 200 cases): random charset-" +
    "parameter garbage — truncated names, quoted junk, multi-param " +
    "Content-Types, BOM prefixes over declared charsets, 0/1-byte " +
    "bodies — never throws, every row lands in exactly ONE census " +
    "class, and a BOM always wins over the declaration") {
    import spark.implicits._
    import graft.codec.TextCharsets
    val rnd = new scala.util.Random(0xc5a25eL)
    val namePool = Seq(
      "utf-8", "UTF-8", "iso-8859-1", "windows-1252", "us-ascii",
      // truncated / junk / illegal-syntax names
      "utf-", "iso-8859", "windows-12", "", " ", "!!!", "utf 8",
      "\"utf-8", "utf-8\"", "'latin1'", "x-never-heard-of-it",
      "仮名", "UTF-8  ", "a" * 120, "charset", "=", ";;;")
    val ctShapes = Seq[String => String](
      n => s"text/plain; charset=$n",
      n => s"text/plain; charset=\"$n\"",
      n => s"text/plain; a=b; charset=$n; c=d",
      n => s"text/plain; charset=$n; charset=utf-16le", // dup param
      n => s"TEXT/PLAIN;charset=$n",
      n => s"text/plain; charset", // no value at all
      _ => "text/plain", _ => "text/html")
    val boms = Seq(
      Array.emptyByteArray,
      Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte), // UTF-8
      Array(0xFF.toByte, 0xFE.toByte), // UTF-16LE
      Array(0xFE.toByte, 0xFF.toByte)) // UTF-16BE
    val bomNames = Map(1 -> "utf-8", 2 -> "utf-16le", 3 -> "utf-16be")
    val cases = (0 until 240).map { i =>
      val name = namePool(rnd.nextInt(namePool.length))
      val ct = ctShapes(rnd.nextInt(ctShapes.length))(name)
      val bomIdx = rnd.nextInt(boms.length)
      val n = rnd.nextInt(3) match {
        case 0 => 0
        case 1 => 1 // the 1-byte body: can cut ANY multi-byte sequence
        case _ => rnd.nextInt(64)
      }
      val tail = new Array[Byte](n); rnd.nextBytes(tail)
      (i.toLong, ct, boms(bomIdx) ++ tail, bomIdx)
    }
    val legal = Set("ok", "replaced", "fallback", "fallback_replaced")
    // direct decode: never throws, one legal class, canonical charset,
    // BOM precedence over whatever the parameter declared
    cases.foreach { case (_, ct, body, bomIdx) =>
      val d = TextCharsets.decode(body, TextCharsets.charsetParam(ct),
        sniffHtml = rnd.nextBoolean())
      assert(legal(d.decode), s"illegal class '${d.decode}' for ct=$ct")
      assert(TextCharsets.resolve(d.charset).nonEmpty,
        s"non-canonical charset '${d.charset}' for ct=$ct")
      if (bomIdx > 0) {
        assert(d.charset === bomNames(bomIdx),
          s"BOM lost to declaration in ct=$ct")
        // a BOM row can be 'replaced' (random tail bytes) but it can
        // never be a fallback — the BOM charset always resolves
        assert(d.decode === "ok" || d.decode === "replaced")
      }
    }
    // and through the dispatch: one census row per record, text lanes
    // all in legal classes
    val df = cases.map { case (id, ct, body, _) =>
      (s"http://s/doc/$id", body, ct)
    }.toDF("uri", "body", "content_type")
    val census = WarcFiles.dispatchRecords(df).collect()
    assert(census.length === cases.length)
    census.foreach { r =>
      val dec = r.getAs[String]("decode")
      assert(dec == "" || legal(dec), s"census class '$dec'")
    }
  }

  test("a stray non-warc file in the directory is not read (glob filter)") {
    val dir = Files.createTempDirectory("warcfiles_glob").toString
    WarcFiles.writeArchiveDir(docsDf, dir, files = 2, tornEvery = 0)
    Files.write(Paths.get(dir, "README.txt"),
      "not an archive".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    val got = audit(dir)
    assert(got.keySet === Set("part-0.warc", "part-1.warc.gz"))
  }
}
