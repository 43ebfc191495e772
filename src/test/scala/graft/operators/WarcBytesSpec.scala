package graft.operators

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
import java.nio.file.{Files, Paths}
import java.security.MessageDigest
import java.util.zip.GZIPOutputStream

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.sources.WarcFiles

/** The byte-domain WARC walk: bit-exact UTF-8/binary payload round
  * trips through REAL files (plain and .warc.gz), agreement with the
  * char-domain walk on its ASCII certificate domain, and the same
  * never-throw tear taxonomy. */
class WarcBytesSpec extends SparkSpec {

  // deterministic seeded property runs — the BpeFuzzSpec convention
  private def forAllSeeded[A](gen: Gen[A], n: Int)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(28500L + i)))
    }

  private def md5(b: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(b)
      .map(x => f"$x%02x").mkString

  private def gzip(b: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val g = new GZIPOutputStream(bos)
    g.write(b); g.close()
    bos.toByteArray
  }

  // UTF-8 text with 2-, 3- and 4-byte sequences plus a raw binary tail
  // covering every byte value — nothing here survives an ASCII decode
  private val utf8Body: Array[Byte] =
    "héllo wörld — 中文テキスト 🎉 end".getBytes(UTF_8) ++
      (0 until 256).map(_.toByte).toArray

  test("UTF-8/binary payloads round-trip md5-exact through real files, " +
    ".warc.gz included") {
    val dir = Files.createTempDirectory("warc_bytes").toString
    val archive =
      Warc.encodeArchiveBytes(7L, "srcX", utf8Body,
        "application/octet-stream") ++
        Warc.encodeArchiveBytes(8L, "srcX",
          "plain ascii body".getBytes(ISO_8859_1), "text/plain")
    Files.write(Paths.get(dir, "part-0.warc"), archive)
    Files.write(Paths.get(dir, "part-1.warc.gz"), gzip(archive))
    for (name <- Seq("part-0.warc", "part-1.warc.gz")) {
      val raw = Files.readAllBytes(Paths.get(dir, name))
      val bytes =
        if (name.endsWith(".gz"))
          new java.util.zip.GZIPInputStream(
            new java.io.ByteArrayInputStream(raw)).readAllBytes()
        else raw
      val p = Warc.parseBytes(bytes)
      assert(!p.torn, s"$name parsed torn")
      val bodies = p.records.filter(_.recType == "response").map(_.body)
      assert(bodies.length === 2)
      assert(md5(bodies.head) === md5(utf8Body),
        s"$name corrupted the UTF-8/binary payload")
      assert(md5(bodies(1)) ===
        md5("plain ascii body".getBytes(ISO_8859_1)))
    }
    // and through the Spark source end to end: the audit must see both
    // files clean with BYTE-exact body volumes (char-domain decode of
    // this payload would mangle every non-ASCII byte)
    val audit = WarcFiles.readAudit(spark, dir).collect()
      .map(r => r.getAs[String]("file") ->
        (r.getAs[String]("status"), r.getAs[Long]("body_chars"))).toMap
    val expected = utf8Body.length.toLong + "plain ascii body".length
    assert(audit("part-0.warc") === (("warc_ok", expected)))
    assert(audit("part-1.warc.gz") === (("warc_ok", expected)))
  }

  test("byte and char walks agree record-for-record on ASCII archives, " +
    "including tears") {
    val gen = for {
      docs <- Gen.listOfN(3, Gen.asciiPrintableStr.map(_.take(80)))
      cutPct <- Gen.chooseNum(0, 100)
    } yield (docs.zipWithIndex, cutPct)
    forAllSeeded(gen, 60) { case (docs, cutPct) =>
      val full = docs.map { case (t, i) =>
        Warc.encodeArchive(i.toLong, s"s$i", t)
      }.mkString
      val s = full.substring(0, full.length * cutPct / 100)
      val c = Warc.parse(s)
      val b = Warc.parseBytes(s.getBytes(ISO_8859_1))
      assert(b.torn === c.torn)
      assert(b.records.length === c.records.length)
      b.records.zip(c.records).foreach { case (br, cr) =>
        assert(br.recType === cr.recType)
        assert(br.uri === cr.uri)
        assert(br.httpStatus === cr.httpStatus)
        assert(br.contentType === cr.contentType)
        assert(new String(br.body, ISO_8859_1) === cr.body)
      }
    }
  }

  test("readRecords serves complete records ahead of a tear and nothing " +
    "from an undecodable file") {
    val dir = Files.createTempDirectory("warc_records").toString
    val clean = Warc.encodeArchiveBytes(1L, "s", utf8Body, "x/y")
    val torn = clean ++
      Warc.encodeArchiveBytes(2L, "s", utf8Body, "x/y").take(10)
    Files.write(Paths.get(dir, "part-0.warc"), torn)
    val corrupt = gzip(clean)
    corrupt(0) = 0; corrupt(1) = 0 // zeroed gzip magic
    Files.write(Paths.get(dir, "part-1.warc.gz"), corrupt)
    val rows = WarcFiles.readRecords(spark, dir).collect()
    assert(rows.length === 1, "torn file must serve its complete record; " +
      "corrupt file must serve nothing")
    val r = rows.head
    assert(r.getAs[String]("file") === "part-0.warc")
    assert(r.getAs[String]("uri") === "http://s/doc/1")
    assert(md5(r.getAs[Array[Byte]]("body")) === md5(utf8Body))
  }

  test("byte-domain tear taxonomy: complete records ahead of a tear are " +
    "kept; adversarial lengths stop the walk without throwing") {
    val clean = Warc.encodeArchiveBytes(1L, "s", utf8Body, "x/y")
    val torn = clean ++ Warc.encodeArchiveBytes(2L, "s", utf8Body, "x/y")
      .take(clean.length / 2)
    val p = Warc.parseBytes(torn)
    assert(p.torn)
    assert(p.records.count(_.recType == "response") === 1)
    assert(md5(p.records.filter(_.recType == "response").head.body) ===
      md5(utf8Body))
    // header claims more bytes than the archive holds
    val lying = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Length: 999999999999\r\n\r\n").getBytes(ISO_8859_1)
    val lp = Warc.parseBytes(clean ++ lying)
    assert(lp.torn && lp.records.length === 2) // request + response kept
    assert(Warc.parseBytes(Array.emptyByteArray) ===
      Warc.BParsed(Nil, torn = false))
  }

  test("a truncated HTTP status line degrades the record in BOTH walks, " +
    "never throws") {
    // payload 'HTTP/1.1 \r\n\r\nbody': the HTTP head ends at offset 9,
    // before the 12 chars a status code needs — the adversarial shape
    // that used to throw StringIndexOutOfBounds in the byte walk
    for (payload <- Seq("HTTP/1.1 \r\n\r\nbody", "HTTP/1.1 2\r\n\r\nx",
      "HTTP/1.1 20\r\n\r\n")) {
      val rec = (s"WARC/1.0\r\nWARC-Type: response\r\n" +
        s"WARC-Target-URI: http://s/doc/9\r\n" +
        s"Content-Length: ${payload.length}\r\n\r\n$payload\r\n\r\n")
      val c = Warc.parse(rec)
      val b = Warc.parseBytes(rec.getBytes(ISO_8859_1))
      for (r <- Seq(c.records.head.httpStatus, b.records.head.httpStatus))
        assert(r === 0, s"payload ${payload.take(12)}… must degrade")
      assert(!c.torn && !b.torn, "degraded record, not a tear")
      assert(c.records.head.body === "")
      assert(b.records.head.body.isEmpty)
      assert(c.records.head.contentType === "" &&
        b.records.head.contentType === "")
    }
  }

  test("parseStream == parseBytes record-for-record on clean, torn, " +
    "lying-length, degraded and empty inputs (r18: the bounded-memory " +
    "walk serves oversized files through the SAME grammar)") {
    def agree(bytes: Array[Byte]): Unit = {
      val whole = Warc.parseBytes(bytes)
      val streamed = Warc.parseStream(
        new java.io.ByteArrayInputStream(bytes))
      assert(streamed.torn === whole.torn)
      assert(streamed.records.length === whole.records.length)
      streamed.records.zip(whole.records).foreach { case (s, w) =>
        assert(s.recType === w.recType && s.uri === w.uri &&
          s.httpStatus === w.httpStatus && s.contentType === w.contentType)
        assert(md5(s.body) === md5(w.body))
      }
    }
    val clean = Warc.encodeArchiveBytes(1L, "s", utf8Body, "x/y")
    val second = Warc.encodeArchiveBytes(2L, "s", utf8Body, "x/y")
    agree(clean ++ second)
    agree(clean ++ second.take(10)) // torn mid-header
    agree(clean ++ second.dropRight(7)) // torn mid-payload/trailer
    agree(Array.emptyByteArray)
    agree(("WARC/1.0\r\nWARC-Type: response\r\nContent-Length: " +
      "999999999\r\n\r\nshort").getBytes(ISO_8859_1)) // lying length
    agree(("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: u\r\n" +
      "Content-Length: 14\r\n\r\nHTTP/1.1 \r\n\r\nz\r\n\r\n")
      .getBytes(ISO_8859_1)) // degraded status line
    // stream-specific bound: a record past maxRecordBytes tears, every
    // complete record ahead of it is kept (small doc = 2 records, plus
    // the huge doc's request record — its response is over-bound)
    val small = Warc.encodeArchiveBytes(1L, "s",
      "tiny".getBytes(ISO_8859_1), "x/y")
    val huge = Warc.encodeArchiveBytes(2L, "s",
      Array.fill(10000)('a'.toByte), "x/y")
    val big = Warc.parseStream(
      new java.io.ByteArrayInputStream(small ++ huge),
      maxRecordBytes = 2048)
    assert(big.torn && big.records.length === 3,
      s"expected 3 kept records before the over-bound one, got " +
        s"${big.records.length} (torn=${big.torn})")
  }

  test("HTTP body encodings (r19): chunked / gzip / deflate / " +
    "chunked+gzip bodies decode bit-exact through the walk with their " +
    "audit class; every bad/unsupported coding censuses with an EMPTY " +
    "body — compressed garbage never serves as text") {
    def one(body: Array[Byte], headers: Seq[(String, String)]): Warc.BRec =
      Warc.parseBytes(Warc.encodeArchiveBytesHttp(1L, "s", body, headers))
        .records.filter(_.recType == "response").head
    val ct = "Content-Type" -> "text/plain"
    // good lanes: decoded body == original, class names the decodings
    val cases = Seq(
      (Warc.chunkEncode(utf8Body, 7),
        Seq(ct, "Transfer-Encoding" -> "chunked"), "chunked"),
      (Warc.gzipEncode(utf8Body),
        Seq(ct, "Content-Encoding" -> "gzip"), "gzip"),
      (Warc.gzipEncode(utf8Body),
        Seq(ct, "Content-Encoding" -> "x-gzip"), "gzip"),
      (Warc.deflateEncode(utf8Body),
        Seq(ct, "Content-Encoding" -> "deflate"), "deflate"),
      (Warc.chunkEncode(Warc.gzipEncode(utf8Body), 11),
        Seq(ct, "Transfer-Encoding" -> "chunked",
          "Content-Encoding" -> "gzip"), "chunked+gzip"))
    cases.foreach { case (enc, headers, cls) =>
      val r = one(enc, headers)
      assert(r.encoding === cls)
      assert(md5(r.body) === md5(utf8Body), s"$cls body corrupted")
    }
    // raw deflate (no zlib wrapper) — the browser-fallback case
    val rawDef = {
      val d = new java.util.zip.Deflater(
        java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
      d.setInput(utf8Body); d.finish()
      val out = new ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end(); out.toByteArray
    }
    val rd = one(rawDef, Seq(ct, "Content-Encoding" -> "deflate"))
    assert(rd.encoding === "deflate" && md5(rd.body) === md5(utf8Body))
    // identity: no headers → empty class, body untouched
    val id = one(utf8Body, Seq(ct,
      "Content-Length" -> utf8Body.length.toString))
    assert(id.encoding === "" && md5(id.body) === md5(utf8Body))
    // failure classes: declared-but-not coding → censused, body EMPTY
    val bad = Seq(
      (("zz\r\n".getBytes(ISO_8859_1) ++ utf8Body),
        Seq(ct, "Transfer-Encoding" -> "chunked"), "bad_chunked"),
      (utf8Body, Seq(ct, "Content-Encoding" -> "gzip"), "bad_gzip"),
      (Array[Byte](0x78, -2, 1, 2, 3),
        Seq(ct, "Content-Encoding" -> "deflate"), "bad_deflate"),
      (utf8Body, Seq(ct, "Content-Encoding" -> "br"), "unsupported"),
      (utf8Body, Seq(ct, "Transfer-Encoding" -> "gzip, chunked"),
        "unsupported"))
    bad.foreach { case (enc, headers, cls) =>
      val r = one(enc, headers)
      assert(r.encoding === cls, s"expected $cls got ${r.encoding}")
      assert(r.body.isEmpty, s"$cls served bytes it could not certify")
    }
    // Transfer-Encoding: identity is a no-op, not unsupported
    val ident = one(utf8Body, Seq(ct, "Transfer-Encoding" -> "identity"))
    assert(ident.encoding === "" && md5(ident.body) === md5(utf8Body))
  }

  test("chunked-body FUZZ (seeded, r19): a chunked body cut at ANY " +
    "offset — mid-size-line, mid-chunk, mid-trailer — never throws; a " +
    "complete framing round-trips exact, an incomplete one censuses " +
    "bad_chunked with an empty body") {
    val gen = for {
      n <- Gen.choose(0, 300)
      body <- Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
        .map(_.toArray)
      chunkSize <- Gen.choose(1, 40)
      cutFrac <- Gen.choose(0.0, 1.2) // > 1.0 = no cut
    } yield (body, chunkSize, cutFrac)
    forAllSeeded(gen, 150) { case (body, chunkSize, cutFrac) =>
      val enc = Warc.chunkEncode(body, chunkSize)
      val cut = math.min(enc.length, (enc.length * cutFrac).toInt)
      val fed = enc.take(cut)
      val r = Warc.parseBytes(Warc.encodeArchiveBytesHttp(1L, "s", fed,
        Seq("Content-Type" -> "x/y", "Transfer-Encoding" -> "chunked")))
        .records.filter(_.recType == "response").head
      // the framing is complete once the 0-size line landed — the
      // final trailer-section CRLF is ignored by the decoder (RFC 9112
      // trailers are optional), so the last 2 bytes are inert
      if (cut >= enc.length - 2) {
        assert(r.encoding === "chunked")
        assert(md5(r.body) === md5(body), "complete framing corrupted")
      } else {
        // any earlier cut loses the 0-size terminator: the prefix is
        // complete chunks + a truncated size line or short data, every
        // shape of which the decoder rejects
        assert(r.encoding === "bad_chunked",
          s"cut=$cut of ${enc.length} decoded as '${r.encoding}'")
        assert(r.body.isEmpty)
      }
    }
  }

  test("revisit records (r19): WARC-Refers-To-Target-URI parses into " +
    "refersTo in BOTH byte walks; response records carry it empty") {
    val archive = Warc.encodeArchiveBytes(5L, "s", utf8Body, "x/y") ++
      Warc.encodeRevisitBytes("http://s/doc/1000000000005",
        "http://s/doc/5")
    for (p <- Seq(Warc.parseBytes(archive),
      Warc.parseStream(new java.io.ByteArrayInputStream(archive)))) {
      assert(!p.torn)
      val rev = p.records.filter(_.recType == "revisit")
      assert(rev.length === 1)
      assert(rev.head.uri === "http://s/doc/1000000000005")
      assert(rev.head.refersTo === "http://s/doc/5")
      assert(rev.head.body.isEmpty)
      assert(p.records.filter(_.recType == "response")
        .forall(_.refersTo === ""))
    }
  }

  test("parseStream == parseBytes on ENCODED-body archives (the decode " +
    "lives in the shared record builder — the walks cannot drift)") {
    val archive =
      Warc.encodeArchiveBytesHttp(1L, "s", Warc.chunkEncode(utf8Body, 13),
        Seq("Content-Type" -> "x/y", "Transfer-Encoding" -> "chunked")) ++
        Warc.encodeArchiveBytesHttp(2L, "s", Warc.gzipEncode(utf8Body),
          Seq("Content-Type" -> "x/y", "Content-Encoding" -> "gzip")) ++
        Warc.encodeArchiveBytesHttp(3L, "s", utf8Body,
          Seq("Content-Type" -> "x/y", "Content-Encoding" -> "br"))
    val whole = Warc.parseBytes(archive)
    val streamed = Warc.parseStream(
      new java.io.ByteArrayInputStream(archive))
    assert(streamed.records.map(r => (r.recType, r.uri, r.encoding,
      md5(r.body))) ===
      whole.records.map(r => (r.recType, r.uri, r.encoding, md5(r.body))))
    assert(whole.records.filter(_.recType == "response")
      .map(_.encoding) === List("chunked", "gzip", "unsupported"))
  }

  test("parseStream parity FUZZ (seeded): random archives cut at random " +
    "offsets, and pure garbage, agree with parseBytes byte-for-byte") {
    val gen = for {
      nDocs <- Gen.choose(0, 4)
      payloads <- Gen.listOfN(nDocs, Gen.choose(0, 400)
        .flatMap(n => Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
          .map(_.toArray)))
      cutFrac <- Gen.choose(0.0, 1.2) // > 1.0 = no cut
      garbagePrefix <- Gen.oneOf(true, false)
      garbage <- Gen.listOfN(8, Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield {
      val archive = payloads.zipWithIndex.map { case (p, i) =>
        Warc.encodeArchiveBytes(i.toLong, "s", p, "x/y")
      }.foldLeft(Array.emptyByteArray)(_ ++ _)
      val cut = math.min(archive.length,
        (archive.length * cutFrac).toInt)
      val body = archive.take(cut)
      if (garbagePrefix) garbage.toArray ++ body else body
    }
    forAllSeeded(gen, 120) { bytes =>
      val whole = Warc.parseBytes(bytes)
      val streamed = Warc.parseStream(
        new java.io.ByteArrayInputStream(bytes))
      assert(streamed.torn === whole.torn)
      assert(streamed.records.map(r => (r.recType, r.uri, r.httpStatus,
        r.contentType, md5(r.body))) ===
        whole.records.map(r => (r.recType, r.uri, r.httpStatus,
          r.contentType, md5(r.body))))
    }
  }
}
