package graft.operators

import java.nio.charset.StandardCharsets.ISO_8859_1

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WARC (Web ARChive, ISO 28500) ingest — the container every web-scale
  * training corpus actually arrives in (Common Crawl ships WARC): a
  * concatenation of records, each a header block (`WARC/1.0` + `Key:
  * Value` lines), a blank line, exactly `Content-Length` payload bytes,
  * and a `\r\n\r\n` separator. Response-record payloads are themselves
  * HTTP messages (status line + headers + blank line + body).
  *
  * The parser hops records BY `Content-Length` — never by scanning for
  * separators — because a payload may legally contain anything,
  * including bytes that look like a record boundary (the classic
  * naive-split corruption). Complete records ahead of a tear are KEPT
  * (an interrupted crawl transfer loses the tail, not the archive);
  * the torn record itself certifies nothing — count-don't-crash, the
  * decode-audit discipline of every codec in this engine.
  *
  * Certification follows the media-codec pattern (q117/q125/q161): a
  * deterministic ENCODER writes a request+response record pair per
  * document with a fixed layout, the parser must recover the original
  * text exactly (`md5(body) == md5(text)` in both engines), and the
  * DuckDB oracle replays every length census arithmetically from
  * `strlen` — including the total archive length, which pins the
  * encoder's byte layout, Content-Length digits and all.
  *
  * Scale shape: encode and parse are narrow partition-local
  * `mapPartitions` maps (the sanctioned shape for byte/char walks —
  * Catalyst cannot express a Content-Length hop); no shuffle, the
  * archive string never moves. Scope note (the Chunker BMP
  * convention): lengths are CHARACTER counts, so the certificate
  * domain is ASCII payloads — real byte-WARC swaps String for
  * Array[Byte] with the identical walk.
  */
object Warc {

  // ------------------------------------------------------------- encode

  /** Deterministic two-record archive for (docId, source, text):
    * every offset is arithmetic in strlen(text), strlen(source) and
    * the digit counts — which is what lets the oracle replay the full
    * layout. */
  def encodeArchive(docId: Long, source: String, text: String): String =
    encodeArchiveAs(docId, source, text, "text/plain")

  /** Generalized encoder: arbitrary response payload + Content-Type —
    * the crawl-composition entry (q254 wraps an [[HtmlExtract]] page as
    * the response body, exactly what a real crawl archive holds). */
  def encodeArchiveAs(docId: Long, source: String, body: String,
                      contentType: String): String = {
    val uri = s"http://$source/doc/$docId"
    val reqHttp = s"GET /doc/$docId HTTP/1.1\r\nHost: $source\r\n\r\n"
    val respHttp = s"HTTP/1.1 200 OK\r\nContent-Type: $contentType\r\n" +
      s"Content-Length: ${body.length}\r\n\r\n$body"
    def record(recType: String, payload: String): String =
      s"WARC/1.0\r\nWARC-Type: $recType\r\nWARC-Target-URI: $uri\r\n" +
        s"Content-Length: ${payload.length}\r\n\r\n$payload\r\n\r\n"
    record("request", reqHttp) + record("response", respHttp)
  }

  final case class ArchiveRow(doc_id: Long, source: String, warc: String)

  /** Attach a `warc` column; every `truncateEvery`-th archive is cut at
    * half (mid-transfer tear) when the knob is positive. */
  def attachArchives(docs: DataFrame, truncateEvery: Int = 0): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("source"), col("text"))
      .as[(Long, String, String)]
      .mapPartitions(_.map { case (id, src, text) =>
        val a = encodeArchive(id, src, text)
        val out =
          if (truncateEvery > 0 && id % truncateEvery == 0)
            a.substring(0, a.length / 2)
          else a
        ArchiveRow(id, src, out)
      }).toDF()
  }

  /** The crawl fixture: each document's [[HtmlExtract.encodePage]] page
    * archived as a `text/html` response — what a real web crawl
    * actually stores (pages inside archives, two container layers
    * between the bytes and the training text). */
  def attachHtmlArchives(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("source"), col("text"))
      .as[(Long, String, String)]
      .mapPartitions(_.map { case (id, src, text) =>
        ArchiveRow(id, src, encodeArchiveAs(id, src,
          HtmlExtract.encodePage(id, text), "text/html"))
      }).toDF()
  }

  // -------------------------------------------------------------- parse

  /** One parsed record. For torn/malformed records nothing is emitted —
    * the archive-level result carries the tear flag instead. */
  final case class Rec(recType: String, uri: String, httpStatus: Int,
                       contentType: String, body: String)

  /** Archive-level parse result: the complete records plus whether the
    * walk ended cleanly (`torn = false`) or on a tear/malformation. */
  final case class Parsed(records: List[Rec], torn: Boolean)

  private def headerMap(block: String): Map[String, String] =
    block.split("\r\n").iterator.drop(1).flatMap { line =>
      val i = line.indexOf(": ")
      if (i <= 0) None else Some(line.substring(0, i) -> line.substring(i + 2))
    }.toMap

  /** Content-Length-hopping record walk. Never throws. EMPTY input is a
    * valid zero-record archive (`torn = false`): a tear means a record
    * was interrupted, and an empty string contains no record to
    * interrupt — only input that starts or ends mid-record is torn.
    * Scope note (r19): this CHAR-domain walk serves the ASCII,
    * identity-encoded certificate domain (q247/q248/q254); HTTP
    * Transfer-/Content-Encoding decode lives in the BYTE domain's
    * shared record builder ([[decodeHttpBody]]) — the real-file path —
    * and is deliberately absent here. */
  def parse(warc: String): Parsed = {
    val recs = List.newBuilder[Rec]
    var pos = 0
    while (pos < warc.length) {
      val hdrEnd = warc.indexOf("\r\n\r\n", pos)
      if (hdrEnd < 0 || !warc.startsWith("WARC/1.0\r\n", pos))
        return Parsed(recs.result(), torn = true)
      val hdrs = headerMap(warc.substring(pos, hdrEnd))
      val len = hdrs.get("Content-Length").flatMap(_.toLongOption)
      val recType = hdrs.getOrElse("WARC-Type", "")
      val uri = hdrs.getOrElse("WARC-Target-URI", "")
      // adversarial lengths are garbage, not a tear — but the contract
      // is the same: stop, keep what parsed, never throw. Negative is
      // rejected outright; anything beyond the archive itself is
      // rejected BEFORE the offset arithmetic, because payloadStart +
      // hugeLen overflows Long and the wrapped offset can land exactly
      // on the header's own separator (reproduced: substring threw)
      if (len.isEmpty || len.get < 0L || len.get > warc.length.toLong ||
        recType.isEmpty)
        return Parsed(recs.result(), torn = true)
      val payloadStart = hdrEnd + 4
      val payloadEnd = payloadStart + len.get
      // the record ends with a \r\n\r\n separator AFTER the payload
      if (payloadEnd + 4 > warc.length ||
        !warc.startsWith("\r\n\r\n", payloadEnd.toInt))
        return Parsed(recs.result(), torn = true)
      val payload = warc.substring(payloadStart, payloadEnd.toInt)
      recs += (recType match {
        case "response" =>
          val he = payload.indexOf("\r\n\r\n")
          // he bounds the HTTP head; a status line cut short (he < 12)
          // degrades the record — the same guard as [[parseBytes]], so
          // the two walks stay record-for-record equal on ASCII input
          val (status, cType, body) =
            if (he < 12 || !payload.startsWith("HTTP/1.1 ")) (0, "", "")
            else (payload.substring(9, 12).toIntOption.getOrElse(0),
              // headerMap's drop(1) skips the HTTP status line here,
              // exactly as it skips the WARC/1.0 line above
              headerMap(payload.substring(0, he))
                .getOrElse("Content-Type", ""),
              payload.substring(he + 4))
          Rec(recType, uri, status, cType, body)
        case _ => Rec(recType, uri, 0, "", "")
      })
      pos = payloadEnd.toInt + 4
    }
    Parsed(recs.result(), torn = false)
  }

  // -------------------------------------------------------- byte domain

  /** One parsed record in the BYTE domain: the body is returned
    * bit-exact as the DECODED payload bytes — a UTF-8 page or raw
    * binary payload survives the walk unchanged, and a chunked/gzip/
    * deflate HTTP body (r19, VERDICT #3) is decoded with its own audit
    * class in `encoding` ("" identity, else the applied decodings
    * "chunked"/"gzip"/"deflate"/"chunked+gzip"/…; `bad_chunked`/
    * `bad_gzip`/`bad_deflate`/`unsupported` serve an EMPTY body — the
    * damage is censused, never handed to a text decode as garbage).
    * `refersTo` carries `WARC-Refers-To-Target-URI` (revisit records'
    * free dup edge, r19 VERDICT #4); empty elsewhere. */
  final case class BRec(recType: String, uri: String, httpStatus: Int,
                        contentType: String, encoding: String,
                        refersTo: String, body: Array[Byte])

  final case class BParsed(records: List[BRec], torn: Boolean)

  private val WarcMagic = "WARC/1.0\r\n".getBytes(ISO_8859_1)
  private val CrlfCrlf = "\r\n\r\n".getBytes(ISO_8859_1)
  private val HttpMagic = "HTTP/1.1 ".getBytes(ISO_8859_1)

  private def startsWithAt(b: Array[Byte], pat: Array[Byte], at: Int): Boolean =
    at >= 0 && at + pat.length <= b.length && {
      var i = 0
      while (i < pat.length && b(at + i) == pat(i)) i += 1
      i == pat.length
    }

  private def indexOfCrlfCrlf(b: Array[Byte], from: Int): Int = {
    var i = from
    val last = b.length - 4
    while (i <= last) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' &&
        b(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  /** Byte-domain record walk — the REAL-FILE path ([[graft.sources
    * .WarcFiles]] decodes crawl files through this, not through the
    * char-domain [[parse]]): the identical Content-Length hop over raw
    * bytes, with String decode applied ONLY to the header lines
    * (ISO-8859-1 — WARC and HTTP header bytes are ASCII per ISO 28500,
    * and Latin-1 maps every byte 1:1 so a stray high byte degrades a
    * header value instead of corrupting offsets or throwing). Payload
    * bodies stay `Array[Byte]`: a UTF-8 or binary payload round-trips
    * bit-exact, which the char-domain walk cannot promise (its
    * certificate domain is ASCII — scope note in the object doc). Here
    * Content-Length counts BYTES, the on-the-wire meaning. Same
    * never-throw tear taxonomy as [[parse]]; WarcBytesSpec pins the two
    * walks record-for-record equal on ASCII archives. */
  def parseBytes(warc: Array[Byte]): BParsed = {
    val recs = List.newBuilder[BRec]
    var pos = 0
    while (pos < warc.length) {
      val hdrEnd = indexOfCrlfCrlf(warc, pos)
      if (hdrEnd < 0 || !startsWithAt(warc, WarcMagic, pos))
        return BParsed(recs.result(), torn = true)
      val hdrs = headerMap(
        new String(warc, pos, hdrEnd - pos, ISO_8859_1))
      val len = hdrs.get("Content-Length").flatMap(_.toLongOption)
      val recType = hdrs.getOrElse("WARC-Type", "")
      val uri = hdrs.getOrElse("WARC-Target-URI", "")
      // same adversarial-length rejection order as the char walk: a
      // huge length is rejected before payloadStart + len can overflow
      if (len.isEmpty || len.get < 0L || len.get > warc.length.toLong ||
        recType.isEmpty)
        return BParsed(recs.result(), torn = true)
      val payloadStart = hdrEnd + 4
      val payloadEnd = payloadStart + len.get
      if (payloadEnd + 4 > warc.length ||
        !startsWithAt(warc, CrlfCrlf, payloadEnd.toInt))
        return BParsed(recs.result(), torn = true)
      val payload = java.util.Arrays.copyOfRange(
        warc, payloadStart, payloadEnd.toInt)
      recs += buildRec(recType, uri,
        hdrs.getOrElse("WARC-Refers-To-Target-URI", ""), payload)
      pos = payloadEnd.toInt + 4
    }
    BParsed(recs.result(), torn = false)
  }

  /** One record from its type + payload — shared by the whole-array
    * walk above and the bounded-memory stream walk below, so the two
    * can never drift. The status code is parsed from `head` =
    * payload[0, he), so the degraded-record guard must bound he itself:
    * a status line cut short ("HTTP/1.1 \r\n\r\nbody" has he = 9 < 12)
    * degrades to status 0 instead of throwing on the substring.
    * `refersTo` is the WARC-level Refers-To-Target-URI the callers
    * parse from the record headers. */
  private def buildRec(recType: String, uri: String, refersTo: String,
                       payload: Array[Byte]): BRec = recType match {
    case "response" =>
      val he = indexOfCrlfCrlf(payload, 0)
      if (he < 12 || !startsWithAt(payload, HttpMagic, 0))
        BRec(recType, uri, 0, "", "", refersTo, Array.emptyByteArray)
      else {
        val head = new String(payload, 0, he, ISO_8859_1)
        val hm = headerMap(head)
        val (body, encoding) = decodeHttpBody(
          java.util.Arrays.copyOfRange(payload, he + 4, payload.length),
          hm.get("Transfer-Encoding"), hm.get("Content-Encoding"))
        BRec(recType, uri,
          head.substring(9, 12).toIntOption.getOrElse(0),
          hm.getOrElse("Content-Type", ""), encoding, refersTo, body)
      }
    case _ => BRec(recType, uri, 0, "", "", refersTo, Array.emptyByteArray)
  }

  // ----------------------------------------------- HTTP body encodings

  /** De-chunk / inflate an HTTP response body per its Transfer-Encoding
    * and Content-Encoding headers (r19, VERDICT #3): legal in WARC and
    * common in non-normalized crawls (Common Crawl strips chunking;
    * most other crawlers don't). Returns the decoded body plus the
    * audit class: "" for identity, the applied decodings joined with
    * '+' in wire order (chunked outermost, so "chunked+gzip" means
    * de-chunk then gunzip), or a failure class (`bad_chunked`,
    * `bad_gzip`, `bad_deflate`, `unsupported`) with an EMPTY body —
    * serving chunk-framing noise or compressed bytes as "text" is
    * exactly the corruption the census exists to count, so a body this
    * walk cannot decode is never served at all. Never throws. */
  private[graft] def decodeHttpBody(raw: Array[Byte], te: Option[String],
                                    ce: Option[String]): (Array[Byte], String) = {
    val teV = te.map(_.trim.toLowerCase(java.util.Locale.ROOT))
      .filter(v => v.nonEmpty && v != "identity")
    val ceV = ce.map(_.trim.toLowerCase(java.util.Locale.ROOT))
      .filter(v => v.nonEmpty && v != "identity")
    var cur = raw
    val applied = List.newBuilder[String]
    teV match {
      case None => ()
      case Some("chunked") => dechunk(cur) match {
        case Some(d) => cur = d; applied += "chunked"
        case None => return (Array.emptyByteArray, "bad_chunked")
      }
      // multi-coding TE ("gzip, chunked") and everything else we don't
      // frame-decode: the body's framing is unknown, census and drop
      case Some(_) => return (Array.emptyByteArray, "unsupported")
    }
    ceV match {
      case None => ()
      case Some("gzip") | Some("x-gzip") => gunzipBytes(cur) match {
        case Some(d) => cur = d; applied += "gzip"
        case None => return (Array.emptyByteArray, "bad_gzip")
      }
      case Some("deflate") =>
        // HTTP "deflate" is officially zlib (RFC 1950) but raw-deflate
        // senders are legion — try wrapped, fall back to raw, the
        // browser behavior
        inflateBytes(cur, nowrap = false)
          .orElse(inflateBytes(cur, nowrap = true)) match {
          case Some(d) => cur = d; applied += "deflate"
          case None => return (Array.emptyByteArray, "bad_deflate")
        }
      case Some(_) => return (Array.emptyByteArray, "unsupported")
    }
    (cur, applied.result().mkString("+"))
  }

  /** RFC 9112 chunked framing: hex size line (chunk extensions after
    * ';' ignored) CRLF, data, CRLF, …, 0-size terminator (trailer
    * section ignored). None on any malformation — a chunked body cut
    * mid-chunk, a non-hex size line, a missing CRLF. */
  private[graft] def dechunk(b: Array[Byte]): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream()
    var pos = 0
    while (true) {
      var le = pos
      while (le + 1 < b.length && !(b(le) == '\r' && b(le + 1) == '\n'))
        le += 1
      if (le + 1 >= b.length) return None // size line never terminates
      val line = new String(b, pos, le - pos, ISO_8859_1)
      val sizeStr = line.indexOf(';') match {
        case -1 => line.trim
        case i => line.substring(0, i).trim
      }
      if (sizeStr.isEmpty || !sizeStr.forall(c => (c >= '0' && c <= '9') ||
        (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F'))) return None
      val size =
        try java.lang.Long.parseLong(sizeStr, 16)
        catch { case _: NumberFormatException => return None }
      if (size < 0 || size > b.length.toLong) return None
      pos = le + 2
      if (size == 0) return Some(out.toByteArray) // trailers ignored
      if (pos + size + 2 > b.length) return None // cut mid-chunk
      out.write(b, pos, size.toInt)
      pos += size.toInt
      if (!(b(pos) == '\r' && b(pos + 1) == '\n')) return None
      pos += 2
    }
    None // unreachable
  }

  /** Whole-buffer gunzip, None on any decode failure. */
  private[graft] def gunzipBytes(b: Array[Byte]): Option[Array[Byte]] =
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(b))
      try {
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        Some(out.toByteArray)
      } finally in.close()
    } catch { case _: java.io.IOException => None }

  /** Whole-buffer inflate (zlib wrapper when `nowrap = false`, raw
    * deflate otherwise), None on malformed input. */
  private[graft] def inflateBytes(b: Array[Byte],
                                  nowrap: Boolean): Option[Array[Byte]] = {
    val inf = new java.util.zip.Inflater(nowrap)
    try {
      inf.setInput(b)
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary()))
          return None // truncated or dictionary-dependent: malformed
        out.write(buf, 0, n)
      }
      Some(out.toByteArray)
    } catch { case _: java.util.zip.DataFormatException => None }
    finally inf.end()
  }

  /** Fixture/spec encoder: RFC 9112 chunked framing at a fixed chunk
    * size — the deterministic inverse of [[dechunk]]. */
  def chunkEncode(body: Array[Byte], chunkSize: Int): Array[Byte] = {
    require(chunkSize > 0, s"chunkSize must be positive, got $chunkSize")
    val out = new java.io.ByteArrayOutputStream()
    var pos = 0
    while (pos < body.length) {
      val n = math.min(chunkSize, body.length - pos)
      out.write(s"${n.toHexString}\r\n".getBytes(ISO_8859_1))
      out.write(body, pos, n)
      out.write('\r'); out.write('\n')
      pos += n
    }
    out.write("0\r\n\r\n".getBytes(ISO_8859_1))
    out.toByteArray
  }

  /** Fixture/spec encoder: gzip (deterministic for fixed input). */
  def gzipEncode(body: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(body); g.close()
    bos.toByteArray
  }

  /** Fixture/spec encoder: zlib-wrapped deflate (the official HTTP
    * "deflate" coding). */
  def deflateEncode(body: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    try {
      d.setInput(body); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    } finally d.end()
  }

  /** BOUNDED-MEMORY record walk over an InputStream (r18, VERDICT #8):
    * the same grammar, record construction, and never-throw tear
    * taxonomy as [[parseBytes]], but the file never materializes — the
    * buffer holds at most one record (header + payload + trailer) plus
    * a read window, so a crawl file past the binaryFile content ceiling
    * can still SERVE its records in record-hop windows instead of only
    * auditing as `warc_oversize`. Two stream-specific bounds replace
    * the whole-array length checks (an unbounded stream has no natural
    * rejection point): a declared Content-Length above `maxRecordBytes`
    * and a header block growing past it both tear — complete records
    * ahead of either are kept, the parseBytes discipline. An
    * IOException mid-read (a gzip stream corrupt past its header)
    * also tears, keeping everything parsed before it. */
  def parseStream(in: java.io.InputStream,
                  maxRecordBytes: Int = 256 << 20): BParsed = {
    val recs = List.newBuilder[BRec]
    var buf = new Array[Byte](64 * 1024)
    var len = 0
    var eof = false
    def readMore(): Boolean =
      try {
        if (len == buf.length)
          buf = java.util.Arrays.copyOf(buf,
            math.min(math.max(buf.length * 2L, 64L * 1024),
              Int.MaxValue - 8).toInt)
        val n = in.read(buf, len, buf.length - len)
        if (n < 0) { eof = true; false } else { len += n; true }
      } catch { case _: java.io.IOException => eof = true; false }
    def ensure(need: Int): Boolean = {
      if (need > maxRecordBytes) return false
      while (len < need && !eof) {
        if (need > buf.length)
          buf = java.util.Arrays.copyOf(buf, need)
        readMore()
      }
      len >= need
    }
    def crlfCrlfIn(from: Int): Int = {
      var i = from
      val last = len - 4
      while (i <= last) {
        if (buf(i) == '\r' && buf(i + 1) == '\n' && buf(i + 2) == '\r' &&
          buf(i + 3) == '\n') return i
        i += 1
      }
      -1
    }
    while (true) {
      // pull at least one byte of the next record (or finish clean)
      if (len == 0 && !eof) readMore()
      if (len == 0 && eof) return BParsed(recs.result(), torn = false)
      // header block: grow the window until its CRLFCRLF lands
      var hdrEnd = crlfCrlfIn(0)
      while (hdrEnd < 0 && !eof && len < maxRecordBytes) {
        val before = len
        readMore()
        // re-scan from 3 bytes before the old end: a CRLFCRLF can
        // straddle the read boundary, and everything earlier was
        // already searched
        hdrEnd = crlfCrlfIn(math.max(0, before - 3))
      }
      if (hdrEnd < 0 || !startsWithAt(buf, WarcMagic, 0))
        return BParsed(recs.result(), torn = true)
      val hdrs = headerMap(new String(buf, 0, hdrEnd, ISO_8859_1))
      val clen = hdrs.get("Content-Length").flatMap(_.toLongOption)
      val recType = hdrs.getOrElse("WARC-Type", "")
      if (clen.isEmpty || clen.get < 0L ||
        clen.get > maxRecordBytes.toLong || recType.isEmpty)
        return BParsed(recs.result(), torn = true)
      val payloadStart = hdrEnd + 4
      val recEnd = payloadStart.toLong + clen.get + 4
      if (recEnd > Int.MaxValue - 8 || !ensure(recEnd.toInt) ||
        !startsWithAt(buf, CrlfCrlf, payloadStart + clen.get.toInt))
        return BParsed(recs.result(), torn = true)
      val payload = java.util.Arrays.copyOfRange(buf, payloadStart,
        payloadStart + clen.get.toInt)
      recs += buildRec(recType, hdrs.getOrElse("WARC-Target-URI", ""),
        hdrs.getOrElse("WARC-Refers-To-Target-URI", ""), payload)
      // hop: drop the consumed record, keep the unparsed tail
      val consumed = recEnd.toInt
      System.arraycopy(buf, consumed, buf, 0, len - consumed)
      len -= consumed
    }
    BParsed(recs.result(), torn = false) // unreachable
  }

  /** Byte-domain encoder: same two-record layout as [[encodeArchiveAs]]
    * but Content-Length counts PAYLOAD BYTES — the on-the-wire meaning —
    * so a UTF-8 or binary body archives correctly (the char encoder's
    * char-count lengths only coincide with byte counts on ASCII). */
  def encodeArchiveBytes(docId: Long, source: String, body: Array[Byte],
                         contentType: String): Array[Byte] = {
    val uri = s"http://$source/doc/$docId"
    val reqHttp =
      s"GET /doc/$docId HTTP/1.1\r\nHost: $source\r\n\r\n".getBytes(ISO_8859_1)
    val respHttp =
      (s"HTTP/1.1 200 OK\r\nContent-Type: $contentType\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n").getBytes(ISO_8859_1) ++ body
    def record(recType: String, payload: Array[Byte]): Array[Byte] =
      (s"WARC/1.0\r\nWARC-Type: $recType\r\nWARC-Target-URI: $uri\r\n" +
        s"Content-Length: ${payload.length}\r\n\r\n").getBytes(ISO_8859_1) ++
        payload ++ CrlfCrlf
    record("request", reqHttp) ++ record("response", respHttp)
  }

  /** Byte-domain encoder with CALLER-SUPPLIED HTTP response headers —
    * the encoded-body fixture entry (r19): `headers` land verbatim
    * after the status line (include Content-Type and, for identity
    * bodies, Content-Length; chunked lanes omit it, the wire
    * convention). The WARC-level Content-Length counts the PAYLOAD
    * bytes (head + encoded body), what the record hop uses. */
  def encodeArchiveBytesHttp(docId: Long, source: String,
                             body: Array[Byte],
                             headers: Seq[(String, String)]): Array[Byte] = {
    val uri = s"http://$source/doc/$docId"
    val reqHttp =
      s"GET /doc/$docId HTTP/1.1\r\nHost: $source\r\n\r\n".getBytes(ISO_8859_1)
    val respHttp =
      ("HTTP/1.1 200 OK\r\n" +
        headers.map { case (k, v) => s"$k: $v\r\n" }.mkString +
        "\r\n").getBytes(ISO_8859_1) ++ body
    def record(recType: String, payload: Array[Byte]): Array[Byte] =
      (s"WARC/1.0\r\nWARC-Type: $recType\r\nWARC-Target-URI: $uri\r\n" +
        s"Content-Length: ${payload.length}\r\n\r\n").getBytes(ISO_8859_1) ++
        payload ++ CrlfCrlf
    record("request", reqHttp) ++ record("response", respHttp)
  }

  /** A `revisit` record (r19, VERDICT #4): the crawler refetched `uri`,
    * found the payload identical to the record at `refersToUri`, and
    * stored this marker INSTEAD of the body — a free exact-dup edge the
    * dedup funnel consumes without hashing anything. */
  def encodeRevisitBytes(uri: String, refersToUri: String): Array[Byte] =
    (s"WARC/1.0\r\nWARC-Type: revisit\r\nWARC-Target-URI: $uri\r\n" +
      s"WARC-Refers-To-Target-URI: $refersToUri\r\n" +
      "WARC-Profile: identical-payload-digest\r\n" +
      "Content-Length: 0\r\n\r\n").getBytes(ISO_8859_1) ++ CrlfCrlf

  final case class WarcStatsRow(doc_id: Long, source: String,
                                warc_ok: Boolean, n_records: Int,
                                uri: String, http_status: Int,
                                content_type: String, body: String,
                                warc_len: Int)

  /** Parse over the `warc` column: narrow partition-local map. The
    * certified body is the LAST complete response record's (our
    * encoder writes one); archives with no complete response certify
    * an empty body. */
  def parseColumns(archives: DataFrame): DataFrame = {
    val spark = archives.sparkSession
    import spark.implicits._
    archives.select(col("doc_id").cast("long"), col("source"), col("warc"))
      .as[(Long, String, String)]
      .mapPartitions(_.map { case (id, src, warc) =>
        val p = parse(warc)
        val resp = p.records.reverse.find(_.recType == "response")
        WarcStatsRow(id, src, !p.torn, p.records.length,
          resp.map(_.uri).getOrElse(""),
          resp.map(_.httpStatus).getOrElse(0),
          resp.map(_.contentType).getOrElse(""),
          resp.map(_.body).getOrElse(""),
          warc.length)
      }).toDF()
  }

  /** Per-(source, status) audit ledger: clean archives certify their
    * body volume; torn archives certify their KEPT complete records
    * but no body chars. */
  def audit(stats: DataFrame): DataFrame =
    stats
      .groupBy(col("source"),
        when(col("warc_ok"), lit("warc_ok"))
          .otherwise(lit("warc_torn")).as("status"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_records")).cast("long").as("n_records_kept"),
        sum(when(col("warc_ok"), length(col("body"))).otherwise(lit(0L)))
          .as("body_chars"))
}
