package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PDF → text extraction — the other big crawl-corpus format next to
  * HTML (reference for the container math: the public PDF 1.4 spec).
  * The deterministic ENCODER builds a complete single-page PDF around
  * each document's text: catalog/pages/page/content/font objects, a
  * correct xref table with real byte offsets, and a content stream of
  * `(line) Tj` text-showing operators — REALLY FlateDecode-compressed
  * for every even doc_id (java.util.zip, actual zlib), raw for odd, so
  * both parse paths run. The extractor walks objects, inflates where
  * the stream dict says so, unescapes the PDF string syntax, and must
  * recover the ORIGINAL text exactly — md5(extracted) == md5(text) in
  * both engines, with object/line censuses the oracle replays from
  * strlen arithmetic (stream byte length is deliberately NOT an oracle
  * column: zlib output size is engine-local, the q112 lesson).
  *
  * Scale shape: encode and extract are narrow partition-local maps
  * (the sanctioned byte-codec shape); PDFs never shuffle; single pass
  * over the bytes. The parser NEVER throws — truncation, a corrupt
  * deflate body, or unbalanced syntax degrade to `pdf_ok = false` and
  * BY CONTRACT no body ships (the count-don't-crash audit discipline
  * of every decoder here).
  */
object PdfExtract {

  private val LineWidth = 60 // text chars per Tj line

  // ---------------------------------------------------------------- encode

  private def escapePdf(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '\\' => b.append("\\\\")
      case '(' => b.append("\\(")
      case ')' => b.append("\\)")
      case c => b.append(c)
    }
    b.toString
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION)
    d.setInput(raw); d.finish()
    val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def inflate(raw: Array[Byte]): Option[Array[Byte]] =
    try {
      val i = new java.util.zip.Inflater()
      i.setInput(raw)
      val out = new java.io.ByteArrayOutputStream(raw.length * 3 + 64)
      val buf = new Array[Byte](4096)
      while (!i.finished()) {
        val n = i.inflate(buf)
        // n == 0 while unfinished covers truncated input AND the
        // no-progress states (needsDictionary, bogus FDICT headers) —
        // without this the "never throws" parser could instead never
        // RETURN on a hostile byte pattern
        if (n == 0 && !i.finished()) throw new java.util.zip.DataFormatException("stalled")
        out.write(buf, 0, n)
      }
      i.end()
      Some(out.toByteArray)
    } catch { case _: Exception => None }

  /** Single-page PDF for (docId, text); compressed iff docId is even.
    * Object structure is fixed (5 objects), so every census is
    * arithmetic in strlen(text) — the deterministic-encoder oracle
    * contract. */
  def encodePdf(docId: Long, text: String): Array[Byte] = {
    val content = {
      val b = new StringBuilder(text.length * 2 + 64)
      b.append("BT /F1 12 Tf 72 720 Td\n")
      val nLines = (text.length + LineWidth - 1) / LineWidth
      (0 until nLines).foreach { i =>
        val line = text.substring(i * LineWidth,
          math.min((i + 1) * LineWidth, text.length))
        // the string payload is the line's UTF-8 BYTES (viewed as
        // latin-1 chars): lossless for all of Unicode, so the md5
        // roundtrip contract holds for any input text — a plain
        // latin-1 encode would silently '?'-substitute and ship a
        // "successful" wrong body
        val bytes = new String(line.getBytes("UTF-8"), "ISO-8859-1")
        b.append('(').append(escapePdf(bytes)).append(") Tj 0 -14 Td\n")
      }
      b.append("ET")
      b.toString.getBytes("ISO-8859-1")
    }
    val compressed = docId % 2 == 0
    val streamBytes = if (compressed) deflate(content) else content
    val filter = if (compressed) " /Filter /FlateDecode" else ""

    val out = new java.io.ByteArrayOutputStream(streamBytes.length + 512)
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    val offsets = new Array[Int](6)
    w("%PDF-1.4\n")
    offsets(1) = out.size
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    offsets(2) = out.size
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    offsets(3) = out.size
    w("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R " +
      "/Resources << /Font << /F1 5 0 R >> >> >> endobj\n")
    offsets(4) = out.size
    w(s"4 0 obj << /Length ${streamBytes.length}$filter >> stream\n")
    out.write(streamBytes)
    w("\nendstream endobj\n")
    offsets(5) = out.size
    w("5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj\n")
    val xrefAt = out.size
    w("xref\n0 6\n0000000000 65535 f \n")
    (1 to 5).foreach(i => w(f"${offsets(i)}%010d 00000 n \n"))
    w("trailer << /Size 6 /Root 1 0 R >>\nstartxref\n" + xrefAt + "\n%%EOF\n")
    out.toByteArray
  }

  // ---------------------------------------------------------------- extract

  /** `ok = false` certifies NO body — partial extractions never ship. */
  final case class Parsed(ok: Boolean, body: String, nObjs: Int,
                          nStreams: Int, compressed: Boolean, nLines: Int)

  private def latin1(b: Array[Byte]): String = new String(b, "ISO-8859-1")

  /** Unescape the `(...)`-delimited PDF strings of `content`, in order,
    * concatenated; counts Tj operators. Returns null on unbalanced
    * syntax. */
  private def textFromContent(content: String): (String, Int) = {
    val body = new StringBuilder
    var nTj = 0
    var i = 0
    val n = content.length
    while (i < n) {
      if (content.charAt(i) == '(') {
        val s = new StringBuilder
        i += 1
        var closed = false
        while (i < n && !closed) {
          content.charAt(i) match {
            case '\\' if i + 1 < n =>
              s.append(content.charAt(i + 1)); i += 2
            case ')' => closed = true; i += 1
            case c => s.append(c); i += 1
          }
        }
        if (!closed) return (null, 0)
        // a string only contributes if shown with Tj
        if (content.startsWith(" Tj", i)) { body.append(s); nTj += 1 }
      } else i += 1
    }
    // body chars are UTF-8 BYTES viewed as latin-1 (the encoder's
    // string payload contract) — decode once over the concatenation
    (new String(body.toString.getBytes("ISO-8859-1"), "UTF-8"), nTj)
  }

  private def parseLength(dict: String): Option[Int] = {
    val at = dict.indexOf("/Length ")
    if (at < 0) None
    else {
      var j = at + "/Length ".length
      var v = 0L
      var any = false
      while (j < dict.length && dict.charAt(j).isDigit && v <= Int.MaxValue) {
        v = v * 10 + (dict.charAt(j) - '0'); j += 1; any = true
      }
      if (any && v <= Int.MaxValue) Some(v.toInt) else None
    }
  }

  /** Single-pass object walk, STREAM-EXTENT AWARE: each stream's data
    * is skipped by its dict's /Length (verified to land exactly on
    * `\nendstream`), so marker substrings INSIDE document text or zlib
    * bytes — "%%EOF", " 0 obj", ">> stream" — can never be mistaken
    * for structure: the object census counts only outside stream
    * extents, and the trailer %%EOF must sit after the last stream.
    * Never throws. */
  def extract(pdf: Array[Byte]): Parsed = {
    val s = latin1(pdf)
    var corrupt = !s.startsWith("%PDF-")
    var nStreams = 0
    var compressed = false
    var body: String = null
    var nLines = 0
    val streamRanges = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var pos = 0
    var lastStreamEnd = 0
    var at = s.indexOf(">> stream\n", pos)
    while (at >= 0 && !corrupt) {
      nStreams += 1
      val dictStart = s.lastIndexOf("<<", at)
      val dict =
        if (dictStart >= lastStreamEnd) s.substring(dictStart, at + 2) else ""
      val isFlate = dict.contains("/FlateDecode")
      val dataStart = at + ">> stream\n".length
      parseLength(dict) match {
        case Some(len) if dataStart + len + "\nendstream".length <= s.length &&
          s.startsWith("\nendstream", dataStart + len) =>
          val raw = java.util.Arrays.copyOfRange(pdf, dataStart, dataStart + len)
          (if (isFlate) inflate(raw) else Some(raw)) match {
            case None => corrupt = true
            case Some(cb) =>
              compressed ||= isFlate
              val (t, k) = textFromContent(latin1(cb))
              if (t == null) corrupt = true
              else { body = (if (body == null) "" else body) + t; nLines += k }
          }
          streamRanges += ((dataStart, dataStart + len))
          pos = dataStart + len + "\nendstream".length
          lastStreamEnd = pos
          at = s.indexOf(">> stream\n", pos)
        case _ => corrupt = true
      }
    }
    if (nStreams == 0) corrupt = true
    // the trailer's %%EOF must come AFTER the last stream's data — a
    // "%%EOF" inside a truncated document's surviving text never
    // certifies the file
    if (s.lastIndexOf("%%EOF") < lastStreamEnd || s.lastIndexOf("%%EOF") < 0)
      corrupt = true
    var nObjs = 0
    var idx = s.indexOf(" 0 obj")
    while (idx >= 0) {
      if (!streamRanges.exists { case (a, b) => idx >= a && idx < b }) nObjs += 1
      idx = s.indexOf(" 0 obj", idx + 1)
    }
    val ok = !corrupt
    Parsed(ok, if (ok && body != null) body else "", nObjs, nStreams,
      compressed, nLines)
  }

  // ---------------------------------------------------------------- columns

  final case class PdfStatsRow(doc_id: Long, source: String,
                               pdf_ok: Boolean, body: String, n_objs: Int,
                               n_streams: Int, compressed: Boolean,
                               n_lines: Int)

  /** Attach the deterministic PDF; every `truncateEvery`-th doc_id is
    * cut in half (loses %%EOF and usually the stream tail) — the
    * corrupt slice for the audit ledger. 0 disables corruption. */
  def attachPdfs(docs: DataFrame, truncateEvery: Int = 0): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("source"), col("text"))
      .as[(Long, String, String)]
      .mapPartitions(_.map { case (id, src, text) =>
        val pdf = encodePdf(id, text)
        val out =
          if (truncateEvery > 0 && id % truncateEvery == 0)
            java.util.Arrays.copyOfRange(pdf, 0, pdf.length / 2)
          else pdf
        (id, src, out)
      })
      .toDF("doc_id", "source", "pdf")
  }

  /** Run the extractor; one narrow map, PDFs never shuffle. */
  def extractColumns(withPdfs: DataFrame): DataFrame = {
    val spark = withPdfs.sparkSession
    import spark.implicits._
    withPdfs.select(col("doc_id").cast("long"), col("source"), col("pdf"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, src, pdf) =>
        val p = extract(pdf)
        PdfStatsRow(id, src, p.ok, p.body, p.nObjs, p.nStreams,
          p.compressed, p.nLines)
      })
      .toDF()
  }

  /** The decode-audit ledger: per-status doc counts and certified body
    * chars (0 for failures BY CONTRACT). */
  def audit(stats: DataFrame): DataFrame =
    stats.groupBy(when(col("pdf_ok"), lit("pdf_ok"))
        .otherwise(lit("pdf_truncated")).as("status"))
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("body")).cast("long")).as("body_chars"))
}
