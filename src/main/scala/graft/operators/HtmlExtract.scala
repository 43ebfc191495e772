package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HTML → text extraction — stage one of every web-crawl corpus
  * pipeline (the trafilatura/jusText job): walk the markup, drop
  * structural boilerplate (`script`/`style`/`nav`/`footer` subtrees),
  * drop high-link-density blocks (menus), decode entities, and keep the
  * content blocks' text.
  *
  * Certification follows the media-codec pattern (q117/q125/q153): a
  * deterministic ENCODER wraps each document's text into a full page —
  * chunked `<p>` blocks, a nav, a link-only menu div whose density the
  * extractor must measure and reject, inline anchors wrapping existing
  * words (tag noise that must not perturb text), an escaped-entity
  * pass — and the extractor must recover the ORIGINAL text exactly
  * (`md5(extracted) == md5(text)` in both engines) plus tag/link
  * censuses the DuckDB oracle replays arithmetically from `strlen`.
  *
  * Scale shape: both encode and extract are narrow partition-local
  * `mapPartitions` maps (the sanctioned shape for byte/char codecs —
  * Catalyst cannot express a tag walker); no shuffle is introduced, the
  * page string never moves, and the char walk is single-pass O(page).
  * The parser NEVER throws: malformed/truncated markup degrades to
  * `html_ok = false` (and no certified body), the count-don't-crash
  * audit discipline of every decoder in this engine.
  */
object HtmlExtract {

  private val ParWidth = 80  // chars per <p> chunk
  private val MinAnchorPar = 11  // only wrap a 5-char anchor if density stays < 0.5

  // ---------------------------------------------------------------- encode

  private def escape(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&' => b.append("&amp;")
        case '<' => b.append("&lt;")
        case '>' => b.append("&gt;")
        case c => b.append(c)
      }
      i += 1
    }
    b.toString
  }

  /** Deterministic page for (docId, text): structure depends only on
    * `strlen(text)` and `docId`, which is what lets the oracle replay
    * every census with arithmetic. */
  def encodePage(docId: Long, text: String): String = {
    val b = new StringBuilder(text.length * 2 + 256)
    b.append("<html><head><title>doc ").append(docId)
      .append("</title><script>var x=1;</script></head><body>")
    b.append("<nav><a href=\"/\">home</a><a href=\"/s\">search</a>")
      .append("<a href=\"/c\">contact</a></nav>")
    val m = 2 + (docId % 4).toInt
    b.append("<div class=\"menu\">")
    (0 until m).foreach(i => b.append("<a href=\"/m/").append(i)
      .append("\">item").append(i).append("</a>"))
    b.append("</div>")
    val p = (text.length + ParWidth - 1) / ParWidth
    (0 until p).foreach { i =>
      val chunk = text.substring(i * ParWidth,
        math.min((i + 1) * ParWidth, text.length))
      b.append("<p>")
      if (i % 3 == 0 && chunk.length >= MinAnchorPar) {
        b.append("<a href=\"#p").append(i).append("\">")
          .append(escape(chunk.substring(0, 5))).append("</a>")
          .append(escape(chunk.substring(5)))
      } else b.append(escape(chunk))
      b.append("</p>")
    }
    b.append("<footer><a href=\"/terms\">terms</a></footer>")
    b.append("</body></html>")
    b.toString
  }

  // ---------------------------------------------------------------- extract

  /** One extraction result; `ok = false` (truncated/malformed page)
    * certifies NO body — partial extractions are never shipped. */
  final case class Extracted(ok: Boolean, body: String, nTags: Int,
                             nLinks: Int, nPars: Int, nDroppedDensity: Int)

  private val SkipTags = Set("script", "style", "nav", "footer")
  private val BlockTags = Set("p", "div")

  private def decodeEntity(s: String, from: Int, out: StringBuilder): Int = {
    // returns chars consumed from position `from` (which holds '&')
    val semi = s.indexOf(';', from + 1)
    // longest legal entity content is 8 chars ('#1048576', plane 16),
    // so semi - from may reach 9
    if (semi < 0 || semi - from > 9) { out.append('&'); 1 }
    else s.substring(from + 1, semi) match {
      case "amp" => out.append('&'); semi - from + 1
      case "lt" => out.append('<'); semi - from + 1
      case "gt" => out.append('>'); semi - from + 1
      case "quot" => out.append('"'); semi - from + 1
      case e if e.startsWith("#") && e.drop(1).forall(_.isDigit) &&
        e.length > 1 && e.length <= 8 &&
        e.drop(1).toLong <= Character.MAX_CODE_POINT =>
        // appendCodePoint, not toChar: supplementary-plane entities
        // (&#128512;) must not truncate to a mangled BMP char
        out.appendAll(Character.toChars(e.drop(1).toInt)); semi - from + 1
      case _ => out.append('&'); 1
    }
  }

  /** Single-pass tag walker. Never throws. */
  def extract(html: String): Extracted = {
    val body = new StringBuilder
    val block = new StringBuilder
    var nTags, nLinks, nPars, nDropped = 0
    var skipDepth = 0        // inside script/style/nav/footer subtree
    var blockDepth = 0       // inside a p/div content block
    var blockTag = ""        // the OUTERMOST open block's tag name
    var anchorDepth = 0      // inside <a> (for link-density chars)
    var linkChars = 0
    var sawHtmlClose = false
    var i = 0
    val n = html.length
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        val close = i + 1 < n && html.charAt(i + 1) == '/'
        var j = i + (if (close) 2 else 1)
        val nameStart = j
        while (j < n && html.charAt(j).isLetter) j += 1
        val name = html.substring(nameStart, j).toLowerCase
        val gt = html.indexOf('>', j)
        if (name.isEmpty || gt < 0) {
          // not a well-formed tag: treat '<' as text (robustness)
          if (skipDepth == 0 && blockDepth > 0) {
            block.append(c); if (anchorDepth > 0) linkChars += 1
          }
          i += 1
        } else {
          if (!close) {
            nTags += 1
            if (name == "a") { nLinks += 1; anchorDepth += 1 }
            if (SkipTags(name)) skipDepth += 1
            else if (skipDepth == 0 && BlockTags(name)) {
              if (blockDepth == 0) { blockTag = name; block.setLength(0); linkChars = 0 }
              blockDepth += 1
            }
          } else {
            if (name == "html") sawHtmlClose = true
            if (name == "a" && anchorDepth > 0) anchorDepth -= 1
            if (SkipTags(name) && skipDepth > 0) skipDepth -= 1
            else if (skipDepth == 0 && BlockTags(name) && blockDepth > 0) {
              blockDepth -= 1
              if (blockDepth == 0) {
                // close of the outermost block: keep or drop by density
                val len = block.length
                if (len > 0 && linkChars * 2 > len) nDropped += 1
                else { body.append(block); if (blockTag == "p") nPars += 1 }
              }
            }
          }
          i = gt + 1
        }
      } else {
        if (skipDepth == 0 && blockDepth > 0) {
          if (c == '&') { val used = decodeEntity(html, i, block)
            if (anchorDepth > 0) linkChars += 1
            i += used
          } else { block.append(c); if (anchorDepth > 0) linkChars += 1; i += 1 }
        } else i += 1
      }
    }
    val ok = sawHtmlClose && skipDepth == 0 && blockDepth == 0
    Extracted(ok, if (ok) body.toString else "", nTags, nLinks, nPars, nDropped)
  }

  // ---------------------------------------------------------------- columns

  final case class PageRow(doc_id: Long, source: String, html: String)
  final case class HtmlStatsRow(doc_id: Long, source: String,
                                html_ok: Boolean, body: String, n_tags: Int,
                                n_links: Int, n_pars: Int,
                                n_dropped_density: Int)

  /** Attach the deterministic page (`html` column); every
    * `truncateEvery`-th doc_id gets its page cut in half — the corrupt
    * slice for the audit ledger. 0 disables corruption. */
  def attachPages(docs: DataFrame, truncateEvery: Int = 0): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("source"), col("text"))
      .as[(Long, String, String)]
      .mapPartitions(_.map { case (id, src, text) =>
        val page = encodePage(id, text)
        val out =
          if (truncateEvery > 0 && id % truncateEvery == 0)
            page.substring(0, page.length / 2)
          else page
        PageRow(id, src, out)
      }).toDF()
  }

  /** Extraction over the `html` column: narrow partition-local map. */
  def extractColumns(pages: DataFrame): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.select(col("doc_id").cast("long"), col("source"), col("html"))
      .as[(Long, String, String)]
      .mapPartitions(_.map { case (id, src, html) =>
        val e = extract(html)
        HtmlStatsRow(id, src, e.ok, e.body, e.nTags, e.nLinks, e.nPars,
          e.nDroppedDensity)
      }).toDF()
  }

  /** Per-status audit ledger: ok pages certify their body volume;
    * truncated pages certify NOTHING (body_len 0 by contract). */
  def audit(stats: DataFrame): DataFrame =
    stats
      .groupBy(when(col("html_ok"), lit("html_ok"))
        .otherwise(lit("html_truncated")).as("status"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("html_ok"), length(col("body"))).otherwise(lit(0L)))
          .as("body_chars"))
}
