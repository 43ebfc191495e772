package graft.codec

import java.nio.charset.{CharacterCodingException, Charset, CodingErrorAction, StandardCharsets}

/** Charset resolution + certified decode for the crawl text lanes
  * (r18, VERDICT #1): a real crawl is full of `text/html;
  * charset=ISO-8859-1` / `windows-1252` pages, and the r17 dispatch
  * decoded every text body as UTF-8 — each such page was silently
  * mojibake'd (U+FFFD) into the training corpus with `ok = true` and no
  * census. The reference never lets damage pass uncounted
  * (/root/reference/src/dnstap/dnstap.go:278-280 logs and drops every
  * decode failure); this codec makes the charset decision explicit and
  * the damage COUNTABLE:
  *
  *   - a byte-order mark wins over everything and is stripped (WHATWG
  *     precedence: BOM > transport > meta — UTF-8 / UTF-16LE / UTF-16BE);
  *   - the Content-Type `charset=` parameter is honored (RFC 2045
  *     parameter syntax, case-insensitive, optional quotes);
  *   - HTML without a transport charset is sniffed for `<meta charset>`
  *     / `<meta http-equiv=content-type>` in the first 1024 bytes (the
  *     WHATWG prescan window; transport wins over meta when present);
  *   - an unknown/unsupported declared name falls back to UTF-8 and is
  *     censused as its own class (`fallback`) — never thrown;
  *   - malformed byte sequences decode to U+FFFD AND flag the row
  *     (`replaced`) — the text still serves (a training pipeline wants
  *     the survivors), but the corruption is an audit class, not a
  *     silent pass.
  *
  * Everything here is per-record and allocation-bounded (one decoder
  * per call, prefix-bounded sniff) — it runs inside the dispatch's
  * narrow mapPartitions, nothing shuffles.
  */
object TextCharsets {

  /** One certified decode: the text, the canonical (lowercased) name of
    * the charset actually used, and the audit class —
    * `ok` | `replaced` | `fallback` | `fallback_replaced` (fallback =
    * the declared/sniffed name was unknown and UTF-8 was used). */
  final case class Decoded(text: String, charset: String, decode: String)

  /** The `charset=` parameter of a Content-Type value, if any:
    * parameters split on ';', names case-insensitive, values optionally
    * double-quoted (RFC 2045 §5.1). Empty values count as absent. */
  def charsetParam(contentType: String): Option[String] =
    contentType.split(';').iterator.drop(1).map(_.trim)
      .flatMap { p =>
        val eq = p.indexOf('=')
        if (eq < 0) None
        else {
          val name = p.substring(0, eq).trim
          if (!name.equalsIgnoreCase("charset")) None
          else {
            val v = p.substring(eq + 1).trim.stripPrefix("\"")
              .stripSuffix("\"").trim
            if (v.isEmpty) None else Some(v)
          }
        }
      }
      .nextOption()

  /** WHATWG-style prescan window: meta declarations past the first 1 KiB
    * are ignored by real browsers and by this sniff. */
  private val SniffWindow = 1024

  /** Sniff an HTML `<meta charset=...>` or
    * `<meta http-equiv="Content-Type" content="...; charset=...">`
    * declaration from the byte prefix. The prefix is decoded Latin-1
    * (byte-transparent — charset names are ASCII, and a stray high byte
    * degrades a name instead of shifting offsets) and scanned
    * case-insensitively. Heuristic by design: it finds the declarations
    * real pages carry; adversarial markup falls through to the UTF-8
    * default, never throws. */
  /** ASCII whitespace per the WHATWG prescan — a meta attribute split
    * across lines (`charset =\n "utf-8"`) is as valid as one space. */
  private def isAsciiWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'

  def sniffMetaCharset(bytes: Array[Byte]): Option[String] = {
    if (bytes == null || bytes.length == 0) return None
    val n = math.min(bytes.length, SniffWindow)
    val head = new String(bytes, 0, n, StandardCharsets.ISO_8859_1)
      .toLowerCase(java.util.Locale.ROOT)
    var from = 0
    while (from >= 0 && from < head.length) {
      val at = head.indexOf("charset", from)
      if (at < 0) return None
      // accept "charset = x" inside a <meta ...> tag region only: the
      // token must be preceded somewhere by '<meta' with no '>' between
      val open = head.lastIndexOf("<meta", at)
      val close = head.lastIndexOf('>', at)
      if (open >= 0 && close < open) {
        var i = at + "charset".length
        while (i < head.length && isAsciiWs(head.charAt(i))) i += 1
        if (i < head.length && head.charAt(i) == '=') {
          i += 1
          while (i < head.length && isAsciiWs(head.charAt(i))) i += 1
          val quoted = i < head.length &&
            (head.charAt(i) == '"' || head.charAt(i) == '\'')
          val quote = if (quoted) head.charAt(i) else ' '
          if (quoted) i += 1
          val start = i
          while (i < head.length && {
            val c = head.charAt(i)
            if (quoted) c != quote
            // unquoted values end on ANY ASCII whitespace (WHATWG), not
            // just space — a newline-terminated value otherwise swallows
            // the rest of the tag into the charset name
            else !isAsciiWs(c) && c != '>' && c != ';' && c != '/' &&
              c != '"' && c != '\''
          }) i += 1
          val v = head.substring(start, i).trim
          if (v.nonEmpty) return Some(v)
        }
      }
      from = at + "charset".length
    }
    None
  }

  /** Resolve a declared charset name, None when the JVM doesn't know it
    * (or the name is syntactically illegal) — the `fallback` class. */
  def resolve(name: String): Option[Charset] =
    try Some(Charset.forName(name.trim))
    catch { case _: IllegalArgumentException => None }

  /** Decode `bytes` with `cs`, flagging malformed/unmappable input: the
    * strict pass costs nothing on clean input (the common case), and
    * only a flagged row pays the second REPLACE decode. */
  private def decodeFlagged(bytes: Array[Byte], cs: Charset): (String, Boolean) =
    try {
      val strict = cs.newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      (strict.decode(java.nio.ByteBuffer.wrap(bytes)).toString, false)
    } catch {
      case _: CharacterCodingException =>
        val lax = cs.newDecoder()
          .onMalformedInput(CodingErrorAction.REPLACE)
          .onUnmappableCharacter(CodingErrorAction.REPLACE)
        (lax.decode(java.nio.ByteBuffer.wrap(bytes)).toString, true)
    }

  /** Byte-order-mark sniff: (charset, BOM length). Per the WHATWG
    * encoding standard a BOM outranks EVERYTHING — transport charset
    * included — and is not content (the caller skips `bomLen` bytes).
    * UTF-8 EF BB BF; UTF-16 FF FE (LE) / FE FF (BE). UTF-16 must be
    * checked AFTER UTF-8's longer mark can't match (distinct prefixes,
    * so order here is immaterial — kept explicit for the reader). */
  def sniffBom(bytes: Array[Byte]): Option[(Charset, Int)] =
    if (bytes == null || bytes.length < 2) None
    else if (bytes.length >= 3 && (bytes(0) & 0xFF) == 0xEF &&
      (bytes(1) & 0xFF) == 0xBB && (bytes(2) & 0xFF) == 0xBF)
      Some((StandardCharsets.UTF_8, 3))
    else if ((bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xFF) == 0xFE)
      Some((StandardCharsets.UTF_16LE, 2))
    else if ((bytes(0) & 0xFF) == 0xFE && (bytes(1) & 0xFF) == 0xFF)
      Some((StandardCharsets.UTF_16BE, 2))
    else None

  /** The dispatch-lane decode, WHATWG precedence: a BOM wins over
    * everything (and is stripped — it is a signal, not content), then
    * `declared` (the Content-Type `charset=` parameter), then
    * `<meta charset>` when `sniffHtml`, else UTF-8. Unknown names fall
    * back to UTF-8 and census as `fallback`; malformed bytes census as
    * `replaced`. */
  def decode(bytes: Array[Byte], declared: Option[String],
             sniffHtml: Boolean = false): Decoded =
    sniffBom(bytes) match {
      case Some((cs, bomLen)) =>
        val (text, replaced) = decodeFlagged(
          java.util.Arrays.copyOfRange(bytes, bomLen, bytes.length), cs)
        Decoded(text, cs.name().toLowerCase(java.util.Locale.ROOT),
          if (replaced) "replaced" else "ok")
      case None =>
        val name = declared.orElse(
          if (sniffHtml) sniffMetaCharset(bytes) else None)
        val (cs, fellBack) = name match {
          case None => (StandardCharsets.UTF_8, false)
          case Some(n) => resolve(n) match {
            case Some(c) => (c, false)
            case None => (StandardCharsets.UTF_8, true)
          }
        }
        val (text, replaced) = decodeFlagged(bytes, cs)
        val status = (fellBack, replaced) match {
          case (false, false) => "ok"
          case (false, true) => "replaced"
          case (true, false) => "fallback"
          case (true, true) => "fallback_replaced"
        }
        Decoded(text, cs.name().toLowerCase(java.util.Locale.ROOT), status)
    }
}
