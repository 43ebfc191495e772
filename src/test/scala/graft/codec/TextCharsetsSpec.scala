package graft.codec

import java.nio.charset.{Charset, StandardCharsets}

import org.scalatest.funsuite.AnyFunSuite

/** The charset-certified decode behind the crawl text lanes (r18): the
  * Content-Type parameter grammar, the WHATWG-window meta sniff, and
  * the four decode classes — every contract q262's census arithmetic
  * rides on. */
class TextCharsetsSpec extends AnyFunSuite {

  test("charsetParam: RFC 2045 parameter grammar — case-insensitive " +
    "name, optional quotes, other params skipped, absent/empty = None") {
    assert(TextCharsets.charsetParam("text/html; charset=ISO-8859-1")
      === Some("ISO-8859-1"))
    assert(TextCharsets.charsetParam("text/html;charset=\"utf-8\"")
      === Some("utf-8"))
    assert(TextCharsets.charsetParam("text/html; CHARSET=latin1")
      === Some("latin1"))
    assert(TextCharsets.charsetParam(
      "multipart/form-data; boundary=x; charset=utf-8")
      === Some("utf-8"))
    assert(TextCharsets.charsetParam("text/html") === None)
    assert(TextCharsets.charsetParam("text/html; charset=") === None)
    assert(TextCharsets.charsetParam("text/html; charset=\"\"") === None)
    assert(TextCharsets.charsetParam("") === None)
    // the base type is never mistaken for a parameter
    assert(TextCharsets.charsetParam("charset=utf-8") === None)
  }

  test("sniffMetaCharset: <meta charset> and http-equiv forms inside " +
    "the 1 KiB prescan window; declarations past it are ignored") {
    def b(s: String) = s.getBytes(StandardCharsets.ISO_8859_1)
    assert(TextCharsets.sniffMetaCharset(
      b("<html><head><meta charset=\"iso-8859-1\"></head>"))
      === Some("iso-8859-1"))
    assert(TextCharsets.sniffMetaCharset(
      b("<head><META CHARSET=UTF-8></head>")) === Some("utf-8"))
    assert(TextCharsets.sniffMetaCharset(
      b("<meta http-equiv=\"Content-Type\" " +
        "content=\"text/html; charset=windows-1252\">"))
      === Some("windows-1252"))
    // 'charset' outside a meta tag (page text) is not a declaration
    assert(TextCharsets.sniffMetaCharset(
      b("<html><body><p>set your charset = utf-8 here</p>")) === None)
    // past the prescan window: invisible, as in real browsers
    assert(TextCharsets.sniffMetaCharset(
      b(" " * 1100 + "<meta charset=utf-8>")) === None)
    assert(TextCharsets.sniffMetaCharset(Array.emptyByteArray) === None)
    assert(TextCharsets.sniffMetaCharset(null) === None)
  }

  test("sniffMetaCharset: WHATWG whitespace (r18 ADVICE) — tab/CR/LF/FF " +
    "around '=' are as valid as spaces, and an unquoted value ends on " +
    "ANY whitespace, not just space") {
    def b(s: String) = s.getBytes(StandardCharsets.ISO_8859_1)
    // meta attributes split across lines — real pages do this
    assert(TextCharsets.sniffMetaCharset(
      b("<meta charset\t=\n\"iso-8859-1\">")) === Some("iso-8859-1"))
    assert(TextCharsets.sniffMetaCharset(
      b("<meta charset =\r\n windows-1252>")) === Some("windows-1252"))
    assert(TextCharsets.sniffMetaCharset(
      b("<meta charset\f=\futf-8>")) === Some("utf-8"))
    // unquoted value terminated by a newline before other attributes:
    // the name must not swallow the rest of the tag
    assert(TextCharsets.sniffMetaCharset(
      b("<meta charset=iso-8859-1\nlang=en>")) === Some("iso-8859-1"))
    assert(TextCharsets.sniffMetaCharset(
      b("<meta charset=utf-8\tid=x>")) === Some("utf-8"))
  }

  test("decode classes: ok / replaced / fallback / fallback_replaced, " +
    "with the canonical lowercased charset name reported") {
    val latin1Bytes = "é x".getBytes(StandardCharsets.ISO_8859_1)
    val utf8Bytes = "é x".getBytes(StandardCharsets.UTF_8)
    val ok = TextCharsets.decode(latin1Bytes, Some("ISO-8859-1"))
    assert(ok === TextCharsets.Decoded("é x", "iso-8859-1", "ok"))
    // declared UTF-8 over latin-1 bytes: 0xE9 is malformed → U+FFFD,
    // flagged — the class r17 served silently
    val rep = TextCharsets.decode(latin1Bytes, Some("utf-8"))
    assert(rep.decode === "replaced" && rep.charset === "utf-8")
    assert(rep.text === "� x")
    // the UNDETECTABLE lie: UTF-8 bytes declared latin-1 decode without
    // error to mojibake — latin-1 maps every byte
    val lie = TextCharsets.decode(utf8Bytes, Some("iso-8859-1"))
    assert(lie.decode === "ok" && lie.text === "Ã© x")
    // unknown name → UTF-8 fallback, censused
    val fb = TextCharsets.decode(utf8Bytes, Some("x-unknown-cs"))
    assert(fb === TextCharsets.Decoded("é x", "utf-8", "fallback"))
    val fbr = TextCharsets.decode(latin1Bytes, Some("x-unknown-cs"))
    assert(fbr.decode === "fallback_replaced")
    // windows-1252 honors the chars latin-1 lacks (€ = 0x80)
    val eur = TextCharsets.decode(
      "€".getBytes(Charset.forName("windows-1252")), Some("windows-1252"))
    assert(eur.text === "€" && eur.decode === "ok")
  }

  test("BOM precedence (WHATWG): a byte-order mark wins over transport " +
    "AND meta, and is stripped from the content") {
    import TextCharsets.decode
    val u8bom = Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte)
    val utf8 = "é x".getBytes(StandardCharsets.UTF_8)
    val bommed = decode(u8bom ++ utf8, None)
    assert(bommed === TextCharsets.Decoded("é x", "utf-8", "ok"),
      "UTF-8 BOM not honored/stripped")
    // BOM beats a LYING transport declaration
    val lied = decode(u8bom ++ utf8, Some("iso-8859-1"))
    assert(lied.charset === "utf-8" && lied.text === "é x")
    // UTF-16 both endiannesses
    val le = decode(Array(0xFF.toByte, 0xFE.toByte) ++
      "é x".getBytes(StandardCharsets.UTF_16LE), None)
    assert(le === TextCharsets.Decoded("é x", "utf-16le", "ok"))
    val be = decode(Array(0xFE.toByte, 0xFF.toByte) ++
      "é x".getBytes(StandardCharsets.UTF_16BE), Some("utf-8"))
    assert(be === TextCharsets.Decoded("é x", "utf-16be", "ok"))
    // no false positive: a latin-1 'ÿþ' pair IS the UTF-16LE mark —
    // that ambiguity is inherent to BOM sniffing (browsers share it);
    // pin the behavior so a change is a conscious decision
    assert(TextCharsets.sniffBom("ÿþ".getBytes(
      StandardCharsets.ISO_8859_1)).map(_._1.name()) === Some("UTF-16LE"))
    assert(TextCharsets.sniffBom("plain".getBytes(
      StandardCharsets.US_ASCII)) === None)
    assert(TextCharsets.sniffBom(Array[Byte](0xEF.toByte)) === None)
  }

  test("decode precedence: transport param WINS over meta; meta is " +
    "sniffed only for HTML and only when no param is declared") {
    val html = "<html><head><meta charset=\"iso-8859-1\"></head>" +
      "<body>é</body></html>"
    val latin1 = html.getBytes(StandardCharsets.ISO_8859_1)
    // no param, sniffHtml: the meta declaration is honored
    val sniffed = TextCharsets.decode(latin1, None, sniffHtml = true)
    assert(sniffed.charset === "iso-8859-1" && sniffed.decode === "ok")
    assert(sniffed.text === html)
    // no param, NOT html: default UTF-8 (and 0xE9 flags)
    val plain = TextCharsets.decode(latin1, None)
    assert(plain.charset === "utf-8" && plain.decode === "replaced")
    // declared param beats the meta tag (WHATWG: transport layer wins)
    val declared = TextCharsets.decode(latin1, Some("utf-8"),
      sniffHtml = true)
    assert(declared.charset === "utf-8" && declared.decode === "replaced")
  }
}
