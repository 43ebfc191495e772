package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** PDF codec roundtrip + corruption fuzz — pure JVM (no Spark): the
  * encoder/extractor pair must be exact on both the raw and the
  * FlateDecode path, PDF string escaping must roundtrip, and NO
  * truncation point may throw or ship a body. */
class PdfExtractSpec extends AnyFunSuite {

  private val tricky = Seq(
    "",                                   // no Tj lines at all
    "plain words only",
    "parens (inside) the (text)",
    "back\\slash and \\( escaped",
    ")leading close",
    "x" * 200,                            // multi-line split
    "a(b)c" * 40)                         // escapes across line cuts

  test("roundtrip exact on raw and compressed paths, tricky strings") {
    for (t <- tricky; id <- Seq(2L, 3L)) { // even = compressed, odd = raw
      val p = PdfExtract.extract(PdfExtract.encodePdf(id, t))
      assert(p.ok, s"not ok for id=$id text=${t.take(20)}")
      assert(p.body == t, s"body mismatch for id=$id text=${t.take(20)}")
      assert(p.nObjs == 5 && p.nStreams == 1)
      assert(p.compressed == (id % 2 == 0))
      assert(p.nLines == (t.length + 59) / 60)
    }
  }

  test("every truncation point degrades to ok=false with no body, never throws") {
    for (id <- Seq(2L, 3L)) {
      val text = "some document text (with) escapes \\ here"
      val pdf = PdfExtract.encodePdf(id, text)
      // cut at every prefix length — header-only, mid-dict, mid-stream,
      // mid-xref; anything missing part of %%EOF must certify no body,
      // and a cut that only loses trailing bytes AFTER %%EOF is still a
      // complete document and must roundtrip
      val eofEnd = new String(pdf, "ISO-8859-1").lastIndexOf("%%EOF") + 5
      (0 until pdf.length by 7).foreach { cut =>
        val p = PdfExtract.extract(java.util.Arrays.copyOfRange(pdf, 0, cut))
        if (cut < eofEnd)
          assert(!p.ok && p.body == "", s"cut=$cut id=$id shipped a body")
        else assert(p.ok && p.body == text, s"cut=$cut id=$id lost the body")
      }
      // byte corruption inside the stream: flip a byte in the middle
      val mid = pdf.length / 2
      val mutated = pdf.clone(); mutated(mid) = (mutated(mid) ^ 0x55).toByte
      val p = PdfExtract.extract(mutated) // must not throw; ok may vary
      if (!p.ok) assert(p.body == "")
    }
  }

  test("PDF structure markers INSIDE document text cannot confuse the parser") {
    // text that embeds every marker the extractor keys on — the
    // /Length-based stream walk must see them as payload, not structure
    val hostile = Seq(
      "before %%EOF after",
      "a 0 obj b",
      "x >> stream\n y",
      "p \nendstream q",
      "%%EOF\nendstream 4 0 obj >> stream\n",
      "trailer << /Size 6 >> startxref")
    for (t <- hostile; id <- Seq(2L, 3L)) {
      val p = PdfExtract.extract(PdfExtract.encodePdf(id, t))
      assert(p.ok && p.body == t && p.nObjs == 5 && p.nStreams == 1,
        s"marker text broke parse: id=$id '$t'")
    }
    // and the q188 contract under truncation: text containing %%EOF in
    // the surviving half must NOT certify a truncated file
    val pdf = PdfExtract.encodePdf(3L, ("%%EOF " * 20) + ("pad " * 50))
    val cut = PdfExtract.extract(
      java.util.Arrays.copyOfRange(pdf, 0, pdf.length * 3 / 4))
    assert(!cut.ok && cut.body == "")
  }

  test("roundtrip exact for full Unicode (UTF-8 string payloads)") {
    val texts = Seq("café naïve", "中文 文本",
      "emoji 😀🎉 end", "mixed (é\\x) t")
    for (t <- texts; id <- Seq(2L, 3L)) {
      val p = PdfExtract.extract(PdfExtract.encodePdf(id, t))
      assert(p.ok && p.body == t, s"unicode roundtrip failed: id=$id '$t'")
    }
  }

  test("garbage input is rejected, not thrown on") {
    assert(!PdfExtract.extract(Array.emptyByteArray).ok)
    assert(!PdfExtract.extract("not a pdf at all".getBytes("ISO-8859-1")).ok)
    assert(!PdfExtract.extract(Array.fill[Byte](1024)(0x25)).ok)
  }
}
