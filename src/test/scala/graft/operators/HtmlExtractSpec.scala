package graft.operators

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

/** The tag walker in isolation: roundtrip identity through the
  * deterministic encoder (escaped entities included), measured
  * link-density drops, truncation discipline (no partial bodies), and
  * never-throw robustness on mangled markup. */
class HtmlExtractSpec extends AnyFunSuite {

  test("encoder roundtrip recovers the exact text, specials included") {
    val texts = Seq(
      "plain words only here",
      "a < b && b > c \"quoted\" & ampersand",
      "x" * 553,                       // max corpus length, many chunks
      "short",                         // single sub-anchor-width chunk
      ("word " * 40).trim)             // chunk boundaries mid-word
    texts.zipWithIndex.foreach { case (t, i) =>
      val e = HtmlExtract.extract(HtmlExtract.encodePage(i.toLong, t))
      assert(e.ok, s"page $i not ok")
      assert(e.body == t, s"roundtrip mismatch for text $i")
      assert(e.nDroppedDensity == 1, "menu div must fall to the density rule")
      assert(e.nPars == (t.length + 79) / 80)
    }
  }

  test("census arithmetic matches the oracle formulas") {
    val rnd = new Random(7)
    (0 until 200).foreach { i =>
      val len = 1 + rnd.nextInt(600)
      val t = Seq.fill(len)(('a' + rnd.nextInt(26)).toChar).mkString
      val id = rnd.nextInt(1000).toLong
      val e = HtmlExtract.extract(HtmlExtract.encodePage(id, t))
      val p = (len + 79) / 80
      val lastLen = len - 80 * (p - 1)
      val inline = (if (p >= 2) (p - 2) / 3 + 1 else 0) +
        (if ((p - 1) % 3 == 0 && lastLen >= 11) 1 else 0)
      val m = 2 + (id % 4).toInt
      assert(e.nTags == 12 + m + p + inline, s"tags len=$len id=$id")
      assert(e.nLinks == 4 + m + inline, s"links len=$len id=$id")
      assert(e.nPars == p)
      assert(e.body == t)
    }
  }

  test("link density is measured, not assumed: mixed blocks keep/drop") {
    // 10 text chars, 30 link chars -> density .75: dropped
    val dropped = "<html><body><div>textchars!<a>" + ("l" * 30) +
      "</a></div></body></html>"
    val e1 = HtmlExtract.extract(dropped)
    assert(e1.nDroppedDensity == 1 && e1.body.isEmpty)
    // 30 text chars, 10 link chars -> density .25: kept, anchor text in body
    val kept = "<html><body><div>" + ("t" * 30) + "<a>" + ("l" * 10) +
      "</a></div></body></html>"
    val e2 = HtmlExtract.extract(kept)
    assert(e2.nDroppedDensity == 0 && e2.body == "t" * 30 + "l" * 10)
  }

  test("truncated page certifies nothing") {
    val page = HtmlExtract.encodePage(1L, "some words to extract here")
    val e = HtmlExtract.extract(page.substring(0, page.length / 2))
    assert(!e.ok && e.body.isEmpty)
  }

  test("entity decoding: numeric, named, and unknown-literal") {
    val html = "<html><body><p>&#65;&amp;&xyz;&lt;end</p></body></html>"
    val e = HtmlExtract.extract(html)
    assert(e.ok)
    assert(e.body == "A&&xyz;<end")
  }

  test("supplementary-plane numeric entities decode as full code points") {
    val e = HtmlExtract.extract(
      "<html><body><p>&#128512;x&#99999999;</p></body></html>")
    assert(e.ok)
    // U+1F600 as a surrogate pair; out-of-range entity stays literal
    assert(e.body == new String(Character.toChars(128512)) + "x&#99999999;")
  }

  test("never throws on mangled markup (fuzz)") {
    val rnd = new Random(11)
    val base = HtmlExtract.encodePage(3L, "fuzz target text with words")
    (0 until 500).foreach { _ =>
      val mode = rnd.nextInt(4)
      val s = mode match {
        case 0 => base.substring(0, rnd.nextInt(base.length))
        case 1 => base.updated(rnd.nextInt(base.length),
          "<>&/\"x".charAt(rnd.nextInt(6)))
        case 2 => Seq.fill(rnd.nextInt(80))(
          "<a><p></<>&#;&&amp;text/".charAt(rnd.nextInt(24))).mkString
        case _ => base.take(rnd.nextInt(base.length)) + "<p><div>" +
          base.drop(rnd.nextInt(base.length))
      }
      HtmlExtract.extract(s) // must not throw; census values are best-effort
    }
  }
}
