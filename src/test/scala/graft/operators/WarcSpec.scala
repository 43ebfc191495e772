package graft.operators

import graft.SparkSpec

/** The WARC walk must hop by Content-Length (never separator-scan),
  * keep complete records ahead of a tear, and never throw. The
  * payload-contains-boundary case is the one a naive split corrupts —
  * it gets its own test. */
class WarcSpec extends SparkSpec {

  private val arch = Warc.encodeArchive(7L, "src1", "hello world")

  test("round trip: request + response recovered, body exact") {
    val p = Warc.parse(arch)
    assert(!p.torn)
    assert(p.records.map(_.recType) === List("request", "response"))
    val r = p.records.last
    assert(r.uri === "http://src1/doc/7")
    assert(r.httpStatus === 200)
    assert(r.contentType === "text/plain")
    assert(r.body === "hello world")
  }

  test("payload containing a record boundary does not split the record") {
    // a body that embeds the WARC magic AND a blank-line separator —
    // Content-Length hopping must sail straight over it
    val evil = "x\r\n\r\nWARC/1.0\r\nWARC-Type: request\r\n\r\ny"
    val p = Warc.parse(Warc.encodeArchive(1L, "s", evil))
    assert(!p.torn)
    assert(p.records.length === 2)
    assert(p.records.last.body === evil)
  }

  test("tear inside record 2 keeps record 1; tear inside record 1 keeps " +
    "nothing; garbage and empty input are torn, never thrown") {
    val r1Len = arch.indexOf("WARC/1.0", 1) // start of record 2
    val cutIn2 = Warc.parse(arch.substring(0, r1Len + 30))
    assert(cutIn2.torn && cutIn2.records.map(_.recType) === List("request"))
    val cutIn1 = Warc.parse(arch.substring(0, 20))
    assert(cutIn1.torn && cutIn1.records.isEmpty)
    assert(Warc.parse("").records.isEmpty && !Warc.parse("").torn)
    assert(Warc.parse("HTTP/1.1 200 OK\r\n\r\n").torn)
    // missing Content-Length header
    assert(Warc.parse("WARC/1.0\r\nWARC-Type: request\r\n\r\nxx\r\n\r\n").torn)
    // adversarial NEGATIVE Content-Length: payloadEnd lands before
    // payloadStart on the header's own separator — must report torn,
    // not throw StringIndexOutOfBounds
    val neg = Warc.parse("WARC/1.0\r\nWARC-Type: request\r\n" +
      "WARC-Target-URI: u\r\nContent-Length: -4\r\n\r\n")
    assert(neg.torn && neg.records.isEmpty)
    // near-Long.MaxValue Content-Length: payloadStart + len overflows
    // Long and the wrapped offset can land exactly on the header's own
    // separator — must report torn, never throw
    val huge = Warc.parse("WARC/1.0\r\nWARC-Type: request\r\n" +
      "WARC-Target-URI: u\r\nContent-Length: 9223372036854775804\r\n\r\n")
    assert(huge.torn && huge.records.isEmpty)
  }

  test("fuzz certificate: random archives round-trip exactly; EVERY cut " +
    "position of an archive parses without throwing, keeps exactly the " +
    "complete-record prefix, and never invents a record") {
    val rnd = new scala.util.Random(0x4a7cL)
    def randText(): String = {
      val words = Seq("alpha", "beta", "x", "WARC/1.0", "\r\n\r\n", "12",
        "Content-Length:", "")
      (0 until rnd.nextInt(8)).map(_ => words(rnd.nextInt(words.length)))
        .mkString(" ")
    }
    (0 until 40).foreach { i =>
      val (id, src, text) = (rnd.nextLong(1L << 40), s"s$i", randText())
      val arch = Warc.encodeArchive(id, src, text)
      val p = Warc.parse(arch)
      assert(!p.torn && p.records.length === 2, s"case $i")
      assert(p.records.last.body === text, s"case $i body")
    }
    // exhaustive cut sweep over one archive: the walk must never throw,
    // and the kept records are exactly those whose full extent
    // (including the trailing separator) survived the cut
    val arch = Warc.encodeArchive(7L, "src", "some body text here")
    val r1End = arch.indexOf("WARC/1.0", 1)
    (0 to arch.length).foreach { cut =>
      val p = Warc.parse(arch.substring(0, cut))
      val expect = if (cut >= arch.length) 2 else if (cut >= r1End) 1 else 0
      assert(p.records.length === expect, s"cut=$cut")
      // a tear means a RECORD was interrupted: cuts at record
      // boundaries — 0 (empty archive), r1End (a complete one-record
      // archive), arch.length (untouched) — parse cleanly; every other
      // cut lands mid-record and must report torn
      val boundary = cut == 0 || cut == r1End || cut == arch.length
      assert(p.torn === !boundary, s"cut=$cut torn")
    }
  }

  test("distributed parse certifies md5(body) == md5(text) and the " +
    "arithmetic archive length") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha", "some text body"),
      (22L, "beta", "another, longer text body with more characters"))
      .toDF("doc_id", "source", "text")
    val got = Warc.parseColumns(Warc.attachArchives(docs))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    docs.collect().foreach { d =>
      val (id, src, text) = (d.getLong(0), d.getString(1), d.getString(2))
      val row = got(id)
      assert(row.getAs[Boolean]("warc_ok"))
      assert(row.getAs[Int]("n_records") === 2)
      assert(row.getAs[String]("body") === text)
      // replay the oracle's census arithmetic in memory
      val dd = id.toString.length; val s = src.length; val t = text.length
      val cl1 = 30 + dd + s
      val cl2 = 63 + t.toString.length + t
      val wl = 264 + 3 * s + 3 * dd + cl1.toString.length +
        cl2.toString.length + t.toString.length + t
      assert(row.getAs[Int]("warc_len") === wl)
    }
  }

  test("crawl composition: an HtmlExtract page archived as text/html " +
    "round-trips to the ORIGINAL text through both container layers") {
    import spark.implicits._
    val docs = Seq((3L, "s0", "the quick brown fox " * 9),
        (14L, "s1", "tiny"))
      .toDF("doc_id", "source", "text")
    val parsed = Warc.parseColumns(Warc.attachHtmlArchives(docs))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    docs.collect().foreach { d =>
      val (id, text) = (d.getLong(0), d.getString(2))
      val row = parsed(id)
      assert(row.getAs[Boolean]("warc_ok"))
      assert(row.getAs[String]("content_type") === "text/html")
      val page = row.getAs[String]("body")
      assert(page.startsWith("<html>") && page.endsWith("</html>"))
      val e = HtmlExtract.extract(page)
      assert(e.ok && e.body === text, s"doc $id")
    }
  }

  test("half-cut audit law: response never survives, request survives " +
    "iff the cut clears record 1") {
    import spark.implicits._
    val docs = Seq(
      (53L, "s", "short"),
      (106L, "s", "a much longer body so the half cut lands well inside " +
        "the response record and record one survives intact"))
      .toDF("doc_id", "source", "text")
    val stats = Warc.parseColumns(Warc.attachArchives(docs, truncateEvery = 53))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    docs.collect().foreach { d =>
      val (id, src, text) = (d.getLong(0), d.getString(1), d.getString(2))
      val full = Warc.encodeArchive(id, src, text)
      val r1 = full.indexOf("WARC/1.0", 1)
      val expectKept = if (full.length / 2 >= r1) 1 else 0
      val row = stats(id)
      assert(!row.getAs[Boolean]("warc_ok"))
      assert(row.getAs[Int]("n_records") === expectKept)
      assert(row.getAs[String]("body") === "")
    }
  }
}
