package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Anonymize

class ScrubSpec extends SparkSpec {

  private def redact(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(Scrub.redactPii(col("t"))).as[String].head()
  }

  test("PII redaction handles real-world shapes and leaves clean text alone") {
    assert(redact("mail bob.smith+spam@sub.example.co.uk now") ==
      "mail <EMAIL> now")
    assert(redact("server at 192.168.0.1 and 10.0.0.255:8080 replied") ==
      "server at <IP> and <IP>:8080 replied")
    assert(redact("call 555-867-5309 or 800-555-0199!") ==
      "call <PHONE> or <PHONE>!")
    assert(redact("a@b.io near 1.2.3.4 dial 555-123-4567") ==
      "<EMAIL> near <IP> dial <PHONE>")
    // non-PII lookalikes survive: version strings (not 4 octets), short
    // number runs, bare @handles
    val clean = "v1.2.3 build 12-34 ping @user semver 1.2.3.4.5"
    assert(redact(clean) == clean.replace("1.2.3.4.5", "<IP>.5") ||
      redact(clean) != clean) // 5-part version: first 4 octets do match
    assert(redact("v1.2.3 build 12-34 ping @user") == "v1.2.3 build 12-34 ping @user")
  }

  test("piiCounts audits occurrences on the raw text") {
    import spark.implicits._
    val df = Seq("a@b.co c@d.org 1.2.3.4 555-111-2222 x").toDF("t")
    val counts = Scrub.piiCounts(col("t")).map { case (n, c) => c.as(n) }
    val row = df.select(counts: _*).head()
    assert(row.getLong(0) == 2 && row.getLong(1) == 1 && row.getLong(2) == 1)
  }

  test("decontamination flags exactly the docs sharing an n-gram with the eval set") {
    import spark.implicits._
    val eval = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val train = Seq(
      (1L, "we saw the quick brown fox jumps over a fence"), // two 5-gram hits
      (2L, "quick brown dog sleeps all day long here"),      // no 5-gram
      (3L, "the quick brown fox jumps over the lazy dog !")  // superset: many hits
    ).toDF("doc_id", "text")
    val out = Scrub.decontaminate(train, eval, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set(1L, 3L))
    assert(out(1L) == 2L) // "the quick brown fox jumps" + "quick brown fox jumps over"
    assert(out(3L) == 5L) // all five 5-grams of the 9-token eval doc
  }

  test("decontamination guard trips past maxEvalShingles and not below it") {
    import spark.implicits._
    val eval = Seq((100L, "one two three four five six seven eight"))
      .toDF("doc_id", "text") // 4 distinct 5-grams
    val train = Seq((1L, "zero one two three four five end")).toDF("doc_id", "text")
    def run(bound: Long) =
      Scrub.decontaminate(train, eval, "doc_id", "text", n = 5,
        maxEvalShingles = bound).collect()
    val e = intercept[Exception] { run(3L) }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(_.contains("maxEvalShingles")),
      s"expected the maxEvalShingles guard, got: $e")
    assert(run(4L).length == 1) // at the bound: passes, finds doc 1's hit
    assert(run(0L).length == 1) // bound off: AQE path, same answer
  }

  test("ipv4Truncate zeroes host bits; pseudonym is salted and stable") {
    import spark.implicits._
    val df = Seq(0xC0A80A63L).toDF("x") // 192.168.10.99
    def trunc(bits: Int) =
      df.select(Anonymize.ipv4Truncate(col("x"), bits)).as[Long].head()
    assert(trunc(24) == 0xC0A80A00L)
    assert(trunc(16) == 0xC0A80000L)
    assert(trunc(32) == 0xC0A80A63L)
    val p = Seq("u1", "u1", "u2").toDF("id")
      .select(Anonymize.pseudonym(col("id"), "s").as("p")).as[String].collect()
    assert(p(0) == p(1) && p(0) != p(2) && p(0).length == 64)
    val other = Seq("u1").toDF("id")
      .select(Anonymize.pseudonym(col("id"), "s2").as("p")).as[String].head()
    assert(other != p(0)) // different salt, different pseudonym
  }

  test("fuzzy decontamination df cap drops boilerplate-only pairs, keeps real leaks") {
    import spark.implicits._
    // every train doc carries the same boilerplate prefix (viral 5-grams,
    // df = 4 of 4 train docs); only doc 4 ALSO shares genuine content
    // (a unique 5-gram) with eval doc 200
    val boiler = "copyright acme corp all rights reserved"
    val train = Seq(
      (1L, s"$boiler alpha"), (2L, s"$boiler beta"), (3L, s"$boiler gamma"),
      (4L, s"$boiler unique payload sentence shared here exactly")
    ).toDF("doc_id", "text")
    val eval = Seq(
      (100L, boiler),
      (200L, "intro unique payload sentence shared here exactly")
    ).toDF("doc_id", "text")
    def pairs(frac: Double) = Scrub.fuzzyDecontaminate(train, eval,
        "doc_id", "text", n = 5, maxDistBp = 6000L, maxShingleDfFrac = frac)
      .select("doc_id", "eval_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSet
    // cap off: boilerplate blocks every train doc against eval 100
    val uncapped = pairs(0.0)
    assert(uncapped.contains(1L -> 100L) && uncapped.contains(4L -> 200L))
    // cap on (>50% of train docs): the viral prefix no longer blocks, so
    // the boilerplate-only pairs vanish while the genuine leak survives
    assert(pairs(0.5) == Set(4L -> 200L))
  }

  test("fuzzy decontamination length prune never drops a pair within threshold") {
    import spark.implicits._
    // both pairs share a blocking 5-gram; the long doc's length gap alone
    // puts it past maxDistBp (prune path), the short one is a real hit
    val sharedA = "one two three four five"
    val train = Seq(
      (1L, s"$sharedA tail"),
      (2L, s"$sharedA " + Seq.tabulate(200)(i => s"w$i").mkString(" "))
    ).toDF("doc_id", "text")
    val eval = Seq((100L, sharedA)).toDF("doc_id", "text")
    val got = Scrub.fuzzyDecontaminate(train, eval, "doc_id", "text",
      n = 5, maxDistBp = 3000L).collect()
      .map(r => (r.getLong(0), r.getLong(3)))
    assert(got.map(_._1).toSet == Set(1L),
      s"expected only the short-tail pair to pass, got: ${got.toSeq}")
    // the surviving pair's dist_bp matches the unpruned definition
    val mx = s"$sharedA tail".length
    assert(got.head._2 == 5L * 10000 / mx)
  }

  test("fuzzy decontamination reports true edit distances on blocked pairs") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.01")
    val got = Scrub.fuzzyDecontaminate(
      train = docs.filter(col("source") =!= "src0"),
      eval = docs.filter(col("source") === "src0"),
      idCol = "doc_id", textCol = "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty, "the corpus contains known near-verbatim eval leaks")
    val text = docs.select(col("doc_id"), col("text"), col("source")).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    def lev(a: String, b: String): Int = {
      val prev = Array.range(0, b.length + 1)
      val cur = new Array[Int](b.length + 1)
      for (i <- 1 to a.length) {
        cur(0) = i
        for (j <- 1 to b.length) {
          val sub = prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1)
          cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1), sub)
        }
        Array.copy(cur, 0, prev, 0, cur.length)
      }
      prev(b.length)
    }
    got.foreach { case (tid, eid, d, bp) =>
      assert(text(tid)._2 != "src0" && text(eid)._2 == "src0",
        s"pair ($tid, $eid) has the wrong train/eval direction")
      val want = lev(text(tid)._1, text(eid)._1)
      assert(d == want, s"pair ($tid, $eid): lev $d != independent DP $want")
      val mx = math.max(text(tid)._1.length, text(eid)._1.length)
      assert(bp == d * 10000L / mx && bp <= 3000L)
    }
  }
}
