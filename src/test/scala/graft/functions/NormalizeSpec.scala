package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def norm(s: String, form: String): String =
    Seq(Tuple1(s)).toDF("t")
      .select(Normalize.normalize(col("t"), form))
      .collect()(0).getString(0)

  test("NFC composes, NFD decomposes, NFKC folds compatibility forms") {
    val decomposed = "e\u0301clair"          // e + combining acute
    val composed = "\u00e9clair"        // precomposed e-acute
    assert(norm(decomposed, "NFC") == composed)
    assert(norm(composed, "NFD") == decomposed)
    // ligature ﬁ and fullwidth Ａ are compatibility forms: NFC keeps
    // them, NFKC folds them to ASCII
    assert(norm("ﬁle Ａ", "NFC") == "ﬁle Ａ")
    assert(norm("ﬁle Ａ", "NFKC") == "file A")
  }

  test("ASCII fast path returns the value unchanged; nulls stay null") {
    val df = Seq(Tuple1("plain ascii"), Tuple1(null.asInstanceOf[String]))
      .toDF("t")
      .select(Normalize.normalize(col("t")).as("n"))
    assert(df.collect().map(r => Option(r.getString(0))).toSeq ==
      Seq(Some("plain ascii"), None))
  }

  test("the documented dedup order: normalize-then-hash unifies mixed encodings") {
    // the same visible text in two encodings hashes apart raw, together
    // after NFC — the under-dedup failure mode the expression closes
    val df = Seq((1L, "caf\u00e9 au lait"), (2L, "cafe\u0301 au lait"))
      .toDF("id", "text")
      .select(
        md5(col("text")).as("raw_h"),
        md5(Normalize.normalize(col("text"), "NFC")).as("norm_h"))
      .collect()
    assert(df(0).getString(0) != df(1).getString(0))
    assert(df(0).getString(1) == df(1).getString(1))
  }

  test("an unknown form fails analysis loudly") {
    val e = intercept[Exception] {
      Seq(Tuple1("x")).toDF("t")
        .select(Normalize.normalize(col("t"), "NFX")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("nfc"))
  }
}
