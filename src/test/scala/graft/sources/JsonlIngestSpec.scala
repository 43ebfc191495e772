package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** JSONL round-trip must preserve every row byte-exactly (including
  * quotes/unicode/escapes in text), quarantine malformed lines with
  * the raw line kept for forensics, and quarantine type-mismatched
  * rows — never drop, never fail. */
class JsonlIngestSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    (1L, "plain text", "en", 10L),
    (2L, "quotes \" and \\ backslash", "de", 24L),
    (3L, "unicode: héllo wörld — π ≈ 3", "fr", 28L),
    (4L, "", "es", 0L),
    (5L, "newline-ish \\n literal", "en", 22L))

  test("round-trip preserves rows; malformed and mistyped lines quarantine") {
    val df = rows.toDF("doc_id", "text", "lang", "n_chars")
    val out = Files.createTempDirectory("jsonl_spec").toString
    JsonlIngest.writeJsonlWithNoise(df, out, Seq(
      """{"doc_id": 99, "text": unquoted""", // malformed JSON
      """not json at all""",
      """{"doc_id": "NaN-ish", "text": "typed wrong", "lang": "en", "n_chars": "x"}"""))
    // materialize before slicing by the corrupt column — Spark refuses
    // a raw-JSON scan whose only referenced column is the corrupt
    // record (see readPermissive's scaladoc; audit() does this itself)
    val back = JsonlIngest.readPermissive(spark, out, df.schema)
      .localCheckpoint()

    val ok = back.filter(col(JsonlIngest.CorruptCol).isNull)
      .select("doc_id", "text", "lang", "n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSet
    assert(ok == rows.toSet)

    val bad = back.filter(col(JsonlIngest.CorruptCol).isNotNull)
      .select(JsonlIngest.CorruptCol)
      .collect().map(_.getString(0)).toSet
    assert(bad.size == 3)
    assert(bad.exists(_.contains("unquoted")), "raw malformed line kept")
    assert(bad.exists(_.contains("typed wrong")), "type-mismatch quarantined")

    val audit = JsonlIngest.audit(back, "lang", "n_chars")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(audit("__corrupt__") == ((3L, 0L)))
    assert(audit("en") == ((2L, 32L)))
  }

  test("a schema already carrying the corrupt column fails loudly") {
    val df = rows.toDF("doc_id", "text", "lang", "n_chars")
      .withColumn(JsonlIngest.CorruptCol, lit("x"))
    intercept[IllegalArgumentException] {
      JsonlIngest.readPermissive(spark, "/tmp/unused", df.schema)
    }
  }
}
