package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-scrubbing operators for a training-data pipeline: PII redaction
  * and benchmark decontamination. Like [[TextAnalysis]], everything is
  * built from codegen'd `org.apache.spark.sql.functions` — regex scrub is
  * a per-row map with no shuffle, and decontamination is a broadcast
  * semi-join against the (small) benchmark shingle set, so both scale
  * linearly in corpus size.
  */
object Scrub {

  /** PII patterns, deliberately RE2-compatible (no backreferences or
    * lookaround) so the DuckDB oracle runs the byte-identical regex. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b"
  val PhonePattern = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** Redact emails, IPv4 literals and NANP-style phone numbers with typed
    * placeholder tokens. Email first: the other patterns cannot create new
    * email matches, and `<EMAIL>` contains no digits to confuse them. */
  def redactPii(text: Column): Column = {
    val noEmail = regexp_replace(text, EmailPattern, "<EMAIL>")
    val noIp = regexp_replace(noEmail, Ipv4Pattern, "<IP>")
    regexp_replace(noIp, PhonePattern, "<PHONE>")
  }

  /** Occurrence counts per PII class (on the UNredacted text) — the audit
    * trail a compliance pass wants next to the scrub itself. */
  def piiCounts(text: Column): Seq[(String, Column)] = Seq(
    "n_emails" -> size(regexp_extract_all(text, lit(EmailPattern), lit(0))).cast("long"),
    "n_ipv4" -> size(regexp_extract_all(text, lit(Ipv4Pattern), lit(0))).cast("long"),
    "n_phones" -> size(regexp_extract_all(text, lit(PhonePattern), lit(0))).cast("long"))

  /** Benchmark decontamination: count, per training document, the distinct
    * n-token shingles it shares with an evaluation corpus — documents with
    * hits are contaminated and must be dropped before training (the
    * standard eval-leakage guard).
    *
    * Plan shape at 100 TB: the training side explodes to distinct
    * (doc, shingle) pairs with map-side combine; the eval side — benchmark
    * suites are tiny relative to a training corpus — collapses to distinct
    * shingles and is BROADCAST, so the corpus never shuffles on shingle
    * and the whole operator is scan → explode → broadcast-semi-join →
    * one aggregate on doc id.
    *
    * The broadcast assumption is ENFORCED, not hoped for: a distinct
    * shingle count above `maxEvalShingles` kills the job with a clear
    * message before the broadcast build can OOM an executor (the guard
    * lives inside the broadcast subtree, so the count completes first —
    * same contract as `Similarity.knnBruteForce`). The bound counts
    * shingles, not bytes — size it to shingle width; Spark's broadcast
    * limits remain the hard backstop. An eval suite past the bound
    * should be decontaminated in batches, or pass `maxEvalShingles = 0`
    * to drop the hint entirely and let AQE pick the join (degrades to a
    * shuffle join on shingle past the broadcast threshold — slower,
    * never OOM).
    */
  def decontaminate(train: DataFrame, eval: DataFrame,
                    idCol: String, textCol: String, n: Int = 5,
                    maxEvalShingles: Long = 1L << 22): DataFrame = {
    def shingleSet(df: DataFrame, cols: Column*): DataFrame = df
      .withColumn("__tk", TextAnalysis.tokens(col(textCol)))
      .select(cols :+ explode(TextAnalysis.shinglesOfTokens(col("__tk"), n)).as("sg"): _*)
      .distinct()
    val trainSh = shingleSet(train, col(idCol))
    val evalSh =
      if (maxEvalShingles <= 0) shingleSet(eval)
      else {
        // the guard path has two consumers of the eval shingle pipeline
        // (the count aggregate and the broadcast stream) — materialize it
        // once so tokenize+explode+distinct doesn't run twice (same
        // eager-localCheckpoint trade as the Dedup pair family)
        val evalSh0 = shingleSet(eval).localCheckpoint()
        // the 1-row count stays explicitly broadcast: if Catalyst chose
        // the shingle side as build side, the full eval set would be
        // collected before the assert runs — the window the guard closes
        val nSh = evalSh0.agg(count(lit(1)).as("__n_sg"))
        broadcast(evalSh0.crossJoin(broadcast(nSh))
          .filter(assert_true(col("__n_sg") <= lit(maxEvalShingles),
            lit(s"decontaminate: eval shingle set exceeds maxEvalShingles=" +
              s"$maxEvalShingles; batch the eval suite or pass " +
              "maxEvalShingles=0 to allow a shuffle join")).isNull)
          .drop("__n_sg"))
      }
    trainSh.join(evalSh, "sg")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits")) // (id, sg) distinct ⇒ count = distinct shingles
  }
}
