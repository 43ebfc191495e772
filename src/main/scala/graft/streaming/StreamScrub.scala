package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.SetProbe
import graft.operators.{Scrub, TextAnalysis}

/** Streaming scrub stage: PII redaction + exact eval-set
  * decontamination applied to documents AS THEY ARRIVE — the streaming
  * form of [[Scrub.redactPii]] + [[Scrub.decontaminate]]-and-drop.
  *
  * Shape: both steps are row-local expressions, so the operator runs in
  * append mode with NO state store, no watermark, and no stream-side
  * shuffle — the [[StreamSemanticDedup]] discipline (static reference
  * data rides the plan; the stream only ever maps). The eval corpus
  * collapses to its distinct shingle hashes ONCE at plan build
  * ([[evalShingleHashes]], loudly bounded — the
  * `Scrub.decontaminate` broadcast contract), sorts, and ships inside a
  * codegen'd exact binary-search probe
  * ([[graft.functions.SortedLongSetContains]]): a document drops iff
  * ANY of its n-token shingle hashes is in the eval set — byte-for-byte
  * the batch operator's hit condition. A Bloom sketch would be smaller
  * but its false positives would silently drop CLEAN documents here
  * (nothing downstream re-checks, unlike the q68 prefilter+join), so
  * exactness is the right trade at eval-suite sizes.
  *
  * Batch equivalence holds by construction — the same expressions run
  * in either mode — and is pinned by `StreamScrubSpec`.
  */
object StreamScrub {

  /** Distinct xxhash64 shingle hashes of the eval corpus, verified
    * against `maxEvalShingles` BEFORE collecting (fail loudly, never
    * OOM the driver). */
  def evalShingleHashes(eval: DataFrame, textCol: String, n: Int = 5,
                        maxEvalShingles: Long = 1L << 22): Array[Long] = {
    // localCheckpoint: the guard count() and the collect() below are
    // two actions over the same tokenize→explode→distinct subtree —
    // without materialization the eval-corpus pipeline runs twice (the
    // Scrub.decontaminate convention, applied here too).
    val sh = eval
      .withColumn("__tk", TextAnalysis.tokens(col(textCol)))
      .select(explode(TextAnalysis.shinglesOfTokens(col("__tk"), n)).as("__s"))
      .select(xxhash64(col("__s")).as("sg"))
      .distinct()
      .localCheckpoint()
    val nSh = sh.count()
    require(nSh <= maxEvalShingles,
      s"StreamScrub: eval shingle set has $nSh distinct shingles, over the " +
        s"maxEvalShingles=$maxEvalShingles bound — batch the eval suite")
    sh.collect().map(_.getLong(0))
  }

  /** Scrub a (possibly streaming) document frame: drop rows sharing any
    * n-token shingle with the eval set, then redact PII in `textCol`.
    * Decontamination tests the RAW text (a PII placeholder must not
    * break an otherwise-verbatim eval overlap — same order as the batch
    * pipeline: decontaminate, then redact). */
  def scrub(docs: DataFrame, evalHashes: Array[Long], textCol: String,
            n: Int = 5): DataFrame = {
    // MATERIALIZE the token array before the shingle lambdas reference
    // it (the shinglesOfTokens contract): inlining tokens() here would
    // re-split the document inside every element_at of every window —
    // the O(windows x n x tokens) generator-token pathology
    val contaminated = exists(
      transform(TextAnalysis.shinglesOfTokens(col("__tk"), n),
        s => xxhash64(s)),
      h => SetProbe.containsLong(h, evalHashes))
    docs.withColumn("__tk", TextAnalysis.tokens(col(textCol)))
      // null text → null token array → null predicate; coalesce keeps
      // the row, matching the batch operator (explode of null emits no
      // shingles → no hits → doc kept)
      .filter(!coalesce(contaminated, lit(false)))
      .drop("__tk")
      .withColumn(textCol, Scrub.redactPii(col(textCol)))
  }
}
