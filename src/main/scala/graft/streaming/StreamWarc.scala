package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.WarcFiles

/** Streaming crawl ingest — the reference's defining capability is a
  * SOURCE that continuously ingests a real external format
  * (/root/reference/src/dnstap/dnstap.go:90-248, the unix-socket
  * framestream listener); the web-crawl analogue watches a landing
  * directory for new `.warc` / `.warc.gz` files and audits each one
  * exactly like the batch reader — the decode map is SHARED
  * ([[WarcFiles.auditColumns]]), so stream == batch by construction
  * (StreamWarcSpec pins it across multi-batch arrival).
  *
  * Scale shape: Structured Streaming's file source gives exactly-once
  * per file via its own source log (a crashed batch re-lists, already-
  * committed files never reprocess); one file = one task (gzip members
  * are not splittable), the same grain as batch; the walk and gunzip
  * are partition-local, so a micro-batch of N landed files is N
  * independent tasks and nothing corpus-sized ever shuffles. Corrupt
  * files COUNT as `warc_corrupt` rows — never thrown, never dropped —
  * the quarantine discipline a continuously-fed pipeline cannot live
  * without (a single bad archive must not kill the stream).
  */
object StreamWarc {

  /** binaryFile's FIXED schema, spelled out because a streaming file
    * source demands an explicit schema up front (no inference pass —
    * the files don't exist yet). */
  private val binaryFileSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("path",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("modificationTime",
      org.apache.spark.sql.types.TimestampType),
    org.apache.spark.sql.types.StructField("length",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("content",
      org.apache.spark.sql.types.BinaryType)))

  private def binSource(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.format("binaryFile")
      .schema(binaryFileSchema)
      .option("pathGlobFilter", "*.warc*")
      .load(dir)

  private def maxLen(spark: SparkSession): Long =
    spark.conf.get("spark.sql.sources.binaryFile.maxLength",
      Int.MaxValue.toString).toLong

  /** Per-file audit rows as an APPEND stream over a landing directory.
    * Stateless (a narrow map over the file source) — no watermark, no
    * state store; the bounded quantity is the source log, which grows
    * with files listed, the documented file-source contract.
    * `serveOversize = true` (r18) routes past-ceiling landed files
    * through the SAME bounded stream walk as the batch reader
    * ([[WarcFiles.streamedAuditColumns]] — a narrow map over the path
    * listing, still stateless), so stream == batch by construction on
    * the oversized lane too. */
  def audit(spark: SparkSession, dir: String,
            serveOversize: Boolean = false): DataFrame = {
    val bin = binSource(spark, dir)
    if (!serveOversize) WarcFiles.auditColumns(bin)
    else {
      val ml = maxLen(spark)
      WarcFiles.auditColumns(
          bin.filter(org.apache.spark.sql.functions.col("length") <= ml))
        .unionByName(WarcFiles.streamedAuditColumns(bin
          .filter(org.apache.spark.sql.functions.col("length") > ml)
          .select(org.apache.spark.sql.functions.col("path"))))
    }
  }

  /** Per-response-record EXTRACTION rows as an APPEND stream — the
    * serving leg ([[audit]] is the ops ledger): each landed file's
    * complete response records with bit-exact payload bytes, through
    * the SAME decode map as the batch reader
    * ([[WarcFiles.recordColumns]] — stream == batch by construction).
    * Same shape guarantees as audit: stateless narrow flatMap,
    * exactly-once per file via the source log, a torn file serves its
    * complete records, an undecodable file serves nothing (its audit
    * row is the observable). */
  def records(spark: SparkSession, dir: String,
              serveOversize: Boolean = false): DataFrame = {
    val bin = binSource(spark, dir)
    if (!serveOversize) WarcFiles.recordColumns(bin)
    else WarcFiles.recordColumns(bin)
      .unionByName(WarcFiles.streamedRecordColumns(bin
        .filter(org.apache.spark.sql.functions.col("length") >
          maxLen(spark))
        .select(org.apache.spark.sql.functions.col("path"))))
  }

  /** Per-record extracted TEXT as an APPEND stream — the corpus-build
    * front end ([[records]] serves bytes; this routes them through
    * [[WarcFiles.dispatchText]]'s Content-Type dispatch, the SAME
    * routing the batch funnel (q259) runs, so stream == batch by
    * construction). Stateless narrow pass: dispatch + extraction are
    * per-record, nothing shuffles, a landed file is one task. Non-text
    * records yield no row (their audit/census rows are the
    * observable); a failed extraction keeps its `ok = false` row. */
  def textRecords(spark: SparkSession, dir: String): DataFrame =
    WarcFiles.dispatchText(records(spark, dir))

  /** Per-REVISIT-record dup edges as an APPEND stream (r19) — the
    * landing-directory feed for the revisit dedup lane (q265): each
    * landed file's revisit markers as (file, uri, refers_to) rows,
    * through the SAME shared map as the batch reader
    * ([[WarcFiles.revisitColumns]] — stream == batch by construction).
    * Stateless narrow flatMap; a crawler's free dup edges reach the
    * funnel the moment their file lands, no hashing anywhere. */
  def revisits(spark: SparkSession, dir: String): DataFrame =
    WarcFiles.revisitColumns(binSource(spark, dir))

  /** Per-record sniffed MEDIA metadata as an APPEND stream — the
    * multimodal sibling of [[textRecords]], routing landed files
    * through [[WarcFiles.dispatchMedia]]'s magic-byte sniff (the SAME
    * routing the batch census (q260) runs, so stream == batch by
    * construction). Stateless narrow pass: sniffing is headers-only
    * and per-record, nothing shuffles; non-media records yield no row,
    * unparseable media keeps its countable `ok = 0` row. */
  def mediaRecords(spark: SparkSession, dir: String): DataFrame =
    WarcFiles.dispatchMedia(records(spark, dir))
}
