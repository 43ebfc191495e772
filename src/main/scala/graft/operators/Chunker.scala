package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Content-defined chunking — the dedup primitive for BLOB-shaped data
  * (LBFS/rsync lineage): chunk boundaries come from a rolling content
  * fingerprint, not fixed offsets, so an insertion early in a document
  * shifts ONE chunk instead of re-aligning every fixed-size block —
  * which is why two near-identical crawls share almost all their
  * chunks and a content-addressed store dedups them.
  *
  * The fingerprint is windowed (last W=8 codepoints, 31-weighted sum),
  * so h_i is a pure function of positions i−7..i — positionally
  * independent, which is what lets BOTH engines state it per position
  * with no sequential recurrence: boundaries are "mask hits"
  * (h_i ≡ 0 mod 16, avg chunk 16 chars), chunks are the spans between
  * hits. Min/max-length clamps (which would make boundary i depend on
  * boundary i−1, a sequential chain) are deliberately absent — the
  * positional form is the replayable one, and the expected-length mask
  * does the bounding statistically.
  *
  * Scale: narrow codegen'd projections per document (no UDF, no
  * shuffle — text never moves); only 60-bit chunk hashes reach the
  * corpus-level census aggregation, which is map-side combined.
  * IMPORTANT shape constraint (the q66/q72 inlined-generator lesson
  * applied to higher-order functions): a lambda that reads a sibling
  * ARRAY EXPRESSION re-evaluates it per element, and CollapseProject
  * re-inlines any single-referenced projection — so per-position
  * work is computed INSIDE the consuming lambda (O(len·W) total),
  * and the boundary list, which three span expressions consume, is
  * a multiply-referenced projection CollapseProject leaves alone.
  */
object Chunker {

  val Window = 8
  val MaskMod = 16

  /** One document's chunk spans as (start, len, hash60) — the tight
    * partition-local loop ([[chunks]]' kernel): O(len·W) integer
    * arithmetic over UTF-16 code units, hash = the portable 60-bit
    * md5 lane (first 15 hex digits of the chunk's UTF-8 md5, exactly
    * `conv(substring(md5(x), 1, 15), 16, 10)`). */
  private[operators] def chunkRow(text: String): Seq[(Int, Int, Long)] = {
    val n = text.length
    val md = java.security.MessageDigest.getInstance("MD5")
    def hash60(bytes: Array[Byte]): Long = {
      md.reset()
      val dig = md.digest(bytes)
      var hv = 0L
      var b = 0
      while (b < 8) { hv = (hv << 8) | (dig(b) & 0xffL); b += 1 }
      hv >>> 4
    }
    if (n == 0) {
      // split("") yields one empty element in BOTH engines, so the
      // declarative form and the oracle emit exactly one (1, 1)
      // empty-hash chunk for an empty document — the kernel must too
      // (certificate-pinned, including the empty row)
      return Seq((1, 1, hash60(Array.emptyByteArray)))
    }
    val out = Seq.newBuilder[(Int, Int, Long)]
    var start = 1
    var i = 1
    while (i <= n) {
      var h = 0L
      var j = 0
      while (j < Window && i - j >= 1) {
        h += text.charAt(i - j - 1).toLong * powsArr(j)
        j += 1
      }
      if ((h % MaskMod == 0 && i != n) || i == n) {
        val chunk = text.substring(start - 1, i)
        // first 15 hex chars == top 60 bits of the first 8 digest bytes
        out += ((start, i - start + 1,
          hash60(chunk.getBytes(java.nio.charset.StandardCharsets.UTF_8))))
        start = i + 1
      }
      i += 1
    }
    out.result()
  }

  private val powsArr: Array[Long] =
    (0 until Window).map(j => math.pow(31.0, j).toLong).toArray

  /** Per-document chunk rows: (doc_id, start, len, chunk_hash) — the
    * content-addressed manifest a blob store dedups on. 1-based
    * starts; chunks tile the text exactly.
    *
    * Runs as ONE partition-local map in plain Scala (the
    * MediaCodec/PdfExtract byte-codec lane): the per-character rolling
    * hash in declarative higher-order functions evaluates lambdas
    * INTERPRETED, outside whole-stage codegen — measured 6 s at sf0.1
    * vs sub-second for this loop. Text never shuffles either way;
    * only (doc_id, start, len, hash) rows leave the map. */
  def chunks(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions(_.flatMap { case (id, text) =>
        chunkRow(if (text == null) "" else text).map { case (s, l, h) =>
          (id, s.toLong, l.toLong, h)
        }
      })
      .toDF("doc_id", "start", "len", "chunk_hash")
  }

  /** The declarative (column-expression) form of [[chunks]] — kept as
    * the cross-implementation certificate: ChunkerSpec pins it equal
    * to the Scala kernel row-for-row (empty text included), so the
    * loop can never drift from the replayable positional definition
    * the oracle states. Certificate scope is BMP text: for
    * astral-plane input this form sees UTF8String's lone-surrogate
    * mangling ('?') where the kernel hashes the raw code units — the
    * KERNEL is authoritative there (deterministic, documented; the
    * oracle lane is BMP either way). */
  private[operators] def chunksDeclarative(docs: DataFrame, idCol: String,
                                           textCol: String): DataFrame = {
    val pows = (0 until Window).map(j => math.pow(31.0, j).toLong)
    // coalesce null text to '' so the certificate's domain matches the
    // kernel (which maps null -> "" and emits the one-empty-chunk row);
    // split(null) would otherwise drop null-text docs from this form
    val s1 = docs.select(col(idCol).as("doc_id"),
      split(coalesce(col(textCol), lit("")), "").as("__cs"))
    // h(i) = sum_{j=0..min(7,i-1)} ord(c_{i-j}) * 31^j, computed
    // DIRECTLY inside the boundary filter — each position evaluates
    // its own O(W) hash exactly once. (An intermediate hash-array
    // column is a trap here: referenced once downstream,
    // CollapseProject inlines the whole array expression into the
    // consumer's lambda and every element re-builds it — O(len²·W),
    // measured 8 s at sf0.1 vs ~1 s for this form.)
    def hashAt(i: org.apache.spark.sql.Column) =
      (0 until Window).map(j =>
        when(i - j >= 1,
          ascii(element_at(col("__cs"), i - j)) * lit(pows(j)))
          .otherwise(lit(0L)))
        .reduce(_ + _)
    // mask hits (except the final position) + the final position
    val s3 = s1.select(col("doc_id"), col("__cs"),
      when(size(col("__cs")) > 0, concat(
        filter(sequence(lit(1), size(col("__cs"))),
          i => hashAt(i) % MaskMod === 0 && i =!= size(col("__cs"))),
        array(size(col("__cs")))))
        .otherwise(array().cast("array<int>")).as("__bd"))
    // chunk text is re-assembled from the SAME split array the
    // boundaries were computed over (array_join of the span slice),
    // never substring over the original string — Spark's split works
    // in UTF-16 code units while substring counts code points, and
    // mixing the two index spaces corrupts chunks on astral-plane
    // input. In one space the tiling invariant (chunks concat back to
    // the split array) holds for ALL input; cross-engine hash parity
    // is certified for BMP text (code units == code points there, and
    // DuckDB's per-character split agrees), astral chunking stays
    // deterministic per engine.
    val s4 = s3.select(col("doc_id"), col("__cs"),
      explode(transform(sequence(lit(1), size(col("__bd"))), k =>
        struct(
          when(k === 1, lit(1)).otherwise(element_at(col("__bd"), k - 1) + 1)
            .as("start"),
          element_at(col("__bd"), k).as("end")))).as("__c"))
    s4.select(col("doc_id"),
      col("__c.start").cast("long").as("start"),
      (col("__c.end") - col("__c.start") + 1).cast("long").as("len"),
      Dedup.baseHash60(array_join(
        slice(col("__cs"), col("__c.start"),
          col("__c.end") - col("__c.start") + 1), ""))
        .as("chunk_hash"))
  }

  /** Corpus chunk-dedup card: per doc, how many chunks it has and how
    * many are SHARED (their hash occurs in ≥ 2 documents) — the
    * measured storage win of content addressing. */
  def dedupCard(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ch = chunks(docs, idCol, textCol)
    val census = ch.groupBy(col("chunk_hash"))
      .agg(countDistinct(col("doc_id")).as("__docs"))
    ch.join(census, Seq("chunk_hash"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("__docs") >= 2, 1L).otherwise(0L)).as("n_shared"),
        sum(col("len")).as("n_bytes"))
  }
}
