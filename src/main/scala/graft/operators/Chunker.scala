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
  * IMPORTANT shape constraint: each intermediate array (chars, hash
  * series, boundary list) is projected as its OWN column, one stage
  * per step — a lambda referencing a sibling array EXPRESSION
  * re-evaluates it per element (O(len³) measured before the split;
  * the q66/q72 inlined-generator lesson applied to higher-order
  * functions), and CollapseProject keeps multiply-referenced
  * non-cheap projections apart.
  */
object Chunker {

  val Window = 8
  val MaskMod = 16

  /** Per-document chunk rows: (doc_id, start, len, chunk_hash) — the
    * content-addressed manifest a blob store dedups on. 1-based
    * starts; chunks tile the text exactly. */
  def chunks(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val pows = (0 until Window).map(j => math.pow(31.0, j).toLong)
    val s1 = docs.select(col(idCol).as("doc_id"),
      split(col(textCol), "").as("__cs"))
    // h(i) = sum_{j=0..min(7,i-1)} ord(c_{i-j}) * 31^j, one pass
    val s2 = s1.select(col("doc_id"), col("__cs"), size(col("__cs")).as("__n"),
      transform(sequence(lit(1), size(col("__cs"))), i =>
        (0 until Window).map(j =>
          when(i - j >= 1,
            ascii(element_at(col("__cs"), i - j)) * lit(pows(j)))
            .otherwise(lit(0L)))
          .reduce(_ + _)).as("__hs"))
    // mask hits (except the final position) + the final position
    val s3 = s2.select(col("doc_id"), col("__cs"),
      when(col("__n") > 0, concat(
        filter(sequence(lit(1), col("__n")),
          i => element_at(col("__hs"), i) % MaskMod === 0 && i =!= col("__n")),
        array(col("__n"))))
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
