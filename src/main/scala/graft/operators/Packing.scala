package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-batch construction: place documents into
  * fixed-token-capacity sequences ("packs") so padding waste is bounded,
  * the step between tokenization and batch emission in an LLM data
  * pipeline.
  *
  * Distribution strategy: packing is inherently sequential, so it runs
  * PER PARTITION — documents are hash-spread across partitions for
  * balance, sorted descending by length inside each (first-fit
  * decreasing), and a greedy first-fit scan assigns each doc to the
  * first open pack with room. This is the sanctioned `mapPartitions`
  * case (SURVEY §4: genuine per-partition imperative logic): no cross-
  * partition coordination, no shuffle beyond the one repartition, and
  * pack ids are globally unique by construction
  * (partitionId << 32 | localPack). First-fit guarantees at most one
  * open pack under half capacity, so #packs < 2·OPT; FFD in practice
  * lands within ~10% of optimal.
  *
  * Determinism: hash partitioning + (len desc, id asc) ordering + greedy
  * scan are all deterministic, so replay/retry produce identical packs.
  * Oversize docs (len > capacity) get a singleton pack at offset 0 —
  * truncation policy is the consumer's call.
  */
object Packing {

  def packSequences(df: DataFrame, idCol: String, lenCol: String,
                    capacity: Long, partitions: Int = 0): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val nParts =
      if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    df.select(col(idCol).cast("long").as("id"), col(lenCol).cast("long").as("len"))
      .repartition(nParts, col("id"))
      .sortWithinPartitions(desc("len"), asc("id"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        val pid = TaskContext.getPartitionId().toLong
        val ff = new FirstFit(capacity)
        it.map { case (id, len) =>
          val (p, offset) = ff.place(len)
          (id, (pid << 32) | p.toLong, offset, len)
        }
      }
      .toDF("doc_id", "pack_id", "pack_offset", "doc_tokens")
  }

  /** GPT-style CONCAT-AND-CHUNK packing — the other packing discipline
    * real LLM pipelines run: documents concatenate into one token
    * stream per `streamCol` group (in `idCol` order) and the stream is
    * cut every `capacity` tokens; documents legally SPAN chunk
    * boundaries (the consumer masks cross-document attention). Unlike
    * first-fit ([[packSequences]], whose assignment depends on hash
    * partitioning and is therefore rows-only-checkable), this placement
    * is a pure function of the per-stream cumulative sums — replayable
    * cross-engine, hash-exact against a window-cumsum oracle.
    *
    * Output: one row per (document × chunk it spans):
    * (stream, chunk_id, doc_id, start_in_chunk, n_toks_in_chunk).
    * Chunk ids are per-stream. Token-less documents are excluded (no
    * tokens to place — the gapFill exclusion convention).
    *
    * Scale: ONE exchange — the per-stream window cumsum (partitioned
    * window, ordered by id); the chunk explode adds ≤ len/capacity + 1
    * rows per doc, bounded by the token volume itself. No placement
    * state, no driver action. */
  def concatChunks(df: DataFrame, streamCol: String, idCol: String,
                   lenCol: String, capacity: Long): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val w = Window.partitionBy(col("stream")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(streamCol).as("stream"),
        col(idCol).cast("long").as("doc_id"),
        col(lenCol).cast("long").as("n_toks"))
      .filter(col("n_toks") > 0)
      .withColumn("__s", coalesce(sum(col("n_toks")).over(w), lit(0L)))
      .select(col("stream"), col("doc_id"), col("n_toks"), col("__s"),
        explode(sequence(expr(s"__s div ${capacity}L"),
          expr(s"(__s + n_toks - 1) div ${capacity}L"))).as("chunk_id"))
      .select(col("stream"), col("chunk_id"), col("doc_id"),
        (greatest(col("__s"), col("chunk_id") * capacity)
          - col("chunk_id") * capacity).as("start_in_chunk"),
        (least((col("chunk_id") + 1L) * capacity, col("__s") + col("n_toks"))
          - greatest(col("chunk_id") * capacity, col("__s")))
          .as("n_toks_in_chunk"))
  }

  /** First-fit over open packs via a max-segment-tree on remaining
    * capacity: `place` finds the LEFTMOST pack with room in O(log P)
    * instead of scanning every pack ever opened, so a partition of n
    * docs packs in O(n log n) rather than the quadratic O(n·P) the
    * naive scan degrades to when most docs are near capacity — while
    * producing bit-for-bit the same assignment as the linear first-fit
    * scan (same pack indices, same offsets).
    *
    * Leaves hold each open pack's remaining capacity (-1 = not yet
    * opened, which can never satisfy a `len >= 0` query); inner nodes
    * hold the subtree max, so descending "left child if its max fits"
    * lands on the leftmost fitting pack. A pack holding an oversize doc
    * goes capacity-negative and correctly rejects everything after,
    * including zero-length docs — matching the scan's
    * `used + len > capacity` arithmetic exactly. */
  private final class FirstFit(capacity: Long) {
    private var size = 16 // leaf slots (power of two)
    private var tree = Array.fill(2 * size)(-1L)
    private var packs = 0 // packs opened so far

    private def grow(): Unit = {
      val ns = size * 2
      val nt = Array.fill(2 * ns)(-1L)
      System.arraycopy(tree, size, nt, ns, size)
      var i = ns - 1
      while (i >= 1) { nt(i) = math.max(nt(2 * i), nt(2 * i + 1)); i -= 1 }
      size = ns
      tree = nt
    }

    private def update(p: Int, v: Long): Unit = {
      var i = size + p
      tree(i) = v
      i /= 2
      while (i >= 1) { tree(i) = math.max(tree(2 * i), tree(2 * i + 1)); i /= 2 }
    }

    /** Assign one doc; returns (local pack index, offset within pack). */
    def place(len: Long): (Int, Long) = {
      val p =
        if (packs == 0 || tree(1) < len) { // no open pack fits: open one
          if (packs == size) grow()
          val np = packs
          packs += 1
          update(np, capacity)
          np
        } else {
          var i = 1
          while (i < size) i = if (tree(2 * i) >= len) 2 * i else 2 * i + 1
          i - size
        }
      val remaining = tree(size + p)
      update(p, remaining - math.max(len, 1L))
      (p, capacity - remaining)
    }
  }
}
