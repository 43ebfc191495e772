package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
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
        // open packs: used tokens per local pack index
        val used = scala.collection.mutable.ArrayBuffer.empty[Long]
        it.map { case (id, len) =>
          var p = 0
          while (p < used.length && used(p) + len > capacity) p += 1
          if (p == used.length) used += 0L
          val offset = used(p)
          used(p) += math.max(len, 1L)
          (id, (pid << 32) | p.toLong, offset, len)
        }
      }
      .toDF("doc_id", "pack_id", "pack_offset", "doc_tokens")
  }
}
