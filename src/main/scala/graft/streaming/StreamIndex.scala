package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Retrieval

/** Streaming inverted-index maintenance — the freshness leg of the
  * q182 artifact: every micro-batch of NEW documents becomes one
  * additive index delta (postings/lengths appended, corpus stats
  * re-summed), written under its own batch directory via `foreachBatch`
  * — the [[StreamMerge]] pattern applied to the retrieval index. The
  * additive merge law is what makes the index streamable at all: a
  * delta never touches base files, and the serve-side
  * [[readMerged]] reconstructs the exact index a batch build over all
  * documents would produce (StreamIndexSpec pins it, including the
  * df/avgdl drift the new docs cause).
  *
  * CONTRACT: arriving doc_ids are NEW (the q61/q138 admission
  * discipline) — the same disjointness [[Retrieval.mergeParts]]
  * requires. */
object StreamIndex {

  /** Maintain `path` from a stream of documents. Each micro-batch
    * writes one delta index at `path/delta=<batchId>`. The checkpoint
    * is REQUIRED: batch ids must survive restarts, or a restarted
    * stream would begin again at batch 0 and mode("overwrite") would
    * silently replace an earlier run's delta with different documents.
    * With the checkpoint, a replayed batch id re-delivers the SAME
    * rows, so overwriting its own delta directory is the idempotent
    * recovery Structured Streaming's foreachBatch contract asks for. */
  def maintain(docs: DataFrame, idCol: String, textCol: String,
               path: String, checkpoint: String): StreamingQuery = {
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // persist around the multiple actions (isEmpty + the three
        // artifact writes): each action would otherwise re-tokenize the
        // whole micro-batch from source — the StreamMediaAudit
        // multi-action convention
        batch.persist()
        try {
          if (!batch.isEmpty)
            Retrieval.writeIndex(Retrieval.indexParts(batch, idCol, textCol),
              s"$path/delta=$batchId")
        } finally { batch.unpersist(); () }
        ()
      }
      .start()
  }

  /** Serve-side: merge the compacted base (if any) and every remaining
    * delta under `path` into one index. Between [[compactDeltas]] runs
    * the delta count grows with batches; after one it is O(1) again —
    * the law StreamIndexSpec measures. */
  def readMerged(spark: SparkSession, path: String): Retrieval.IndexParts = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val all = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(s => s.isDirectory && (s.getPath.getName.startsWith("delta=") ||
        s.getPath.getName.startsWith("compacted=")))
      .map(_.getPath)
    // anything at or below the NEWEST base id is ALREADY folded into it —
    // older compacted bases and low deltas only exist when compactDeltas
    // crashed between its rename and its delete pass; merging either
    // again would double-count every one of their documents, so the max
    // base id is the read-side watermark over BOTH directory kinds
    val baseId = all.filter(_.getName.startsWith("compacted="))
      .map(_.getName.stripPrefix("compacted=").toLong)
      .sorted.lastOption.getOrElse(Long.MinValue)
    val parts = all.filter { p =>
      val n = p.getName
      if (n.startsWith("delta=")) n.stripPrefix("delta=").toLong > baseId
      else n.stripPrefix("compacted=").toLong == baseId
    }.map(_.toString).sorted
    require(parts.nonEmpty, s"no index deltas under $path")
    parts.map(d => Retrieval.readIndex(spark, d))
      .reduce(Retrieval.mergeParts)
  }

  /** Periodic artifact maintenance — the [[graft.sinks.Compaction]]
    * discipline applied to the index: every delta with batch id
    * ≤ `upTo`, together with any earlier compacted base, merges into
    * ONE `compacted=<upTo>` index and the swallowed directories
    * delete. Without this the artifact holds one directory per
    * micro-batch forever (4 320/day at a 20 s cadence — the small-files
    * failure q182's O(10⁵)-files story must not reintroduce); after it
    * the directory count is O(1) regardless of batches served.
    *
    * SAFETY: `upTo` must be at or below the stream's COMMITTED batch
    * frontier — a replayed batch id below `upTo` would re-create its
    * delta directory next restart and [[readMerged]] would then count
    * those documents twice (the exact frontier rule
    * [[graft.sinks.Compaction.compact]] documents for the parquet
    * sink). The merged base is staged under a dot-prefixed temp dir and
    * renamed into place BEFORE the swallowed dirs delete, so a crash
    * leaves either the old layout plus an ignorable temp dir or the new
    * base plus not-yet-deleted sources — and those leftovers are INERT:
    * a delta at or below the base id is already folded into the base,
    * so [[readMerged]] skips it (base-id watermark) and the next
    * compactDeltas run deletes it instead of re-merging it (a rerun at
    * the same `upTo` is therefore the legal crash-recovery move);
    * concurrent READERS during the
    * swap are the caller's transaction, as with Compaction. Returns the
    * number of directories swallowed. */
  def compactDeltas(spark: SparkSession, path: String, upTo: Long): Int = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
    val allBases = entries.filter(_.getName.startsWith("compacted="))
    // the NEWEST base wins; older compacted dirs are crash leftovers
    // (rename landed, the delete pass did not) already folded into it
    val baseId = allBases
      .map(_.getName.stripPrefix("compacted=").toLong)
      .sorted.lastOption.getOrElse(Long.MinValue)
    val bases = allBases.filter(
      _.getName.stripPrefix("compacted=").toLong == baseId)
    require(baseId <= upTo,
      s"compacted base $baseId already past upTo=$upTo")
    // anything at or below the base id is already inside the base — the
    // crash-between-rename-and-delete leftovers; finish their delete
    // instead of merging them a second time (readMerged ignores them
    // for the same reason, so this pass is pure hygiene)
    val stale = entries.filter { p =>
      val n = p.getName
      (n.startsWith("delta=") && n.stripPrefix("delta=").toLong <= baseId) ||
        (n.startsWith("compacted=") &&
          n.stripPrefix("compacted=").toLong < baseId)
    }
    stale.foreach(p => fs.delete(p, true))
    val deltas = entries.filter { p =>
      val n = p.getName
      n.startsWith("delta=") && {
        val id = n.stripPrefix("delta=").toLong
        id > baseId && id <= upTo
      }
    }
    if (deltas.isEmpty) stale.length
    else {
      val merged = (bases ++ deltas).sortBy(_.getName)
        .map(p => Retrieval.readIndex(spark, p.toString))
        .reduce(Retrieval.mergeParts)
      val tmp = new org.apache.hadoop.fs.Path(root, s".compact-$upTo")
      Retrieval.writeIndex(merged, tmp.toString) // reads sources: write first
      require(fs.rename(tmp, new org.apache.hadoop.fs.Path(root, s"compacted=$upTo")),
        s"rename of the compacted index into $path failed")
      (bases ++ deltas).foreach(p => fs.delete(p, true))
      bases.length + deltas.length + stale.length
    }
  }
}
