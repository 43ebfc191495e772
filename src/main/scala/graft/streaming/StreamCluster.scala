package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Dedup

/** Continuously maintained dedup CLUSTERING artifact — the closure
  * counterpart of [[StreamDedup]] (which answers "is this new doc a
  * duplicate"; this leg answers "which component does every doc belong
  * to, right now"). Each micro-batch of NEW documents:
  *
  *   1. shingles the batch ([[Dedup.shingleIndex]], fixed-width rows);
  *   2. probes the STORED corpus shingle index for batch↔corpus edges
  *      and self-joins the batch index for batch↔batch edges — the
  *      corpus is never re-tokenized and never self-joined;
  *   3. extends the previous labeling through the label-contracted
  *      reduced graph ([[Dedup.incrementalComponents]] — only touched
  *      components shuffle);
  *   4. writes the new labeling generation and APPENDS the batch's
  *      shingle generation.
  *
  * Artifact layout (the [[StreamIndex]] generation discipline):
  * `path/shingles/gen=<batchId>` (append-only, one per batch) and
  * `path/labels/gen=<batchId>` (full labeling snapshot — 2 longs per
  * doc; serve-side reads the NEWEST generation). The checkpoint makes
  * batch ids stable across restarts, so a replayed batch overwrites
  * its OWN generation directories with identical content — idempotent
  * recovery. [[readLabels]] reads only the max-gen labels dir, so a
  * crash between the two writes leaves the artifact serving the
  * previous consistent generation.
  *
  * CONTRACT: arriving doc_ids are NEW (the q61/q138 admission
  * discipline — [[Dedup.incrementalComponents]] requires base/delta
  * disjointness). Edges run WITHOUT df caps: caps are
  * population-dependent and the leg's certificate is labeling ==
  * full [[Dedup.connectedComponents]] over every document fed so far
  * (StreamClusterSpec pins it batch over batch, including a bridge
  * merge of two earlier components).
  */
object StreamCluster {

  def maintain(docs: DataFrame, idCol: String, textCol: String,
               path: String, checkpoint: String,
               n: Int = 3, threshold: Double = 0.5): StreamingQuery = {
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.persist()
        // the batch work localCheckpoints several frames (bIdx here,
        // sh inside Dedup.shingleIndex, labels/el inside
        // incrementalComponents); in a long-running stream they would
        // otherwise linger in storage memory until driver GC lets
        // ContextCleaner reap them — the r14 block-manager-pressure
        // class. Snapshot the persistent-RDD ids now and release
        // exactly the ones this batch creates after its writes commit.
        val sc = batch.sparkSession.sparkContext
        val preexisting = sc.getPersistentRDDs.keySet
        try {
          if (!batch.isEmpty) {
            val spark = batch.sparkSession
            val bIdx = Dedup.shingleIndex(batch, idCol, textCol, n)
              .localCheckpoint() // probed by two edge joins + written
            // a REPLAYED batch must extend the PREVIOUS labeling, never
            // read its own crashed partial output: both artifact reads
            // are restricted to generations strictly below this batch id
            // AND to directories whose _SUCCESS marker landed (a partial
            // parquet dir from a killed write would otherwise fail every
            // retry of this batch forever)
            val prevLabels = genDirs(spark, s"$path/labels", batchId)
              .lastOption.map(spark.read.parquet(_))
            val shingleGens = genDirs(spark, s"$path/shingles", batchId)
            val batchIds = batch.select(col(idCol).cast("long").as("id"))
            val within = Dedup.jaccardPairsWithinIndex(bIdx, threshold)
              .select(col("doc_a").as("src"), col("doc_b").as("dst"))
            val labels = prevLabels match {
              case None =>
                Dedup.connectedComponents(batchIds, within)
              case Some(prev) =>
                val corpusIdx = spark.read.parquet(shingleGens: _*)
                val cross = Dedup
                  .jaccardPairsAgainstIndex(corpusIdx, bIdx, threshold)
                  .select(col("batch_doc").as("src"),
                    col("corpus_doc").as("dst"))
                Dedup.incrementalComponents(prev, batchIds,
                  cross.unionByName(within))
            }
            // SHINGLES land first, labels second: readLabels keys on the
            // max LABELS generation, so until the labels write commits
            // the artifact still serves the previous consistent
            // labeling, and an early-landed shingle generation is inert
            // (the next batch only reads shingles of batches whose ids
            // the source log replays anyway). A crash anywhere re-runs
            // the same batch id and overwrites both generations with
            // identical content (same input rows, deterministic
            // operators) — no generation is ever half-new.
            bIdx.write.mode("overwrite")
              .parquet(s"$path/shingles/gen=$batchId")
            labels.write.mode("overwrite")
              .parquet(s"$path/labels/gen=$batchId")
          }
        } finally {
          batch.unpersist()
          sc.getPersistentRDDs.foreach { case (id, rdd) =>
            if (!preexisting.contains(id)) rdd.unpersist(blocking = false)
          }
        }
        ()
      }
      .start()
  }

  /** Generation directories under `root` with id < `beforeGen`, oldest
    * first, COMMITTED ones only (_SUCCESS landed — a partial dir from a
    * killed write is invisible to both the maintainer and serve reads). */
  private def genDirs(spark: SparkSession, root: String,
                      beforeGen: Long): Seq[String] = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rootPath)) Seq.empty
    else fs.listStatus(rootPath)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("gen="))
      .flatMap { s =>
        // non-numeric gen=* names (a tool's gen=tmp, a compaction
        // staging dir) are skipped, not thrown — a stray directory must
        // not permanently kill the maintainer batch or serve reads
        scala.util.Try(s.getPath.getName.stripPrefix("gen=").toLong)
          .toOption.flatMap { id =>
            if (id < beforeGen &&
              fs.exists(new org.apache.hadoop.fs.Path(s.getPath, "_SUCCESS")))
              Some((id, s.getPath.toString))
            else None
          }
      }
      .sortBy(_._1).map(_._2).toSeq
  }

  /** Serve-side: the newest consistent (committed) labeling. */
  def readLabels(spark: SparkSession, path: String): DataFrame =
    genDirs(spark, s"$path/labels", Long.MaxValue).lastOption
      .map(spark.read.parquet(_))
      .getOrElse(throw new IllegalArgumentException(
        s"no committed labeling generations under $path"))
}
