package graft.streaming

import org.apache.hadoop.fs.Path

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
  *   4. writes the batch's shingle generation and the labeling DELTA.
  *
  * Artifact layout (r16 — the [[StreamIndex]] base+delta discipline,
  * applied to both halves):
  *
  *   - `path/shingles/gen=<batchId>/hb=<h mod nBuckets>/…` — one
  *     generation per batch, HASH-BUCKETED by shingle hash so the
  *     per-batch corpus probe reads only the buckets the batch's own
  *     shingles can join (a trickle batch touches few buckets; the
  *     probe scan prunes to exactly those directories instead of
  *     reading the whole corpus index every micro-batch).
  *   - `path/labels/gen=<batchId>` — the labeling DELTA: only rows
  *     whose component CHANGED plus the new batch's rows (flagged
  *     `is_new`), each stamped with its `gen` column. Serve-side folds
  *     newest-wins (labels are min-ids, monotonically nonincreasing per
  *     id, so newest-wins is exact) as base ⟕ folded-deltas — the
  *     corpus side is scanned, never shuffled ([[foldLabels]]); the
  *     delta itself comes from the contraction map
  *     ([[Dedup.incrementalComponentsDelta]]), never from diffing two
  *     corpus-sized labelings. A full corpus-sized snapshot per
  *     micro-batch was the r15 scale-killer; the delta is bounded by
  *     the batch's touched components.
  *   - `path/{shingles,labels}/base=<id>` — COMPACTION output: every
  *     `compactEvery` batches the committed generations at or below
  *     `id` fold into one base (shingles: row union, re-bucketed;
  *     labels: newest-wins snapshot). Generations otherwise accumulate
  *     one directory per micro-batch forever — 4 320/day at a 20 s
  *     cadence, the small-files class that kills 100 TB scans. Readers
  *     use the max-base-id WATERMARK: anything at or below the newest
  *     base id is already folded into it, so crash leftovers between
  *     the compactor's rename and its delete pass are INERT (skipped by
  *     every read, swept by the next compaction) — the exact
  *     [[StreamIndex.compactDeltas]] crash discipline.
  *
  * The checkpoint makes batch ids stable across restarts, so a
  * replayed batch overwrites its OWN generation directories with
  * identical content — idempotent recovery. Both maintainer reads are
  * restricted to generations strictly below the replaying batch id AND
  * to directories whose _SUCCESS landed, so a replayed batch extends
  * the PREVIOUS labeling and a crashed partial write is invisible;
  * compaction only ever folds generations strictly below the running
  * batch id (they belong to committed batches), so a replay after a
  * crash still sees exactly the pre-batch corpus through the base.
  *
  * CONTRACT: arriving doc_ids are NEW (the q61/q138 admission
  * discipline — [[Dedup.incrementalComponents]] requires base/delta
  * disjointness). Edges run WITHOUT df caps: caps are
  * population-dependent and the leg's certificate is labeling ==
  * full [[Dedup.connectedComponents]] over every document fed so far
  * (StreamClusterSpec pins it batch over batch, including a bridge
  * merging two earlier components, compaction, and an engine-level
  * restart replay).
  */
object StreamCluster {

  def maintain(docs: DataFrame, idCol: String, textCol: String,
               path: String, checkpoint: String,
               n: Int = 3, threshold: Double = 0.5,
               nBuckets: Int = 16, compactEvery: Int = 8): StreamingQuery = {
    require(nBuckets > 0, "nBuckets must be positive")
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
            val prevLabels = foldLabels(spark, path, batchId)
            val batchIds = batch.select(col(idCol).cast("long").as("id"))
            val within = Dedup.jaccardPairsWithinIndex(bIdx, threshold)
              .select(col("doc_a").as("src"), col("doc_b").as("dst"))
            // the labeling DELTA: the new batch's final labels
            // (is_new = true) plus base rows whose component changed
            // (is_new = false) — computed by the contraction map
            // directly ([[Dedup.incrementalComponentsDelta]]), never by
            // diffing two corpus-sized labelings. Labels are min-ids —
            // they only ever decrease — so newest-wins folding
            // reconstructs the exact full labeling from the delta
            // chain, and the is_new flag lets the fold recover "id not
            // in base" without an anti join against the corpus.
            val delta = prevLabels match {
              case None =>
                Dedup.connectedComponents(batchIds, within)
                  .withColumn("is_new", lit(true))
              case Some(prev) =>
                // the batch's own bucket set bounds the corpus probe: a
                // shingle hash joins only within its bucket, so corpus
                // directories for buckets the batch never touches are
                // pruned from the scan entirely (driver-side collect of
                // at most nBuckets ints)
                val buckets = bIdx
                  .select(pmod(col("h"), lit(nBuckets.toLong)).cast("int")
                    .as("hb"))
                  .distinct().collect().map(_.getInt(0)).toSet
                // a batch whose buckets are all absent from the corpus
                // (or an all-short-doc batch with no shingles) has no
                // possible corpus edge — nothing to probe
                val cross = readPrunedShingles(spark, path, batchId,
                  buckets, nBuckets) match {
                  case None =>
                    spark.range(0).select(col("id").as("src"),
                      col("id").as("dst"))
                  case Some(corpusIdx) => Dedup
                    .jaccardPairsAgainstIndex(corpusIdx, bIdx, threshold)
                    .select(col("batch_doc").as("src"),
                      col("corpus_doc").as("dst"))
                }
                Dedup.incrementalComponentsDelta(prev, batchIds,
                  cross.unionByName(within))
            }
            // SHINGLES land first, labels second: serve reads key on
            // the LABELS generations, so until the labels write commits
            // the artifact still serves the previous consistent
            // labeling, and an early-landed shingle generation is inert
            // (the next batch only reads shingles of batches whose ids
            // the source log replays anyway). A crash anywhere re-runs
            // the same batch id and overwrites both generations with
            // identical content (same input rows, deterministic
            // operators) — no generation is ever half-new.
            bIdx
              .withColumn("hb",
                pmod(col("h"), lit(nBuckets.toLong)).cast("int"))
              .write.mode("overwrite").partitionBy("hb")
              .parquet(s"$path/shingles/gen=$batchId")
            delta.withColumn("gen", lit(batchId))
              .write.mode("overwrite")
              .parquet(s"$path/labels/gen=$batchId")
            // artifact maintenance: fold committed generations STRICTLY
            // BELOW this batch (they belong to committed batches; this
            // batch's own generations stay separate until a later batch
            // folds them, so a replay of THIS batch still sees the
            // exact pre-batch corpus)
            if (compactEvery > 0) {
              val gens = committed(spark, s"$path/shingles", "gen=",
                batchId).map(_._1)
              val baseId = newestBase(spark, s"$path/shingles", batchId)
                .map(_._1).getOrElse(Long.MinValue)
              if (gens.count(_ > baseId) >= compactEvery)
                compact(spark, path, gens.max)
            }
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

  // ------------------------------------------------------------- reads

  /** Serve-side: the newest consistent (committed) labeling — the
    * newest-wins fold of the base snapshot and every delta. */
  def readLabels(spark: SparkSession, path: String): DataFrame =
    foldLabels(spark, path, Long.MaxValue)
      .getOrElse(throw new IllegalArgumentException(
        s"no committed labeling generations under $path"))

  /** Newest-wins fold of the committed labeling state strictly below
    * `beforeGen`: the base snapshot (if any) plus the delta chain above
    * it. Each row carries the `gen` that wrote it; an id's newest row
    * is its current label (min-ids only ever decrease).
    *
    * Fold SHAPE (the per-batch maintainer read and every serve): the
    * deltas fold newest-wins among THEMSELVES (a delta-sized shuffle,
    * bounded by compactEvery generations), then the base is LEFT-JOINED
    * against that small side — AQE broadcasts it, so the corpus-sized
    * base is only ever scanned, never shuffled. Ids absent from the
    * base are exactly the delta rows whose generation chain contains an
    * `is_new = true` arrival (the base predates every folded delta, so
    * arrival-after-base ⇔ not-in-base) — recovered by a flag aggregate
    * instead of an anti join against the corpus. A corpus-sized
    * groupBy here would put a full shuffle in every micro-batch, which
    * is the scale-killer the delta layout exists to avoid. */
  private def foldLabels(spark: SparkSession, path: String,
                         beforeGen: Long): Option[DataFrame] = {
    val root = s"$path/labels"
    val base = newestBase(spark, root, beforeGen)
    val baseId = base.map(_._1).getOrElse(Long.MinValue)
    val deltaDirs = committed(spark, root, "gen=", beforeGen)
      .filter(_._1 > baseId).map(_._2)
    val deltas =
      if (deltaDirs.isEmpty) None
      else Some(readUnion(spark, deltaDirs)
        .groupBy(col("id"))
        .agg(max_by(col("component"), col("gen")).as("component"),
          max(col("is_new")).as("__arrived")))
    (base.map(_._2), deltas) match {
      case (None, None) => None
      case (None, Some(d)) =>
        Some(d.select(col("id"), col("component")))
      case (Some(b), None) =>
        Some(spark.read.parquet(b).select(col("id"), col("component")))
      case (Some(b), Some(d)) =>
        val baseDf = spark.read.parquet(b)
        Some(baseDf
          .join(d.select(col("id"), col("component").as("__upd")),
            Seq("id"), "left")
          .select(col("id"),
            coalesce(col("__upd"), col("component")).as("component"))
          .unionByName(d.filter(col("__arrived"))
            .select(col("id"), col("component"))))
    }
  }

  /** The shingle-index leaf directories a batch touching `buckets` must
    * probe: for every committed generation (and the base) strictly
    * below `beforeGen`, only its `hb=<b>` subdirectories with `b` in
    * the batch's bucket set — the scan-prune that keeps the per-batch
    * corpus probe proportional to the batch, not the corpus. Exposed
    * package-private so the spec can measure the prune. */
  private[streaming] def prunedShingleDirs(spark: SparkSession, path: String,
                                           beforeGen: Long, buckets: Set[Int],
                                           nBuckets: Int): Seq[String] = {
    val root = s"$path/shingles"
    val base = newestBase(spark, root, beforeGen)
    val baseId = base.map(_._1).getOrElse(Long.MinValue)
    val roots = base.map(_._2).toSeq ++
      committed(spark, root, "gen=", beforeGen)
        .filter(_._1 > baseId).map(_._2)
    val fs = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    roots.flatMap { r =>
      fs.listStatus(new Path(r))
        .filter { s =>
          s.isDirectory && s.getPath.getName.startsWith("hb=") &&
            scala.util.Try(s.getPath.getName.stripPrefix("hb=").toInt)
              .toOption.exists(buckets.contains)
        }
        .map(_.getPath.toString)
    }
  }

  /** The pruned corpus-probe read: the batch's bucket leaf dirs grouped
    * by generation root, each root read with its own basePath (mixed
    * `base=`/`gen=` parent names break a single multi-root partition
    * discovery), unioned by name. None when the corpus has nothing the
    * batch could join. */
  private def readPrunedShingles(spark: SparkSession, path: String,
                                 beforeGen: Long, buckets: Set[Int],
                                 nBuckets: Int): Option[DataFrame] = {
    val leaves = prunedShingleDirs(spark, path, beforeGen, buckets, nBuckets)
    if (leaves.isEmpty) None
    else Some(leaves.groupBy(l => l.substring(0, l.lastIndexOf('/')))
      .toSeq.sortBy(_._1)
      .map { case (root, ls) =>
        spark.read.option("basePath", root).parquet(ls: _*)
          .select(col("doc"), col("h"), col("sz"))
      }
      .reduce(_.unionByName(_)))
  }

  // ------------------------------------------------------- maintenance

  /** Fold every committed generation with id ≤ `upTo` (plus any earlier
    * base) into `base=<upTo>` for both artifact halves — shingles as a
    * re-bucketed row union, labels as the newest-wins snapshot (stamped
    * `gen = upTo`, so later folds order it correctly). Staged under a
    * dot-prefixed temp dir and RENAMED into place before the swallowed
    * directories delete: a crash leaves either the old layout plus an
    * ignorable temp dir, or the new base plus stale sources that every
    * read already skips (max-base-id watermark) and the next compaction
    * sweeps. `upTo` must stay strictly below the running batch id —
    * [[maintain]] only folds generations of committed batches. */
  private[streaming] def compact(spark: SparkSession, path: String,
                                 upTo: Long): Unit = {
    foldHalf(spark, s"$path/shingles", upTo) { dirs =>
      (readUnion(spark, dirs), Seq("hb"))
    }
    foldHalf(spark, s"$path/labels", upTo) { dirs =>
      // the occasional corpus-sized shuffle belongs HERE (one fold per
      // compactEvery batches), not in the per-batch/serve fold; the
      // snapshot is a base, so every row is settled (is_new = false)
      (readUnion(spark, dirs)
        .groupBy(col("id"))
        .agg(max_by(col("component"), col("gen")).as("component"))
        .withColumn("gen", lit(upTo))
        .withColumn("is_new", lit(false)), Seq.empty)
    }
  }

  /** Union of several generation/base directories read ONE ROOT AT A
    * TIME: a single multi-root read trips partition discovery over the
    * mixed `base=`/`gen=` parent names (conflicting-directory-structures),
    * while a per-root read infers each root's own `hb=` partitions
    * correctly and the union is by name. Root counts are bounded by
    * `compactEvery`, so the per-root plan fan-in stays O(1). */
  private def readUnion(spark: SparkSession, dirs: Seq[String]): DataFrame =
    dirs.map(spark.read.parquet(_)).reduce(_.unionByName(_))

  private def foldHalf(spark: SparkSession, root: String, upTo: Long)
                      (fold: Seq[String] => (DataFrame, Seq[String])): Unit = {
    val fs = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // hygiene: crashed staging dirs are invisible to reads; sweep them
    fs.listStatus(new Path(root))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(".compact-"))
      .foreach(s => fs.delete(s.getPath, true))
    val base = newestBase(spark, root, upTo + 1)
    val baseId = base.map(_._1).getOrElse(Long.MinValue)
    // stale = already folded into the newest base (crash leftovers of a
    // delete pass); finish their delete instead of double-counting them
    val stale = committed(spark, root, "gen=", upTo + 1)
      .filter(_._1 <= baseId).map(_._2) ++
      committed(spark, root, "base=", upTo + 1)
        .filter(_._1 < baseId).map(_._2)
    stale.foreach(d => fs.delete(new Path(d), true))
    val gens = committed(spark, root, "gen=", upTo + 1)
      .filter(g => g._1 > baseId && g._1 <= upTo)
    if (gens.nonEmpty) {
      val (df, partitionCols) = fold(base.map(_._2).toSeq ++ gens.map(_._2))
      val tmp = new Path(root, s".compact-$upTo")
      val writer = df.write.mode("overwrite")
      (if (partitionCols.isEmpty) writer
       else writer.partitionBy(partitionCols: _*)).parquet(tmp.toString)
      require(fs.rename(tmp, new Path(root, s"base=$upTo")),
        s"rename of the compacted base into $root failed")
      (base.map(_._2).toSeq ++ gens.map(_._2))
        .foreach(d => fs.delete(new Path(d), true))
    }
  }

  // ---------------------------------------------------------- listings

  /** Committed `<prefix><id>` directories under `root` with id strictly
    * below `beforeGen`, oldest first (_SUCCESS landed — a partial dir
    * from a killed write is invisible to both the maintainer and serve
    * reads). Non-numeric names (a tool's gen=tmp, a staging dir) are
    * skipped, not thrown. */
  private def committed(spark: SparkSession, root: String, prefix: String,
                        beforeGen: Long): Seq[(Long, String)] = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rootPath)) Seq.empty
    else fs.listStatus(rootPath)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
      .flatMap { s =>
        scala.util.Try(s.getPath.getName.stripPrefix(prefix).toLong)
          .toOption.flatMap { id =>
            if (id < beforeGen &&
              fs.exists(new Path(s.getPath, "_SUCCESS")))
              Some((id, s.getPath.toString))
            else None
          }
      }
      .sortBy(_._1).toSeq
  }

  /** The newest committed base strictly below `beforeGen` — everything
    * at or below its id is already folded into it (the read watermark). */
  private def newestBase(spark: SparkSession, root: String,
                         beforeGen: Long): Option[(Long, String)] =
    committed(spark, root, "base=", beforeGen).lastOption
}
