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
  *      reduced graph with DELTA-BOUNDED artifact lookups (below) —
  *      only touched components shuffle, and only the label buckets
  *      the batch's edges can reach are read;
  *   4. writes the batch's shingle generation and the labeling DELTA.
  *
  * Artifact layout (r17 — every corpus-sized half is hash-bucketed so
  * per-batch reads prune to the batch's own buckets):
  *
  *   - `path/shingles/gen=<batchId>/hb=<h mod nb>/…` — one generation
  *     per batch, bucketed by shingle hash: the per-batch corpus probe
  *     reads only the buckets the batch's own shingles can join.
  *   - `path/labels/gen=<batchId>` — the labeling DELTA: only rows
  *     whose component CHANGED plus the new batch's rows (flagged
  *     `is_new`), each stamped with its `gen` column. Deltas are
  *     delta-sized; they are never bucketed.
  *   - `path/labels/base=<id>/hb=<xxhash64(id) mod nb>/…` — compaction
  *     snapshot keyed by DOC ID: the per-batch edge-endpoint label
  *     lookup ([[lookupLabelsById]]) reads only the endpoint ids'
  *     buckets. r16 scanned this base in full twice per edge-carrying
  *     batch — at 100 B docs that is a ~TB-scale read per 20 s trigger;
  *     the bucket prune makes it proportional to the batch.
  *   - `path/labels_byc/base=<id>/cb=<xxhash64(component) mod nb>/…` —
  *     the SAME snapshot keyed by COMPONENT (a secondary index, written
  *     at the same compaction): the changed-component member lookup
  *     ([[lookupChangedByComponent]]) reads only the changed
  *     components' buckets. Labels rows are two longs, so the second
  *     copy is negligible next to the shingle index. The byc copy is
  *     renamed into place FIRST — a crash between the two renames
  *     leaves byc AHEAD, which the member lookup tolerates (its delta
  *     watermark keys on the byc id; the labels half never references
  *     byc content).
  *   - `nBuckets` is persisted in `path/_meta/nbuckets` on first
  *     maintain and ADOPTED by every later maintain (the modulus is a
  *     property of the artifact's layout, not of the call): restarting
  *     with a different value would compute prune buckets under a new
  *     modulus against directories written under the old one and
  *     silently skip joinable corpus — with the meta file the caller's
  *     value is ignored in favor of the artifact's.
  *
  * Compaction (every `compactEvery` batches) folds committed
  * generations into the bases with a GRACE PERIOD: folded sources are
  * not deleted by the compaction that folds them — every read already
  * skips them via the max-base-id watermark, so they are inert — and
  * the NEXT compaction's stale sweep removes them. A serve reader that
  * resolved the previous layout before a compaction can therefore
  * finish its scan; the artifact is SINGLE WRITER (one maintain
  * stream), ENFORCED by a writer lease (r18): create-exclusive
  * `_meta/lease` with a per-batch heartbeat mtime — a second maintain
  * fails loudly at acquire, a crashed writer's lease is reclaimed once
  * its heartbeat goes stale, and a clean stop releases immediately.
  * Readers use the max-base-id watermark: anything at or below the
  * newest base id is already folded into it, so crash leftovers are
  * invisible to every read and swept by the next compaction.
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
               nBuckets: Int = 16, compactEvery: Int = 8,
               leaseStaleMs: Long = 10L * 60 * 1000): StreamingQuery = {
    require(nBuckets > 0, "nBuckets must be positive")
    val spark0 = docs.sparkSession
    // WRITER LEASE (r18, VERDICT #4): the artifact documents
    // single-writer, but two concurrent maintains on one path would
    // interleave generations UNDETECTED — now the second acquire fails
    // loudly. Create-exclusive file + per-batch heartbeat mtime; a
    // crashed writer's lease goes stale after `leaseStaleMs` and is
    // reclaimed; a clean stop releases it immediately (listener below).
    val leaseId = acquireLease(spark0, path, leaseStaleMs)
    // the artifact's layout modulus wins over the caller's (see object
    // doc); resolved once, captured by the batch closure
    val nb = effectiveNBuckets(spark0, path, nBuckets)
    val query = docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // heartbeat FIRST — and verify the lease is still ours: a
        // reclaimer that (wrongly) stole a live lease must kill this
        // writer rather than let two maintains interleave writes
        heartbeatLease(batch.sparkSession, path, leaseId)
        batch.persist()
        // the batch work localCheckpoints several frames (bIdx, edges,
        // labels, superOf, plus sh inside Dedup.shingleIndex and sym
        // inside connectedComponents); in a long-running stream they
        // would otherwise linger in storage memory until driver GC lets
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
            val batchIds = batch.select(col(idCol).cast("long").as("id"))
            val within = Dedup.jaccardPairsWithinIndex(bIdx, threshold)
              .select(col("doc_a").as("src"), col("doc_b").as("dst"))
            val delta =
              if (!hasHistory(spark, path, batchId))
                Dedup.connectedComponents(batchIds, within)
                  .withColumn("is_new", lit(true))
              else {
                // the batch's own bucket set bounds the corpus probe: a
                // shingle hash joins only within its bucket, so corpus
                // directories for buckets the batch never touches are
                // pruned from the scan entirely (driver-side collect of
                // at most nb ints)
                val buckets = bIdx
                  .select(pmod(col("h"), lit(nb.toLong)).cast("int")
                    .as("hb"))
                  .distinct().collect().map(_.getInt(0)).toSet
                // a batch whose buckets are all absent from the corpus
                // (or an all-short-doc batch with no shingles) has no
                // possible corpus edge — nothing to probe
                val cross = readPrunedShingles(spark, path, batchId,
                  buckets, nb) match {
                  case None =>
                    spark.range(0).select(col("id").as("src"),
                      col("id").as("dst"))
                  case Some(corpusIdx) => Dedup
                    .jaccardPairsAgainstIndex(corpusIdx, bIdx, threshold)
                    .select(col("batch_doc").as("src"),
                      col("corpus_doc").as("dst"))
                }
                incrementalDeltaPruned(spark, path, batchId, nb,
                  batchIds, cross.unionByName(within))
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
                pmod(col("h"), lit(nb.toLong)).cast("int"))
              .write.mode("overwrite").partitionBy("hb")
              .parquet(s"$path/shingles/gen=$batchId")
            // COMMIT FENCE (r19, VERDICT #5): the batch-start ownership
            // check cannot protect a batch that outlives the staleness
            // window — it could be deposed mid-flight and still land its
            // generation AFTER the takeover. Re-verify (and refresh)
            // ownership immediately before the labels write, the
            // serve-visible commit: a deposed writer throws HERE, its
            // shingle generation stays inert (reads key on labels), and
            // the artifact serves only the new writer's chain.
            testBeforeLabelsCommit()
            heartbeatLease(spark, path, leaseId)
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
                compact(spark, path, gens.max, nb)
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
    liveLeases.put(leaseId, query)
    // IDLE heartbeat: foreachBatch only fires when data arrives, so a
    // live stream with a quiet source would let its lease go stale and
    // be stolen — a daemon thread refreshes at staleMs/3 while the
    // query is active. A takeover mid-race is still caught by the
    // ownership check (the thread's failed heartbeat just ends it; the
    // BATCH-side check is what kills a deposed writer).
    val hb = new Thread(() => {
      try {
        while (query.isActive) {
          Thread.sleep(math.max(500L, leaseStaleMs / 3))
          if (query.isActive) heartbeatLease(spark0, path, leaseId)
        }
      } catch { case _: Throwable => () }
    })
    hb.setDaemon(true)
    hb.setName(s"graft-stream-cluster-lease-$leaseId")
    hb.start()
    // clean-stop release: without it a restart inside the staleness
    // window would spuriously fail; the listener self-removes once its
    // query terminates (crash paths never reach it — staleness covers
    // those). Registered AFTER start (the id is only known then); a
    // termination in that gap leaves the lease to the stale reclaim.
    spark0.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryProgress(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = ()
        override def onQueryTerminated(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit =
          if (e.id == query.id) {
            releaseLease(spark0, path, leaseId)
            spark0.streams.removeListener(this)
          }
      })
    query
  }

  // -------------------------------------------------------------- lease

  /** Spec-injection point for the commit-fence pin: invoked driver-side
    * inside foreachBatch immediately before the pre-commit ownership
    * check, so a test can depose the writer at exactly the moment the
    * fence exists for (mid-batch, after the work, before the
    * serve-visible labels write). Production no-op. */
  private[streaming] var testBeforeLabelsCommit: () => Unit = () => ()

  private def leasePath(path: String) = new Path(s"$path/_meta/lease")

  /** In-JVM ledger of lease holders: an immediate restart after a clean
    * `stop()` must reclaim deterministically — the async listener
    * release may not have fired yet — without weakening the cross-JVM
    * staleness contract (an unknown holder id is assumed live until its
    * heartbeat goes stale). */
  private val liveLeases =
    new java.util.concurrent.ConcurrentHashMap[String, StreamingQuery]()

  private def readLease(fs: org.apache.hadoop.fs.FileSystem,
                        lp: Path): String =
    try {
      val in = fs.open(lp)
      try scala.io.Source.fromInputStream(in).mkString.trim
      finally in.close()
    } catch { case _: java.io.IOException => "" }

  /** Acquire the single-writer lease: fail loudly when a LIVE lease
    * (heartbeat younger than `staleMs`, holder not known-terminated in
    * this JVM) exists; reclaim a stale or terminated one. */
  private[streaming] def acquireLease(spark: SparkSession, path: String,
                                      staleMs: Long): String = {
    val lp = leasePath(path)
    val fs = lp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(lp)) {
      val age = System.currentTimeMillis() -
        fs.getFileStatus(lp).getModificationTime
      val holder = readLease(fs, lp)
      val holderTerminated =
        Option(liveLeases.get(holder)).exists(!_.isActive)
      if (age <= staleMs && !holderTerminated) sys.error(
        s"another maintain stream holds the writer lease on $path " +
          s"(heartbeat ${age / 1000} s ago, staleness ${staleMs / 1000} s): " +
          "the artifact is single-writer — stop the other stream, or if " +
          "it crashed, wait out the staleness window")
      if (holderTerminated) liveLeases.remove(holder)
      fs.delete(lp, false) // stale or cleanly stopped: reclaim
    }
    val id = java.util.UUID.randomUUID.toString
    val out =
      try fs.create(lp, false)
      catch { case _: java.io.IOException => sys.error(
        s"writer-lease race lost on $path: another maintain acquired " +
          "between the liveness check and the create — single-writer") }
    try out.write(id.getBytes("UTF-8")) finally out.close()
    // reclaim is check/delete/create, NOT atomic (r18 ADVICE): two
    // acquirers that both observed the same stale lease can both reach
    // the create — the second deletes the first's fresh lease and
    // recreates. Re-reading narrows the race from the whole reclaim
    // sequence to read-vs-delete, and the per-batch + pre-commit
    // ownership checks fence whatever residue remains (a deposed writer
    // can heartbeat-fail but never LAND a labels generation).
    if (readLease(fs, lp) != id) sys.error(
      s"writer-lease race lost on $path: another maintain reclaimed the " +
        "same stale lease and overwrote this one — single-writer")
    id
  }

  /** Per-batch heartbeat: verify the lease still carries OUR id (a
    * mistaken reclaim must kill this writer, not interleave two), then
    * refresh its mtime. */
  private def heartbeatLease(spark: SparkSession, path: String,
                             leaseId: String): Unit = {
    val lp = leasePath(path)
    val fs = lp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val holder = readLease(fs, lp)
    if (holder != leaseId) sys.error(
      s"writer lease on $path was taken over (holder '$holder'): this " +
        "maintain lost single-writer ownership and must stop")
    fs.setTimes(lp, System.currentTimeMillis(), -1)
  }

  /** Clean-stop release — only if the lease is still ours. */
  private def releaseLease(spark: SparkSession, path: String,
                           leaseId: String): Unit =
    try {
      liveLeases.remove(leaseId)
      val lp = leasePath(path)
      val fs = lp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(lp) && readLease(fs, lp) == leaseId)
        fs.delete(lp, false)
    } catch { case _: java.io.IOException => () }

  // --------------------------------------------------- incremental delta

  /** The labeling delta for one batch, with every artifact read
    * DELTA-BOUNDED: the algebra of [[Dedup.incrementalComponentsDelta]]
    * (contract and certificate identical — labels are min-ids, the
    * contraction preserves connectivity, the delta is newRows ∪
    * changed members), but the corpus labeling is never scanned.
    * Edge-endpoint labels come from the hb-bucket-pruned base
    * ([[lookupLabelsById]]); changed-component members come from the
    * cb-bucket-pruned byc copy ([[lookupChangedByComponent]]). One
    * census aggregate decides the edge-free fast path AND collects the
    * endpoint bucket set — the probes r16 ran as separate jobs. */
  private[streaming] def incrementalDeltaPruned(
      spark: SparkSession, path: String, batchId: Long, nb: Int,
      batchIds: DataFrame, edgesRaw: DataFrame): DataFrame = {
    val edges = edgesRaw.select(col("src"), col("dst"))
      .localCheckpoint() // delta-sized; feeds census, el, endpoints
    // ONE job: edge count (fast-path decision) + the corpus-endpoint
    // id-bucket set (bounds the base lookup) — collect_set of pmod
    // values holds at most nb ints, and when(…) without otherwise
    // yields null for batch-own endpoints, which collect_set skips
    val census = edges
      .select(explode(array(col("src"), col("dst"))).as("id"))
      .join(batchIds.withColumn("__b", lit(1)), Seq("id"), "left")
      .agg(count(lit(1)).as("n2"),
        collect_set(when(col("__b").isNull,
          pmod(xxhash64(col("id")), lit(nb.toLong)).cast("int")))
          .as("bs"))
      .head()
    // edge-free fast path — the COMMON trickle-batch case in a
    // mostly-unique corpus: no edge means no contraction and no changed
    // member, so the delta is exactly the new ids as singletons
    if (census.getLong(0) == 0L)
      return batchIds.select(col("id"), col("id").as("component"),
        lit(true).as("is_new"))
    val epBuckets = census.getSeq[Int](1).toSet
    val corpusEndpoints = edges
      .select(explode(array(col("src"), col("dst"))).as("id"))
      .join(batchIds, Seq("id"), "left_anti").distinct()
    val epLabels = lookupLabelsById(spark, path, batchId, nb,
      epBuckets, corpusEndpoints)
    // the working labeling is DELTA-BOUNDED — endpoint labels plus the
    // batch's self-labels — where r16 unioned the whole corpus labeling
    val labels = epLabels
      .unionByName(batchIds.select(col("id"), col("id").as("component")))
      .localCheckpoint() // feeds both el endpoint joins
    val el = edges
      .join(labels.select(col("id").as("src"), col("component").as("__ls")),
        Seq("src"))
      .join(labels.select(col("id").as("dst"), col("component").as("__ld")),
        Seq("dst"))
      .select(col("__ls").as("src"), col("__ld").as("dst"))
      .filter(col("src") =!= col("dst"))
      .localCheckpoint() // feeds touched + the fixpoint's joins
    // no isEmpty probe on el (r16 ran one): batch self-labels are the
    // distinct new ids and corpus labels are min-ids of OLD ids, so
    // every edge is label-crossing — el is empty iff edges was, which
    // the census already decided
    val touched = el.select(col("src").as("id"))
      .union(el.select(col("dst").as("id"))).distinct()
    val superOf = Dedup.connectedComponents(touched, el)
      .select(col("id").as("__old"), col("component").as("__sup"))
      .localCheckpoint() // delta-sized; feeds both delta branches
    val chg = superOf.filter(col("__sup") =!= col("__old"))
    // the changed-component bucket set doubles as the emptiness probe:
    // empty ⇒ no existing member is relabeled, skip the byc read
    val cbBuckets = chg
      .select(pmod(xxhash64(col("__old")), lit(nb.toLong)).cast("int"))
      .distinct().collect().map(_.getInt(0)).toSet
    val newRows = batchIds
      .join(superOf.withColumnRenamed("__old", "id"), Seq("id"), "left")
      .select(col("id"),
        coalesce(col("__sup"), col("id")).as("component"),
        lit(true).as("is_new"))
    if (cbBuckets.isEmpty) newRows
    else newRows.unionByName(
      lookupChangedByComponent(spark, path, batchId, cbBuckets, chg))
  }

  // ------------------------------------------------------------- reads

  /** Serve-side: the newest consistent (committed) labeling — the
    * newest-wins fold of the base snapshot and every delta. */
  def readLabels(spark: SparkSession, path: String): DataFrame =
    foldLabels(spark, path, Long.MaxValue)
      .getOrElse(throw new IllegalArgumentException(
        s"no committed labeling generations under $path"))

  /** POINT-LOOKUP serve (r18, VERDICT #5): current labels of the given
    * ids — the common serve shape ("which component is doc X in") —
    * riding the same hb-bucket prune the maintainer uses, so the base
    * read touches only the ids' own bucket directories instead of
    * folding the whole labeling. `ids` must carry an `id` column
    * (cast to long); it is a LOOKUP set — its bucket census runs as a
    * driver-side collect of at most nBuckets ints. Ids absent from the
    * artifact yield no row. Newest-wins equality with [[readLabels]]
    * (and the pruned directory set) is spec-pinned. Requires the
    * artifact's `_meta/nbuckets` (every r17+ artifact has one; for a
    * pre-meta artifact create it by hand, the [[effectiveNBuckets]]
    * recovery story). */
  def lookupLabels(spark: SparkSession, path: String,
                   ids: DataFrame): DataFrame = {
    val metaPath = new Path(s"$path/_meta/nbuckets")
    val fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val nb = (try {
      if (!fs.exists(metaPath)) None
      else {
        val in = fs.open(metaPath)
        val s = try scala.io.Source.fromInputStream(in).mkString.trim
        finally in.close()
        s.toIntOption
      }
    } catch { case _: java.io.IOException => None })
      .getOrElse(throw new IllegalArgumentException(
        s"no readable $metaPath: lookupLabels prunes by the artifact's " +
          "bucket modulus — create the meta by hand for a pre-meta " +
          "artifact, or use readLabels"))
    val idsN = ids.select(col("id").cast("long").as("id"))
    val buckets = idsN
      .select(pmod(xxhash64(col("id")), lit(nb.toLong)).cast("int")
        .as("hb"))
      .distinct().collect().map(_.getInt(0)).toSet
    lookupLabelsById(spark, path, Long.MaxValue, nb, buckets, idsN)
  }

  /** Newest-wins fold of the committed labeling state strictly below
    * `beforeGen`: the base snapshot (if any) plus the delta chain above
    * it. Each row carries the `gen` that wrote it; an id's newest row
    * is its current label (min-ids only ever decrease).
    *
    * Fold SHAPE (every serve): the deltas fold newest-wins among
    * THEMSELVES (a delta-sized shuffle, bounded by compactEvery
    * generations), then the base is LEFT-JOINED against that small
    * side — AQE broadcasts it, so the corpus-sized base is only ever
    * scanned, never shuffled. Ids absent from the base are exactly the
    * delta rows whose generation chain contains an `is_new = true`
    * arrival (the base predates every folded delta, so
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

  /** CURRENT labels of the given (delta-bounded) endpoint ids:
    * newest-wins over the hb-bucket-PRUNED base and the delta chain
    * above it. The base read touches only the `hb=` leaf directories in
    * `idBuckets` — the r16 full-base scan was the last O(corpus) read
    * per micro-batch. The deltas are delta-sized (never bucketed) and
    * read whole; both sides join the small `ids` frame (broadcast)
    * BEFORE the newest-wins aggregate, so the fold shuffles at most
    * |ids| × chain-length rows. */
  private def lookupLabelsById(spark: SparkSession, path: String,
                               beforeGen: Long, nb: Int,
                               idBuckets: Set[Int],
                               ids: DataFrame): DataFrame = {
    val root = s"$path/labels"
    val base = newestBase(spark, root, beforeGen)
    val baseId = base.map(_._1).getOrElse(Long.MinValue)
    val deltaDirs = committed(spark, root, "gen=", beforeGen)
      .filter(_._1 > baseId).map(_._2)
    val parts =
      base.map(_._2).flatMap(prunedBaseRead(spark, _, "hb=", idBuckets))
        .toSeq ++
        (if (deltaDirs.isEmpty) Seq.empty
         else Seq(readUnion(spark, deltaDirs)))
    if (parts.isEmpty)
      ids.select(col("id"), col("id").as("component")).limit(0)
    else parts
      .map(_.select(col("id"), col("component"), col("gen")))
      .reduce(_.unionByName(_))
      .join(ids, Seq("id"))
      .groupBy(col("id"))
      .agg(max_by(col("component"), col("gen")).as("component"))
  }

  /** Rows of the CURRENT labeling (strictly below `beforeGen`) whose
    * component is among the changed ones, relabeled to their
    * super-component (`is_new = false` — arrival detection rides the
    * chain's earlier `is_new = true` rows, exactly as in
    * [[Dedup.incrementalComponentsDelta]]). The corpus-sized portion is
    * served by the COMPONENT-keyed byc snapshot pruned to the changed
    * components' `cb=` buckets; rows newer than the byc watermark come
    * from the delta chain (small), and ids the deltas updated take
    * their delta row instead of a stale base row (left-anti against the
    * delta fold — a broadcast-sized side). Legacy artifacts compacted
    * before the byc copy existed fall back to the labels base,
    * unpruned — correct, just not bounded. */
  private def lookupChangedByComponent(spark: SparkSession, path: String,
                                       beforeGen: Long,
                                       cbBuckets: Set[Int],
                                       chg: DataFrame): DataFrame = {
    val labelsRoot = s"$path/labels"
    val (baseDf, coveredUpTo) =
      newestBase(spark, s"$path/labels_byc", beforeGen) match {
        case Some((id, dir)) =>
          (prunedBaseRead(spark, dir, "cb=", cbBuckets), id)
        case None =>
          val lb = newestBase(spark, labelsRoot, beforeGen)
          (lb.map(b => spark.read.parquet(b._2)),
            lb.map(_._1).getOrElse(Long.MinValue))
      }
    val deltaDirs = committed(spark, labelsRoot, "gen=", beforeGen)
      .filter(_._1 > coveredUpTo).map(_._2)
    val deltaFold =
      if (deltaDirs.isEmpty) None
      else Some(readUnion(spark, deltaDirs)
        .groupBy(col("id"))
        .agg(max_by(col("component"), col("gen")).as("component"))
        .localCheckpoint()) // feeds the member filter AND the anti join
    val chgMap = chg.select(col("__old").as("component"), col("__sup"))
    val fromDelta = deltaFold.map(_.join(chgMap, Seq("component"))
      .select(col("id"), col("__sup").as("component"),
        lit(false).as("is_new")))
    val fromBase = baseDf.map { b =>
      val members = b.select(col("id"), col("component"))
        .join(chgMap, Seq("component"))
      (deltaFold match {
        case None => members
        case Some(d) =>
          members.join(d.select(col("id")), Seq("id"), "left_anti")
      }).select(col("id"), col("__sup").as("component"),
        lit(false).as("is_new"))
    }
    (fromBase.toSeq ++ fromDelta.toSeq).reduceOption(_.unionByName(_))
      .getOrElse(chg.select(col("__old").as("id"),
        col("__sup").as("component"), lit(false).as("is_new")).limit(0))
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
    roots.flatMap(prunedBucketLeaves(spark, _, "hb=", buckets))
  }

  /** The `<prefix><k>` leaf directories of one generation/base root
    * with `k` in the bucket set — the listing both prunes share.
    * Exposed package-private so the spec can measure label-base
    * pruning the same way it measures the shingle prune. */
  private[streaming] def prunedBucketLeaves(spark: SparkSession,
                                            dir: String, prefix: String,
                                            buckets: Set[Int]): Seq[String] = {
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new Path(dir))
      .filter { s =>
        s.isDirectory && s.getPath.getName.startsWith(prefix) &&
          scala.util.Try(s.getPath.getName.stripPrefix(prefix).toInt)
            .toOption.exists(buckets.contains)
      }
      .map(_.getPath.toString).toSeq
  }

  /** Bucket-pruned read of one base directory: only the `<prefix><k>`
    * leaves with `k` in the bucket set. A base with NO bucket leaves at
    * all is a legacy (pre-r17, unpartitioned) layout — read whole,
    * correct but unbounded. None when the base has bucket leaves but
    * none match (no possible row). */
  private def prunedBaseRead(spark: SparkSession, baseDir: String,
                             prefix: String,
                             buckets: Set[Int]): Option[DataFrame] = {
    val fs = new Path(baseDir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val hasBucketLayout = fs.listStatus(new Path(baseDir))
      .exists(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
    if (!hasBucketLayout) Some(spark.read.parquet(baseDir))
    else {
      val leaves = prunedBucketLeaves(spark, baseDir, prefix, buckets)
      if (leaves.isEmpty) None
      else Some(spark.read.option("basePath", baseDir)
        .parquet(leaves: _*))
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
    * re-bucketed row union, labels as the newest-wins snapshot written
    * TWICE (id-keyed `labels/base=`, component-keyed `labels_byc/base=`).
    * Staged under a dot-prefixed temp dir and RENAMED into place; the
    * folded sources are NOT deleted here — the grace period (object
    * doc) leaves them one compaction cycle for in-flight readers of the
    * previous layout, and the next fold's stale sweep removes them.
    * `upTo` must stay strictly below the running batch id —
    * [[maintain]] only folds generations of committed batches. */
  private[streaming] def compact(spark: SparkSession, path: String,
                                 upTo: Long, nb: Int): Unit = {
    foldHalf(spark, s"$path/shingles", upTo) { dirs =>
      (readUnion(spark, dirs), Seq("hb"))
    }
    compactLabels(spark, path, upTo, nb)
  }

  /** The labels-half fold: ONE newest-wins snapshot shuffle (the
    * occasional corpus-sized shuffle belongs here, once per
    * compactEvery batches, never in the per-batch path), written first
    * as the component-keyed byc copy, then re-read and re-bucketed by
    * id for the labels base — a scan instead of a second shuffle. byc
    * renames FIRST: a crash between the renames leaves byc ahead of
    * the labels base, which [[lookupChangedByComponent]] tolerates; a
    * labels base ahead of byc could strand member lookups, so that
    * order never happens. Both targets are replace-renamed because a
    * replayed batch re-runs the same `upTo` fold after a crash. */
  private def compactLabels(spark: SparkSession, path: String,
                            upTo: Long, nb: Int): Unit = {
    val root = s"$path/labels"
    val bycRoot = s"$path/labels_byc"
    val fs = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // hygiene: crashed staging dirs are invisible to reads; sweep them
    for (r <- Seq(root, bycRoot); p = new Path(r) if fs.exists(p))
      fs.listStatus(p)
        .filter(s => s.isDirectory &&
          s.getPath.getName.startsWith(".compact-"))
        .foreach(s => fs.delete(s.getPath, true))
    val base = newestBase(spark, root, upTo + 1)
    val baseId = base.map(_._1).getOrElse(Long.MinValue)
    // stale sweep = the grace period ending: sources folded by the
    // PREVIOUS compaction (≤ its base id) had their cycle; delete them
    (committed(spark, root, "gen=", upTo + 1)
      .filter(_._1 <= baseId).map(_._2) ++
      committed(spark, root, "base=", upTo + 1)
        .filter(_._1 < baseId).map(_._2))
      .foreach(d => fs.delete(new Path(d), true))
    val bycNewest = newestBase(spark, bycRoot, Long.MaxValue)
      .map(_._1).getOrElse(Long.MinValue)
    committed(spark, bycRoot, "base=", Long.MaxValue)
      .filter(_._1 < bycNewest)
      .foreach(d => fs.delete(new Path(d._2), true))
    val gens = committed(spark, root, "gen=", upTo + 1)
      .filter(g => g._1 > baseId && g._1 <= upTo)
    if (gens.nonEmpty) {
      val snapshot = (base.map(_._2).toSeq ++ gens.map(_._2))
        .map(d => spark.read.parquet(d)
          .select(col("id"), col("component"), col("gen")))
        .reduce(_.unionByName(_))
        .groupBy(col("id"))
        .agg(max_by(col("component"), col("gen")).as("component"))
        .withColumn("gen", lit(upTo))
        .withColumn("is_new", lit(false))
      stagedBaseWrite(fs, bycRoot, upTo,
        snapshot.withColumn("cb",
          pmod(xxhash64(col("component")), lit(nb.toLong)).cast("int")),
        Seq("cb"))
      stagedBaseWrite(fs, root, upTo,
        spark.read.parquet(s"$bycRoot/base=$upTo").drop("cb")
          .withColumn("hb",
            pmod(xxhash64(col("id")), lit(nb.toLong)).cast("int")),
        Seq("hb"))
    }
  }

  /** Stage-write `df` and replace-rename it into `root/base=<upTo>`.
    * The replace handles a crashed prior attempt at the SAME `upTo`
    * (batch replay re-runs the fold); a half-written target cannot be
    * observed because reads require _SUCCESS and the rename is the
    * commit point. */
  private def stagedBaseWrite(fs: org.apache.hadoop.fs.FileSystem,
                              root: String, upTo: Long, df: DataFrame,
                              partitionCols: Seq[String]): Unit = {
    val tmp = new Path(root, s".compact-$upTo")
    val writer = df.write.mode("overwrite")
    (if (partitionCols.isEmpty) writer
     else writer.partitionBy(partitionCols: _*)).parquet(tmp.toString)
    val target = new Path(root, s"base=$upTo")
    if (fs.exists(target)) fs.delete(target, true)
    require(fs.rename(tmp, target),
      s"rename of the compacted base into $root failed")
  }

  /** Union of several generation/base directories read ONE ROOT AT A
    * TIME: a single multi-root read trips partition discovery over the
    * mixed `base=`/`gen=` parent names (conflicting-directory-structures),
    * while a per-root read infers each root's own `hb=` partitions
    * correctly and the union is by name. Root counts are bounded by
    * `compactEvery` (plus one grace cycle), so the per-root plan
    * fan-in stays O(1). */
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
    // stale sweep = the previous fold's grace period ending: everything
    // at or below the newest base id is already folded into it and
    // every read skips it — delete now, one cycle after the fold
    val stale = committed(spark, root, "gen=", upTo + 1)
      .filter(_._1 <= baseId).map(_._2) ++
      committed(spark, root, "base=", upTo + 1)
        .filter(_._1 < baseId).map(_._2)
    stale.foreach(d => fs.delete(new Path(d), true))
    val gens = committed(spark, root, "gen=", upTo + 1)
      .filter(g => g._1 > baseId && g._1 <= upTo)
    if (gens.nonEmpty) {
      val (df, partitionCols) = fold(base.map(_._2).toSeq ++ gens.map(_._2))
      stagedBaseWrite(fs, root, upTo, df, partitionCols)
      // grace period: folded sources survive this cycle (object doc)
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

  private def hasHistory(spark: SparkSession, path: String,
                         beforeGen: Long): Boolean = {
    val root = s"$path/labels"
    committed(spark, root, "gen=", beforeGen).nonEmpty ||
      committed(spark, root, "base=", beforeGen).nonEmpty
  }

  /** Any committed generation under ANY artifact half. The labels-only
    * [[hasHistory]] is right for the maintainer (the labeling defines
    * the artifact's state), but the META guard must see layout history
    * a labels check cannot: a crash between the first batch's shingles
    * write and its labels write leaves committed bucketed shingle
    * generations with no labels generation — healing a torn meta to the
    * caller's requested value there would silently mis-bucket pruned
    * reads of that generation under a possibly-different modulus. */
  private def hasLayoutHistory(spark: SparkSession, path: String): Boolean =
    Seq(s"$path/labels", s"$path/shingles", s"$path/labels_byc")
      .exists { root =>
        committed(spark, root, "gen=", Long.MaxValue).nonEmpty ||
          committed(spark, root, "base=", Long.MaxValue).nonEmpty
      }

  // -------------------------------------------------------------- meta

  /** Resolve the artifact's bucket modulus: adopt `path/_meta/nbuckets`
    * when it exists (the layout every persisted `hb=`/`cb=` directory
    * was written under — a different caller value would silently skip
    * joinable corpus buckets), else persist the requested value as the
    * artifact's layout. Single-writer, like the stream itself; the
    * no-overwrite create makes a racing second writer fail loudly. */
  private[streaming] def effectiveNBuckets(spark: SparkSession, path: String,
                                           requested: Int): Int = {
    val metaPath = new Path(s"$path/_meta/nbuckets")
    val fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(metaPath)) {
      // An unparseable or unreadable meta (0-byte, truncated digits, or
      // a checksum mismatch from a torn local-fs write) can only be a
      // crash leftover. If no bucketed directory was ever committed the
      // layout is unambiguous — adopt the requested value and heal the
      // meta; if history EXISTS its modulus is unknowable, so fail with
      // the recovery story instead of a bare NumberFormatException (or
      // ChecksumException) at every restart.
      val parsed = try {
        val in = fs.open(metaPath)
        val s = try scala.io.Source.fromInputStream(in).mkString.trim
        finally in.close()
        s.toIntOption
      } catch { case _: java.io.IOException => None }
      parsed match {
        case Some(nb) => nb
        case None if !hasLayoutHistory(spark, path) =>
          fs.delete(metaPath, false)
          writeNBucketsMeta(fs, metaPath, requested)
          requested
        case None => sys.error(
          s"corrupt nbuckets meta at $metaPath with committed " +
            "generations present: " +
            "the artifact's bucket modulus is unrecoverable from meta; " +
            "pass the original nBuckets and recreate the file by hand, " +
            "or rebuild the artifact")
      }
    } else if (hasLayoutHistory(spark, path)) {
      // committed generations but NO meta: a pre-meta (legacy) artifact
      // whose layout modulus only its original caller knows. Silently
      // persisting the requested value would bless a possibly-different
      // modulus and mis-bucket every prune — exactly the bug the meta
      // exists to prevent — so demand the one-time manual ack.
      sys.error(
        s"$path has committed generations but no $metaPath (a pre-meta " +
          "artifact): create the file by hand with the nBuckets the " +
          "artifact was originally maintained under, or rebuild")
    } else {
      writeNBucketsMeta(fs, metaPath, requested)
      requested
    }
  }

  /** Stage-and-rename the meta write: a crash mid-write must never leave
    * a torn `nbuckets` (e.g. "1" of "16") that a restart would adopt as
    * a WRONG modulus and silently mis-bucket every prune. */
  private def writeNBucketsMeta(fs: org.apache.hadoop.fs.FileSystem,
                                metaPath: Path, value: Int): Unit = {
    val tmp = new Path(metaPath.getParent,
      s".nbuckets.tmp-${java.util.UUID.randomUUID}")
    val out = fs.create(tmp, false)
    try out.write(value.toString.getBytes("UTF-8"))
    finally out.close()
    // no-overwrite rename: if a racing writer committed first, ADOPT is
    // only safe when its value matches ours — the artifact is
    // single-writer by contract, so a mismatch is a configuration error
    // that must fail loudly, not a prune that silently skips buckets
    if (!fs.rename(tmp, metaPath)) {
      fs.delete(tmp, false)
      require(fs.exists(metaPath),
        s"meta rename failed without a committed $metaPath")
      val in = fs.open(metaPath)
      val committed =
        try scala.io.Source.fromInputStream(in).mkString.trim
        finally in.close()
      require(committed == value.toString,
        s"a racing writer committed nbuckets=$committed at $metaPath " +
          s"while this maintain requested $value — the artifact is " +
          "single-writer; align the callers")
    }
  }
}
