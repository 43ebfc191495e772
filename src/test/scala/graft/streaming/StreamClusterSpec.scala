package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.operators.Dedup

/** The continuously maintained clustering artifact must equal the full
  * batch closure over every document fed so far, after every
  * micro-batch — including the bridge case where a later doc merges two
  * components formed in an earlier batch. */
class StreamClusterSpec extends SparkSpec {

  // near-dup families: docs sharing a body string are Jaccard-1 pairs;
  // distinct bodies share no 3-shingle
  private val bodyA = "alpha beta gamma delta epsilon zeta"
  private val bodyB = "one two three four five six seven"
  private val bodyC = "red orange yellow green blue indigo"

  private def fullClosure(docs: Seq[(Long, String)],
                          threshold: Double = 0.5): Map[Long, Long] = {
    import spark.implicits._
    val df = docs.toDF("doc_id", "text")
    val edges = Dedup.ngramJaccardPairs(df, "doc_id", "text",
        n = 3, threshold = threshold)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    Dedup.connectedComponents(
        df.select(col("doc_id").as("id")), edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def labels(path: String): Map[Long, Long] =
    StreamCluster.readLabels(spark, path)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("labeling == full closure after every batch; a later doc bridges " +
    "two earlier components") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val path = Files.createTempDirectory("stream_cluster").toString
    val ckpt = Files.createTempDirectory("stream_cluster_ck").toString
    val mem = MemoryStream[(Long, String)]
    val query = StreamCluster.maintain(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", path, ckpt)
    try {
      // batch 1: components {1,2} (bodyA) and {3,4} (bodyB), singleton 5
      val b1 = Seq(1L -> bodyA, 2L -> bodyA, 3L -> bodyB, 4L -> bodyB,
        5L -> bodyC)
      mem.addData(b1)
      query.processAllAvailable()
      assert(labels(path) === fullClosure(b1))
      assert(labels(path)(2L) === 1L)
      assert(labels(path)(4L) === 3L)
      // batch 2: doc 6 joins the earlier bodyA component, doc 7 joins
      // singleton 5's bodyC; the 9~10 pair clusters inside the batch
      val b2 = Seq(6L -> bodyA, 7L -> bodyC, 9L -> "w x y z q r s",
        10L -> "w x y z q r s")
      mem.addData(b2)
      query.processAllAvailable()
      val all = b1 ++ b2
      assert(labels(path) === fullClosure(all))
      assert(labels(path)(6L) === 1L) // joined the earlier component
      assert(labels(path)(7L) === 5L)
      assert(labels(path)(10L) === 9L) // batch-internal pair
      // batch 3: more members of the first component — three
      // generations deep, the labeling must still equal the closure
      val b3 = Seq(11L -> bodyA, 12L -> bodyA)
      mem.addData(b3)
      query.processAllAvailable()
      assert(labels(path) === fullClosure(all ++ b3))
    } finally query.stop()
  }

  test("a partial (uncommitted) generation from a crashed write is " +
    "invisible: serve reads keep the previous consistent labeling") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val path = Files.createTempDirectory("stream_cluster_crash").toString
    val ckpt = Files.createTempDirectory("stream_cluster_crash_ck").toString
    val mem = MemoryStream[(Long, String)]
    val query = StreamCluster.maintain(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", path, ckpt)
    try {
      mem.addData(Seq(1L -> bodyA, 2L -> bodyA))
      query.processAllAvailable()
      val committed = labels(path)
      assert(committed === Map(1L -> 1L, 2L -> 1L))
      // simulate a crash mid-write of a NEWER generation: a directory
      // with data but no _SUCCESS marker
      val partial = java.nio.file.Paths.get(path, "labels", "gen=99")
      Files.createDirectories(partial)
      Files.write(partial.resolve("part-junk.parquet"),
        Array[Byte](1, 2, 3))
      assert(labels(path) === committed,
        "serve read leaked a partial generation")
    } finally query.stop()
  }

  test("labels generations are DELTAS: a batch that leaves old components " +
    "untouched writes only its new/changed rows, never a corpus snapshot") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val path = Files.createTempDirectory("stream_cluster_delta").toString
    val ckpt = Files.createTempDirectory("stream_cluster_delta_ck").toString
    val mem = MemoryStream[(Long, String)]
    val query = StreamCluster.maintain(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", path, ckpt)
    try {
      val b1 = Seq(1L -> bodyA, 2L -> bodyA, 3L -> bodyB, 4L -> bodyB,
        5L -> bodyC)
      mem.addData(b1)
      query.processAllAvailable()
      // batch 2: 6 joins component 1 (label 1 — no existing row changes,
      // min stays 1), 7 joins component 5, 9~10 pair internally: the
      // delta is exactly the four NEW ids, not the 9-doc corpus
      val b2 = Seq(6L -> bodyA, 7L -> bodyC, 9L -> "w x y z q r s",
        10L -> "w x y z q r s")
      mem.addData(b2)
      query.processAllAvailable()
      val deltaRows = spark.read
        .parquet(s"$path/labels/gen=1").collect()
      assert(deltaRows.length === 4,
        s"expected a 4-row delta, got ${deltaRows.length}")
      assert(deltaRows.map(_.getLong(0)).toSet === Set(6L, 7L, 9L, 10L))
      assert(labels(path) === fullClosure(b1 ++ b2))
    } finally query.stop()
  }

  test("generation compaction bounds the directory count under a long " +
    "feed, labels stay equal to the closure, and the bucketed probe " +
    "prunes to the batch's own buckets") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val path = Files.createTempDirectory("stream_cluster_compact").toString
    val ckpt = Files.createTempDirectory("stream_cluster_compact_ck").toString
    val mem = MemoryStream[(Long, String)]
    val query = StreamCluster.maintain(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", path, ckpt,
      nBuckets = 4, compactEvery = 2)
    val bodies = Seq(bodyA, bodyB, bodyC, "p q r s t u v", bodyA,
      "m n o p q r s", bodyB, "j k l m n o p")
    try {
      var fed = Seq.empty[(Long, String)]
      bodies.zipWithIndex.foreach { case (b, i) =>
        val doc = Seq((i + 1).toLong -> b)
        fed = fed ++ doc
        mem.addData(doc)
        query.processAllAvailable()
        assert(labels(path) === fullClosure(fed),
          s"labeling drifted from the closure after batch $i")
      }
      def dirCount(half: String): Int =
        new java.io.File(s"$path/$half").listFiles()
          .count(f => f.isDirectory &&
            (f.getName.startsWith("gen=") || f.getName.startsWith("base=")))
      // compactEvery=2 folds pairs of generations into one base as the
      // feed advances; folded sources survive ONE grace cycle (r17), so
      // the steady-state bound is previous-base + its folded gens +
      // new base + fresh gens ≈ 2·compactEvery + 3, not 8-and-growing
      assert(dirCount("shingles") <= 7,
        s"shingle generations unbounded: ${dirCount("shingles")} dirs")
      assert(dirCount("labels") <= 7,
        s"label generations unbounded: ${dirCount("labels")} dirs")
      // the labels base is hb-bucketed (r17): the per-batch endpoint
      // lookup reads only the endpoint ids' buckets — measure the prune
      // exactly as for shingles
      val labelBases = new java.io.File(s"$path/labels").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("base="))
        .map(_.getName.stripPrefix("base=").toLong)
      assert(labelBases.nonEmpty, "no labels base after 8 batches")
      val newestLabelBase = s"$path/labels/base=${labelBases.max}"
      val allLeaves = StreamCluster.prunedBucketLeaves(spark,
        newestLabelBase, "hb=", Set(0, 1, 2, 3))
      val oneLeaf = StreamCluster.prunedBucketLeaves(spark,
        newestLabelBase, "hb=", allLeaves.map(l =>
          l.substring(l.lastIndexOf("hb=") + 3).toInt).toSet.take(1))
      assert(allLeaves.nonEmpty, "labels base is not hb-bucketed")
      assert(oneLeaf.size < allLeaves.size || allLeaves.size == 1,
        s"label-base bucket prune did not reduce the scan: " +
          s"${oneLeaf.size} of ${allLeaves.size}")
      // the component-keyed secondary copy exists and is cb-bucketed
      val bycBases = new java.io.File(s"$path/labels_byc").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("base="))
      assert(bycBases.nonEmpty, "no component-keyed byc base")
      assert(bycBases.maxBy(_.getName.stripPrefix("base=").toLong)
        .listFiles().exists(_.getName.startsWith("cb=")),
        "byc base is not cb-bucketed")
      // the probe prune: a batch touching one bucket reads only that
      // bucket's directories, a strict subset of the full corpus index
      val all = StreamCluster.prunedShingleDirs(spark, path,
        Long.MaxValue, Set(0, 1, 2, 3), nBuckets = 4)
      val one = StreamCluster.prunedShingleDirs(spark, path,
        Long.MaxValue, Set(2), nBuckets = 4)
      assert(one.forall(_.contains("hb=2")))
      assert(one.nonEmpty && one.size < all.size,
        s"bucket prune did not reduce the scan: ${one.size} of ${all.size}")
      // the serve fold's SHAPE: base ⟕ folded-deltas as a BROADCAST
      // join (the corpus side is scanned, never shuffled) — a revert to
      // the corpus-sized groupBy fold has no join at all, and a
      // sort-merge join here means the base got exchanged
      val served = StreamCluster.readLabels(spark, path)
      served.collect() // finalize the adaptive plan
      val plan = served.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"serve fold lost its broadcast base-join shape:\n$plan")
      assert(!plan.contains("SortMergeJoin"),
        s"serve fold shuffles the base snapshot:\n$plan")
    } finally query.stop()
  }

  test("restart from checkpoint replays the same batch id end-to-end " +
    "through the engine: generation overwrite is idempotent, including " +
    "after a mid-artifact kill") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val path = Files.createTempDirectory("stream_cluster_restart").toString
    val ckpt = Files.createTempDirectory("stream_cluster_restart_ck").toString
    val mem = MemoryStream[(Long, String)]
    def start() = StreamCluster.maintain(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", path, ckpt)
    val b1 = Seq(1L -> bodyA, 2L -> bodyA, 3L -> bodyB)
    val b2 = Seq(4L -> bodyB, 5L -> bodyC)
    val q1 = start()
    try {
      mem.addData(b1)
      q1.processAllAvailable()
      mem.addData(b2)
      q1.processAllAvailable()
      assert(labels(path) === fullClosure(b1 ++ b2))
    } finally q1.stop()
    // stop() returns once the query is terminated, but deregistration
    // from the session's active set can lag a beat — the engine rejects
    // a second query on the same checkpoint while the first lingers
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (spark.streams.active.nonEmpty && System.nanoTime() < deadline)
      Thread.sleep(50)
    // crash simulation: batch 1's engine commit never landed (delete the
    // commit log entry) and its artifact write was killed mid-flight
    // (labels generation gone entirely, shingles generation still there
    // — the worst half-written state the write order allows)
    assert(Files.deleteIfExists(
      java.nio.file.Paths.get(ckpt, "commits", "1")))
    // the local ChecksumFileSystem keeps a .1.crc sidecar; left behind it
    // makes the replayed batch's atomic commit-rename throw
    // FileAlreadyExists ("multiple streaming queries are concurrently
    // using ..."). A real HDFS/S3 crash loses both together.
    Files.deleteIfExists(java.nio.file.Paths.get(ckpt, "commits", ".1.crc"))
    def rmr(p: java.nio.file.Path): Unit = {
      if (Files.isDirectory(p))
        Files.list(p).forEach(rmr(_))
      Files.deleteIfExists(p); ()
    }
    rmr(java.nio.file.Paths.get(path, "labels", "gen=1"))
    // the engine must now replay batch 1 from the checkpoint with the
    // SAME offsets, and the generation overwrite must reconverge the
    // artifact to the exact same labeling
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(labels(path) === fullClosure(b1 ++ b2),
        "replayed batch did not reconverge the artifact")
      // and the stream continues normally past the replay
      val b3 = Seq(6L -> bodyA)
      mem.addData(b3)
      q2.processAllAvailable()
      assert(labels(path) === fullClosure(b1 ++ b2 ++ b3))
      assert(labels(path)(6L) === 1L)
    } finally q2.stop()
  }

  test("a genuine cross-component bridge merges two earlier components") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val path = Files.createTempDirectory("stream_cluster_b").toString
    val ckpt = Files.createTempDirectory("stream_cluster_b_ck").toString
    val mem = MemoryStream[(Long, String)]
    val query = StreamCluster.maintain(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", path, ckpt,
      threshold = 0.3)
    try {
      // components {20} and {30} from distinct bodies
      val b1 = Seq(20L -> bodyA, 30L -> bodyB)
      mem.addData(b1)
      query.processAllAvailable()
      assert(labels(path) === Map(20L -> 20L, 30L -> 30L))
      // doc 10 = bodyA ++ bodyB (13 tokens → 11 shingles, including the
      // two crossing ones): jaccard vs the pure-A doc is 4/11 ≈ 0.364
      // and vs the pure-B doc 5/11 ≈ 0.455 — both above the 0.3
      // threshold, neither pure doc pairs with the other — ONE delta
      // doc merges two existing components through the reduced graph
      val b2 = Seq(10L -> s"$bodyA $bodyB")
      mem.addData(b2)
      query.processAllAvailable()
      val got = labels(path)
      assert(got === fullClosure(b1 ++ b2, threshold = 0.3))
      assert(got(20L) === got(30L) && got(20L) === 10L,
        s"bridge did not merge the components: $got")
    } finally query.stop()
  }

  test("compaction grace period: folded sources survive the fold that " +
    "folded them (reads skip via the watermark) and the NEXT compaction " +
    "sweeps them; a stale pre-base layout never corrupts the labeling") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val path = Files.createTempDirectory("stream_cluster_grace").toString
    val ckpt = Files.createTempDirectory("stream_cluster_grace_ck").toString
    val mem = MemoryStream[(Long, String)]
    val query = StreamCluster.maintain(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", path, ckpt,
      nBuckets = 4, compactEvery = 2)
    def genIds(half: String): Set[Long] =
      Option(new java.io.File(s"$path/$half").listFiles()).toSeq.flatten
        .filter(f => f.isDirectory && f.getName.startsWith("gen="))
        .map(_.getName.stripPrefix("gen=").toLong).toSet
    try {
      var fed = Seq.empty[(Long, String)]
      def feed(docs: (Long, String)*): Unit = {
        fed = fed ++ docs; mem.addData(docs)
        query.processAllAvailable()
        assert(labels(path) === fullClosure(fed))
      }
      feed(1L -> bodyA); feed(2L -> bodyA) // batches 0, 1
      feed(3L -> bodyB) // batch 2 folds {0,1} into base=1
      // grace: the folded sources are still on disk after the fold…
      assert(genIds("labels").intersect(Set(0L, 1L)) === Set(0L, 1L),
        "grace period violated: folded label gens deleted immediately")
      assert(genIds("shingles").intersect(Set(0L, 1L)) === Set(0L, 1L),
        "grace period violated: folded shingle gens deleted immediately")
      feed(4L -> bodyC) // batch 3
      feed(5L -> bodyA) // batch 4 folds {2,3} into base=3 + sweeps ≤1
      assert(genIds("labels").intersect(Set(0L, 1L)) === Set.empty[Long],
        "stale sweep missed the previous cycle's folded label gens")
      assert(genIds("shingles").intersect(Set(0L, 1L)) === Set.empty[Long],
        "stale sweep missed the previous cycle's folded shingle gens")
      // …and the labeling stayed the closure throughout (asserted per
      // feed) including while stale dirs coexisted with the base
      feed(6L -> bodyB)
    } finally query.stop()
  }

  test("crash between the byc and labels-base renames (byc AHEAD) is " +
    "tolerated: lookups stay exact and the next compaction reconverges") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val path = Files.createTempDirectory("stream_cluster_byccrash").toString
    val ckpt = Files.createTempDirectory("stream_cluster_bycc_ck").toString
    val mem = MemoryStream[(Long, String)]
    val query = StreamCluster.maintain(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", path, ckpt,
      threshold = 0.3, nBuckets = 4, compactEvery = 2)
    def rmr(p: java.nio.file.Path): Unit = {
      if (Files.isDirectory(p)) Files.list(p).forEach(rmr(_))
      Files.deleteIfExists(p); ()
    }
    try {
      var fed = Seq.empty[(Long, String)]
      def feed(docs: (Long, String)*): Unit = {
        fed = fed ++ docs; mem.addData(docs)
        query.processAllAvailable()
      }
      feed(1L -> bodyA, 2L -> bodyA, 3L -> bodyB) // batch 0
      feed(4L -> bodyB) // batch 1
      feed(5L -> bodyC) // batch 2 compacts {0,1} into base=1 (labels+byc)
      val lb = new java.io.File(s"$path/labels").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("base="))
      assert(lb.nonEmpty, "fixture: expected a compacted labels base")
      // simulate the crash window: byc/base landed, labels/base did not
      // (the write order guarantees this is the ONLY possible skew) —
      // the folded gens are still present thanks to the grace period,
      // so the id-keyed lookups fall back to them
      lb.foreach(d => rmr(d.toPath))
      assert(labels(path) === fullClosure(fed, threshold = 0.3),
        "serve read wrong in the byc-ahead crash window")
      // a BRIDGE doc merges components 1 (bodyA) and 3 (bodyB) inside
      // the crash window: endpoint labels resolve by id against the
      // surviving gens, and component 3's members relabel through the
      // byc copy + the gen=2 delta — BOTH pruned lookups exercised
      feed(6L -> s"$bodyA $bodyB")
      val got = labels(path)
      assert(got === fullClosure(fed, threshold = 0.3),
        "maintainer lookups wrong in the byc-ahead crash window")
      assert(got(3L) === 1L && got(4L) === 1L,
        s"changed-member relabel missed in the crash window: $got")
      // and enough further batches to re-trigger compaction reconverge
      feed(7L -> bodyC); feed(8L -> bodyA)
      assert(labels(path) === fullClosure(fed, threshold = 0.3))
      assert(new java.io.File(s"$path/labels").listFiles()
        .exists(f => f.isDirectory && f.getName.startsWith("base=")),
        "compaction did not rebuild the labels base after the crash")
    } finally query.stop()
  }

  test("nBuckets is persisted on first maintain and ADOPTED on restart: " +
    "a different caller value cannot skew the bucket prune") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val path = Files.createTempDirectory("stream_cluster_meta").toString
    val ckpt = Files.createTempDirectory("stream_cluster_meta_ck").toString
    val mem = MemoryStream[(Long, String)]
    val b1 = Seq(1L -> bodyA, 2L -> bodyA, 3L -> bodyB)
    val q1 = StreamCluster.maintain(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", path, ckpt,
      nBuckets = 4, compactEvery = 2)
    try {
      mem.addData(b1); q1.processAllAvailable()
    } finally q1.stop()
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (spark.streams.active.nonEmpty && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(new String(Files.readAllBytes(
      java.nio.file.Paths.get(path, "_meta", "nbuckets"))).trim === "4")
    // restart with a DIFFERENT nBuckets: the artifact's modulus must win
    // (a caller-side 8 against hb= dirs written mod 4 would silently
    // skip joinable buckets); the closure equality is the observable
    assert(StreamCluster.effectiveNBuckets(spark, path, 8) === 4)
    val q2 = StreamCluster.maintain(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", path, ckpt,
      nBuckets = 8, compactEvery = 2)
    try {
      val b2 = Seq(4L -> bodyA, 5L -> bodyB, 6L -> bodyC)
      mem.addData(b2); q2.processAllAvailable()
      assert(labels(path) === fullClosure(b1 ++ b2))
      assert(labels(path)(4L) === 1L && labels(path)(5L) === 3L)
      assert(new String(Files.readAllBytes(
        java.nio.file.Paths.get(path, "_meta", "nbuckets"))).trim === "4",
        "restart overwrote the artifact's layout modulus")
    } finally q2.stop()
  }

  test("a torn/empty nbuckets meta heals to the requested value when no " +
    "history exists, and fails with the recovery story when committed " +
    "generations are present (never a bare NumberFormatException)") {
    val path = Files.createTempDirectory("stream_cluster_meta_torn").toString
    val metaDir = java.nio.file.Paths.get(path, "_meta")
    Files.createDirectories(metaDir)
    // a pre-staged-write crash could leave a 0-byte (or digit-truncated)
    // meta; with no committed layout the value is unambiguous — heal it
    Files.write(metaDir.resolve("nbuckets"), Array.emptyByteArray)
    assert(StreamCluster.effectiveNBuckets(spark, path, 8) === 8)
    assert(new String(Files.readAllBytes(
      metaDir.resolve("nbuckets"))).trim === "8", "meta not healed")
    // corrupt meta WITH a committed generation: the modulus every hb=
    // dir was written under is unknowable — restart must fail loudly,
    // not adopt a guess and silently mis-bucket the prune
    Files.write(metaDir.resolve("nbuckets"), "1x".getBytes("UTF-8"))
    val gen = java.nio.file.Paths.get(path, "labels", "gen=0")
    Files.createDirectories(gen)
    Files.write(gen.resolve("_SUCCESS"), Array.emptyByteArray)
    val e = intercept[RuntimeException](
      StreamCluster.effectiveNBuckets(spark, path, 8))
    assert(e.getMessage.contains("nbuckets"))
    assert(!e.isInstanceOf[NumberFormatException])
    // MISSING meta with committed history (a pre-meta legacy artifact):
    // silently persisting the caller's value would bless a possibly
    // different modulus — restart must demand the manual ack instead
    Files.delete(metaDir.resolve("nbuckets"))
    val e2 = intercept[RuntimeException](
      StreamCluster.effectiveNBuckets(spark, path, 8))
    assert(e2.getMessage.contains("pre-meta"))
  }

  test("the meta guard sees SHINGLES-only history (ADVICE r17): a crash " +
    "between the first batch's shingles write and its labels write must " +
    "not let a torn meta heal to the caller's value — the committed " +
    "bucketed shingle generation was written under the old modulus") {
    val path = Files.createTempDirectory("stream_cluster_meta_shingles").toString
    val metaDir = java.nio.file.Paths.get(path, "_meta")
    Files.createDirectories(metaDir)
    Files.write(metaDir.resolve("nbuckets"), Array.emptyByteArray) // torn
    // committed shingles generation, NO labels generation — exactly the
    // crash window between the two writes of the first batch
    val gen = java.nio.file.Paths.get(path, "shingles", "gen=0")
    Files.createDirectories(gen)
    Files.write(gen.resolve("_SUCCESS"), Array.emptyByteArray)
    val e = intercept[RuntimeException](
      StreamCluster.effectiveNBuckets(spark, path, 8))
    assert(e.getMessage.contains("nbuckets"),
      "torn meta healed despite committed shingle history")
    // same blindness check for the MISSING-meta legacy guard: byc-only
    // history (labels_byc committed, labels swept) must also demand ack
    val path2 = Files.createTempDirectory("stream_cluster_meta_byc").toString
    val byc = java.nio.file.Paths.get(path2, "labels_byc", "base=3")
    Files.createDirectories(byc)
    Files.write(byc.resolve("_SUCCESS"), Array.emptyByteArray)
    val e2 = intercept[RuntimeException](
      StreamCluster.effectiveNBuckets(spark, path2, 8))
    assert(e2.getMessage.contains("pre-meta"))
  }

  test("writer lease (r18): a second concurrent maintain on the same " +
    "path fails loudly; a clean stop releases; a crashed (stale) lease " +
    "is reclaimed; a live foreign lease blocks") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val path = Files.createTempDirectory("stream_cluster_lease").toString
    val ckpt = Files.createTempDirectory("stream_cluster_lease_ck").toString
    val mem = MemoryStream[(Long, String)]
    val q1 = StreamCluster.maintain(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", path, ckpt)
    try {
      mem.addData(Seq(1L -> bodyA, 2L -> bodyB)); q1.processAllAvailable()
      // second maintain while the first is LIVE: must throw at acquire
      val ckpt2 = Files.createTempDirectory("stream_cluster_lease_ck2").toString
      val e = intercept[RuntimeException](StreamCluster.maintain(
        mem.toDF().toDF("doc_id", "text"), "doc_id", "text", path, ckpt2))
      assert(e.getMessage.contains("single-writer"),
        s"concurrent maintain did not fail as a lease conflict: $e")
      assert(q1.isActive, "the lease conflict must not kill the holder")
    } finally q1.stop()
    // clean stop: an immediate restart reclaims (in-JVM ledger) and the
    // artifact keeps extending correctly
    val q2 = StreamCluster.maintain(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", path, ckpt)
    try {
      mem.addData(Seq(3L -> bodyA)); q2.processAllAvailable()
      assert(labels(path) ===
        fullClosure(Seq(1L -> bodyA, 2L -> bodyB, 3L -> bodyA)))
    } finally q2.stop()
    // crashed writer: a FOREIGN lease (unknown holder id — another JVM)
    // with a stale heartbeat is reclaimed; a fresh one blocks.
    // QUIESCE q2's ASYNC release first — its listener's delete must not
    // race the foreign plant (flaked once under the full parallel
    // suite) — then plant on a clean slate (no stale Hadoop .crc
    // sidecar either, so the engine reads exactly what we wrote).
    val lease = java.nio.file.Paths.get(path, "_meta", "lease")
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (Files.exists(lease) && System.nanoTime() < deadline)
      Thread.sleep(50)
    Files.deleteIfExists(lease)
    Files.deleteIfExists(java.nio.file.Paths.get(path, "_meta", ".lease.crc"))
    Files.write(lease, "foreign-jvm-holder".getBytes("UTF-8"))
    val attempt = scala.util.Try(StreamCluster.maintain(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", path,
      Files.createTempDirectory("ck3").toString))
    attempt.foreach(_.stop()) // never leak a rogue query into later tests
    assert(attempt.isFailure &&
      attempt.failed.get.getMessage.contains("single-writer"),
      s"fresh foreign lease did not block: $attempt; lease exists=" +
        s"${Files.exists(lease)} content='${
          if (Files.exists(lease))
            new String(Files.readAllBytes(lease)).trim else ""}'")
    assert(lease.toFile.setLastModified(
      System.currentTimeMillis() - 2L * 60 * 60 * 1000))
    val q3 = StreamCluster.maintain(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", path, ckpt)
    try {
      assert(new String(Files.readAllBytes(lease)).trim
        != "foreign-jvm-holder", "stale lease not reclaimed")
      mem.addData(Seq(4L -> bodyC)); q3.processAllAvailable()
      assert(labels(path)(4L) === 4L)
    } finally q3.stop()
  }

  test("writer lease survives an IDLE stream: with no batches arriving " +
    "for longer than the staleness window, the heartbeat thread keeps " +
    "the lease fresh and a second maintain still fails") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val path = Files.createTempDirectory("stream_cluster_idle").toString
    val ckpt = Files.createTempDirectory("stream_cluster_idle_ck").toString
    val mem = MemoryStream[(Long, String)]
    val q = StreamCluster.maintain(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", path, ckpt,
      leaseStaleMs = 3000)
    try {
      mem.addData(Seq(1L -> bodyA)); q.processAllAvailable()
      Thread.sleep(8000) // idle well past the 3 s staleness window
      val e = intercept[RuntimeException](StreamCluster.maintain(
        mem.toDF().toDF("doc_id", "text"), "doc_id", "text", path,
        Files.createTempDirectory("idle_ck2").toString,
        leaseStaleMs = 3000))
      assert(e.getMessage.contains("single-writer"),
        "an idle stream's lease went stale and was stolen")
      assert(q.isActive)
      mem.addData(Seq(2L -> bodyB)); q.processAllAvailable()
      assert(labels(path) === fullClosure(Seq(1L -> bodyA, 2L -> bodyB)))
    } finally q.stop()
  }

  test("commit fence (r19): a writer deposed MID-BATCH — after batch " +
    "start, before the labels write — throws at the fence, lands no " +
    "labels generation, and the artifact serves the new writer's chain " +
    "only") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val path = Files.createTempDirectory("stream_cluster_fence").toString
    val ckpt = Files.createTempDirectory("stream_cluster_fence_ck").toString
    val lease = java.nio.file.Paths.get(path, "_meta", "lease")
    val mem = MemoryStream[(Long, String)]
    val q1 = StreamCluster.maintain(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", path, ckpt)
    try {
      // the takeover fires exactly where the fence exists for: after
      // the batch-start ownership check passed and the shingles landed,
      // immediately before the serve-visible labels commit — as if the
      // batch outlived the staleness window and a second maintain
      // reclaimed (delete + create with its own id), then went stale
      // itself so a later writer can acquire
      StreamCluster.testBeforeLabelsCommit = () => {
        Files.deleteIfExists(lease)
        Files.deleteIfExists(
          java.nio.file.Paths.get(path, "_meta", ".lease.crc"))
        Files.write(lease, "mid-batch-takeover-holder".getBytes("UTF-8"))
        assert(lease.toFile.setLastModified(
          System.currentTimeMillis() - 20L * 60 * 1000))
      }
      mem.addData(Seq(1L -> bodyA, 2L -> bodyA))
      val e = intercept[Exception](q1.processAllAvailable())
      def mentions(t: Throwable): Boolean = t != null &&
        (Option(t.getMessage).exists(_.contains("taken over")) ||
          mentions(t.getCause))
      assert(mentions(e),
        s"deposed writer did not die at the commit fence: $e")
      // the deposed batch's labels generation must NOT exist — its
      // shingles may (they are inert: serve reads key on labels)
      assert(!new java.io.File(path, "labels").exists,
        "a deposed writer landed a serve-visible labels generation")
    } finally {
      StreamCluster.testBeforeLabelsCommit = () => ()
      q1.stop()
    }
    // the takeover lease is stale: a fresh maintain acquires and its
    // chain is the ONLY thing the artifact serves
    val mem2 = MemoryStream[(Long, String)]
    val q2 = StreamCluster.maintain(
      mem2.toDF().toDF("doc_id", "text"), "doc_id", "text", path,
      Files.createTempDirectory("stream_cluster_fence_ck2").toString)
    try {
      mem2.addData(Seq(10L -> bodyB, 11L -> bodyB))
      q2.processAllAvailable()
      assert(labels(path) === Map(10L -> 10L, 11L -> 10L),
        "artifact must serve exactly the new writer's chain")
    } finally q2.stop()
  }

  test("lookupLabels (r18): point lookups equal readLabels newest-wins " +
    "and touch ONLY the ids' own hb buckets — the complement's base " +
    "directories can be unreadable garbage") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val path = Files.createTempDirectory("stream_cluster_lookup").toString
    val ckpt = Files.createTempDirectory("stream_cluster_lookup_ck").toString
    val mem = MemoryStream[(Long, String)]
    val fed = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val q = StreamCluster.maintain(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text", path, ckpt,
      nBuckets = 4, compactEvery = 2)
    try {
      // several batches through a compaction so a bucketed BASE exists,
      // plus deltas above it (the lookup folds base + chain)
      Seq(Seq(1L -> bodyA, 2L -> bodyA, 3L -> bodyB),
        Seq(4L -> bodyB, 5L -> bodyC),
        Seq(6L -> bodyA),
        Seq(7L -> bodyC, 8L -> bodyB)).foreach { b =>
        fed ++= b; mem.addData(b); q.processAllAvailable()
      }
      val all = labels(path)
      val ids = Seq(1L, 4L, 7L)
      val got = StreamCluster.lookupLabels(spark, path, ids.toDF("id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === ids.map(i => i -> all(i)).toMap,
        "lookupLabels disagrees with readLabels")
      // an id the artifact never saw yields no row
      assert(StreamCluster.lookupLabels(spark, path,
        Seq(999L).toDF("id")).collect().isEmpty)
      // PRUNE PIN: poison every labels/base hb bucket OUTSIDE the ids'
      // own set — a lookup that reads them now fails on garbage parquet
      import org.apache.spark.sql.functions.{pmod, xxhash64, lit}
      val wanted = ids.toDF("id")
        .select(pmod(xxhash64(col("id")), lit(4L)).cast("int").as("b"))
        .distinct().collect().map(_.getInt(0)).toSet
      assert(wanted.size < 4, "test ids cover every bucket — weaken ids")
      val labelsRoot = new java.io.File(path, "labels")
      val bases = labelsRoot.listFiles.filter(_.getName.startsWith("base="))
      assert(bases.nonEmpty, "no compacted base — raise the batch count")
      for (base <- bases; hb <- base.listFiles
             if hb.getName.startsWith("hb=") &&
               !wanted.contains(hb.getName.stripPrefix("hb=").toInt);
           f <- hb.listFiles if f.getName.endsWith(".parquet"))
        Files.write(f.toPath, "not parquet".getBytes("UTF-8"))
      val gotPruned = StreamCluster.lookupLabels(spark, path, ids.toDF("id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotPruned === ids.map(i => i -> all(i)).toMap,
        "lookup read (or lost) buckets outside the ids' own set")
    } finally q.stop()
  }
}
