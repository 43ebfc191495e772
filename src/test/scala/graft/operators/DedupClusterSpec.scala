package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Connected components over duplicate-pair graphs (Dedup.connectedComponents). */
class DedupClusterSpec extends SparkSpec {

  private def run(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val n = nodes.toDF("id")
    val e = edges.toDF("src", "dst")
    Dedup.connectedComponents(n, e).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("cluster-hashed splits admit zero straddling near-dup pairs") {
    // the q101 invariant: hashing the split on the q48 component means a
    // near-dup pair can never cross a split boundary — the leakage q91
    // exists to measure is structurally impossible
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.01"
    val docs = graft.Tables.documents(spark, dir)
    val splits = graft.SparkEntry.queries("q101_cluster_split")(spark, dir)
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      n = 3, threshold = 0.5, maxShingleDfFrac = 0.1)
    assert(pairs.limit(1).count() == 1, "corpus has known near-dup pairs")
    val straddling = pairs
      .join(splits.select(col("doc_id").as("doc_a"), col("split").as("sa")), "doc_a")
      .join(splits.select(col("doc_id").as("doc_b"), col("split").as("sb")), "doc_b")
      .filter(col("sa") =!= col("sb"))
      .count()
    assert(straddling == 0, s"$straddling near-dup pairs straddle a split")
  }

  test("incremental dedup flags only batch-vs-corpus pairs, never corpus self-pairs") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"), // corpus-internal dup of 1
      (3L, "totally unrelated corpus content here")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha beta gamma delta zeta"), // near-dup of 1 and 2
      (11L, "fresh novel text nothing shared")
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalJaccardPairs(corpus, batch,
        "doc_id", "text", n = 3, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 10 shares shingles "alpha beta gamma","beta gamma delta" with 1 and 2:
    // jaccard 2/4 = 0.5 each; the corpus 1~2 self-dup is NOT emitted
    assert(out == Set((10L, 1L), (10L, 2L)))
  }

  test("incremental dedup df cap drops corpus-viral shingles from both sides") {
    import spark.implicits._
    // every corpus doc carries the same boilerplate shingle; the batch
    // doc matches the corpus ONLY through it
    val corpus = (1L to 5L).map(i => (i, "spam common boilerplate"))
      .toDF("doc_id", "text")
    val batch = Seq((10L, "spam common boilerplate")).toDF("doc_id", "text")
    def pairs(frac: Double) =
      Dedup.incrementalJaccardPairs(corpus, batch, "doc_id", "text",
          n = 3, threshold = 0.5, maxShingleDfFrac = frac)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // uncapped: the viral shingle pairs the batch doc with all 5
    assert(pairs(0.0) == (1L to 5L).map((10L, _)).toSet)
    // capped at 50% of the corpus (df 5 > ceil(5*0.5)=3): the shingle
    // leaves the universe on BOTH sides — no pair survives
    assert(pairs(0.5) == Set.empty)
  }

  test("bloom prefilter changes the plan, never the result") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val words = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    def text() = Seq.fill(8)(words(rnd.nextInt(words.length))).mkString(" ")
    val corpus = (1L to 60L).map(i => (i, text())).toDF("doc_id", "text")
    val batch = (100L to 115L).map(i => (i, text())).toDF("doc_id", "text")
    def run(fpp: Double) =
      Dedup.incrementalJaccardPairs(corpus, batch, "doc_id", "text",
          n = 2, threshold = 0.3, bloomFpp = fpp)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val plain = run(0.0)
    assert(plain.nonEmpty) // the invariance claim needs a non-trivial set
    assert(run(0.03) == plain)
    // an absurdly leaky filter still only ADMITS extra candidates — the
    // exact join discards them, so even fpp→1 is semantics-preserving
    assert(run(0.9) == plain)
  }

  test("bloom prefilter skips itself past maxBloomItems instead of failing") {
    import spark.implicits._
    val corpus = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val batch = Seq((10L, "alpha beta gamma zeta")).toDF("doc_id", "text")
    val out = Dedup.incrementalJaccardPairs(corpus, batch, "doc_id", "text",
        n = 2, threshold = 0.3, bloomFpp = 0.03, maxBloomItems = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((10L, 1L)))
  }

  test("edge endpoints outside nodes never become component labels") {
    // edges mention node 5, which is NOT in nodes: if its id propagated,
    // {7, 9} would get component 5 and keep-min (doc_id === component)
    // would silently drop the whole cluster from the surviving corpus
    val got = run(Seq(7L, 9L), Seq((5L, 7L), (7L, 9L)))
    assert(got == Map(7L -> 7L, 9L -> 7L))
  }

  test("chains collapse transitively; singletons label themselves") {
    // 1-2, 2-3 form one group even though 1 and 3 never paired; 4 is alone
    val got = run(Seq(1L, 2L, 3L, 4L), Seq((1L, 2L), (2L, 3L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L))
  }

  test("cycles and reversed edge order converge to the component minimum") {
    val got = run(Seq(5L, 6L, 7L, 8L, 9L),
      Seq((7L, 6L), (6L, 5L), (5L, 7L), (9L, 8L)))
    assert(got == Map(5L -> 5L, 6L -> 5L, 7L -> 5L, 8L -> 8L, 9L -> 8L))
  }

  test("a long chain needs multiple propagation rounds and still closes") {
    val n = 12L
    val got = run(0L to n, (0L until n).map(i => (i, i + 1)))
    assert(got.values.toSet == Set(0L))
  }

  test("a 1000-node chain converges within default maxIters via pointer doubling") {
    // diameter 999 would need 999 plain propagation rounds; the
    // label(label) shortcut doubles reach per round past shortcutAfter,
    // so the default maxIters=20 must close it instead of throwing
    val n = 1000L
    val got = run(1L to n, (1L until n).map(i => (i, i + 1)))
    assert(got.size == 1000 && got.values.toSet == Set(1L))
  }

  test("random graphs match a union-find oracle (seeded property sweep)") {
    // two utterly different fixpoint engines agreeing: Spark min-label
    // propagation (+ pointer doubling) vs a driver-side union-find
    (0 until 8).foreach { trial =>
      val rnd = new scala.util.Random(1000L + trial)
      val n = 30 + rnd.nextInt(50)
      val nodes = (1L to n.toLong).toSeq
      val edges = Seq.fill(rnd.nextInt(2 * n))(
        (1L + rnd.nextInt(n), 1L + rnd.nextInt(n))).filter(e => e._1 != e._2)
      val parent = scala.collection.mutable.Map(nodes.map(i => i -> i): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra max rb) = ra min rb
      }
      // canonical label = min id per component (path-compress to roots,
      // then take the min id over each root's members)
      val byRoot = nodes.groupBy(find)
      val want = byRoot.flatMap { case (_, ms) => ms.map(_ -> ms.min) }
      val got = run(nodes, edges)
      assert(got == want, s"trial $trial (n=$n, e=${edges.length})")
    }
  }

  test("every component label is a member of its own component") {
    val edges = Seq((10L, 11L), (11L, 12L), (20L, 21L), (30L, 31L), (31L, 32L), (32L, 30L))
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct :+ 99L
    val got = run(nodes, edges)
    got.groupBy(_._2).foreach { case (label, members) =>
      assert(members.keySet.contains(label))
      assert(label == members.keySet.min)
    }
  }
}
