package graft.operators

import graft.SparkSpec

class CorpusStatsSpec extends SparkSpec {

  test("rare-token stats count occurrences under the frequency threshold") {
    import spark.implicits._
    // corpus frequencies: "a" x4, "b" x2, "c" x1  (rareBelow = 2 → only
    // "c" and "b"? no: cf(b)=2 is NOT < 2; only cf(c)=1 is rare)
    val df = Seq(
      (1L, "a a b c"),
      (2L, "a a b")
    ).toDF("doc_id", "text")
    val out = CorpusStats.rareTokenStats(df, "doc_id", "text", rareBelow = 2L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(1L) == ((4L, 1L, 2500L))) // "c" is the only rare occurrence
    assert(out(2L) == ((3L, 0L, 0L)))
    // a doc with no tokens yields no row (documented)
    val empty = CorpusStats.rareTokenStats(
      Seq((1L, ""), (2L, "x")).toDF("doc_id", "text"), "doc_id", "text")
    assert(empty.collect().map(_.getLong(0)).toSet == Set(2L))
  }

  test("chunking windows cover every token exactly once, in order") {
    import spark.implicits._
    val df = Seq(
      (1L, (1 to 7).map(i => s"t$i").mkString(" ")), // 7 tokens, seqLen 3 → 3,3,1
      (2L, "a b c"),                                 // exactly one full window
      (3L, "")                                       // no tokens → no chunks
    ).toDF("doc_id", "text")
    val out = CorpusStats.chunk(df, "doc_id", "text", seqLen = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .sortBy(c => (c._1, c._2))
    assert(out.toSeq == Seq(
      (1L, 0L, "t1 t2 t3", 3L), (1L, 1L, "t4 t5 t6", 3L), (1L, 2L, "t7", 1L),
      (2L, 0L, "a b c", 3L)))
    // reassembly invariant: concatenating a doc's chunks restores its tokens
    val joined = out.filter(_._1 == 1L).map(_._3).mkString(" ")
    assert(joined == (1 to 7).map(i => s"t$i").mkString(" "))
  }

  test("source overlap counts distinct shared shingles per source pair") {
    import spark.implicits._
    val shared = "one two three four five" // the one 5-gram both share
    val df = Seq(
      (1L, s"$shared six", "sA"),   // shingles: one..five, two..six
      (2L, s"zz $shared", "sB"),    // shingles: zz..four, one..five
      (3L, "totally different text with no shingle overlap here", "sC")
    ).toDF("doc_id", "text", "source")
    val out = CorpusStats.sourceOverlap(df, "text", "source", n = 5)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(out == Map(("sA", "sB") -> 1L)) // sC shares nothing → no row
    // duplicate docs within ONE source don't inflate the count (distinct)
    val dup = df.union(Seq((4L, s"$shared six", "sA"))
      .toDF("doc_id", "text", "source"))
    val out2 = CorpusStats.sourceOverlap(dup, "text", "source", n = 5)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(out2 == Map(("sA", "sB") -> 1L))
  }

  test("vocab drift: top-k sets, exact jaccard, count-desc-token-asc order") {
    import spark.implicits._
    // srcA top-2: x (3), y (2); srcB top-2: x (4), z (2); shared = {x}
    val df = Seq(
      (1L, "x x x y y w", "srcA"),
      (2L, "x x x x z z q", "srcB")
    ).toDF("doc_id", "text", "source")
    val out = CorpusStats.vocabDrift(df, "source", "text", k = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.toSeq == Seq(("srcA", "srcB", 1L, 1.0 / 3.0)))
    // tie at count 1 breaks by token asc: srcC top-2 of {c,a,b} is {a,b},
    // sharing {a, b} with srcD's {a (x2), b (x2)} — jaccard 1.0
    val tied = Seq(
      (3L, "c a b", "srcC"),
      (4L, "a a b b", "srcD")
    ).toDF("doc_id", "text", "source")
    val out2 = CorpusStats.vocabDrift(tied, "source", "text", k = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(out2.toSeq == Seq(("srcC", "srcD", 2L, 1.0)))
  }

  test("vocab drift two-phase rank equals the naive global rank (sweep)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // heavy-tailed counts across band boundaries: token t_i appears ~2^(i%8)
    // times, so several tokens share each magnitude band and k cuts into
    // a band's interior — the case the banded prune must get exactly right
    (0 until 3).foreach { trial =>
      val rnd = new scala.util.Random(7L + trial)
      val rows = for {
        s <- Seq("s1", "s2", "s3")
        i <- 0 until 40
        _ <- 0 until (1 << (i % 8)) if rnd.nextInt(4) > 0
      } yield (s, s"tok${i % 25}")
      val df = rows.zipWithIndex
        .map { case ((s, t), ix) => (ix.toLong, s, t) }
        .toDF("id", "src", "tok")
        .select(col("id"), col("src").as("source"),
          col("tok").as("text")) // one token per "doc" — counts add up
      val k = 7
      val got = CorpusStats.vocabDrift(df, "source", "text", k)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .toSet
      // naive oracle: full window rank, then pairwise intersection
      val counts = df.groupBy(col("source"), col("text").as("tok"))
        .agg(count(lit(1)).as("c"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("c").desc, col("tok"))
      val topk = counts.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= k).select(col("source"), col("tok"))
        .collect().map(r => (r.getString(0), r.getString(1)))
      val bySrc = topk.groupBy(_._1).map { case (s, ts) => s -> ts.map(_._2).toSet }
      val want = (for {
        a <- bySrc.keys; b <- bySrc.keys if a < b
        shared = (bySrc(a) & bySrc(b)).size if shared > 0
      } yield (a, b, shared.toLong)).toSet
      assert(got == want, s"trial $trial")
    }
  }

  test("buildVocab assigns contiguous frequency-ranked ids") {
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.01")
    val got = CorpusStats.buildVocab(docs, "text", minCount = 5L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    assert(got.map(_._3).sorted.toSeq == (0L until got.length.toLong).toSeq,
      "token ids must be a contiguous 0-based range")
    assert(got.forall(_._2 >= 5L))
    // naive definition: (count desc, token asc)
    val naive = docs.select(col("text")).collect()
      .flatMap(_.getString(0).split(" ").filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .filter(_._2 >= 5L)
      .sortBy { case (t, c) => (-c, t) }
      .zipWithIndex.map { case ((t, c), i) => (t, c, i.toLong) }
    assert(got.sortBy(_._3).toSeq == naive,
      "banded vocab rank drifted from the single-sort definition")
  }

  test("bpePairCounts equals the naive token-stream pair count") {
    import org.apache.spark.sql.functions.col
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.01")
    val got = CorpusStats.bpePairCounts(docs, "text", k = 20)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.length == 20)
    // naive: every adjacent char pair of every token OCCURRENCE
    val words = docs.select(col("text")).collect()
      .flatMap(_.getString(0).split(" ").filter(_.nonEmpty))
    val naive = words.flatMap(w => w.sliding(2).filter(_.length == 2))
      .groupBy(identity).map { case (p, occ) => p -> occ.length.toLong }
    val top = naive.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    val want = top.zipWithIndex.map { case ((p, n), i) => (p, n, i + 1L) }
    assert(got.sortBy(_._3).toSeq == want,
      "banded top-k drifted from the naive global definition")
  }

  test("bpeTrainMerges: greedy a==a chains, cross-round merged symbols, tie-break") {
    import spark.implicits._
    // "aaaa"x2 contributes 3 (a,a) pairs per occurrence; greedy
    // left-to-right merges aaaa -> [aa,aa] (NOT [aa,a,a]), so round 2
    // must see (aa,aa), proving both the chain parity and that merged
    // symbols re-enter later rounds
    val docs = Seq("aaaa aaaa bc").toDF("text")
    val got = CorpusStats.bpeTrainMerges(docs, "text", k = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq.sortBy(_._1)
    assert(got == Seq(
      (1, "a", "a", "aa", 6L),
      (2, "aa", "aa", "aaaa", 2L),
      (3, "b", "c", "bc", 1L)))
    // pairs exhausted before k rounds: loud failure, not a short table
    val e = intercept[IllegalStateException] {
      CorpusStats.bpeTrainMerges(docs, "text", k = 4).collect()
    }
    assert(e.getMessage.contains("ran out of adjacent pairs"))
    // equal counts fall to the lexicographic (left, right) tie-break
    val tie = CorpusStats.bpeTrainMerges(Seq("ab cd").toDF("text"), "text", k = 2)
      .collect().map(r => (r.getInt(0), r.getString(3))).toSeq.sortBy(_._1)
    assert(tie == Seq((1, "ab"), (2, "cd")))
  }

  test("bpeEncodedCounts pays the post-merge token count per document") {
    import spark.implicits._
    val docs = Seq((1L, "aaaa aaaa bc"), (2L, "bc aaaa")).toDF("id", "text")
    def got(k: Int) = CorpusStats.bpeEncodedCounts(docs, "id", "text", k)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // k=1 merges only (a,a): aaaa -> [aa,aa] (2 symbols), bc -> [b,c] (2)
    assert(got(1) == Map(1L -> ((3L, 6L)), 2L -> ((2L, 4L))))
    // k=3 collapses aaaa -> [aaaa] and bc -> [bc]: every word 1 symbol
    assert(got(3) == Map(1L -> ((3L, 3L)), 2L -> ((2L, 2L))))
  }

  test("bpeApplyMerges on the training corpus equals bpeEncodedCounts") {
    import spark.implicits._
    val docs = Seq((1L, "low lower lowest low"), (2L, "new newer newest"),
      (3L, "low new lowest")).toDF("doc_id", "text")
    val k = 4
    val direct = CorpusStats.bpeEncodedCounts(docs, "doc_id", "text", k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val applied = CorpusStats.bpeApplyMerges(docs, "doc_id", "text",
        CorpusStats.bpeTrainMerges(docs, "text", k))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(applied == direct, s"apply=$applied direct=$direct")
    // frozen-table decoupling: unseen words still fold through the
    // merges (chains included) instead of erroring or dropping
    val unseen = Seq((9L, "lowlow brandnew zz")).toDF("doc_id", "text")
    val enc = CorpusStats.bpeApplyMerges(unseen, "doc_id", "text",
        CorpusStats.bpeTrainMerges(docs, "text", k))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(enc.length == 1 && enc(0)._2 == 3L && enc(0)._3 >= 3L)
  }
}
