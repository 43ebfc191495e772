package graft.operators

import graft.SparkSpec

/** BM25 retrieval pinned against a from-scratch in-memory reference of
  * the same integer-exact formula, plus the semantic corners the oracle
  * data never exercises (empty docs, absent terms, tie-breaks, the
  * rerank dot product).
  */
class RetrievalSpec extends SparkSpec {

  private val docs = Seq(
    1L -> "hash join hash join hash",
    2L -> "hash scan",
    3L -> "join join join merge",
    4L -> "", // tokenless: must not count toward N or sum_len
    5L -> "dup dup merge",
    6L -> "scan scan scan scan scan scan scan scan")

  private val queries = Seq(
    1L -> Seq("hash", "join"),
    2L -> Seq("dup"),
    3L -> Seq("absent")) // no doc contains it -> no rows for query 3

  /** The reference: same rationals, same floors, Long arithmetic. */
  private def refBm25For(docs: Seq[(Long, String)],
                         queries: Seq[(Long, Seq[String])],
                         k: Int, scale: Long): Seq[(Long, Long, Long, Long)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.split(' ').filter(_.nonEmpty).toSeq
    }.filter(_._2.nonEmpty)
    val n = toks.size.toLong
    val sumLen = toks.map(_._2.size.toLong).sum
    val dl = toks.map { case (id, ts) => id -> ts.size.toLong }.toMap
    val df = toks.flatMap { case (_, ts) => ts.distinct }
      .groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    def termScore(id: Long, term: String): Option[Long] = {
      val tf = toks.toMap.apply(id).count(_ == term).toLong
      if (tf == 0L) None
      else {
        val l = 1000L * dl(id) * n / sumLen
        Some(scale * 22000L * tf * (2L * n - 2L * df(term) + 1L) /
          ((10000L * tf + 3000L + 9L * l) * (2L * df(term) + 1L)))
      }
    }
    queries.flatMap { case (qid, ts) =>
      toks.map(_._1).flatMap { id =>
        val ss = ts.flatMap(t => termScore(id, t))
        if (ss.isEmpty) None else Some((qid, id, ss.sum))
      }.sortBy { case (_, id, s) => (-s, id) }
        .take(k)
        .zipWithIndex
        .map { case ((qid2, id, s), i) => (qid2, id, s, i + 1L) }
    }
  }

  private def refBm25(k: Int, scale: Long): Seq[(Long, Long, Long, Long)] =
    refBm25For(docs, queries, k, scale)

  test("bm25TopK == in-memory reference (scores, ranks, absent terms)") {
    import spark.implicits._
    val got = Retrieval.bm25TopK(docs.toDF("doc_id", "text"),
        "doc_id", "text", queries, k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(x => (x._1, x._4))
    assert(got.toSeq == refBm25(k = 3, scale = 100000L))
    // query 3's term appears nowhere: it contributes zero rows, not
    // zero-scored rows
    assert(!got.exists(_._1 == 3L))
  }

  test("bm25TopK == reference on RANDOM corpora (property)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "b", "c", "dd", "ee", "fff", "gg", "h")
    (1 to 5).foreach { trial =>
      val rdocs = (1L to 40L).map { id =>
        val n = rnd.nextInt(25) // 0..24 tokens; 0 => tokenless doc
        id -> Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      val rqueries = (1L to 3L).map { qid =>
        qid -> rnd.shuffle(vocab).take(1 + rnd.nextInt(3)).toSeq
      }
      val got = Retrieval.bm25TopK(rdocs.toDF("doc_id", "text"),
          "doc_id", "text", rqueries, k = 7)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(x => (x._1, x._4))
      assert(got.toSeq == refBm25For(rdocs, rqueries, k = 7, scale = 100000L),
        s"trial $trial diverged")
    }
  }

  test("rare-term idf outranks common-term tf at equal length") {
    import spark.implicits._
    // 'dup' appears in 1 of 5 docs, 'scan' in 2; one match each — the
    // rarer term must score higher for the same tf and dl
    val out = Retrieval.bm25TopK(docs.toDF("doc_id", "text"), "doc_id",
        "text", Seq(9L -> Seq("dup", "hash")), k = 10)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(out(5L) > out(2L)) // doc 5 matches rare 'dup', doc 2 common 'hash'
  }

  test("repeated query term is rejected") {
    import spark.implicits._
    val df = docs.toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(df, "doc_id", "text", Seq(1L -> Seq("a", "a")), 5)
    }
  }

  test("merged base+delta index == one-shot build, through the parquet artifact") {
    import spark.implicits._
    val df = docs.toDF("doc_id", "text")
    val full = Retrieval.bm25TopK(df, "doc_id", "text", queries, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

    val dir = java.nio.file.Files.createTempDirectory("graft_bm25_spec").toString
    Retrieval.writeIndex(Retrieval.indexParts(
      df.filter($"doc_id" <= 3L), "doc_id", "text"), s"$dir/base")
    Retrieval.writeIndex(Retrieval.indexParts(
      df.filter($"doc_id" > 3L), "doc_id", "text"), s"$dir/delta")
    val merged = Retrieval.mergeParts(
      Retrieval.readIndex(spark, s"$dir/base"),
      Retrieval.readIndex(spark, s"$dir/delta"))
    val served = Retrieval.bm25FromIndex(merged, queries, k = 10)
    val got = served.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == full)

    // the term probe reaches the postings SCAN as a pushed filter —
    // the artifact's entire point: a query never reads non-term files
    val planStr = served.queryExecution.executedPlan.toString
    val scanLine = planStr.linesIterator
      .filter(l => l.contains("PushedFilters") && l.contains("postings"))
    assert(scanLine.exists(_.contains("In(tok")),
      s"postings scan lost the pushed term filter:\n$planStr")
  }

  test("rrfHybrid: fused score is the exact floor sum of both rank legs") {
    import spark.implicits._
    val emb = Seq(
      1L -> Array(127.0f, 0.0f), 2L -> Array(0.0f, 127.0f),
      3L -> Array(64.0f, 64.0f), 5L -> Array(-127.0f, 0.0f),
      6L -> Array(127.0f, 127.0f), 100L -> Array(127.0f, 0.0f))
      .toDF("vec_id", "embedding")
    val out = Retrieval.rrfHybrid(docs.toDF("doc_id", "text"),
        "doc_id", "text", emb, "vec_id", "embedding",
        Seq((1L, Seq("hash", "join"), 100L)), kCand = 10, kOut = 10)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    out.foreach { case (_, rb, re, fused) =>
      assert(fused == 1000000L / (60L + rb) + 1000000L / (60L + re),
        s"fused mismatch at ranks ($rb, $re)")
    }
    // both legs rank within the candidate set and ranks are complete
    assert(out.map(_._2).sorted.toSeq == (1L to out.length).toSeq)
    assert(out.map(_._3).sorted.toSeq == (1L to out.length).toSeq)
  }

  test("phraseStats: adjacency not co-occurrence, overlaps, repeated terms") {
    import spark.implicits._
    val pdocs = Seq(
      1L -> "hash join fast",        // one "hash join"
      2L -> "join hash",             // both terms, WRONG order -> no hit
      3L -> "hash join hash join",   // two occurrences
      4L -> "hash hash hash",        // overlapping "hash hash" -> 2
      5L -> "a hash b join c"        // co-occurrence, not adjacent
    ).toDF("doc_id", "text")
    val out = Retrieval.phraseStats(pdocs, "doc_id", "text", Seq(
        10L -> Seq("hash", "join"),
        20L -> Seq("hash", "hash"),
        30L -> Seq("hash", "join", "hash")))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(10L) == ((2L, 3L))) // docs 1 and 3; occurrences 1 + 2
    assert(out(20L) == ((1L, 2L))) // doc 4 only, overlapping starts 0 and 1
    assert(out(30L) == ((1L, 1L))) // doc 3: "hash join hash" once
    assert(out.size == 3)
  }

  test("bm25Rerank: integer code dot product, inner-join drop, top-kOut") {
    import spark.implicits._
    // embeddings for docs 1,2,3,5 and the query vector 100; doc 6
    // matches 'scan' but has no embedding -> must drop from the rerank
    // max|x| = 127 in every vector -> scale is exactly 1.0 and the
    // codes are exactly the integer components (no float-boundary
    // sensitivity in the hand expectation)
    val emb = Seq(
      1L -> Array(64.0f, 127.0f, -63.0f),
      2L -> Array(127.0f, -127.0f, 64.0f),
      3L -> Array(-127.0f, 64.0f, 0.0f),
      5L -> Array(127.0f, 127.0f, 127.0f),
      100L -> Array(127.0f, -63.0f, 32.0f)).toDF("vec_id", "embedding")
    val out = Retrieval.bm25Rerank(docs.toDF("doc_id", "text"),
        "doc_id", "text", emb, "vec_id", "embedding",
        Seq((1L, Seq("hash", "scan"), 100L)), kCand = 10, kOut = 10)
      .collect()
      .map(r => (r.getLong(1), r.getLong(3), r.getLong(4)))
      .sortBy(_._3)
    val codes = Map(
      1L -> Seq(64L, 127L, -63L), 2L -> Seq(127L, -127L, 64L))
    val q = Seq(127L, -63L, 32L)
    val expDot = codes.map { case (id, c) =>
      id -> c.zip(q).map { case (a, b) => a * b }.sum
    }
    val byId = out.map(x => x._1 -> x._2).toMap
    assert(byId(1L) == expDot(1L) && byId(2L) == expDot(2L))
    assert(!byId.contains(6L)) // no embedding -> dropped
    // rerank order is (dot DESC, doc_id)
    assert(out.map(_._1).toSeq ==
      out.sortBy(x => (-x._2, x._1)).map(_._1).toSeq)

    // the natural schema for doc embeddings names the id column doc_id
    // too — must not collide with the candidate side
    val emb2 = emb.withColumnRenamed("vec_id", "doc_id")
    val out2 = Retrieval.bm25Rerank(docs.toDF("doc_id", "text"),
        "doc_id", "text", emb2, "doc_id", "embedding",
        Seq((1L, Seq("hash", "scan"), 100L)), kCand = 10, kOut = 10)
      .collect().map(r => (r.getLong(1), r.getLong(3))).sortBy(_._1)
    assert(out2.toSeq == out.map(x => (x._1, x._2)).sortBy(_._1).toSeq)
  }
}
