package graft.operators

import graft.SparkSpec

/** MMR diversified re-rank: the diversity term must actually flip a
  * pick (a near-duplicate of pick 1 loses to a less-relevant but
  * diverse candidate), and the greedy output obeys its contract. */
class MmrSpec extends SparkSpec {

  test("near-duplicate of pick 1 is deferred behind the diverse candidate") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple one"), (2L, "apple two"), (3L, "apple three"))
      .toDF("doc_id", "text")
    // d1 and d2 identical direction, d3 orthogonal; query leans to d1:
    //   rel(d1) = rel(d2) = 127·127 = 16129, rel(d3) = 95·127 = 12065
    //   sim(d1, d2) = 16129, sim(d1, d3) = sim(d2, d3) = 0
    val emb = Seq(
      (1L, Array(10f, 0f)), (2L, Array(10f, 0f)), (3L, Array(0f, 10f)),
      (100L, Array(8f, 6f)))
      .toDF("vec_id", "embedding")
    val out = Retrieval.mmrRerank(docs, "doc_id", "text", emb, "vec_id",
      "embedding", Seq((1L, Seq("apple"), 100L)), kCand = 3, kOut = 3)
      .collect().map(r => (r.getLong(5), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1)

    // pick 1: pure relevance, tie by id -> d1
    assert(out(0) == ((1L, 1L, 16129L, 0L, 7L * 16129L)))
    // pick 2: d2 scores 7·16129 − 3·16129 = 64516; d3 scores
    // 7·12065 = 84455 -> diversity flips the order, d3 wins
    assert(out(1) == ((2L, 3L, 12065L, 0L, 84455L)))
    // pick 3: the near-duplicate finally enters
    assert(out(2) == ((3L, 2L, 16129L, 16129L, 64516L)))
  }

  test("contract: kOut distinct picks per query from the candidate set") {
    import spark.implicits._
    val docs = (1L to 30L)
      .map(i => (i, s"apple x$i " * (1 + (i % 3).toInt)))
      .toDF("doc_id", "text")
    val emb = ((1L to 30L).map(i =>
      (i, Array((i % 7).toFloat + 1f, (i % 5).toFloat, (i % 3).toFloat))) :+
      (100L, Array(3f, 2f, 1f))).toDF("vec_id", "embedding")
    val out = Retrieval.mmrRerank(docs, "doc_id", "text", emb, "vec_id",
      "embedding", Seq((1L, Seq("apple"), 100L)), kCand = 10, kOut = 4)
      .collect()
    assert(out.length == 4)
    val picks = out.map(r => r.getLong(5)).sorted
    assert(picks.toSeq == Seq(1L, 2L, 3L, 4L))
    val ids = out.map(r => r.getLong(1))
    assert(ids.distinct.length == 4)
  }
}
