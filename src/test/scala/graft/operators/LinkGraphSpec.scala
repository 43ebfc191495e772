package graft.operators

import scala.util.Random

import graft.SparkSpec

/** Integer-scaled PageRank vs an in-memory reference running the same
  * exact arithmetic — every long must match, on hand-built and random
  * graphs — plus the fixed-point sanity on a symmetric cycle. */
class LinkGraphSpec extends SparkSpec {

  private def reference(edges: Seq[(Long, Long)], iters: Int,
                        scale: Long = 1000000L): Map[Long, Long] = {
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val base = scale * 15L / 100L
    var r = nodes.map(_ -> scale).toMap
    (1 to iters).foreach { _ =>
      val s = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      edges.foreach { case (u, v) => s(v) += r(u) / outdeg(u) }
      r = nodes.map(v => v -> (base + 850L * s(v) / 1000L)).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    import spark.implicits._
    LinkGraph.pageRank(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("matches the exact-arithmetic reference on a hand graph") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (0L, 2L), (3L, 0L), (3L, 3L))
    assert(run(edges, 5) == reference(edges, 5))
  }

  test("matches the reference on random graphs, exactly") {
    val rnd = new Random(42)
    (0 until 3).foreach { _ =>
      val n = 30 + rnd.nextInt(40)
      // every node gets >= 1 out-edge (the operator's contract)
      val edges = (0L until n.toLong).flatMap { v =>
        (0 until 1 + rnd.nextInt(3)).map(_ => v -> rnd.nextInt(n).toLong)
      }
      assert(run(edges, 8) == reference(edges, 8))
    }
  }

  test("uniform cycle is a fixed point (minus deterministic floor loss)") {
    val n = 10L
    val edges = (0L until n).map(v => v -> ((v + 1) % n))
    val got = run(edges, 10)
    // each node keeps receiving exactly its own rank: r = 150000+850r/1000
    // converges to the same value everywhere
    assert(got.values.toSet.size == 1)
  }
}
