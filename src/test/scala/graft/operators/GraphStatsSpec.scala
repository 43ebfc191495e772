package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Triangle counts and clustering coefficients on graphs with known
  * structure, plus the input-hygiene rules (self-loops, parallel and
  * reversed duplicate edges collapse before anything counts). */
class GraphStatsSpec extends SparkSpec {

  private def stats(edges: Seq[(Long, Long)]): Map[Long, (Long, Long, Long)] = {
    import spark.implicits._
    GraphStats.triangleStats(edges.toDF("src", "dst"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
  }

  test("one triangle plus a pendant edge") {
    val m = stats(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)))
    assert(m(1L) == ((2L, 1L, 1000000L))) // deg 2, 1 triangle, lcc = 1
    assert(m(2L) == ((2L, 1L, 1000000L)))
    assert(m(3L) == ((3L, 1L, 333333L))) // 2*1e6*1 / (3*2) floored
    assert(m(4L) == ((1L, 0L, 0L))) // deg < 2 -> lcc 0
  }

  test("4-clique: every node in 3 triangles, lcc exactly 1") {
    val nodes = Seq(1L, 2L, 3L, 4L)
    val edges = for {
      a <- nodes; b <- nodes if a < b
    } yield (a, b)
    val m = stats(edges)
    nodes.foreach { v =>
      assert(m(v) == ((3L, 3L, 1000000L)), s"node $v: ${m(v)}")
    }
  }

  test("self-loops, parallel and reversed duplicates do not create triangles") {
    val m = stats(Seq((1L, 1L), (1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L)))
    assert(m(1L) == ((1L, 0L, 0L)))
    assert(m(2L) == ((2L, 0L, 0L)))
    assert(m(3L) == ((1L, 0L, 0L)))
  }

  private def core(edges: Seq[(Long, Long)], k: Int,
                   iters: Int): Map[Long, Long] = {
    import spark.implicits._
    GraphStats.kCore(edges.toDF("src", "dst"), k, iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("k-core: a chain unravels from the ends, one layer per round") {
    // path 1-2-3-4-5-6 at k=2: endpoints peel, exposing new endpoints —
    // the multi-round case a single filter pass would get wrong
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    assert(core(path, 2, 3).isEmpty)
    // one round only strips the outermost layer — 3-4 still standing
    assert(core(path, 2, 1) == Map(2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L))
  }

  test("k-core: clique survives, tail peels, extra rounds are a no-op") {
    val nodes = Seq(1L, 2L, 3L, 4L)
    val clique = for { a <- nodes; b <- nodes if a < b } yield (a, b)
    val tail = Seq((4L, 5L), (5L, 6L))
    val expected = nodes.map(_ -> 3L).toMap
    assert(core(clique ++ tail, 3, 5) == expected)
    // fixpoint: more rounds change nothing (the q202 iters-pick law)
    assert(core(clique ++ tail, 3, 9) == expected)
  }

  test("degree-ordered enumeration matches the naive id-ordered count on a star+rim") {
    // wheel graph: hub 0 connected to rim 1..6, rim is a cycle — each
    // rim triangle (0, i, i+1); rim node is in 2 triangles, hub in 6
    val rim = (1L to 6L)
    val spokes = rim.map(i => (0L, i))
    val cycle = rim.map(i => (i, if (i == 6L) 1L else i + 1L))
    val m = stats(spokes ++ cycle)
    assert(m(0L) == ((6L, 6L, (2000000L * 6) / (6 * 5))))
    rim.foreach { v =>
      assert(m(v) == ((3L, 2L, (2000000L * 2) / (3 * 2))), s"rim $v: ${m(v)}")
    }
  }
}
