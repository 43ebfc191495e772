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
