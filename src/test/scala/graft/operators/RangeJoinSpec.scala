package graft.operators

import graft.SparkSpec

/** Binned range join vs a direct nested-loop reference: bin-boundary
  * points, intervals spanning many bins, negative values, and the
  * no-duplicate guarantee (each pair meets only in the point's bin). */
class RangeJoinSpec extends SparkSpec {

  test("binned join equals the nested-loop reference, boundaries inclusive") {
    import spark.implicits._
    val points = Seq(
      (1L, "u1", 0L), (2L, "u1", 9L), (3L, "u1", 10L), (4L, "u1", 100L),
      (5L, "u2", 10L), (6L, "u2", -25L), (7L, "u3", 50L))
      .toDF("pid", "k", "t")
    val ivals = Seq(
      ("u1", 0L, 10L),    // spans bins 0..1 at width 10: hits t=0,9,10
      ("u1", 95L, 130L),  // multi-bin
      ("u2", -30L, -20L), // negative range
      ("u2", 10L, 10L),   // degenerate single-point interval
      ("u4", 0L, 100L))   // key with no points
      .toDF("k", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, ivals, Seq("k"), "t", "lo", "hi",
        binWidth = 10L)
      .select("pid", "lo", "hi")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = (for {
      p <- Seq((1L, "u1", 0L), (2L, "u1", 9L), (3L, "u1", 10L), (4L, "u1", 100L),
        (5L, "u2", 10L), (6L, "u2", -25L), (7L, "u3", 50L))
      i <- Seq(("u1", 0L, 10L), ("u1", 95L, 130L), ("u2", -30L, -20L),
        ("u2", 10L, 10L), ("u4", 0L, 100L))
      if p._2 == i._1 && p._3 >= i._2 && p._3 <= i._3
    } yield (p._1, i._2, i._3)).toSet
    assert(got == want, s"got=$got want=$want")
    // no-duplicate guarantee: the same (point, interval) pair once
    val all = RangeJoin.pointInInterval(points, ivals, Seq("k"), "t", "lo", "hi", 10L)
      .select("pid", "lo", "hi").collect()
    assert(all.length == all.distinct.length)
  }

  test("interval overlap equals the nested-loop reference, one row per pair") {
    import spark.implicits._
    val lefts = Seq(
      (1L, "u1", 0L, 25L),   // spans 3 bins at width 10
      (2L, "u1", 40L, 40L),  // degenerate
      (3L, "u2", 5L, 15L),
      (4L, "u2", -22L, -8L)) // negative span
    val rights = Seq(
      ("u1", 20L, 60L),  // overlaps [0,25] across 2 shared bins: dedup test
      ("u1", 26L, 39L),  // adjacent, NO overlap with either u1 interval
      ("u2", 15L, 15L),  // touches [5,15] exactly at the boundary
      ("u2", -10L, 0L))
    val got = RangeJoin.intervalOverlap(
        lefts.toDF("lid", "k", "llo", "lhi"), rights.toDF("k", "rlo", "rhi"),
        Seq("k"), "llo", "lhi", "rlo", "rhi", binWidth = 10L)
      .select("lid", "rlo", "rhi").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = (for {
      l <- lefts; r <- rights
      if l._2 == r._1 && l._3 <= r._3 && r._2 <= l._4
    } yield (l._1, r._2, r._3))
    assert(got.toSet == want.toSet, s"got=${got.toSet} want=${want.toSet}")
    // canonical-bin rule: multi-bin overlaps still emit exactly once
    assert(got.length == want.length, s"duplicate pair rows: ${got.toSeq}")
  }

  test("randomized: both joins equal the nested loop at random bin widths") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242L)
    (0 until 5).foreach { _ =>
      val keys = Seq("k1", "k2", "k3")
      val pts = Seq.fill(60)((rnd.nextLong(500) + 1,
        keys(rnd.nextInt(3)), rnd.nextLong(200) - 100))
      val ivs = Seq.fill(40) {
        val lo = rnd.nextLong(200) - 100
        (keys(rnd.nextInt(3)), lo, lo + rnd.nextLong(40))
      }
      val bw = rnd.nextLong(29) + 1
      val gotP = RangeJoin.pointInInterval(pts.toDF("pid", "k", "t"),
          ivs.toDF("k", "lo", "hi"), Seq("k"), "t", "lo", "hi", bw)
        .select("pid", "t", "lo", "hi").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val wantP = for { p <- pts; i <- ivs
        if p._2 == i._1 && p._3 >= i._2 && p._3 <= i._3
      } yield (p._1, p._3, i._2, i._3)
      assert(gotP.sorted.toSeq == wantP.sorted, s"point join diverged at bw=$bw")
      val lvs = ivs.zipWithIndex.map { case ((k, lo, hi), j) => (j.toLong, k, lo, hi) }
      val gotO = RangeJoin.intervalOverlap(lvs.toDF("lid", "k", "llo", "lhi"),
          ivs.toDF("k", "rlo", "rhi"), Seq("k"), "llo", "lhi", "rlo", "rhi", bw)
        .select("lid", "rlo", "rhi").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val wantO = for { l <- lvs; r <- ivs
        if l._2 == r._1 && l._3 <= r._3 && r._2 <= l._4
      } yield (l._1, r._2, r._3)
      assert(gotO.sorted.toSeq == wantO.sorted, s"overlap join diverged at bw=$bw")
    }
  }
}
