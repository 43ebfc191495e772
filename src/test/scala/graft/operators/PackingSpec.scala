package graft.operators

import graft.SparkSpec

class PackingSpec extends SparkSpec {

  private def pack(lens: Seq[Long], capacity: Long, parts: Int = 2) = {
    import spark.implicits._
    val df = lens.zipWithIndex.map { case (l, i) => (i.toLong, l) }
      .toDF("doc_id", "n_tokens")
    Packing.packSequences(df, "doc_id", "n_tokens", capacity, parts)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
  }

  test("concatChunks: chunks tile exactly, docs span boundaries, every " +
    "token placed once — matches the in-memory concat reference") {
    import spark.implicits._
    val docs = Seq( // (stream, doc_id, n_toks) with an oversize doc
      ("a", 1L, 30L), ("a", 2L, 50L), ("a", 3L, 250L), ("a", 4L, 7L),
      ("b", 10L, 64L), ("b", 11L, 64L), ("b", 12L, 1L),
      ("c", 20L, 0L)) // token-less: excluded by contract
      .toDF("stream", "doc_id", "n_toks")
    val cap = 64L
    val got = Packing.concatChunks(docs, "stream", "doc_id", "n_toks", cap)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // in-memory reference: literal concatenation and cutting
    val ref = Seq("a", "b").flatMap { s =>
      var off = 0L
      docs.collect().filter(r => r.getString(0) == s && r.getLong(2) > 0)
        .sortBy(_.getLong(1)).flatMap { r =>
          val (id, n) = (r.getLong(1), r.getLong(2))
          val start = off; off += n
          (start / cap to (start + n - 1) / cap).map { k =>
            (s, k, id, math.max(start, k * cap) - k * cap,
              math.min((k + 1) * cap, start + n) - math.max(k * cap, start))
          }
        }
    }.toSet
    assert(got.toSet === ref)
    assert(!got.exists(_._3 == 20L)) // token-less doc excluded
    // per-doc token conservation + full-chunk tiling
    got.groupBy(g => (g._1, g._3)).foreach { case ((s, id), segs) =>
      val n = docs.collect()
        .find(r => r.getString(0) == s && r.getLong(1) == id).get.getLong(2)
      assert(segs.map(_._5).sum === n, s"doc $id tokens not conserved")
    }
    got.groupBy(g => (g._1, g._2)).foreach { case ((s, k), segs) =>
      val maxChunk = got.filter(_._1 == s).map(_._2).max
      if (k < maxChunk)
        assert(segs.map(_._5).sum === cap, s"interior chunk ($s,$k) not full")
      // segments tile inside the chunk: sorted starts are contiguous
      val sorted = segs.sortBy(_._4)
      sorted.zip(sorted.drop(1)).foreach { case (x, y) =>
        assert(x._4 + x._5 === y._4, s"gap inside chunk ($s,$k)")
      }
      assert(sorted.head._4 === 0L || k == got.filter(_._1 == s).map(_._2).min)
    }
    // the 250-token doc spans ceil arithmetic's worth of chunks
    assert(got.count(_._3 == 3L) >= 4)
  }

  test("every doc packed exactly once; packs respect capacity; offsets tile") {
    val lens = Seq[Long](100, 90, 80, 60, 50, 40, 30, 20, 10, 5, 5, 5)
    val out = pack(lens, capacity = 128)
    assert(out.map(_._1).sorted.toSeq == (0L until 12L))
    out.groupBy(_._2).foreach { case (_, docs) =>
      assert(docs.map(_._4).sum <= 128)
      // offsets are the cumulative lengths in assignment order: sorted by
      // offset they tile [0, used) without overlap
      val sorted = docs.sortBy(_._3)
      sorted.foldLeft(0L) { case (expect, (_, _, off, len)) =>
        assert(off == expect); expect + len
      }
    }
  }

  test("oversize docs get singleton packs; packing is deterministic") {
    val lens = Seq[Long](500, 100, 100)
    val a = pack(lens, capacity = 128)
    assert(a.find(_._1 == 0L).get._3 == 0L)
    assert(a.groupBy(_._2)(a.find(_._1 == 0L).get._2).length == 1)
    val b = pack(lens, capacity = 128)
    assert(a.sortBy(_._1).toSeq == b.sortBy(_._1).toSeq)
  }

  test("segment-tree first-fit matches the naive linear scan bit-for-bit") {
    // one partition so assignment order is the global (len desc, id asc)
    // sort; the naive scan below is the O(n·P) loop the tree replaced
    val rnd = new scala.util.Random(11)
    val lens = Seq.fill(400)(rnd.nextInt(140).toLong) :+ 500L :+ 0L
    val capacity = 128L
    val out = pack(lens, capacity, parts = 1).map(r => (r._1, r._2, r._3)).toSet

    val used = scala.collection.mutable.ArrayBuffer.empty[Long]
    val expected = lens.zipWithIndex.map { case (l, i) => (i.toLong, l) }
      .sortBy { case (id, l) => (-l, id) }
      .map { case (id, len) =>
        var p = 0
        while (p < used.length && used(p) + len > capacity) p += 1
        if (p == used.length) used += 0L
        val off = used(p)
        used(p) += math.max(len, 1L)
        (id, p.toLong, off)
      }.toSet
    assert(out == expected)
  }

  test("first-fit waste bound: under twice the ideal pack count") {
    val rnd = new scala.util.Random(7)
    val lens = Seq.fill(500)(rnd.nextInt(100).toLong + 1)
    val capacity = 256L
    val out = pack(lens, capacity, parts = 4)
    val ideal = math.ceil(lens.sum.toDouble / capacity).toLong
    val packs = out.map(_._2).distinct.length
    // first-fit leaves at most one under-half-full pack per partition
    assert(packs < 2 * ideal + 4, s"$packs packs vs ideal $ideal")
  }
}
