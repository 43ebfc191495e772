package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Embedding quantization (q75/q76): int8 error bounds, PQ encode/ADC
  * invariants, SemDeDup keep-rule consistency, and the global-order
  * permutation law — all on the sf0.01 driver corpus. */
class QuantizeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"
  private lazy val corpus =
    Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
  private lazy val probes =
    corpus.filter(col("vec_id") < 3)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))

  test("int8 quantization error is within the half-step bound") {
    val rows = Quantize.int8Quantize(corpus, "vec_id", "embedding").collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val scale = r.getDouble(1)
      val mse = r.getDouble(2)
      assert(scale > 0, s"degenerate scale for vec ${r.getLong(0)}")
      // every element's quantization error is <= scale/2, so the mean of
      // squares is <= (scale/2)^2
      assert(mse <= scale * scale * 0.25 + 1e-12,
        s"mse $mse above half-step bound for scale $scale")
      val codeSum = r.getLong(3)
      assert(math.abs(codeSum) <= 127L * 64,
        s"code_sum $codeSum outside +-127*dim")
    }
  }

  test("int8 quantization edge cases: zero vector, exact saturation") {
    import spark.implicits._
    val df = Seq(
      (0L, Seq(0f, 0f, 0f, 0f)),          // zero vector: scale 0, no NaN
      (1L, Seq(1f, -1f, 0.5f, -0.25f)),   // symmetric range
      (2L, Seq(127f, -127f, 127f, 0f))    // values on the code grid
    ).toDF("vec_id", "embedding")
    val rows = Quantize.int8Quantize(df, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3))).toMap
    val (s0, m0, c0) = rows(0L)
    assert(s0 == 0.0 && m0 == 0.0 && c0 == 0L,
      "zero vector must quantize to all-zero with zero error, not NaN")
    val (s2, m2, c2) = rows(2L)
    // scale = 127/127 = 1; every element already sits on the grid
    assert(s2 == 1.0 && m2 == 0.0 && c2 == 127L)
    val (s1, m1, _) = rows(1L)
    assert(s1 > 0 && m1 <= s1 * s1 * 0.25 + 1e-12)
  }

  private lazy val books =
    Quantize.pqCodebooks(corpus, "vec_id", "embedding", m = 4, ksub = 16)

  test("signProject: JL norms preserved on average, matrix is data-independent") {
    import spark.implicits._
    val k = 8
    val proj = Quantize.signProject(corpus, "vec_id", "embedding", k)
    val n2o = corpus.select(col("vec_id"), aggregate(col("embedding"),
      lit(0.0), (a, x) => a + x.cast("double") * x.cast("double")).as("n2"))
    val joined = proj.join(n2o, "vec_id").collect().map { r =>
      val y2 = (1 to k).map(j => { val v = r.getDouble(j); v * v }).sum / k
      (y2, r.getDouble(k + 1))
    }
    // E[||y||^2 / k] = ||x||^2: the corpus-wide mean ratio must sit
    // tight around 1 even though any single vector can deviate
    val ratio = joined.map(_._1).sum / joined.map(_._2).sum
    assert(math.abs(ratio - 1.0) < 0.15, s"JL mean norm ratio $ratio")

    // the sign matrix depends only on (i, j, seed) — never on the data
    // or partitioning: a repartitioned input projects identically
    val again = Quantize.signProject(
        corpus.repartition(7, col("vec_id")), "vec_id", "embedding", k)
      .collect().map(r => r.getLong(0) -> (1 to k).map(r.getDouble)).toMap
    val first = proj.collect()
      .map(r => r.getLong(0) -> (1 to k).map(r.getDouble)).toMap
    assert(again == first)
    // and a different seed is a different matrix
    val other = Quantize.signProject(corpus, "vec_id", "embedding", k, "s2")
      .collect().map(r => r.getLong(0) -> (1 to k).map(r.getDouble)).toMap
    assert(other != first)
  }

  test("PQ codes are in range and codeword vectors encode losslessly") {
    val codes = Quantize.pqEncode(corpus, "vec_id", "embedding", books)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes.size == 500)
    codes.values.foreach { cs =>
      assert(cs.length == 4)
      assert(cs.forall(c => c >= 0 && c < 16))
    }
    // a vector that IS a codeword source has distance 0 to its own
    // codeword in every subspace, so each code must reconstruct that
    // subvector exactly (tie-break may pick a lower code only if two
    // source vectors share a subvector — check reconstruction, not id)
    val byId = corpus.filter(col("vec_id") < 16).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    (0L until 16L).foreach { v =>
      val cs = codes(v)
      (0 until 4).foreach { sub =>
        val rec = books(sub)(cs(sub))
        val want = byId(v).slice(sub * 16, sub * 16 + 16)
        assert(rec.sameElements(want),
          s"vec $v sub $sub: code ${cs(sub)} does not reconstruct exactly")
      }
    }
  }

  test("ADC distance to a codeword-source vector equals exact L2^2") {
    val codes = Quantize.pqEncode(corpus, "vec_id", "embedding", books)
    // large k so the codeword-source vectors appear in each probe's list
    val adc = Quantize.pqSearchAdc(codes, probes, k = 500, books)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val vecs = corpus.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    (0L until 3L).foreach { p =>
      (0L until 16L).filter(_ != p).foreach { v =>
        val exact = vecs(p).zip(vecs(v))
          .map { case (x, y) => (x.toDouble - y.toDouble) * (x.toDouble - y.toDouble) }.sum
        val got = adc((p, v))
        assert(math.abs(got - exact) <= 1e-9 * math.max(1.0, exact),
          s"probe $p vec $v: adist $got != exact $exact")
      }
    }
  }

  test("Lloyd training never increases PQ distortion") {
    val pts = corpus.collect().map(_.getSeq[Float](1).toArray)
    val seed = Quantize.pqTrainCodebooks(corpus, "vec_id", "embedding",
      m = 4, ksub = 16, iters = 0, sampleN = 512)
    val trained = Quantize.pqTrainCodebooks(corpus, "vec_id", "embedding",
      m = 4, ksub = 16, iters = 5, sampleN = 512)
    val d0 = Quantize.pqDistortion(pts, seed)
    val d5 = Quantize.pqDistortion(pts, trained)
    // sampleN=512 >= |corpus|, so training sees every point and k-means
    // monotonicity applies to this exact distortion
    assert(d5 <= d0 + 1e-9, s"training increased distortion: $d0 -> $d5")
    assert(d5 < d0, "five Lloyd rounds should strictly improve the seeds here")
    // trained search still returns a full top-k per probe
    val res = Quantize.pqSearchAdc(
      Quantize.pqEncode(corpus, "vec_id", "embedding", trained),
      probes, k = 5, trained).collect()
    assert(res.length == 15)
    assert(res.forall(_.getDouble(2) >= 0.0))
  }

  test("refined search recovers recall over raw ADC") {
    val codes = Quantize.pqEncode(corpus, "vec_id", "embedding", books)
    def topSet(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (p, vs) => p -> vs.map(_._2).toSet }
    // exact L2 top-5 ground truth
    val vecs = corpus.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def l2(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => (x.toDouble - y.toDouble) * (x.toDouble - y.toDouble) }.sum
    val truth = (0L until 3L).map { p =>
      p -> vecs.keys.filter(_ != p).toSeq
        .sortBy(v => (l2(vecs(p), vecs(v)), v)).take(5).toSet
    }.toMap
    val adc = topSet(Quantize.pqSearchAdc(codes, probes, k = 5, books))
    val refined = topSet(Quantize.pqSearchRefined(codes, corpus, probes,
      shortlistK = 20, k = 5, books))
    val shortlist = topSet(Quantize.pqSearchAdc(codes, probes, k = 20, books))
    (0L until 3L).foreach { p =>
      assert(refined(p).subsetOf(shortlist(p)),
        s"probe $p: refined result escaped the shortlist")
      assert(refined(p).size == 5)
    }
    val adcHits = (0L until 3L).map(p => (adc(p) & truth(p)).size).sum
    val refHits = (0L until 3L).map(p => (refined(p) & truth(p)).size).sum
    assert(refHits >= adcHits,
      s"refinement lost recall: adc $adcHits -> refined $refHits of 15")
    assert(refHits > adcHits,
      s"on this corpus the 20-deep shortlist should strictly improve " +
        s"recall (adc $adcHits, refined $refHits)")
  }

  test("semanticDedup: kept set is near-duplicate-free within cells") {
    val cents = corpus.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cell"), col("embedding").as("ce"))
    val res = Similarity.semanticDedup(corpus, cents, threshold = 0.4)
    val rows = res.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(rows.size == 500, "semanticDedup must emit one row per vector")
    assert(rows.values.exists(!_._2), "threshold 0.4 should drop something")
    assert(rows.values.count(_._2) > 250, "should keep a majority")
    val exactPairs = Similarity.embeddingCosinePairs(corpus, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach { case (v, (cell, kept)) =>
      val lowerMates = rows.filter { case (o, (c, _)) => c == cell && o < v }.keySet
      val hasLowerNeighbor = lowerMates.exists(o => exactPairs.contains((o, v)))
      assert(kept == !hasLowerNeighbor,
        s"vec $v keep=$kept but lower-id near neighbor present=$hasLowerNeighbor")
    }
  }

  test("globalOrder emits the exact single-sort permutation") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        least(lit(9L), floor(col("n_chars") / lit(500.0)).cast("long")).as("bin"))
    val got = Sampling.globalOrder(docs, "doc_id", "bin")
      .select(col("doc_id"), col("bin"), col("pos")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == 500)
    // pos is a contiguous permutation
    assert(got.map(_._3).sorted.toSeq == (0L until 500L).toSeq)
    // and equals the naive definition: order by (bin, salted hash, id)
    val naive = docs
      .withColumn("__hv", graft.operators.Dedup.baseHash32(
        concat(col("doc_id").cast("string"), lit(":order"))))
      .orderBy(col("bin"), col("__hv"), col("doc_id"))
      .select(col("doc_id")).collect().map(_.getLong(0))
    val byPos = got.sortBy(_._3).map(_._1)
    assert(byPos.sameElements(naive), "two-phase order drifted from single-sort")
  }
}
