package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding quantization: int8 scalar quantization (storage/bandwidth
  * compression with an error report) and product quantization (PQ) with
  * asymmetric-distance (ADC) search — the classic IVF-PQ memory path.
  *
  * Why this matters at 100 TB: a 64-dim float32 embedding is 256 bytes;
  * its int8 form is 64 bytes + one scale, and its PQ code is `m` bytes
  * (m=4 here — a 64× reduction). Every shuffle-heavy stage downstream of
  * encoding (candidate joins, re-ranking feeds, index builds) moves codes
  * instead of vectors, which is the difference between a network-bound
  * and a CPU-bound job at cluster scale.
  *
  * All float arithmetic is double-accumulated strictly left-to-right so
  * the DuckDB oracle reproduces results bit-exactly (the
  * [[graft.functions.VectorOps]] contract).
  */
object Quantize {

  /** Per-element double view of an ARRAY<FLOAT> column's element. */
  private def d(x: Column): Column = x.cast("double")

  /** Per-vector symmetric scale: max|x| / 127. */
  private def int8Scale(e: Column): Column =
    aggregate(e, lit(0.0), (acc, x) => greatest(acc, abs(d(x)))) / lit(127.0)

  /** The ONE quantized-value definition (double form; reconstruction is
    * qv*scale) — [[int8Quantize]]'s error report, [[int8Codes]]'s GEMM
    * codes, and the mirrored oracle formula all hinge on these staying
    * identical. */
  private def qv(x: Column, s: Column): Column =
    when(s === 0d, lit(0.0))
      .otherwise(least(lit(127.0), greatest(lit(-127.0), floor(d(x) / s + lit(0.5)))))

  /** Symmetric per-vector int8 scalar quantization with a reconstruction
    * error report. scale = max|x|/127 (0 for the all-zero vector); code_i
    * = clamp(floor(x_i/scale + 0.5), ±127) — floor(x+0.5) rather than
    * round() because engines disagree on half-even vs half-away ties,
    * and floor(x+0.5) is dialect-portable bit-for-bit.
    *
    * Output: (id, scale, mse, code_sum) — `mse` is the mean squared
    * reconstruction error (left-to-right sum), `code_sum` a checksum of
    * the code array so the oracle pins the codes themselves without
    * hashing an array column. Pure narrow projection: no shuffle, no
    * UDF, whole-stage codegen throughout — scales linearly. */
  def int8Quantize(df: DataFrame, idCol: String, embCol: String): DataFrame = {
    val e = col(embCol)
    val withS = df.select(col(idCol), e.as("__e"), int8Scale(e).as("scale"))
    val err = aggregate(col("__e"), lit(0.0),
      (acc, x) => acc + (d(x) - qv(x, col("scale")) * col("scale")) *
        (d(x) - qv(x, col("scale")) * col("scale")))
    val codeSum = aggregate(col("__e"), lit(0L),
      (acc, x) => acc + qv(x, col("scale")).cast("long"))
    withS.select(col(idCol), col("scale"),
      (err / size(col("__e"))).as("mse"), codeSum.as("code_sum"))
  }

  /** Symmetric int8 codes as a long array — the storage/GEMM form of
    * [[int8Quantize]] (same qv definition, exact on both engines; an
    * integer code dot product is what an int8 reranker GEMM computes).
    * One narrow projection, no shuffle. */
  def int8Codes(df: DataFrame, idCol: String, embCol: String): DataFrame = {
    val e = col(embCol)
    df.select(col(idCol), e.as("__e"), int8Scale(e).as("__s"))
      .select(col(idCol),
        transform(col("__e"), x => qv(x, col("__s")).cast("long")).as("codes"))
  }

  /** Deterministic Johnson–Lindenstrauss sign projection: y_j = Σ_i
    * s(i,j)·x_i with s(i,j) ∈ {±1} derived from an md5 hash of (i,j) —
    * the Achlioptas construction with the random matrix replaced by the
    * repo's dialect-portable hash, so BOTH engines materialize the SAME
    * matrix from nothing (no matrix to ship or store, exactly why sign
    * projections beat learned projections at 100 TB: the "model" is a
    * formula). A 64-dim float32 embedding becomes k doubles — the cheap
    * front-end that lets the LSH/IVF candidate stages run on k≪dim
    * components; JL guarantees pairwise distances are preserved within
    * (1±ε) with high probability, and the norm report the registered
    * query emits makes that measurable per vector (E[‖y‖²/k] = ‖x‖²).
    * Pure narrow projection — no shuffle, no UDF; sums are strict
    * left-to-right doubles (the VectorOps contract) so the oracle
    * replays them bit-for-bit. */
  def signProject(df: DataFrame, idCol: String, embCol: String,
                  k: Int, seed: String = "jl",
                  carry: Seq[Column] = Nil): DataFrame = {
    require(k >= 1 && k <= 64, s"k must be in [1, 64], got $k")
    val e = col(embCol)
    def signed(j: Int): Column = aggregate(
      zip_with(e, sequence(lit(0), size(e) - 1), (x, i) =>
        when(pmod(conv(substring(md5(
          concat(i.cast("string"), lit(s":$j:$seed")).cast("binary")),
          1, 8), 16, 10).cast("long"), lit(2L)) === 0L, d(x))
          .otherwise(-d(x))),
      lit(0.0), (acc, x) => acc + x)
    // `carry` rides the same single projection (e.g. the norm report) —
    // a separate select would force a second scan plus a join
    df.select(col(idCol) +: (0 until k).map(j => signed(j).as(s"y$j"))
      ++: carry: _*)
  }

  /** Deterministic PQ codebooks: subvector `sub` of the first `ksub`
    * ids is codeword (sub, code=id). Oracle-reproducible in SQL (the
    * [[Similarity.annIvf]] first-N-centroids trick, per subspace).
    * Index-construction ACTION: collects m*ksub tiny rows (like
    * [[Similarity.trainIvfCentroids]]) so the codebook can ride every
    * encode/search plan as a literal — encode then needs no join at all. */
  def pqCodebooks(corpus: DataFrame, idCol: String, embCol: String,
                  m: Int, ksub: Int): Array[Array[Array[Float]]] = {
    val dim = corpus.select(size(col(embCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subDim = dim / m
    val rows = corpus.filter(col(idCol) < ksub)
      .select(col(idCol), col(embCol)).collect()
    require(rows.length == ksub, s"need ids 0..${ksub - 1} present, got ${rows.length}")
    val byId = rows.map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    Array.tabulate(m, ksub) { (sub, code) =>
      byId(code.toLong).slice(sub * subDim, (sub + 1) * subDim)
    }
  }

  /** Squared L2 distance between a subvector window of `e` and a literal
    * codeword: one codegen'd [[graft.functions.SubvectorL2]] node per
    * candidate (a fused left-to-right loop — bit-identical to the
    * oracle's list_reduce and to the unrolled per-element form, without
    * the ~10 MB serialized expression tree the unrolled form cost). */
  private def subL2(e: Column, sub: Int, subDim: Int, cw: Array[Float]): Column =
    graft.functions.VectorFunctions.subvector_l2(e, typedlit(cw.toSeq), sub * subDim)

  /** PQ-encode every vector: `codes[sub]` = argmin over the subspace's
    * codewords of squared L2 (ties to the lower code). The codebook is a
    * literal, so this is a pure narrow projection — the argmin is an
    * array_min over (distance, code) structs, all inside codegen; no
    * join, no shuffle, nothing but codes ever leaves the scan. */
  def pqEncode(corpus: DataFrame, idCol: String, embCol: String,
               books: Array[Array[Array[Float]]]): DataFrame = {
    val m = books.length
    val subDim = books(0)(0).length
    val codeCols = (0 until m).map { sub =>
      val cands = array(books(sub).zipWithIndex.map { case (cw, code) =>
        struct(subL2(col(embCol), sub, subDim, cw).as("d"),
          lit(code).as("code"))
      }: _*)
      array_min(cands).getField("code")
    }
    corpus.select(col(idCol), array(codeCols: _*).as("codes"))
  }

  /** Lloyd-trained PQ codebooks: per-subspace L2 k-means over a bounded,
    * deterministic hash-sample of the corpus, on the driver — the same
    * training-action contract as [[Similarity.trainIvfCentroids]] (one
    * bounded collect; the result rides every plan as a literal). Seeds
    * are the first `ksub` sample subvectors; empty cells keep their
    * centroid; plain (non-spherical) means because PQ optimizes L2
    * reconstruction, not cosine. Distortion is non-increasing per Lloyd
    * round (asserted in QuantizeSpec). */
  def pqTrainCodebooks(corpus: DataFrame, idCol: String, embCol: String,
                       m: Int, ksub: Int, iters: Int = 5,
                       sampleN: Int = 4096): Array[Array[Array[Float]]] = {
    val dim = corpus.select(size(col(embCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subDim = dim / m
    val sample: Array[Array[Float]] = corpus
      .select(col(idCol), col(embCol))
      .withColumn("__h", xxhash64(col(idCol)))
      // id as secondary sort key: a hash collision at the limit() cut
      // would otherwise make the sample — and the trained codebooks —
      // partition-order-dependent
      .orderBy(col("__h"), col(idCol))
      .limit(sampleN)
      .select(col(embCol))
      .collect()
      .map(_.getSeq[Float](0).toArray)
    require(sample.length >= ksub, s"sample ${sample.length} < $ksub codewords")
    Array.tabulate(m) { sub =>
      val pts = sample.map(v => v.slice(sub * subDim, (sub + 1) * subDim)
        .map(_.toDouble))
      var cents = pts.take(ksub).map(_.clone())
      (0 until iters).foreach { _ =>
        val sums = Array.fill(ksub)(new Array[Double](subDim))
        val counts = new Array[Int](ksub)
        pts.foreach { p =>
          var best = 0; var bestD = Double.PositiveInfinity
          var c = 0
          while (c < ksub) {
            var acc = 0.0; var i = 0
            while (i < subDim) {
              val diff = p(i) - cents(c)(i); acc += diff * diff; i += 1
            }
            if (acc < bestD) { bestD = acc; best = c }
            c += 1
          }
          var i = 0
          while (i < subDim) { sums(best)(i) += p(i); i += 1 }
          counts(best) += 1
        }
        cents = cents.zipWithIndex.map { case (old, c) =>
          if (counts(c) == 0) old else sums(c).map(_ / counts(c))
        }
      }
      cents.map(_.map(_.toFloat))
    }
  }

  /** Mean L2^2 reconstruction distortion of `books` over `pts` (driver
    * helper for training diagnostics/tests). */
  def pqDistortion(pts: Array[Array[Float]],
                   books: Array[Array[Array[Float]]]): Double = {
    val m = books.length
    val subDim = books(0)(0).length
    pts.map { v =>
      (0 until m).map { sub =>
        books(sub).map { cw =>
          var acc = 0.0; var i = 0
          while (i < subDim) {
            val d0 = v(sub * subDim + i).toDouble - cw(i).toDouble
            acc += d0 * d0; i += 1
          }
          acc
        }.min
      }.sum
    }.sum / math.max(1, pts.length)
  }

  /** Asymmetric-distance top-k search over PQ codes.
    *
    * Classic ADC: each probe precomputes a distance table d(sub, code) =
    * L2²(probe subvector, codeword); a corpus vector's approximate
    * distance is the sum of m table lookups on its codes. Spark shape:
    * the tables (|probes| * m * ksub tiny rows) BROADCAST against the
    * exploded code column — the corpus side contributes (id, sub, code)
    * ints only, so at 100 TB the scan-side traffic is bytes per vector,
    * never floats. The per-sub sums are added in fixed sub order (each
    * (probe, id, sub) has exactly one row), keeping the double sum
    * bit-deterministic under any row order. */
  def pqSearchAdc(codes: DataFrame, probes: DataFrame, k: Int,
                  books: Array[Array[Array[Float]]]): DataFrame = {
    val m = books.length
    val subDim = books(0)(0).length
    // distance tables: one row per (probe, sub, code); built by a narrow
    // projection on the (small) probe side, then broadcast
    val entries = (0 until m).flatMap { sub =>
      books(sub).zipWithIndex.map { case (cw, code) =>
        struct(lit(sub).as("sub"), lit(code).as("code"),
          subL2(col("pe"), sub, subDim, cw).as("d"))
      }
    }
    val dtab = probes.select(col("probe_id"),
        explode(array(entries: _*)).as("e"))
      .select(col("probe_id"), col("e.sub"), col("e.code"), col("e.d"))
    val exploded = codes.select(col("vec_id"),
      posexplode(col("codes")).as(Seq("sub", "code")))
    val persub = exploded.join(broadcast(dtab), Seq("sub", "code"))
      .filter(col("vec_id") =!= col("probe_id"))
    // exactly one row per (probe, vec, sub) → per-sub "sums" are exact;
    // the cross-sub addition happens left-to-right in declared order
    val sumCols = (0 until m).map(s =>
      sum(when(col("sub") === s, col("d"))).as(s"__d$s"))
    val adist = persub.groupBy(col("probe_id"), col("vec_id"))
      .agg(sumCols.head, sumCols.tail: _*)
      .select(col("probe_id"), col("vec_id"),
        (0 until m).map(s => col(s"__d$s")).reduceLeft(_ + _).as("adist"))
    val w = Window.partitionBy(col("probe_id")).orderBy(asc("adist"), asc("vec_id"))
    adist.withColumn("rn", row_number().over(w).cast("long")).filter(col("rn") <= k)
  }

  /** Two-stage retrieval: ADC shortlist (`shortlistK` per probe), then
    * EXACT L2 re-rank of only the shortlisted vectors — the standard
    * recall-recovery step of quantized search. The full-precision read
    * is bounded to |probes| * shortlistK corpus rows: the shortlist
    * (tiny) broadcasts against the corpus scan, so at 100 TB the exact
    * kernel touches a vanishing, probe-proportional slice while the
    * bulk ranking ran on codes. */
  def pqSearchRefined(codes: DataFrame, corpus: DataFrame, probes: DataFrame,
                      shortlistK: Int, k: Int,
                      books: Array[Array[Array[Float]]]): DataFrame = {
    require(k <= shortlistK, s"k=$k must be <= shortlistK=$shortlistK")
    val short = pqSearchAdc(codes, probes, shortlistK, books)
      .select(col("probe_id"), col("vec_id"))
    val scored = corpus.join(broadcast(short), Seq("vec_id"))
      .join(broadcast(probes), Seq("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        graft.functions.VectorFunctions
          .subvector_l2(col("pe"), col("embedding"), 0).as("l2"))
    val w = Window.partitionBy(col("probe_id")).orderBy(asc("l2"), asc("vec_id"))
    scored.withColumn("rn", row_number().over(w).cast("long")).filter(col("rn") <= k)
  }
}
