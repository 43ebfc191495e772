package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.functions.VectorFunctions

/** The LSH-bucketed embedding near-dup scale path (q45) against its exact
  * all-pairs recall oracle (q24's form), on the sf0.01 driver corpus. */
class SimilaritySpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"
  private lazy val corpus =
    Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("vec_a"), col("vec_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("hardNegatives never returns a same-label vector and ranks by cosine") {
    val e = Tables.embeddings(spark, sfDir)
    val c = e.select(col("vec_id"), col("embedding"), col("label"))
    val p = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"),
        col("label").as("plabel"))
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cell"), col("embedding").as("ce"))
    val got = Similarity.hardNegatives(c, p, k = 3, cents)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getDouble(3), r.getLong(4)))
    assert(got.nonEmpty)
    val probeLabels = e.filter(col("vec_id") < 3).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    got.foreach { case (pid, vid, negLabel, _, _) =>
      assert(negLabel != probeLabels(pid),
        s"probe $pid got same-label negative $vid")
      assert(vid != pid)
    }
    got.groupBy(_._1).foreach { case (pid, rows) =>
      val byRank = rows.sortBy(_._5).map(_._4)
      assert(byRank.zip(byRank.drop(1)).forall { case (a, b) => a >= b },
        s"probe $pid negatives not in descending cosine order")
    }
  }

  test("incremental semantic dedup reports only true cross-slice near-dups") {
    val slice = pmod(graft.operators.Dedup.baseHash32(col("vec_id").cast("string")), lit(10))
    val corpusSide = corpus.filter(slice =!= 0)
    val batchSide = corpus.filter(slice === 0)
    val cents = corpus.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cell"), col("embedding").as("ce"))
    val got = Similarity.semanticDedupIncremental(corpusSide, batchSide, cents, 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty)
    val batchIds = batchSide.select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val corpusIds = corpusSide.select(col("vec_id")).collect().map(_.getLong(0)).toSet
    // direction: vec_id is always a batch member, dup_of always corpus
    got.foreach { case (v, d, cos) =>
      assert(batchIds.contains(v) && corpusIds.contains(d),
        s"pair ($v, $d) crosses the slice boundary the wrong way")
      assert(cos >= 0.35)
    }
    // every reported pair is a genuine near-dup per the exact all-pairs
    // oracle (cells only PRUNE candidates, never invent similarity)
    val exact = Similarity.embeddingCosinePairs(corpus, threshold = 0.35)
      .collect().map(r => Set(r.getLong(0), r.getLong(1))).toSet
    got.foreach { case (v, d, _) =>
      assert(exact.contains(Set(v, d)), s"pair ($v, $d) not in exact pair set")
    }
  }

  test("bucketed pairs are a subset of exact pairs with identical cosines") {
    val exact = Similarity.embeddingCosinePairs(corpus, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val bucketed = Similarity.embeddingCosinePairsBucketed(corpus, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // LSH only PRUNES candidates: every surviving pair must exist in the
    // exact set with a bit-identical cosine (same codegen'd kernel)
    bucketed.foreach { case (pair, cos) =>
      assert(exact.contains(pair), s"pair $pair not in exact result")
      assert(exact(pair) == cos, s"cosine drift for $pair")
    }
  }

  test("bucketed recall is acceptable at the threshold and near-total above it") {
    val exactDf = Similarity.embeddingCosinePairs(corpus, threshold = 0.4)
    val exact = pairSet(exactDf)
    val got = pairSet(
      Similarity.embeddingCosinePairsBucketed(corpus, threshold = 0.4))
    assert(exact.nonEmpty)
    val recall = (exact & got).size.toDouble / exact.size
    // the sf corpus' near-dup pairs sit right AT the threshold (median
    // cosine ≈ 0.42) — the hardest case for sign-LSH, where a hyperplane
    // splits a pair with p ≈ arccos(0.4)/π ≈ 0.37 per bit
    assert(recall >= 0.60, s"threshold-edge recall $recall < 0.60")
    // pairs comfortably above the threshold (the ones dedup must not
    // miss) collide with much higher probability
    val strong = pairSet(exactDf.filter(col("cosine") >= 0.45))
    if (strong.nonEmpty) {
      val strongRecall = (strong & got).size.toDouble / strong.size
      assert(strongRecall >= recall,
        s"strong-pair recall $strongRecall below overall $recall")
    }
  }

  test("Lloyd-trained IVF centroids beat the first-N quantizer on recall") {
    // HELD-OUT probes: ids ≥ 100 never coincide with first-N centroid
    // vectors (ids < nCells), whose own cells would otherwise flatter the
    // untrained quantizer's recall
    val probes = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") >= 100 && col("vec_id") < 150)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
    def topkSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("probe_id"), col("vec_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = topkSet(Similarity.knnBruteForce(corpus, probes, k = 5))
    val firstN = topkSet(Similarity.annIvf(corpus, probes, k = 5, nCells = 8))
    val kmeans = topkSet(
      Similarity.annIvfKmeans(corpus, probes, k = 5, nCells = 8))
    def recall(got: Set[(Long, Long)]) = (exact & got).size.toDouble / exact.size
    val (rF, rK) = (recall(firstN), recall(kmeans))
    // trained cells follow the data distribution; first-N cells are
    // whatever vectors happened to carry the lowest ids
    assert(rK >= rF, s"kmeans recall $rK below first-N $rF")
    assert(rK >= 0.25, s"kmeans recall $rK unreasonably low")
    // determinism: training twice yields identical centroids
    val c1 = Similarity.trainIvfCentroids(corpus, nCells = 8)
    val c2 = Similarity.trainIvfCentroids(corpus, nCells = 8)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
  }

  test("multi-probe IVF recall rises monotonically toward brute force") {
    val probes = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") >= 100 && col("vec_id") < 150)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
    def topkSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("probe_id"), col("vec_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = topkSet(Similarity.knnBruteForce(corpus, probes, k = 5))
    def recall(np: Int) = {
      val s = topkSet(Similarity.annIvf(corpus, probes, k = 5, nCells = 8,
        nprobe = np))
      (exact & s).size.toDouble / exact.size
    }
    val (r1, r2, r8) = (recall(1), recall(2), recall(8))
    assert(r1 <= r2 && r2 <= r8, s"recall not monotone: $r1 / $r2 / $r8")
    // probing every cell IS brute force
    assert(r8 == 1.0, s"nprobe=nCells recall $r8 != 1.0")
  }

  test("knnBruteForce rejects a probe side past the broadcast bound") {
    val probes = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") < 50)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
    // construction runs no job; the guard fires with the query
    val guarded = Similarity.knnBruteForce(corpus, probes, k = 3, maxProbes = 10)
    val e = intercept[Exception] { guarded.count() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("maxProbes")),
      s"expected the maxProbes guard, got: $e")
    // under the bound the same plan runs fine
    assert(Similarity.knnBruteForce(corpus, probes, k = 3, maxProbes = 50)
      .count() > 0)
  }

  test("random hyperplanes spread the corpus across buckets in every table") {
    val tables = 8
    val bits = 4
    val withBkts = corpus.select(col("vec_id"),
      array((0 until tables).map(t =>
        VectorFunctions.hyperplaneBucket(col("embedding"), t, bits)): _*)
        .as("bkts"))
    val n = corpus.count()
    (0 until tables).foreach { t =>
      val sizes = withBkts
        .groupBy(element_at(col("bkts"), t + 1).as("bucket"))
        .agg(count(lit(1)).as("sz"))
        .collect().map(_.getAs[Long]("sz"))
      // no degenerate pile-up: the largest of the 2^bits buckets holds
      // under half the corpus (uniform would be ~1/16)
      assert(sizes.max < n / 2, s"table $t: largest bucket ${sizes.max} of $n")
      assert(sizes.length >= (1 << bits) / 2, s"table $t: only ${sizes.length} buckets in use")
    }
  }
}
