package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** SentencePiece-style UNIGRAM language-model tokenizer (Kudo 2018,
  * public algorithm) — the second tokenizer family next to
  * [[CorpusStats]]' BPE, sharing its scale split:
  *
  *   - all distributed work runs over the DISTINCT-WORD table
  *     (vocabulary-bounded; the corpus token stream is scanned exactly
  *     once to build it);
  *   - the PIECE table is tokenizer-sized and rides the driver ↔
  *     executors as a broadcast literal, never a shuffle side;
  *   - each hard-EM round is ONE distributed job: Viterbi-segment every
  *     distinct word under the current piece scores (an imperative DP —
  *     the sanctioned `mapPartitions` case: per-character loops with
  *     backtracking have no declarative form) and aggregate the
  *     weighted piece counts, which collect under the same
  *     tokenizer-sized bound.
  *
  * Determinism: counts are exact integers; scores are
  * `StrictMath.log(count) − StrictMath.log(total)` (StrictMath is
  * bit-identical across JVMs, unlike Math); per-word DP accumulates
  * left-to-right in a fixed order; score ties prefer the LONGER last
  * piece. UnigramLmSpec pins the distributed trainer against an
  * in-memory reference on random corpora. Cross-engine SQL oracles
  * cannot express the float Viterbi, so the trained surface registers
  * rows-only (q129/q130) while the integer seeding step (q128) is
  * hash-exact.
  */
object UnigramLm {

  /** Hard bound on the collected piece ledger (counts collect once per
    * EM round): fail loudly before an absurd seed configuration OOMs
    * the driver. */
  val MaxPieceLedger: Long = 1L << 21

  private def wordTable(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextAnalysis.tokens(col(textCol))).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("wc"))

  /** Seed vocabulary: every substring of length 1..`maxLen` of every
    * corpus word, weighted by word occurrence (one credit per position
    * per occurrence), global top-`topK` by (weight DESC, piece ASC) —
    * a TakeOrdered, never a full sort — UNION all single characters
    * (the coverage floor Viterbi segmentation needs). SQL-expressible
    * and certified hash-exact (q128). */
  def seedPieces(df: DataFrame, textCol: String, maxLen: Int = 4,
                 topK: Int = 512): DataFrame = {
    require(maxLen >= 1 && topK >= 1, s"maxLen/topK must be >= 1")
    val subs = wordTable(df, textCol)
      .select(col("wc"), explode(flatten(
        transform(sequence(lit(1), length(col("__w"))), i =>
          transform(sequence(lit(1),
            least(lit(maxLen), length(col("__w")) - i + 1)), l =>
            col("__w").substr(i, l))))).as("piece"))
      .groupBy(col("piece")).agg(sum(col("wc")).as("n_occ"))
    val top = subs.orderBy(col("n_occ").desc, col("piece")).limit(topK)
    top.unionByName(subs.filter(length(col("piece")) === 1)).distinct()
  }

  /** Viterbi segmentation of `w` under `scores`; returns piece
    * boundaries as lengths (reversed walk), or null when some character
    * is unscored (impossible on the training corpus — the seed keeps
    * every single character). Ties prefer the longer last piece. */
  private def viterbi(w: String, scores: collection.Map[String, Double],
                      maxLen: Int): Array[String] = {
    val n = w.length
    val dp = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = new Array[Int](n + 1)
    dp(0) = 0.0
    var i = 1
    while (i <= n) {
      var l = 1
      val lm = math.min(maxLen, i)
      while (l <= lm) {
        scores.get(w.substring(i - l, i)) match {
          case Some(s) =>
            val cand = dp(i - l) + s
            if (cand >= dp(i)) { dp(i) = cand; back(i) = l }
          case None => ()
        }
        l += 1
      }
      i += 1
    }
    if (dp(n) == Double.NegativeInfinity) return null
    var out = List.empty[String]
    var p = n
    while (p > 0) { out = w.substring(p - back(p), p) :: out; p -= back(p) }
    out.toArray
  }

  /** Train the unigram LM: seed, then `emRounds` hard-EM rounds (one
    * distributed Viterbi-count job each), then prune to the `vocabSize`
    * highest-count pieces (single characters always survive — the
    * coverage floor). Returns (piece, n_occ): the final round's exact
    * integer Viterbi counts of the kept pieces. */
  def train(df: DataFrame, textCol: String, vocabSize: Int = 256,
            emRounds: Int = 3, maxPieceLen: Int = 4,
            seedK: Int = 2048): DataFrame = {
    require(vocabSize >= 1 && emRounds >= 1 && emRounds <= 64,
      s"vocabSize >= 1 and 1 <= emRounds <= 64 required")
    val spark = df.sparkSession
    import spark.implicits._
    val words = wordTable(df, textCol)
      .select(col("__w"), col("wc")).as[(String, Long)]
      .localCheckpoint(false)
    val seed = seedPieces(df, textCol, maxPieceLen, seedK)
    require(seed.count() <= MaxPieceLedger,
      s"unigram seed exceeds the MaxPieceLedger=$MaxPieceLedger driver bound")
    var counts: Map[String, Long] = seed.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    var round = 0
    while (round < emRounds) {
      val total = counts.valuesIterator.sum
      val logZ = StrictMath.log(total.toDouble)
      val scores = counts.map { case (p, c) =>
        p -> (StrictMath.log(c.toDouble) - logZ) }
      val bc = spark.sparkContext.broadcast(scores)
      val next = words.mapPartitions(_.flatMap { case (w, wc) =>
        val seg = viterbi(w, bc.value, maxPieceLen)
        if (seg == null) Iterator.empty
        else seg.iterator.map(p => (p, wc))
      }).toDF("piece", "wc")
        .groupBy(col("piece")).agg(sum(col("wc")).as("n"))
        .collect()
      // pieces unused by every Viterbi path drop out (the EM prune),
      // but single characters stay scored for coverage: an unused char
      // keeps count 1 so later rounds can still segment through it
      counts = next.map(r => r.getString(0) -> r.getLong(1)).toMap ++
        counts.keysIterator.filter(p => p.length == 1 &&
          !next.exists(_.getString(0) == p)).map(_ -> 1L).toMap
      round += 1
    }
    val kept = counts.toSeq
      .sortBy { case (p, c) => (-c, p) }
      .take(vocabSize)
      .map(_._1).toSet ++ counts.keysIterator.filter(_.length == 1)
    counts.filter { case (p, _) => kept(p) }
      .toSeq.sortBy { case (p, c) => (-c, p) }
      .toDF("piece", "n_occ")
  }

  private def logSumExp(a: Double, b: Double): Double =
    if (a == Double.NegativeInfinity) b
    else if (b == Double.NegativeInfinity) a
    else {
      val m = math.max(a, b)
      m + StrictMath.log(StrictMath.exp(a - m) + StrictMath.exp(b - m))
    }

  /** Forward-backward over one word's segmentation lattice: the
    * EXPECTED number of times each piece occurs across ALL segmentations
    * of `w`, weighted by segmentation probability under `scores` — the
    * E-step quantity of full EM (Kudo 2018 §3.2), where hard EM's
    * Viterbi counts only credit the single best path. Also returns the
    * word's log-marginal (the lattice partition function). Null when
    * some character is unscored. Deterministic: fixed left-to-right /
    * right-to-left accumulation order, StrictMath only. */
  private[operators] def wordExpectedCounts(
      w: String, scores: collection.Map[String, Double], maxLen: Int)
      : (collection.Map[String, Double], Double) = {
    val n = w.length
    val alpha = Array.fill(n + 1)(Double.NegativeInfinity)
    val beta = Array.fill(n + 1)(Double.NegativeInfinity)
    alpha(0) = 0.0
    var i = 1
    while (i <= n) {
      var l = 1
      val lm = math.min(maxLen, i)
      while (l <= lm) {
        scores.get(w.substring(i - l, i)) match {
          case Some(s) => alpha(i) = logSumExp(alpha(i), alpha(i - l) + s)
          case None => ()
        }
        l += 1
      }
      i += 1
    }
    if (alpha(n) == Double.NegativeInfinity) return null
    beta(n) = 0.0
    i = n - 1
    while (i >= 0) {
      var l = 1
      val lm = math.min(maxLen, n - i)
      while (l <= lm) {
        scores.get(w.substring(i, i + l)) match {
          case Some(s) => beta(i) = logSumExp(beta(i), s + beta(i + l))
          case None => ()
        }
        l += 1
      }
      i -= 1
    }
    val out = scala.collection.mutable.HashMap.empty[String, Double]
    i = 1
    while (i <= n) {
      var l = 1
      val lm = math.min(maxLen, i)
      while (l <= lm) {
        val p = w.substring(i - l, i)
        scores.get(p) match {
          case Some(s) =>
            val post = StrictMath.exp(alpha(i - l) + s + beta(i) - alpha(n))
            if (post > 0.0) out.update(p, out.getOrElse(p, 0.0) + post)
          case None => ()
        }
        l += 1
      }
      i += 1
    }
    (out, alpha(n))
  }

  /** Full-EM unigram training — the public SentencePiece algorithm
    * (Kudo 2018): each EM round computes forward-backward EXPECTED piece
    * counts over every word's whole segmentation lattice (one
    * distributed job, same word-table split as [[train]]) and
    * re-estimates piece probabilities from them; after the EM rounds,
    * pieces prune by LIKELIHOOD LOSS — the corpus log-likelihood cost of
    * removing the piece, approximated (as in the public implementation)
    * by re-segmenting the piece's own string with the remaining
    * vocabulary: loss(x) = E[count(x)] · (score(x) − altScore(x)).
    * Single characters never prune (coverage floor). Returns
    * (piece, expected_n, score) for the kept vocabulary, ordered by
    * (expected_n DESC, piece ASC).
    *
    * Scale: identical shape to [[train]] — distributed work is one
    * lattice pass per round over the DISTINCT-WORD table; the piece
    * ledger (bounded by [[MaxPieceLedger]]) and the pruning loop are
    * driver-side and tokenizer-sized. Expected counts are float
    * (lattice marginals), so the trained surface registers rows-only
    * like q129/q130 — UnigramLmSpec pins the distributed trainer
    * against an in-memory reference within float tolerance. */
  def trainFullEm(df: DataFrame, textCol: String, vocabSize: Int = 256,
                  emRounds: Int = 2, maxPieceLen: Int = 4,
                  seedK: Int = 2048): DataFrame = {
    require(vocabSize >= 1 && emRounds >= 1 && emRounds <= 64,
      s"vocabSize >= 1 and 1 <= emRounds <= 64 required")
    val spark = df.sparkSession
    import spark.implicits._
    val words = wordTable(df, textCol)
      .select(col("__w"), col("wc")).as[(String, Long)]
      .localCheckpoint(false)
    val seed = seedPieces(df, textCol, maxPieceLen, seedK)
    require(seed.count() <= MaxPieceLedger,
      s"unigram seed exceeds the MaxPieceLedger=$MaxPieceLedger driver bound")
    var counts: Map[String, Double] = seed.collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    var scores: Map[String, Double] = Map.empty
    var round = 0
    while (round < emRounds) {
      val total = counts.valuesIterator.sum
      val logZ = StrictMath.log(total)
      scores = counts.map { case (p, c) =>
        p -> (StrictMath.log(c) - logZ) }
      val bc = spark.sparkContext.broadcast(scores)
      val next = words.mapPartitions(_.flatMap { case (w, wc) =>
        val ec = wordExpectedCounts(w, bc.value, maxPieceLen)
        if (ec == null) Iterator.empty
        else ec._1.iterator.map { case (p, e) => (p, e * wc) }
      }).toDF("piece", "e")
        .groupBy(col("piece")).agg(sum(col("e")).as("e"))
        .collect()
      // the char coverage floor survives EM exactly as in hard EM: a
      // character no lattice path uses keeps a unit count so later
      // rounds (and OOV-ish words) can still segment through it
      val observed = next.map(r => r.getString(0) -> r.getDouble(1)).toMap
      counts = observed ++
        counts.keysIterator.filter(p => p.length == 1 &&
          !observed.contains(p)).map(_ -> 1.0).toMap
      round += 1
    }
    val totalF = counts.valuesIterator.sum
    val logZF = StrictMath.log(totalF)
    scores = counts.map { case (p, c) => p -> (StrictMath.log(c) - logZF) }
    // likelihood-loss pruning: what removing the piece costs the corpus
    // likelihood if every occurrence re-segments via the best
    // alternative path for the piece's own string
    // chars are the coverage floor and never rank for the budget — the
    // vocabSize slots go to the multi-char pieces costliest to remove
    val losses = counts.collect { case (p, c) if p.length > 1 =>
      val alt = viterbi(p, scores - p, maxPieceLen)
      val altScore =
        if (alt == null) Double.NegativeInfinity
        else alt.iterator.map(scores).sum
      p -> c * (scores(p) - altScore)
    }
    val kept = losses.toSeq
      .sortBy { case (p, l) => (-l, p) }
      .take(vocabSize)
      .map(_._1).toSet ++ counts.keysIterator.filter(_.length == 1)
    counts.filter { case (p, _) => kept(p) }
      .toSeq.map { case (p, c) => (p, c, scores(p)) }
      .sortBy { case (p, c, _) => (-c, p) }
      .toDF("piece", "expected_n", "score")
  }

  /** Encode the corpus with a trained piece table: per document, the
    * whitespace token count and the unigram piece count after Viterbi
    * segmentation — the sequence-length number this tokenizer's packing
    * budget pays. Words with uncovered characters count as `n_oov`.
    * One narrow distributed pass; only per-doc counters shuffle. */
  def encodedCounts(df: DataFrame, idCol: String, textCol: String,
                    pieces: DataFrame, maxPieceLen: Int = 4): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val counts = pieces.select(col("piece"), col("n_occ")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.valuesIterator.sum
    val logZ = StrictMath.log(total.toDouble)
    val scores = counts.map { case (p, c) =>
      p -> (StrictMath.log(c.toDouble) - logZ) }
    val bc = spark.sparkContext.broadcast(scores)
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        var nTok = 0L
        var nPieces = 0L
        var nOov = 0L
        text.split(" ").iterator.filter(_.nonEmpty).foreach { w =>
          nTok += 1
          val seg = viterbi(w, bc.value, maxPieceLen)
          if (seg == null) nOov += 1 else nPieces += seg.length
        }
        (id, nTok, nPieces, nOov)
      }).toDF(idCol, "n_tokens", "n_pieces", "n_oov")
  }
}
