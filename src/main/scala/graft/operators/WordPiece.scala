package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** WORDPIECE tokenizer (Schuster & Nakajima 2012; the BERT tokenizer,
  * public algorithm as documented by the HuggingFace tokenizers
  * library) — the third tokenizer family next to [[CorpusStats]]' BPE
  * and [[UnigramLm]], completing the production trio. Shares the
  * established scale split:
  *
  *   - ONE distributed corpus scan builds the distinct-word count
  *     table (vocabulary-bounded, Zipf: the same
  *     [[CorpusStats.MaxBpeWordLedger]]-style argument), which
  *     collects under a loud count-before-collect guard when it fits
  *     [[MaxWordLedger]];
  *   - the inherently sequential merge chain runs in-memory over that
  *     ledger (the [[CorpusStats.bpeTrainMergesDeep]] split every
  *     production trainer uses); a corpus PAST the word-ledger bound
  *     routes to [[trainDistributed]] — the word table stays
  *     distributed, the driver holds only pair/symbol count ledgers,
  *     one serial distributed round per merge (scores move globally
  *     with symbol counts, so BPE's fold-safe batching doesn't apply),
  *     capped loudly at [[MaxDistributedMerges]];
  *   - ENCODING runs once per DISTINCT word (greedy longest-match is
  *     an imperative per-character loop — the sanctioned
  *     `mapPartitions` case) and the corpus stream meets the encoded
  *     vocabulary through an 8-byte-hash join: word text never
  *     shuffles (the [[CorpusStats.bpeEncodedCounts]] discipline).
  *
  * WordPiece differs from BPE only in the SELECTION RULE: each round
  * merges the adjacent symbol pair maximizing the likelihood score
  * `count(ab) / (count(a) · count(b))` instead of the raw pair count.
  * Scores are compared EXACTLY as cross-multiplied BigInt rationals —
  * no float ever decides a merge, so training is bit-deterministic
  * and replay-stable (the property WordPieceSpec pins against a
  * brute-force reference). Ties break by (left, right) UTF-8 byte
  * order, the BPE comparator. Continuation symbols carry the `##`
  * prefix; the float-free training surface is still not expressible
  * in cross-engine SQL (the rational argmax chain), so the family
  * registers rows-only like q129/q139, carried by its spec.
  */
object WordPiece {

  /** In-memory path bound on the collected distinct-word ledger; a
    * corpus past it trains on the distributed path instead. */
  val MaxWordLedger: Long = 1L << 22

  /** Bound on the DRIVER ledger of the distributed path (distinct
    * adjacent pairs + distinct symbols — vocabulary-shaped, orders of
    * magnitude under the word count; the [[CorpusStats.MaxBpePairLedger]]
    * argument). */
  val MaxPairLedger: Long = 1L << 22

  /** Depth cap of the distributed fallback: WordPiece scores move
    * globally with symbol counts, so the distributed trainer is serial —
    * one distributed round per merge (no fold-safe batching as in BPE's
    * count argmax). The cap mirrors [[CorpusStats.bpeTrainMergesDeep]]'s
    * fallback contract: LOUD, the caller shards or lowers maxK. */
  val MaxDistributedMerges: Int = 1024

  private def distinctWords(df: DataFrame, textCol: String): DataFrame = df
    .select(explode(TextAnalysis.tokens(col(textCol))).as("__w"))
    .groupBy(col("__w")).agg(count(lit(1)).as("wc"))

  /** Trained merges + training alphabet, routing by corpus size: the
    * in-memory trainer under [[MaxWordLedger]] distinct words, the
    * serial distributed trainer above it ([[MaxDistributedMerges]]
    * depth). Both paths share [[selectBest]] and [[mergeWord]], so the
    * merge sequence is bit-identical wherever both can run
    * (property-pinned by WordPieceSpec). */
  private def trainRouted(df: DataFrame, textCol: String, maxK: Int)
      : (Seq[(Int, String, String, String, Long)], Set[String]) = {
    val spark = df.sparkSession
    import spark.implicits._
    val words = distinctWords(df, textCol).localCheckpoint(false)
    val nWords = words.count() // materializes; guards BEFORE collect
    if (nWords > MaxWordLedger) {
      require(maxK <= MaxDistributedMerges,
        s"corpus has $nWords distinct words (> in-memory ledger cap " +
          s"$MaxWordLedger) and the distributed WordPiece fallback is " +
          s"serial per merge, capped at $MaxDistributedMerges rounds; " +
          s"requested $maxK — shard the corpus or lower maxK")
      trainDistributed(
        words.select(col("__w"), col("wc")).as[(String, Long)]
          .map { case (w, c) => (c, toSymbols(w)) }, maxK)
    } else {
      val ledger = words.select(col("__w"), col("wc")).as[(String, Long)]
        .collect().map { case (w, c) => (c, toSymbols(w)) }
      (trainInMemory(ledger, maxK), ledger.iterator.flatMap(_._2).toSet)
    }
  }

  /** The over-ledger trainer: the distinct-word table STAYS distributed;
    * the driver holds only the vocabulary-shaped pair/symbol count
    * ledgers. Each round selects the argmax on the driver (the exact
    * BigInt rational, [[selectBest]] — shared with the in-memory path),
    * applies the one merge to the distributed word table with the shared
    * [[mergeWord]] kernel, and folds the bounded count deltas of the
    * affected words back into the ledgers — one distributed job per
    * round, lineage cut by a per-round checkpoint. */
  private[operators] def trainDistributed(
      wordsIn: Dataset[(Long, Array[String])], maxK: Int)
      : (Seq[(Int, String, String, String, Long)], Set[String]) = {
    val spark = wordsIn.sparkSession
    import spark.implicits._
    var words = wordsIn.localCheckpoint(false)
    // initial pair (kind 0) + symbol (kind 1) counts in ONE aggregation;
    // count() guards the driver bound before collect
    val init = words.flatMap { case (c, syms) =>
      val out = Seq.newBuilder[(Int, String, String, Long)]
      syms.foreach(s => out += ((1, s, "", c)))
      var j = 0
      while (j < syms.length - 1) {
        out += ((0, syms(j), syms(j + 1), c)); j += 1
      }
      out.result()
    }.toDF("kind", "a", "b", "d")
      .groupBy(col("kind"), col("a"), col("b")).agg(sum(col("d")).as("n"))
      .localCheckpoint(false)
    val nLedger = init.count()
    require(nLedger <= MaxPairLedger,
      s"WordPiece training: $nLedger distinct pairs+symbols exceed the " +
        s"MaxPairLedger=$MaxPairLedger driver bound")
    val pairs = scala.collection.mutable.HashMap.empty[(String, String), Long]
    val symCnt = scala.collection.mutable.HashMap.empty[String, Long]
    init.collect().foreach { r =>
      if (r.getInt(0) == 0) pairs((r.getString(1), r.getString(2))) = r.getLong(3)
      else symCnt(r.getString(1)) = r.getLong(3)
    }
    val alphabet = symCnt.keySet.toSet
    def bump(map: scala.collection.mutable.HashMap[(String, String), Long],
             k: (String, String), d: Long): Unit = {
      val next = map.getOrElse(k, 0L) + d
      if (next > 0L) map(k) = next else map.remove(k)
    }
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    var done = 0
    while (done < maxK && pairs.nonEmpty) {
      val ((a, b), n) = selectBest(pairs, symCnt)
      val m = a + b.stripPrefix("##")
      done += 1
      merges += ((done, a, b, m, n))
      // one distributed job: apply the merge to affected words and
      // aggregate their ± pair/symbol deltas (bounded by merge-site
      // neighbour diversity, like the in-memory incremental update)
      val step = words.map { case (c, syms) =>
        if (containsPair(syms, a, b)) (c, syms, mergeWord(syms, a, b, m))
        else (c, syms, null: Array[String])
      }.localCheckpoint(false)
      val deltas = step.filter(_._3 != null).flatMap { case (c, old, neu) =>
        val out = Seq.newBuilder[(Int, String, String, Long)]
        old.foreach(s => out += ((1, s, "", -c)))
        neu.foreach(s => out += ((1, s, "", c)))
        var j = 0
        while (j < old.length - 1) { out += ((0, old(j), old(j + 1), -c)); j += 1 }
        j = 0
        while (j < neu.length - 1) { out += ((0, neu(j), neu(j + 1), c)); j += 1 }
        out.result()
      }.toDF("kind", "a", "b", "d")
        .groupBy(col("kind"), col("a"), col("b")).agg(sum(col("d")).as("d"))
        .filter(col("d") =!= 0)
        .collect()
      deltas.foreach { r =>
        if (r.getInt(0) == 0) bump(pairs, (r.getString(1), r.getString(2)), r.getLong(3))
        else {
          val next = symCnt.getOrElse(r.getString(1), 0L) + r.getLong(3)
          if (next > 0L) symCnt(r.getString(1)) = next
          else symCnt.remove(r.getString(1))
        }
      }
      words = step.map { case (c, old, neu) => (c, if (neu == null) old else neu) }
    }
    (merges.result(), alphabet)
  }

  /** Word → WordPiece symbols: first character bare, continuations
    * prefixed `##` (code-point split, matching the BPE trainer's
    * `split("")` character unit). */
  private[operators] def toSymbols(w: String): Array[String] = {
    val cs = w.split("").filter(_.nonEmpty)
    cs.zipWithIndex.map { case (c, i) => if (i == 0) c else "##" + c }
  }

  /** Train up to `maxK` WordPiece merges over the corpus word table.
    * Output: (round, left_sym, right_sym, merged, n_occ) — n_occ the
    * exact pair count at selection time. Stops early at exhaustion. */
  def trainMerges(df: DataFrame, textCol: String, maxK: Int): DataFrame = {
    require(maxK > 0 && maxK <= (1 << 16),
      s"maxK merge budget must be in [1, 65536], got $maxK")
    val spark = df.sparkSession
    import spark.implicits._
    trainRouted(df, textCol, maxK)._1
      .toDF("round", "left_sym", "right_sym", "merged", "n_occ")
  }

  /** [[trainMerges]] FORCED onto the distributed path regardless of
    * corpus size — the explicit entry for (a) corpora known to be over
    * the word ledger without paying the routing count, and (b) pricing
    * the serial one-job-per-merge contract (the Bench
    * `wordpiece_distributed` detail line measures per-merge wall with
    * it; WordPieceSpec pins merge-sequence equality against the
    * in-memory path). Same [[MaxDistributedMerges]] cap. */
  def trainMergesDistributed(df: DataFrame, textCol: String,
                             maxK: Int): DataFrame = {
    require(maxK > 0 && maxK <= MaxDistributedMerges,
      s"maxK must be in [1, $MaxDistributedMerges] on the serial " +
        s"distributed path, got $maxK")
    val spark = df.sparkSession
    import spark.implicits._
    trainDistributed(
      distinctWords(df, textCol).select(col("__w"), col("wc"))
        .as[(String, Long)].map { case (w, c) => (c, toSymbols(w)) },
      maxK)._1
      .toDF("round", "left_sym", "right_sym", "merged", "n_occ")
  }

  /** Argmax of `count(ab) / (count(a)·count(b))` over the live pair
    * ledger — exact cross-multiplied BigInt compare, ties by (left,
    * right) UTF-8 byte order. Shared by the in-memory and distributed
    * trainers so a merge decision can never diverge between paths. */
  private[operators] def selectBest(
      pairs: scala.collection.Map[(String, String), Long],
      symCnt: scala.collection.Map[String, Long]): ((String, String), Long) = {
    var best: ((String, String), Long) = null
    var bestDen: BigInt = null
    pairs.foreach { case (p, n) =>
      val den = BigInt(symCnt(p._1)) * BigInt(symCnt(p._2))
      val better =
        if (best == null) true
        else {
          val cmp = (BigInt(n) * bestDen).compare(BigInt(best._2) * den)
          if (cmp != 0) cmp > 0
          else {
            val byA = CorpusStats.cpCompare(p._1, best._1._1)
            if (byA != 0) byA < 0
            else CorpusStats.cpCompare(p._2, best._1._2) < 0
          }
        }
      if (better) { best = (p, n); bestDen = den }
    }
    best
  }

  /** Left-to-right non-overlapping single-merge application — the one
    * merge kernel both trainers share. */
  private[operators] def mergeWord(s: Array[String], a: String, b: String,
                                   m: String): Array[String] = {
    val out = Array.newBuilder[String]
    var j = 0
    while (j < s.length) {
      if (j < s.length - 1 && s(j) == a && s(j + 1) == b) {
        out += m; j += 2
      } else { out += s(j); j += 1 }
    }
    out.result()
  }

  private[operators] def containsPair(s: Array[String], a: String,
                                      b: String): Boolean = {
    var j = 0
    while (j < s.length - 1) {
      if (s(j) == a && s(j + 1) == b) return true
      j += 1
    }
    false
  }

  /** The in-memory trainer: incremental pair/symbol counts with an
    * inverted pair→word index (the [[CorpusStats.bpeTrainInMemory]]
    * machinery), argmax by exact BigInt rational comparison each
    * round. The argmax is a scan over the live pair map — O(pairs)
    * per round (scores shift globally whenever a symbol count moves,
    * so no order structure survives a merge; the HF trainer rescans
    * identically). */
  private[operators] def trainInMemory(ledger: Array[(Long, Array[String])],
      maxK: Int): Seq[(Int, String, String, String, Long)] = {
    val wc = ledger.map(_._1)
    val syms = ledger.map(_._2)
    val pairs = scala.collection.mutable.HashMap.empty[(String, String), Long]
    val symCnt = scala.collection.mutable.HashMap.empty[String, Long]
    val occurs = scala.collection.mutable.HashMap
      .empty[(String, String), scala.collection.mutable.HashSet[Int]]
    def pairBag(s: Array[String]): scala.collection.mutable.HashMap[(String, String), Int] = {
      val m = scala.collection.mutable.HashMap.empty[(String, String), Int]
      var j = 0
      while (j < s.length - 1) {
        val p = (s(j), s(j + 1))
        m.update(p, m.getOrElse(p, 0) + 1)
        j += 1
      }
      m
    }
    def addPair(p: (String, String), d: Long): Unit = {
      val next = pairs.getOrElse(p, 0L) + d
      if (next > 0L) pairs(p) = next else pairs.remove(p)
    }
    def addSym(s: String, d: Long): Unit = {
      val next = symCnt.getOrElse(s, 0L) + d
      if (next > 0L) symCnt(s) = next else symCnt.remove(s)
    }
    syms.indices.foreach { i =>
      syms(i).foreach(s => addSym(s, wc(i)))
      pairBag(syms(i)).foreach { case (p, m) =>
        addPair(p, m.toLong * wc(i))
        occurs.getOrElseUpdate(p, scala.collection.mutable.HashSet.empty) += i
      }
    }
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    var done = 0
    while (done < maxK && pairs.nonEmpty) {
      val ((a, b), n) = selectBest(pairs, symCnt)
      val m = a + b.stripPrefix("##")
      done += 1
      merges += ((done, a, b, m, n))
      val hit = occurs.getOrElse((a, b),
        scala.collection.mutable.HashSet.empty[Int]).toArray
      hit.foreach { i =>
        val oldBag = pairBag(syms(i))
        val next = mergeWord(syms(i), a, b, m)
        val newBag = pairBag(next)
        // symbol-count deltas from the word's symbol multiset change
        val oldSyms = scala.collection.mutable.HashMap.empty[String, Int]
        syms(i).foreach(s => oldSyms.update(s, oldSyms.getOrElse(s, 0) + 1))
        val newSyms = scala.collection.mutable.HashMap.empty[String, Int]
        next.foreach(s => newSyms.update(s, newSyms.getOrElse(s, 0) + 1))
        (oldSyms.keySet ++ newSyms.keySet).foreach { s =>
          val d = newSyms.getOrElse(s, 0) - oldSyms.getOrElse(s, 0)
          if (d != 0) addSym(s, d.toLong * wc(i))
        }
        (oldBag.keySet ++ newBag.keySet).foreach { p =>
          val d = newBag.getOrElse(p, 0) - oldBag.getOrElse(p, 0)
          if (d != 0) addPair(p, d.toLong * wc(i))
          val hadOld = oldBag.contains(p)
          val hasNew = newBag.contains(p)
          if (hadOld && !hasNew) occurs.get(p).foreach { ss =>
            ss -= i; if (ss.isEmpty) occurs.remove(p)
          }
          else if (!hadOld && hasNew)
            occurs.getOrElseUpdate(p,
              scala.collection.mutable.HashSet.empty) += i
        }
        syms(i) = next
      }
    }
    merges.result()
  }

  /** Greedy longest-match-first WordPiece encoding of one word against
    * a frozen vocabulary (the HF WordPiece matcher): repeatedly take
    * the longest vocab piece matching at the cursor (`##`-prefixed
    * past position 0); any position with no match makes the whole word
    * one `[UNK]`. Returns (pieceCount, isUnk). */
  private[operators] def encodeWord(w: String, vocab: Set[String],
                                    maxBody: Int): (Int, Boolean) = {
    val cs = w.split("").filter(_.nonEmpty)
    var pos = 0
    var pieces = 0
    while (pos < cs.length) {
      var len = math.min(maxBody, cs.length - pos)
      var hit = 0
      while (len >= 1 && hit == 0) {
        val body = cs.slice(pos, pos + len).mkString
        val piece = if (pos == 0) body else "##" + body
        if (vocab.contains(piece)) hit = len else len -= 1
      }
      if (hit == 0) return (1, true) // [UNK] swallows the word
      pieces += 1
      pos += hit
    }
    (pieces, false)
  }

  /** Encode the corpus with the tokenizer [[trainMerges]] trains (the
    * training corpus defines alphabet + merged pieces; `df` is the
    * corpus to encode — self-encoding when they coincide). Per
    * document: whitespace word count, WordPiece piece count, and how
    * many words fell to `[UNK]` (each counting one piece, the HF
    * convention). Encoding runs once per DISTINCT word; the stream
    * joins it on the word's xxhash64. */
  def encodedCounts(df: DataFrame, idCol: String, textCol: String,
                    trainDf: DataFrame, trainTextCol: String,
                    maxK: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val (merges, alphabet) = trainRouted(trainDf, trainTextCol, maxK)
    // vocabulary = training alphabet + merged pieces
    val vocab: Set[String] = alphabet ++ merges.iterator.map(_._4)
    val maxBody = if (vocab.isEmpty) 1
      else vocab.iterator.map(p => p.stripPrefix("##").length).max
    val bc = spark.sparkContext.broadcast((vocab, maxBody))
    val encoded = df
      .select(explode(TextAnalysis.tokens(col(textCol))).as("__w"))
      .distinct()
      .as[String]
      .mapPartitions { it =>
        val (v, mb) = bc.value
        it.map { w =>
          val (np, unk) = encodeWord(w, v, mb)
          (w, np.toLong, if (unk) 1L else 0L)
        }
      }.toDF("__w", "__np", "__unk")
      .select(xxhash64(col("__w")).as("__wh"), col("__np"), col("__unk"))
    df.select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("__w"))
      .select(col(idCol), xxhash64(col("__w")).as("__wh"))
      .join(encoded, "__wh")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("__np")).as("n_pieces"),
        sum(col("__unk")).as("n_unk_words"))
  }
}
