package graft.operators

import org.apache.spark.sql.DataFrame
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
  *     collects under a loud count-before-collect guard;
  *   - the inherently sequential merge chain runs in-memory over that
  *     ledger (the [[CorpusStats.bpeTrainMergesDeep]] split every
  *     production trainer uses);
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

  /** Loud bound on the collected distinct-word ledger. */
  val MaxWordLedger: Long = 1L << 22

  private def wordLedger(df: DataFrame, textCol: String): Array[(Long, Array[String])] = {
    val words = df
      .select(explode(TextAnalysis.tokens(col(textCol))).as("__w"))
      .groupBy(col("__w")).agg(count(lit(1)).as("wc"))
      .localCheckpoint(false)
    val nWords = words.count() // materializes; guards BEFORE collect
    require(nWords <= MaxWordLedger,
      s"distinct-word ledger $nWords exceeds MaxWordLedger=$MaxWordLedger")
    words.collect().map { r =>
      (r.getLong(1), toSymbols(r.getString(0)))
    }
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
    trainInMemory(wordLedger(df, textCol), maxK)
      .toDF("round", "left_sym", "right_sym", "merged", "n_occ")
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
    def mergeWord(s: Array[String], a: String, b: String, m: String): Array[String] = {
      val out = Array.newBuilder[String]
      var j = 0
      while (j < s.length) {
        if (j < s.length - 1 && s(j) == a && s(j + 1) == b) {
          out += m; j += 2
        } else { out += s(j); j += 1 }
      }
      out.result()
    }
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    var done = 0
    while (done < maxK && pairs.nonEmpty) {
      // argmax of count(ab)/(count(a)·count(b)) — exact cross-multiplied
      // BigInt compare, ties by (left, right) UTF-8 bytes
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
      val ((a, b), n) = best
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
    val ledger = wordLedger(trainDf, trainTextCol)
    val merges = trainInMemory(ledger, maxK)
    // vocabulary = training alphabet + merged pieces
    val vocab: Set[String] =
      ledger.iterator.flatMap(_._2).toSet ++ merges.iterator.map(_._4)
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
