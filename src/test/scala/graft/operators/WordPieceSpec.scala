package graft.operators

import java.nio.charset.StandardCharsets.UTF_8

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** The incremental WordPiece trainer must equal a from-scratch
  * reference (recompute all pair/symbol counts every round, argmax by
  * exact rational comparison) on random corpora, and the greedy
  * encoder must match a direct matcher + reconstruct its word. Tiny
  * alphabets maximize pair-count collisions and score ties. */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private def forAllSeeded[A](gen: Gen[A], n: Int)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(5517L + i)))
    }

  private val corpusGen: Gen[Seq[String]] = for {
    nDocs <- Gen.choose(1, 5)
    docs <- Gen.listOfN(nDocs, for {
      nWords <- Gen.choose(1, 12)
      ws <- Gen.listOfN(nWords, for {
        len <- Gen.choose(1, 6)
        cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c'))
      } yield cs.mkString)
    } yield ws.mkString(" "))
  } yield docs

  // ---- reference trainer: from-scratch counts every round ----

  private def byteLt(x: String, y: String): Boolean =
    java.util.Arrays.compareUnsigned(x.getBytes(UTF_8), y.getBytes(UTF_8)) < 0

  private def refTrain(texts: Seq[String], k: Int): Seq[(String, String, String, Long)] = {
    val words = texts.flatMap(_.split(" ").filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
    var ledger = words.map { case (w, c) =>
      (c, w.split("").filter(_.nonEmpty).zipWithIndex
        .map { case (ch, i) => if (i == 0) ch else "##" + ch }.toVector)
    }
    val out = Seq.newBuilder[(String, String, String, Long)]
    var done = 0
    var exhausted = false
    while (done < k && !exhausted) {
      val pairC = collection.mutable.HashMap.empty[(String, String), Long]
      val symC = collection.mutable.HashMap.empty[String, Long]
      for ((c, syms) <- ledger) {
        syms.foreach(s => symC(s) = symC.getOrElse(s, 0L) + c)
        syms.sliding(2).filter(_.size == 2).foreach { p =>
          val key = (p(0), p(1))
          pairC(key) = pairC.getOrElse(key, 0L) + c
        }
      }
      if (pairC.isEmpty) exhausted = true
      else {
        // argmax of n/(cA·cB): exact cross-multiplied BigInt, tie by bytes
        val best = pairC.toSeq.reduceLeft { (x, y) =>
          val dx = BigInt(symC(x._1._1)) * BigInt(symC(x._1._2))
          val dy = BigInt(symC(y._1._1)) * BigInt(symC(y._1._2))
          val cmp = (BigInt(x._2) * dy).compare(BigInt(y._2) * dx)
          if (cmp > 0) x else if (cmp < 0) y
          else if (byteLt(x._1._1, y._1._1)) x
          else if (byteLt(y._1._1, x._1._1)) y
          else if (byteLt(x._1._2, y._1._2)) x else y
        }
        val ((a, b), n) = best
        val m = a + b.stripPrefix("##")
        out += ((a, b, m, n))
        done += 1
        ledger = ledger.map { case (c, syms) =>
          val nb = Vector.newBuilder[String]
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
              nb += m; j += 2
            } else { nb += syms(j); j += 1 }
          }
          (c, nb.result())
        }
      }
    }
    out.result()
  }

  test("incremental trainer == from-scratch reference on random corpora") {
    forAllSeeded(corpusGen, 20) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = WordPiece.trainMerges(df, "text", maxK = 24)
        .collect().sortBy(_.getInt(0))
        .map(r => (r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
        .toSeq
      assert(got == refTrain(texts, 24), s"corpus: $texts")
    }
  }

  test("distributed trainer == in-memory trainer on random corpora") {
    // the over-MaxWordLedger path, driven directly (a test corpus can't
    // exceed 4M distinct words): same word table through both trainers
    forAllSeeded(corpusGen, 12) { texts =>
      val words = texts.flatMap(_.split(" ").filter(_.nonEmpty))
        .groupBy(identity).view.mapValues(_.size.toLong).toSeq
      val ledger = words.map { case (w, c) => (c, WordPiece.toSymbols(w)) }
      val inMem = WordPiece.trainInMemory(ledger.toArray, 24)
      val ds = ledger.toDS()
      val (dist, alphabet) = WordPiece.trainDistributed(ds, 24)
      assert(dist == inMem, s"corpus: $texts")
      assert(alphabet == ledger.iterator.flatMap(_._2).toSet)
    }
  }

  test("training is replay-deterministic") {
    val texts = Seq("abc abc ab", "bca cab abc", "aa bb aa")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val a = WordPiece.trainMerges(df, "text", 16).collect().toSeq
    val b = WordPiece.trainMerges(df, "text", 16).collect().toSeq
    assert(a == b)
  }

  test("the public forced-distributed entry == the routed trainer " +
    "(the Bench measurement path trains the same tokenizer)") {
    val texts = Seq("abc abc ab", "bca cab abc", "aa bb aa", "cab ba")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val routed = WordPiece.trainMerges(df, "text", 16).collect().toSeq
    val forced = WordPiece.trainMergesDistributed(df, "text", 16)
      .collect().toSeq
    assert(forced == routed)
  }

  // ---- greedy encoder ----

  private def refEncode(w: String, vocab: Set[String]): (Int, Boolean) = {
    var pos = 0
    var pieces = 0
    val cs = w.split("").filter(_.nonEmpty)
    while (pos < cs.length) {
      val hit = (cs.length - pos to 1 by -1).find { l =>
        val body = cs.slice(pos, pos + l).mkString
        vocab.contains(if (pos == 0) body else "##" + body)
      }
      hit match {
        case None => return (1, true)
        case Some(l) => pieces += 1; pos += l
      }
    }
    (pieces, false)
  }

  test("encodeWord == reference greedy matcher; unknown chars make [UNK]") {
    forAllSeeded(corpusGen, 20) { texts =>
      val words = texts.flatMap(_.split(" ").filter(_.nonEmpty)).distinct
      val merges = refTrain(texts, 12)
      val vocab: Set[String] =
        words.flatMap(w => WordPiece.toSymbols(w)).toSet ++ merges.map(_._3)
      val maxBody = if (vocab.isEmpty) 1
        else vocab.iterator.map(_.stripPrefix("##").length).max
      (words :+ "zzz").foreach { w =>
        assert(WordPiece.encodeWord(w, vocab, maxBody) == refEncode(w, vocab),
          s"word $w vocab $vocab")
      }
    }
  }

  test("encodedCounts matches the per-word reference, self-encoding") {
    forAllSeeded(corpusGen, 10) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val merges = refTrain(texts, 12)
      val words = texts.flatMap(_.split(" ").filter(_.nonEmpty)).distinct
      val vocab: Set[String] =
        words.flatMap(w => WordPiece.toSymbols(w)).toSet ++ merges.map(_._3)
      val got = WordPiece.encodedCounts(df, "doc_id", "text", df, "text", 12)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
      val ref = texts.zipWithIndex.map { case (t, i) =>
        val ws = t.split(" ").filter(_.nonEmpty)
        val enc = ws.map(w => refEncode(w, vocab))
        i.toLong -> ((ws.length.toLong,
          enc.map(_._1.toLong).sum, enc.count(_._2).toLong))
      }.filter(_._2._1 > 0).toMap
      assert(got == ref)
    }
  }
}
