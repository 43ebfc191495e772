package graft.operators

import graft.SparkSpec

/** Content-defined chunking invariants: chunks tile the text exactly,
  * boundaries are content-local (an edit shifts ONE chunk's hashes,
  * not every downstream chunk — the whole point vs fixed-size
  * blocking), and the dedup card measures real sharing. */
class ChunkerSpec extends SparkSpec {

  private val textA = "the quick brown fox jumps over the lazy dog " * 4
  private val textB = "XYZ " + textA // prefix edit

  private def chunksOf(rows: Seq[(Long, String)]): Map[Long, Seq[(Long, Long, Long)]] = {
    import spark.implicits._
    Chunker.chunks(rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .groupBy(_._1).map { case (k, v) =>
        k -> v.map(_._2).sortBy(_._1).toSeq
      }
  }

  test("chunks tile the text: contiguous starts, lengths sum to text length") {
    val m = chunksOf(Seq((1L, textA), (2L, "a"), (3L, "ab")))
    m.foreach { case (id, spans) =>
      val text = if (id == 1L) textA else if (id == 2L) "a" else "ab"
      assert(spans.head._1 == 1L, s"doc $id starts at ${spans.head._1}")
      spans.sliding(2).foreach {
        case Seq((s1, l1, _), (s2, _, _)) => assert(s2 == s1 + l1)
        case _ =>
      }
      assert(spans.map(_._2).sum == text.length.toLong)
      assert(spans.forall(_._2 >= 1))
    }
    // the repeated text must actually produce multiple chunks
    assert(m(1L).size > 3, s"only ${m(1L).size} chunks")
  }

  test("a prefix edit relocates few chunk hashes (content locality)") {
    val m = chunksOf(Seq((1L, textA), (2L, textB)))
    val ha = m(1L).map(_._3).toSet
    val hb = m(2L).map(_._3).toSet
    // boundaries resynchronize within one rolling window of the edit:
    // nearly all of A's chunks reappear in B verbatim
    val shared = ha.intersect(hb).size
    assert(shared >= ha.size - 2,
      s"only $shared of ${ha.size} chunks survive a prefix edit")
  }

  test("Scala kernel == declarative column form, row for row") {
    import spark.implicits._
    // the cross-implementation certificate: the fast partition-local
    // loop must never drift from the replayable positional definition
    // the q204 oracle states (exercised on varied lengths incl. the
    // empty-adjacent shapes)
    // BMP scope: ASCII, an accented BMP char, and the empty string
    // (both engines' split of "" yields one empty element — the
    // kernel's special case); astral input is kernel-authoritative
    // and deliberately NOT in the certificate
    val rows = Seq((1L, textA), (2L, textB), (3L, "a"), (4L, "ab"),
      (5L, "xyzzy plugh " * 9), (6L, "Z"), (7L, ""),
      (8L, "café au lait déjà vu " * 6))
      .toDF("doc_id", "text")
    def norm(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(norm(Chunker.chunks(rows, "doc_id", "text")) ==
      norm(Chunker.chunksDeclarative(rows, "doc_id", "text")))
  }

  test("fuzz: kernel == declarative on 60 random BMP strings") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    // mixed alphabet: ASCII, punctuation, accented/BMP unicode —
    // everything the certificate covers (astral is kernel-authoritative
    // by documented scope)
    val alphabet = "abcXYZ 0189.,!éüñΩλж中日"
    val rows = (1L to 60L).map { i =>
      val len = rnd.nextInt(120)
      (i, Seq.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString)
    }.toDF("doc_id", "text")
    def norm(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val kernel = norm(Chunker.chunks(rows, "doc_id", "text"))
    assert(kernel == norm(Chunker.chunksDeclarative(rows, "doc_id", "text")))
    // tiling invariant holds on the fuzz corpus too
    val byDoc = kernel.groupBy(_._1)
    rows.collect().foreach { r =>
      val id = r.getLong(0); val len = r.getString(1).length.toLong
      val spans = byDoc(id).toSeq.sortBy(_._2)
      assert(spans.map(_._3).sum == math.max(len, 1L), s"doc $id")
    }
  }

  test("identical repeated content is fully shared in the dedup card") {
    import spark.implicits._
    val card = Chunker.dedupCard(
      Seq((1L, textA), (2L, textA), (3L, "completely different words here"))
        .toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val (n1, sh1, b1) = card(1L)
    assert(sh1 == n1, "duplicate docs must share every chunk")
    assert(card(2L) == ((n1, sh1, b1)))
    assert(b1 == textA.length.toLong)
    // within-doc repetition ("the quick..." x4) can legitimately share
    // chunks across docs only if hashes collide across different text —
    // the distinct doc must share nothing with the duplicated pair
    assert(card(3L)._2 == 0L)
  }
}
