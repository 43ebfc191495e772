package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {

  private def gate(texts: Seq[String], minTokens: Long = 3,
                   maxTokens: Long = 100): Seq[Boolean] = {
    import spark.implicits._
    texts.toDF("text")
      .withColumn("__tk", TextAnalysis.tokens(col("text")))
      .select(TextAnalysis.qualityGate(col("__tk"), minTokens, maxTokens))
      .collect().map(_.getBoolean(0)).toSeq
  }

  // 20 distinct tokens, one stopword: passes every clause with margin
  private val clean = ("the" +: (1 to 19).map(i => s"w$i")).mkString(" ")

  test("qualityGate admits clean prose and rejects each failure mode") {
    assert(gate(Seq(clean)) == Seq(true))
    // empty / too short: fails the length floor without dividing by zero
    assert(gate(Seq("", "the a")) == Seq(false, false))
    // too long: same clean shape, past a tight band
    assert(gate(Seq(clean), maxTokens = 10) == Seq(false))
    // >= 60% duplicate tokens (spam repetition): 6 tokens, 2 distinct
    assert(gate(Seq("the buy buy buy buy buy")) == Seq(false))
    // zero stopwords (< 5% floor) with every other clause passing:
    // 9 distinct non-stopword tokens (top share 1/9 = 11.1% < 12%)
    assert(gate(
      Seq("lorem ipsum dolor sit amet consectetur adipiscing elit quux")) ==
      Seq(false))
  }

  test("top_token_count equals the higher-order-function form (random sweep)") {
    import spark.implicits._
    // the codegen'd O(n) expression must be bit-identical to the
    // O(distinct*n) aggregate/filter composition it replaced
    val rnd = new scala.util.Random(7)
    val docs = Seq.tabulate(200) { i =>
      val n = rnd.nextInt(40)
      (i.toLong, Seq.fill(n)(s"t${rnd.nextInt(1 + n / 3)}").mkString(" "))
    }
    val df = docs.toDF("id", "text")
      .withColumn("__tk", TextAnalysis.tokens(col("text")))
    val got = df.select(col("id"),
        graft.functions.TokenStats.topTokenCount(col("__tk")).as("fast"),
        aggregate(array_distinct(col("__tk")), lit(0),
          (acc, u) => greatest(acc, size(filter(col("__tk"), x => x === u))))
          .as("slow"))
      .collect()
    got.foreach(r => assert(r.getInt(1) == r.getInt(2),
      s"id ${r.getLong(0)}: fast ${r.getInt(1)} != slow ${r.getInt(2)}"))
    // empty array and a null element don't break the hash pass
    val edge = Seq((1L, Array.empty[String]), (2L, Array("a", null, "a", null, null)))
      .toDF("id", "tk")
      .select(graft.functions.TokenStats.topTokenCount(col("tk")))
      .collect().map(_.getInt(0)).toSeq
    assert(edge == Seq(0, 3))
  }

  test("qualityGate thresholds are integer-exact at the boundary") {
    // top-token share exactly 12% must FAIL the strict < : 25 tokens,
    // top token 3 occurrences => 3*100 = 25*12 exactly
    val top12 = (Seq.fill(3)("the") ++ (1 to 22).map(i => s"w$i")).mkString(" ")
    assert(gate(Seq(top12)) == Seq(false))
    // one fewer repeat (2/24 ~ 8.3%) passes the same clauses
    val top8 = (Seq.fill(2)("the") ++ (1 to 22).map(i => s"w$i")).mkString(" ")
    assert(gate(Seq(top8)) == Seq(true))
    // stopword share exactly 5% passes the >= floor: 1 stopword in 20
    assert(gate(Seq(clean)) == Seq(true))
  }

  test("bowScore sums the literal weight of each token's hash bucket") {
    import spark.implicits._
    val w = Seq(5, -3, 7, 1)
    val df = Seq((1L, "aa bb aa"), (2L, ""), (3L, "zz"))
      .toDF("id", "text")
      .withColumn("__tk", TextAnalysis.tokens(col("text")))
    // independent reference: bucket each token through the same portable
    // hash, then sum in Scala
    val buckets = df.select(col("id"),
        transform(col("__tk"),
          t => pmod(graft.operators.Dedup.baseHash32(t), lit(w.length)))
          .as("b"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Long](1).map(b => w(b.toInt).toLong).sum).toMap
    val got = df.select(col("id"),
        TextAnalysis.bowScore(col("__tk"), w).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == buckets)
    assert(got(2L) == 0L) // empty doc scores the additive identity
    // the xxhash64 production variant shares the shape and returns long
    val fast = df.select(TextAnalysis.bowScore(col("__tk"), w, fastHash = true))
      .collect().map(_.getLong(0))
    assert(fast.length == 3)
  }
}
