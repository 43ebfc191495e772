package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** OR-blocking, side attachment and the cluster card: candidates are
  * the union of the keys' blocks, null keys opt out, and the golden-
  * record card reflects transitive closure over matches. */
class RecordLinkageSpec extends SparkSpec {

  test("OR-blocking unions per-key blocks and dedups the overlap") {
    import spark.implicits._
    val recs = Seq(
      (1L, "x", "p"), (2L, "x", "q"), (3L, "y", "q"), (4L, "y", "p"))
      .toDF("rid", "k1", "k2")
    val pairs = RecordLinkage.blockPairs(recs, "rid",
      Seq(col("k1"), col("k2")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // k1 blocks: {1,2}, {3,4}; k2 blocks: {1,4}, {2,3}
    assert(pairs == Set((1L, 2L), (3L, 4L), (1L, 4L), (2L, 3L)))
  }

  test("a null blocking key opts the record out of that key's block") {
    import spark.implicits._
    val recs = Seq((1L, Some("x")), (2L, Some("x")), (3L, None), (4L, None))
      .toDF("rid", "k")
    val pairs = RecordLinkage.blockPairs(recs, "rid", Seq(col("k")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // records 3 and 4 must NOT pair through a shared null block
    assert(pairs == Set((1L, 2L)))
  }

  test("attachSides carries both sides' fields in declared order") {
    import spark.implicits._
    val recs = Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("rid", "nm", "v")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val out = RecordLinkage.attachSides(pairs, recs, "rid", Seq("nm", "v"))
    assert(out.columns.toSeq ==
      Seq("id_a", "id_b", "a_nm", "a_v", "b_nm", "b_v"))
    val r = out.head()
    assert((r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
      r.getString(4), r.getLong(5)) == ((1L, 2L, "a", 10L, "b", 20L)))
  }

  test("cluster card closes matches transitively and skips singletons") {
    import spark.implicits._
    val recs = Seq((1L, 100L), (2L, 103L), (3L, 110L), (4L, 999L))
      .toDF("rid", "bal")
    // 1-2 and 2-3 matched: one cluster {1,2,3}; 4 is a singleton
    val matches = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val card = RecordLinkage.clusterCard(recs, "rid", matches, "bal")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(card.toSeq == Seq((1L, 3L, 10L)))
  }

  test("blockProbe pairs delta against base and itself, never base x base") {
    import spark.implicits._
    // base 1 and 2 share a block; delta 10 shares it too; delta 11
    // pairs only with delta 10 through the second key
    val base = Seq((1L, "x", "m"), (2L, "x", "n"), (3L, "y", "o"))
      .toDF("rid", "k1", "k2")
    val delta = Seq((10L, "x", "p"), (11L, "z", "p"))
      .toDF("rid", "k1", "k2")
    val pairs = RecordLinkage.blockProbe(base, delta, "rid",
      Seq(col("k1"), col("k2")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // base pair (1,2) must NOT appear — the base is already resolved
    assert(pairs == Set((1L, 10L), (2L, 10L), (10L, 11L)))
  }

  test("blockProbe dedups a redelivered record (same rid in base and delta)") {
    import spark.implicits._
    val base = Seq((1L, "x")).toDF("rid", "k")
    val delta = Seq((1L, "x"), (2L, "x")).toDF("rid", "k")
    val pairs = RecordLinkage.blockProbe(base, delta, "rid", Seq(col("k")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("end-to-end: a dirtied duplicate links back to its source") {
    import spark.implicits._
    val recs = Seq(
      (1L, "Widget-0042", 7L, 5000L),
      (2L, "Widget-0042", 7L, 5003L), // dup of 1: same name, bal +3
      (3L, "Widget-9911", 7L, 5001L), // same block, different entity
      (4L, "Gadget-7777", 2L, 9000L))
      .toDF("rid", "name", "nat", "bal")
    val pairs = RecordLinkage.blockPairs(recs, "rid", Seq(
      concat(col("nat"), lit(":"),
        graft.functions.IntMath.floordiv(col("bal"), 1000L))))
    val scored = RecordLinkage
      .attachSides(pairs, recs, "rid", Seq("name", "nat", "bal"))
      .filter(levenshtein(col("a_name"), col("b_name")) <= 1 &&
        abs(col("a_bal") - col("b_bal")) <= 5)
      .select(col("id_a"), col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(scored == Set((1L, 2L)))
  }
}
