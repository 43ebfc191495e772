package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TopKPriority
import graft.functions.TopKPriority.Entry

/** Weighted priority sampling: the ledger laws (insert/merge vs a
  * reference sort), determinism under repartitioning, and the
  * window-form vs native-aggregate-form agreement — two independent
  * implementations of the same draw must select the same rows. */
class PrioritySampleSpec extends SparkSpec {

  private def refTopK(es: Seq[Entry], k: Int): Vector[Entry] =
    es.sortBy(e => (-e.pri, e.id)).take(k).toVector

  test("ledger insert == reference sort-take for adversarial sequences") {
    val entries = Seq(
      Entry(1, 10, 0.5), Entry(2, 10, 0.9), Entry(3, 10, 0.1),
      Entry(4, 10, 0.9), // pri tie with id 2 -> id order decides
      Entry(5, 10, 0.50001), Entry(6, 10, 0.0), Entry(7, 10, 1.0e300),
      Entry(8, 10, 1.0e-300), Entry(9, 10, 0.9))
    for (k <- 1 to entries.size; perm <- Seq(entries, entries.reverse,
        entries.sortBy(_.pri), entries.sortBy(_.id).reverse)) {
      val got = perm.foldLeft(Vector.empty[Entry])(
        (acc, e) => TopKPriority.insert(acc, e, k))
      assert(got == refTopK(entries, k), s"k=$k perm=${perm.map(_.id)}")
    }
  }

  test("ledger merge is associative-commutative up to the law (any split agrees)") {
    val entries = (1L to 40L).map(i =>
      Entry(i, i, (i * 7919 % 101).toDouble / 101.0))
    val k = 7
    val whole = refTopK(entries, k)
    for (cut <- Seq(0, 1, 13, 39, 40)) {
      val (a, b) = entries.splitAt(cut)
      val la = a.foldLeft(Vector.empty[Entry])(TopKPriority.insert(_, _, k))
      val lb = b.foldLeft(Vector.empty[Entry])(TopKPriority.insert(_, _, k))
      assert(TopKPriority.mergeLedgers(la, lb, k) == whole, s"cut=$cut")
      assert(TopKPriority.mergeLedgers(lb, la, k) == whole, s"cut=$cut rev")
    }
  }

  test("serialize roundtrip") {
    val v = Vector(Entry(1, 2, 0.25), Entry(3, 4, -1.5))
    assert(TopKPriority.deserialize(TopKPriority.serialize(v)) == v)
    assert(TopKPriority.deserialize(
      TopKPriority.serialize(Vector.empty)) == Vector.empty)
    intercept[IllegalArgumentException] {
      TopKPriority.deserialize(Array[Byte](9, 9))
    }
  }

  test("window form and native-aggregate form select the same rows") {
    import spark.implicits._
    val df = (1L to 500L).map(i => (i, 1L + i % 37, s"s${i % 3}"))
      .toDF("doc_id", "w", "source")
    // global: grouped form with one constant group == prioritySample
    val global = Sampling.prioritySample(df, "doc_id", "w", k = 25)
      .select("doc_id", "rank").as[(Long, Long)].collect().toSet
    val grouped = Sampling.groupedPrioritySample(
      df.withColumn("g", lit(1)), "doc_id", "w", "g", k = 25)
      .select("doc_id", "rank").as[(Long, Long)].collect().toSet
    assert(global == grouped)
    assert(global.size == 25)
  }

  test("sample is invariant under repartitioning and row order") {
    import spark.implicits._
    val df = (1L to 300L).map(i => (i, 1L + (i * 13) % 50, s"s${i % 4}"))
      .toDF("doc_id", "w", "source")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.groupedPrioritySample(d, "doc_id", "w", "source", k = 5)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
    val base = run(df)
    assert(base == run(df.repartition(17)))
    assert(base == run(df.orderBy(desc("doc_id"))))
    assert(base.groupBy(_._1).forall(_._2.size == 5))
  }

  test("heavier weights dominate the kept set") {
    import spark.implicits._
    // 100 rows of weight 1, 100 of weight 10_000: the heavy stratum
    // should own the overwhelming majority of a k=20 sample
    val df = ((1L to 100L).map(i => (i, 1L)) ++
      (101L to 200L).map(i => (i, 10000L))).toDF("doc_id", "w")
    val kept = Sampling.prioritySample(df, "doc_id", "w", k = 20)
      .select("doc_id").as[Long].collect()
    val heavy = kept.count(_ > 100L)
    assert(heavy >= 18, s"only $heavy/20 heavy rows kept")
  }
}
