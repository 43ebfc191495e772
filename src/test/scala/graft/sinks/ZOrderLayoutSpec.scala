package graft.sinks

import graft.SparkSpec

class ZOrderLayoutSpec extends SparkSpec {

  test("zValue2 interleaves bits exactly (even = a, odd = b)") {
    import spark.implicits._
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L),
      (0xFFFFFFFFL, 0L), (0L, 0xFFFFFFFFL), (123456789L, 987654321L))
    def refZ(a: Long, b: Long): Long = {
      var z = 0L
      for (i <- 0 until 32) {
        z |= ((a >> i) & 1L) << (2 * i)
        z |= ((b >> i) & 1L) << (2 * i + 1)
      }
      z
    }
    val got = rows.toDF("a", "b")
      .select(ZOrderLayout.zValue2(
        org.apache.spark.sql.functions.col("a"),
        org.apache.spark.sql.functions.col("b")))
      .collect().map(_.getLong(0)).toSeq
    assert(got == rows.map { case (a, b) => refZ(a, b) })
  }

  test("layout yields disjoint per-partition z-ranges (the skipping contract)") {
    import spark.implicits._
    val df = (0L until 4000L)
      .map(i => (i % 97, (i * 31) % 89)).toDF("a", "b")
    val laid = ZOrderLayout.layout(df, "a", "b", numPartitions = 8)
    val ranges = laid
      .select(ZOrderLayout.zValue2(
        org.apache.spark.sql.functions.col("a"),
        org.apache.spark.sql.functions.col("b")).as("z"))
      .rdd.glom().collect()
      .filter(_.nonEmpty)
      .map(p => (p.map(_.getLong(0)).min, p.map(_.getLong(0)).max))
      .sortBy(_._1)
    assert(ranges.length > 1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) =>
        assert(hi <= lo, s"overlapping partition z-ranges: $hi > $lo")
      case _ => ()
    }
    // every partition internally sorted by z
    laid.select(ZOrderLayout.zValue2(
        org.apache.spark.sql.functions.col("a"),
        org.apache.spark.sql.functions.col("b")).as("z"))
      .rdd.glom().collect().foreach { p =>
        val zs = p.map(_.getLong(0))
        assert(zs.sameElements(zs.sorted))
      }
  }
}
