package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.{GraftExtensions, SparkSpec}
import graft.operators.HeavyHitters

/** The native CMS aggregate must be BIT-COMPATIBLE with the DataFrame
  * grid path (same xxhash64(lit(i), col) cells), obey the merge law
  * (per-group partials merged == whole-stream sketch), and its point
  * estimate must never underestimate — on random streams, with narrow
  * grids forcing collisions. */
class CmsSketchSpec extends SparkSpec {
  import spark.implicits._

  private def forAllSeeded[A](gen: Gen[A], n: Int)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(6201L + i)))
    }

  private val streamGen: Gen[Seq[(String, String)]] = for {
    n <- Gen.choose(1, 200)
    toks <- Gen.listOfN(n, Gen.frequency(
      5 -> Gen.oneOf("hot", "warm"),
      3 -> Gen.choose(0, 30).map(i => s"t$i")))
    srcs <- Gen.listOfN(n, Gen.oneOf("a", "b", "c"))
  } yield toks.zip(srcs)

  private def gridOf(image: Array[Byte]): (Int, Int, Seq[Long]) = {
    val (d, w, cells) = CmsSketch.deserialize(image)
    (d, w, cells.toSeq)
  }

  test("native aggregate == DataFrame cmsCells grid, cell-exact") {
    forAllSeeded(streamGen, 15) { stream =>
      val df = stream.toDF("token", "src")
      val image = df.agg(CmsFunctions.cms_sketch_agg(col("token"), 3, 4))
        .collect().head.getAs[Array[Byte]](0)
      val (d, w, cells) = gridOf(image)
      assert((d, w) == ((3, 4)))
      val ref = HeavyHitters.cmsCells(df.select("token"), "token", 3, 4)
        .collect().map(r => (r.getInt(0) * 4 + r.getLong(1).toInt) -> r.getLong(2))
        .toMap
      val refDense = Seq.tabulate(12)(i => ref.getOrElse(i, 0L))
      assert(cells == refDense, s"stream=$stream")
    }
  }

  test("merge law: per-source partials merged == whole-stream sketch") {
    forAllSeeded(streamGen, 15) { stream =>
      val df = stream.toDF("token", "src")
      val whole = df.agg(CmsFunctions.cms_sketch_agg(col("token"), 3, 4))
        .collect().head.getAs[Array[Byte]](0)
      val merged = df.groupBy(col("src"))
        .agg(CmsFunctions.cms_sketch_agg(col("token"), 3, 4).as("sk"))
        .agg(CmsFunctions.cms_merge_agg(col("sk")))
        .collect().head.getAs[Array[Byte]](0)
      assert(gridOf(merged) == gridOf(whole))
    }
  }

  test("estimate never underestimates; exact when no cell collides") {
    forAllSeeded(streamGen, 15) { stream =>
      val df = stream.toDF("token", "src")
      val image = df.agg(CmsFunctions.cms_sketch_agg(col("token"), 3, 4))
        .collect().head.getAs[Array[Byte]](0)
      val truth = stream.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      truth.foreach { case (tok, n) =>
        val est = df.sparkSession.range(1)
          .select(CmsFunctions.cms_estimate(
            lit(image), lit(tok))).collect().head.getLong(0)
        assert(est >= n, s"underestimate for $tok: $est < $n")
      }
      // absent token: estimate is whatever its cells hold — still >= 0
      val ghost = spark.range(1)
        .select(CmsFunctions.cms_estimate(lit(image), lit("never-seen-xyz")))
        .collect().head.getLong(0)
      assert(ghost >= 0L)
    }
  }

  test("SQL surface: the three functions register and compose") {
    GraftExtensions.register(spark)
    Seq(("x", "a"), ("x", "b"), ("y", "a")).toDF("token", "src")
      .createOrReplaceTempView("cms_in")
    val est = spark.sql(
      """SELECT cms_estimate(cms_merge_agg(sk), 'x') FROM (
        |  SELECT src, cms_sketch_agg(token, 3, 8) AS sk
        |  FROM cms_in GROUP BY src)""".stripMargin)
      .collect().head.getLong(0)
    assert(est >= 2L)
    // non-literal grid params must fail loudly
    val err = intercept[Exception] {
      spark.sql("SELECT cms_sketch_agg(token, CAST(rand()*4 AS INT), 8) FROM cms_in")
        .collect()
    }
    assert(err.getMessage.contains("INT literal") ||
      err.getCause != null && err.getCause.getMessage.contains("INT literal"))
  }

  test("malformed and shape-mismatched images fail loudly, never merge garbage") {
    intercept[IllegalArgumentException] {
      CmsSketch.deserialize(Array[Byte](1, 2, 3))
    }
    val a = CmsSketch.serialize(2, 4, new Array[Long](8))
    val b = CmsSketch.serialize(2, 8, new Array[Long](16))
    val df = Seq(a, b).toDF("sk")
    val e = intercept[Exception] {
      df.agg(CmsFunctions.cms_merge_agg(col("sk"))).collect()
    }
    assert(e.getMessage.contains("cannot merge") ||
      (e.getCause != null && e.getCause.getMessage.contains("cannot merge")))
  }
}
