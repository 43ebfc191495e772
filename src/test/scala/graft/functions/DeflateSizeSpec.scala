package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DeflateSizeSpec extends SparkSpec {
  import spark.implicits._

  private def z(s: String, level: Int = 6): Int =
    Seq(Tuple1(s)).toDF("t")
      .select(Compressibility.deflateSize(col("t"), level))
      .collect()(0).getInt(0)

  test("matches an independent Deflater run byte-for-byte") {
    // the rows-only contract: the expression must equal a reference
    // in-JVM deflate exactly (that IS the value pin, since no external
    // oracle can recompute it)
    val texts = Seq("", "a", "abab" * 500, "the quick brown fox " * 40)
    texts.foreach { t =>
      val d = new java.util.zip.Deflater(6)
      d.setInput(t.getBytes("UTF-8")); d.finish()
      val buf = new Array[Byte](1 << 16)
      var n = 0
      while (!d.finished()) n += d.deflate(buf)
      d.end()
      assert(z(t) == n, s"mismatch for ${t.take(20)}...")
    }
  }

  test("redundancy separates: looped text compresses far below prose-like text") {
    val looped = "copy paste copy paste " * 100
    val mixed = (1 to 400).map(i => s"w${i * 7919 % 1000}").mkString(" ")
    val rl = z(looped) * 10000 / looped.getBytes("UTF-8").length
    val rm = z(mixed) * 10000 / mixed.getBytes("UTF-8").length
    assert(rl < 500, s"looped text ratio_bp=$rl not tiny")
    assert(rm > 2000, s"varied text ratio_bp=$rm suspiciously small")
    assert(rl * 4 < rm, "signal does not separate loops from varied text")
  }

  test("level is validated; nulls stay null; level 0 stores") {
    val e = intercept[Exception] {
      Seq(Tuple1("x")).toDF("t")
        .select(Compressibility.deflateSize(col("t"), 17)).collect()
    }
    assert(e.getMessage.contains("0..9"))
    val r = Seq(Tuple1(null.asInstanceOf[String])).toDF("t")
      .select(Compressibility.deflateSize(col("t"))).collect()(0)
    assert(r.isNullAt(0))
    // stored (level 0) output ≈ input + framing: the size must exceed input
    assert(z("hello world", 0) > "hello world".length)
  }
}
