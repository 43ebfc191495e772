package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** The CMS candidate/verify pattern must return EXACTLY the heavy-hitter
  * set of the exact HAVING query — the sketch may only add candidates
  * (never-underestimate), the verify pass must trim every false
  * positive. Narrow grids (w = 4) force heavy cell collisions, the
  * worst case for false-positive volume. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def forAllSeeded[A](gen: Gen[A], n: Int)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(7710L + i)))
    }

  // zipf-ish stream: few hot tokens, long tail
  private val streamGen: Gen[Seq[(String, String)]] = for {
    n <- Gen.choose(1, 300)
    toks <- Gen.listOfN(n, Gen.frequency(
      6 -> Gen.oneOf("hot1", "hot2"),
      3 -> Gen.oneOf("warm1", "warm2", "warm3"),
      2 -> Gen.choose(0, 50).map(i => s"tail$i")))
    srcs <- Gen.listOfN(n, Gen.oneOf("s0", "s1", "s2"))
  } yield toks.zip(srcs)

  private def refHeavy(toks: Seq[String], frac: Double): Map[String, Long] = {
    val t = math.ceil(toks.size * frac).toLong
    toks.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= t).toMap
  }

  test("heavyHitters == exact HAVING query on random streams, narrow grid") {
    forAllSeeded(streamGen, 20) { stream =>
      val df = stream.toDF("token", "src")
      for (frac <- Seq(0.02, 0.1, 0.3)) {
        val got = HeavyHitters.heavyHitters(df.select("token"), "token", frac,
            depth = 3, width = 4)
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(got == refHeavy(stream.map(_._1), frac),
          s"frac=$frac stream size ${stream.size}")
      }
    }
  }

  test("heavyHittersBySource == exact two-level query, merged partial grids") {
    forAllSeeded(streamGen, 12) { stream =>
      val df = stream.toDF("token", "src")
      val frac = 0.05
      val got = HeavyHitters.heavyHittersBySource(df, "token", "src", frac,
          depth = 3, width = 4)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val heavy = refHeavy(stream.map(_._1), frac).keySet
      val ref = stream.groupBy(identity).view.mapValues(_.size.toLong)
        .filter { case ((tok, _), _) => heavy(tok) }.toMap
      assert(got == ref)
    }
  }

  test("grid bound fails loudly") {
    val df = Seq("a").toDF("token")
    intercept[IllegalArgumentException] {
      HeavyHitters.heavyHitters(df, "token", 0.1,
        depth = 1 << 12, width = 1 << 12)
    }
  }
}
