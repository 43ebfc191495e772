package graft.operators

import java.sql.Timestamp

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.streaming.AdaptiveSampler

/** Property-based invariants from SURVEY §5.4: aggregation conservation
  * laws, grouping-set containment, and sampling purity. Generators are
  * driven with fixed seeds (deterministic CI, no scalatestplus bridge). */
case class DnsRec(identity: String, queryAddress: String,
                  questionName: String, questionType: String,
                  ts: Timestamp, counter: Long)

class InvariantsSpec extends SparkSpec {

  /** Run `body` over `n` deterministic samples of `gen`. */
  private def forAllSeeded[A](gen: Gen[A], n: Int)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(42L + i)))
    }

  private val recGen: Gen[DnsRec] = for {
    id <- Gen.oneOf("ns1", "ns2")
    addr <- Gen.oneOf("10.0.0.1", "10.0.0.2", "10.0.0.3")
    name <- Gen.oneOf("a.example.", "b.example.", "c.example.")
    qtype <- Gen.oneOf("A", "AAAA")
    sec <- Gen.choose(1000L, 2000L)
  } yield DnsRec(id, addr, name, qtype, new Timestamp(sec * 1000), 1L)

  private val batchGen = Gen.nonEmptyListOf(recGen)

  test("each grouping set conserves the input row count; grouped ⊆ ungrouped") {
    import spark.implicits._
    forAllSeeded(batchGen, 10) { recs =>
      val out = GroupingSetCounter(recs.toDF(),
        fixed = Seq("identity"), address = Seq("queryAddress"),
        question = Seq("questionName", "questionType"), tsCol = "ts").collect()
      def total(p: org.apache.spark.sql.Row => Boolean) =
        out.filter(p).map(_.getAs[Long]("counter")).sum
      // sum(counter) over every grouping set == |input|
      val ungrouped = total(r => r.getAs[String]("queryAddress") != "__ANY__" &&
        r.getAs[String]("questionName") != "__ANY__")
      val byAddress = total(r => r.getAs[String]("questionName") == "__ANY__")
      val byQuestion = total(r => r.getAs[String]("queryAddress") == "__ANY__")
      assert(ungrouped == recs.length)
      assert(byAddress == recs.length)
      assert(byQuestion == recs.length)
      // every grouped key's count equals the sum of its ungrouped members
      val fine = out.filter(r => r.getAs[String]("queryAddress") != "__ANY__" &&
        r.getAs[String]("questionName") != "__ANY__")
      out.filter(r => r.getAs[String]("questionName") == "__ANY__").foreach { g =>
        val members = fine.filter(f =>
          f.getAs[String]("identity") == g.getAs[String]("identity") &&
            f.getAs[String]("queryAddress") == g.getAs[String]("queryAddress"))
        assert(members.map(_.getAs[Long]("counter")).sum == g.getAs[Long]("counter"))
        // first-seen timestamp is the min over members (A1 merge rule)
        assert(members.map(_.getAs[Timestamp]("first_seen").getTime).min ==
          g.getAs[Timestamp]("first_seen").getTime)
      }
    }
  }

  test("sampler acceptance is a pure function of the id and mask") {
    forAllSeeded(Gen.zip(Gen.choose(0, 65535), Gen.choose(0, 8)), 50) {
      case (id: Int, widenings: Int) =>
        val s = new AdaptiveSampler(seed = 7, maxMaskBits = 8)
        (0 until widenings).foreach(_ => s.observeInterval(100000))
        val first = s.accepts(id)
        assert((0 until 10).forall(_ => s.accepts(id) == first))
    }
  }

  test("Percentiles.byRank equals the nearest-rank definition on random data") {
    import spark.implicits._
    val dataGen: Gen[List[(String, Long)]] = Gen.nonEmptyListOf(for {
      k <- Gen.oneOf("a", "b", "c")
      // heavy ties + a broad range, the histogram fold's hard cases
      v <- Gen.oneOf(Gen.choose(0L, 5L), Gen.choose(0L, 100000L))
    } yield (k, v))
    forAllSeeded(dataGen, 10) { rows =>
      val df = rows.toDF("k", "v")
      Seq(1L, 97L).foreach { bucket =>
        val got = Percentiles.byRank(df, "k", "v",
          Seq("p50" -> 0.5, "p90" -> 0.9), bucket = bucket)
          .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
          .toMap
        val want = rows.map { case (k, v) =>
          k -> (if (bucket <= 1) v else v / bucket * bucket)
        }.groupBy(_._1).map { case (k, kvs) =>
          val sorted = kvs.map(_._2).sorted
          def at(p: Double) = sorted(((sorted.length - 1) * p).toInt)
          k -> (at(0.5), at(0.9), sorted.length.toLong)
        }
        assert(got == want, s"bucket=$bucket")
      }
    }
  }

  test("exact dedup conserves rows: sum(n_docs) == |input|, keepers distinct") {
    import spark.implicits._
    val textGen = Gen.nonEmptyListOf(Gen.oneOf("aa bb", "bb cc", "cc dd", "dd ee"))
    forAllSeeded(textGen, 10) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val out = Dedup.exact(df, "doc_id", "text").collect()
      assert(out.map(_.getAs[Long]("n_docs")).sum == texts.length)
      val keepers = out.map(_.getAs[Long]("keeper"))
      assert(keepers.distinct.length == keepers.length)
    }
  }
}
