package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-14 experimentation/forecasting operators: Welch A/B card,
  * Benford audit, Pareto skyline, seasonal-naive backtest, label
  * propagation, deadline funnel, churn hazard. Each test pins the
  * operator against a hand-computed reference on data small enough to
  * verify by inspection — the oracle SQL covers the at-scale replay. */
class ExperimentsSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("abWelchCard: exact Welch t2 and significance on a hand case") {
    import spark.implicits._
    // arm 0 units: values 10, 12, 14; arm 1 units: 30, 34
    // na=3 sxa=36 sxxa=440; nb=2 sxb=64 sxxb=2056
    // dn = 36*2 - 64*3 = -120
    // Aa = 3*440 - 1296 = 24 ; Ab = 2*2056 - 4096 = 16
    // dv = 24*4*1 + 16*9*2 = 96 + 288 = 384
    // tn = 14400 * 2 * 1 = 28800 ; t2 = 28800/384 = 75.0
    val df = Seq(
      ("m", 0L, 0L, 10L), ("m", 2L, 0L, 12L), ("m", 4L, 0L, 14L),
      ("m", 1L, 1L, 30L), ("m", 3L, 1L, 34L)
    ).toDF("metric", "uid", "arm", "cents")
    val r = Profile.abWelchCard(df, "metric", "uid",
      col("arm"), col("cents")).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[Long]("n_a") === 3L)
    assert(row.getAs[Long]("n_b") === 2L)
    assert(row.getAs[Long]("sum_a_cents") === 36L)
    assert(row.getAs[Long]("sum_b_cents") === 64L)
    assert(row.getAs[Long]("delta_sign") === -1L)
    assert(row.getAs[Long]("t2_micro") === 75000000L)
    assert(row.getAs[Long]("significant") === 1L)
  }

  test("abWelchCard: degenerate arms report 0, not an infinite statistic") {
    import spark.implicits._
    val oneUnit = Seq(("m", 1L, 0L, 5L), ("m", 2L, 1L, 9L), ("m", 4L, 1L, 9L))
      .toDF("metric", "uid", "arm", "cents")
    val r1 = Profile.abWelchCard(oneUnit, "metric", "uid",
      col("arm"), col("cents")).collect().head
    assert(r1.getAs[Long]("t2_micro") === 0L)
    assert(r1.getAs[Long]("significant") === 0L)
    // both arms constant: dv = 0 with a nonzero delta — still no test
    val noVar = Seq(("m", 1L, 0L, 5L), ("m", 3L, 0L, 5L),
      ("m", 2L, 1L, 9L), ("m", 4L, 1L, 9L))
      .toDF("metric", "uid", "arm", "cents")
    val r2 = Profile.abWelchCard(noVar, "metric", "uid",
      col("arm"), col("cents")).collect().head
    assert(r2.getAs[Long]("t2_micro") === 0L)
    assert(r2.getAs[Long]("significant") === 0L)
    assert(r2.getAs[Long]("delta_sign") === 0L)
  }

  test("benfordCard: dense digit axis, zero-fill, hardcoded expecteds") {
    import spark.implicits._
    val df = Seq(("g", 12.5), ("g", 19.0), ("g", 25.0), ("g", 0.4))
      .toDF("g", "amt") // 0.4 excluded (< 1); digits 1,1,2
    val r = Profile.benfordCard(df, "g", col("amt"))
      .orderBy("digit").collect()
    assert(r.length === 9)
    assert(r.map(_.getAs[Long]("n_amounts")).toSet === Set(3L))
    assert(r(0).getAs[Long]("n_obs") === 2L) // digit 1
    assert(r(1).getAs[Long]("n_obs") === 1L) // digit 2
    assert(r(2).getAs[Long]("n_obs") === 0L) // digit 3 zero-filled
    assert(r(0).getAs[Long]("obs_micro") === 666666L)
    assert(r(0).getAs[Long]("exp_micro") === 301029L)
    assert(r(0).getAs[Long]("dev_micro") === 365637L)
    // expected micro column matches the hardcoded table in order
    assert(r.map(_.getAs[Long]("exp_micro")).toSeq === Profile.BenfordMicro)
  }

  test("skyline: frontier equals the naive dominance filter") {
    import spark.implicits._
    // (cost, gain): frontier is (1,5), (2,7); (2,5) dominated by (2,7),
    // (3,7) by (2,7), (3,3) by everything; duplicate (1,5) carries n=2
    val df = Seq(("b", 1L, 5L), ("b", 1L, 5L), ("b", 2L, 7L),
      ("b", 2L, 5L), ("b", 3L, 7L), ("b", 3L, 3L))
      .toDF("g", "cost", "gain")
    val r = Skyline.paretoFront(df, "g", "cost", "gain")
      .orderBy("cost").collect()
    assert(r.map(x => (x.getLong(1), x.getLong(2), x.getAs[Long]("n_points")))
      .toSeq === Seq((1L, 5L, 2L), (2L, 7L, 1L)))
    // equal-cost, equal-gain points are one frontier row; equal-cost
    // lower-gain points fall
    val tie = Seq(("b", 1L, 5L), ("b", 1L, 4L)).toDF("g", "cost", "gain")
    assert(Skyline.paretoFront(tie, "g", "cost", "gain").collect()
      .map(x => (x.getLong(1), x.getLong(2))).toSeq === Seq((1L, 5L)))
  }

  test("forecastBacktest: dense-axis lags and exact SAE/MAE") {
    import spark.implicits._
    // one key, season 2, daily buckets: cents 100, 200, 100, 240, 110
    // lag2 evaluable at buckets 3,4,5: |100-100|+|240-200|+|110-100|=50
    // lag1 same rows: |100-200|+|240-100|+|110-240| = 370
    val rows = Seq(
      ("k", "2024-01-01 00:00:00", 1.00), ("k", "2024-01-02 00:00:00", 2.00),
      ("k", "2024-01-03 00:00:00", 1.00), ("k", "2024-01-04 00:00:00", 2.40),
      ("k", "2024-01-05 00:00:00", 1.10))
    val df = rows.toDF("k", "s", "value")
      .select(col("k"), col("s").cast("timestamp").as("ts"), col("value"))
    val r = TimeSeries.forecastBacktest(df, "k", "ts", "value",
      bucketSec = 86400L, season = 2).collect().head
    assert(r.getAs[Long]("n_eval") === 3L)
    assert(r.getAs[Long]("sae_seasonal_cents") === 50L)
    assert(r.getAs[Long]("sae_naive_cents") === 370L)
    assert(r.getAs[Long]("mae_seasonal_cents") === 16L)
    assert(r.getAs[Long]("mae_naive_cents") === 123L)
    assert(r.getAs[String]("winner") === "seasonal")
  }

  test("forecastBacktest: zero-filled gap buckets count as observations") {
    import spark.implicits._
    val df = Seq(("k", "2024-01-01 00:00:00", 1.00),
      ("k", "2024-01-04 00:00:00", 1.00)) // days 2,3 silent -> 0 cents
      .toDF("k", "s", "value")
      .select(col("k"), col("s").cast("timestamp").as("ts"), col("value"))
    val r = TimeSeries.forecastBacktest(df, "k", "ts", "value",
      bucketSec = 86400L, season = 3).collect().head
    // only bucket 4 evaluable: |100 - 100| = 0 seasonal; |100 - 0| naive
    assert(r.getAs[Long]("n_eval") === 1L)
    assert(r.getAs[Long]("sae_seasonal_cents") === 0L)
    assert(r.getAs[Long]("sae_naive_cents") === 100L)
  }

  test("labelPropagation: two cliques joined by a bridge separate; " +
    "sizes attach") {
    import spark.implicits._
    // clique {1,2,3}, clique {10,11,12}, bridge 3-10
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L), (3L, 10L))
      .toDF("src", "dst")
    val r = GraphStats.labelPropagation(edges, rounds = 3)
      .orderBy("doc_id").collect()
    val byId = r.map(x => x.getAs[Long]("doc_id") ->
      x.getAs[Long]("community")).toMap
    // min-label plurality pulls each clique to its smallest member
    assert(byId(1L) === byId(2L) && byId(2L) === byId(3L))
    assert(byId(10L) === byId(11L) && byId(11L) === byId(12L))
    assert(byId(1L) !== byId(10L))
    val sizes = r.map(x => x.getAs[Long]("community") ->
      x.getAs[Long]("n_members")).toMap
    assert(sizes.values.toSet === Set(3L))
  }

  test("windowedCard: the deadline drops late completions the " +
    "unbounded funnel counts") {
    import spark.implicits._
    val df = Seq(
      // user 1 converts inside 1h
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 10:10:00", "click"),
      (1L, "2024-01-01 10:20:00", "purchase"),
      // user 2 clicks inside, purchases 2h after the first view
      (2L, "2024-01-01 10:00:00", "view"),
      (2L, "2024-01-01 10:30:00", "click"),
      (2L, "2024-01-01 12:00:00", "purchase"),
      // user 3 clicks only after the deadline
      (3L, "2024-01-01 10:00:00", "view"),
      (3L, "2024-01-01 11:30:00", "click")
    ).toDF("user_id", "s", "event_type")
      .select(col("user_id"), col("s").cast("timestamp").as("ts"),
        col("event_type"))
    val steps = Seq("view", "click", "purchase")
    val bounded = Funnel.windowedCard(df, "user_id", "ts", "event_type",
      steps, windowSec = 3600L).orderBy("step").collect()
    assert(bounded.map(_.getAs[Long]("n_users")).toSeq === Seq(3L, 2L, 1L))
    assert(bounded.map(_.getAs[Long]("conv_bp")).toSeq ===
      Seq(10000L, 6666L, 3333L))
    val unbounded = Funnel.card(df, "user_id", "ts", "event_type", steps)
      .orderBy("step").collect()
    assert(unbounded.map(_.getAs[Long]("n_users")).toSeq === Seq(3L, 3L, 2L))
  }

  test("basketLift: lift rationals, support floor, and the maxBasket " +
    "universe exclusion") {
    import spark.implicits._
    // baskets: b1{x,y}, b2{x,y}, b3{x,z}, b4{y} -> N=4
    // c(x,y)=2, c(x)=3, c(y)=3: lift = 2*4/9 = 0.888... -> 888888
    val df = Seq((1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"),
      (3L, "x"), (3L, "z"), (4L, "y"), (1L, "x") /* dup item */)
      .toDF("b", "i")
    val r = NgramModel.basketLift(df, "b", "i", minSupport = 2L)
      .collect()
    assert(r.length === 1)
    assert((r.head.getAs[String]("item_a"), r.head.getAs[String]("item_b"),
      r.head.getAs[Long]("n_both"), r.head.getAs[Long]("lift_micro")) ===
      (("x", "y", 2L, 888888L)))
    // an over-wide basket leaves pairs, marginals AND N consistently
    val wide = df.union(Seq((9L, "x"), (9L, "y"), (9L, "w"))
      .toDF("b", "i"))
    val r2 = NgramModel.basketLift(wide, "b", "i", minSupport = 2L,
      maxBasket = 2L).collect()
    assert(r2.length === 1)
    assert(r2.head.getAs[Long]("lift_micro") === 888888L)
  }

  test("degreeAssortativity: perfect positive mixing on a symmetric pair " +
    "of cliques; one row") {
    import spark.implicits._
    // two disjoint triangles: every endpoint degree is 2 -> zero
    // variance -> (0, 0) by the corrCard constant-feature convention
    val tri2 = Seq((1L, 2L), (2L, 3L), (3L, 1L),
      (10L, 11L), (11L, 12L), (12L, 10L)).toDF("src", "dst")
    val r = GraphStats.degreeAssortativity(tri2).collect()
    assert(r.length === 1)
    assert(r.head.getAs[Long]("corr2_micro") === 0L)
    assert(r.head.getAs[Long]("corr_sign") === 0L)
    // a star: hub degree n, leaves degree 1 -> perfectly DISassortative
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("src", "dst")
    val s = GraphStats.degreeAssortativity(star).collect().head
    assert(s.getAs[Long]("corr2_micro") === 1000000L)
    assert(s.getAs[Long]("corr_sign") === -1L)
  }

  test("heapsCard: first-band type attribution and cumulative TTR") {
    import spark.implicits._
    // band 0 (docs 0,1): tokens a b a b -> 4 occ, 2 new types
    // band 1 (doc 2,3): tokens a c c -> 3 occ, 1 new type (c)
    val df = Seq((0L, "a b"), (1L, "a b"), (2L, "a c"), (3L, "c"))
      .toDF("doc_id", "text")
    val r = CorpusStats.heapsCard(df, "doc_id", "text", bandWidth = 2L)
      .orderBy("band").collect()
    assert(r.map(x => (x.getAs[Long]("band"), x.getAs[Long]("n_tokens"),
      x.getAs[Long]("new_types"), x.getAs[Long]("cum_tokens"),
      x.getAs[Long]("cum_types"), x.getAs[Long]("ttr_micro"))).toSeq ===
      Seq((0L, 4L, 2L, 4L, 2L, 500000L),
        (1L, 3L, 1L, 7L, 3L, 428571L)))
  }

  test("kAnonymityCard: group sizes, per-threshold risk shares, " +
    "and the totals") {
    import spark.implicits._
    // combos: (a,1)x3, (a,2)x1, (b,1)x2 -> sizes 3,1,2; n_rows=6
    val df = Seq(("a", 1), ("a", 1), ("a", 1), ("a", 2), ("b", 1), ("b", 1))
      .toDF("q1", "q2")
    val r = Scrub.kAnonymityCard(df, Seq("q1", "q2"), ks = Seq(2L, 3L, 4L))
      .orderBy("k").collect()
    assert(r.map(x => (x.getAs[Long]("k"), x.getAs[Long]("n_groups_below"),
      x.getAs[Long]("n_rows_at_risk"), x.getAs[Long]("risk_bp"))).toSeq ===
      Seq((2L, 1L, 1L, 1666L), (3L, 2L, 3L, 5000L), (4L, 3L, 6L, 10000L)))
    assert(r.head.getAs[Long]("n_groups") === 3L)
    assert(r.head.getAs[Long]("n_rows") === 6L)
    assert(r.head.getAs[Long]("min_group_size") === 1L)
  }

  test("backtestFromSeries equals forecastBacktest on its own dense series") {
    import spark.implicits._
    val rows = Seq(
      ("k", "2024-01-01 00:00:00", 1.00), ("k", "2024-01-02 00:00:00", 2.00),
      ("k", "2024-01-03 00:00:00", 1.00), ("k", "2024-01-04 00:00:00", 2.40))
    val df = rows.toDF("k", "s", "value")
      .select(col("k"), col("s").cast("timestamp").as("ts"), col("value"))
    val direct = TimeSeries.forecastBacktest(df, "k", "ts", "value",
      86400L, season = 2).collect().toSeq
    val series = df.select(col("k"),
        expr("CAST(ts AS LONG) DIV 86400").as("bucket_id"),
        floor(col("value") * 100).cast("long").as("__c"))
      .groupBy("k", "bucket_id").agg(sum("__c").as("n"))
    val via = TimeSeries.backtestFromSeries(
      TimeSeries.densify(series, "k"), "k", season = 2).collect().toSeq
    assert(direct === via)
  }

  test("hazardCard: at-risk denominators and conditional exits") {
    import spark.implicits._
    // anchor week 0 for all three; last weeks: u1 -> 0, u2 -> 1, u3 -> 1
    val df = Seq(
      (1L, "2024-01-01 00:00:00", "signup"),
      (1L, "2024-01-02 00:00:00", "view"),
      (2L, "2024-01-01 00:00:00", "signup"),
      (2L, "2024-01-09 00:00:00", "view"),
      (3L, "2024-01-01 00:00:00", "signup"),
      (3L, "2024-01-10 00:00:00", "purchase"),
      (4L, "2024-01-05 00:00:00", "view") // never signs up: excluded
    ).toDF("user_id", "s", "event_type")
      .select(col("user_id"), col("s").cast("timestamp").as("ts"),
        col("event_type"))
    val r = Funnel.hazardCard(df, "user_id", "ts", "event_type", "signup")
      .orderBy("week_offset").collect()
    assert(r.map(x => (x.getAs[Long]("week_offset"),
      x.getAs[Long]("n_at_risk"), x.getAs[Long]("n_churned"),
      x.getAs[Long]("hazard_micro"))).toSeq ===
      Seq((0L, 3L, 1L, 333333L), (1L, 2L, 2L, 1000000L)))
  }
}
