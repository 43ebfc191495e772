package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {

  test("hash sample is deterministic, rate-accurate, and a subset chain") {
    import spark.implicits._
    val df = (0L until 2000L).toDF("id")
    val s30a = Sampling.hashSample(df, "id", 30).collect().map(_.getLong(0)).toSet
    val s30b = Sampling.hashSample(df, "id", 30).collect().map(_.getLong(0)).toSet
    assert(s30a == s30b) // no RNG: identical under re-execution
    // md5 is uniform: 30% ± a few points on 2000 ids
    assert(math.abs(s30a.size / 2000.0 - 0.30) < 0.05)
    // rates nest: the 30% sample is a subset of the 60% sample — stable
    // sample growth, the property rand() sampling cannot give
    val s60 = Sampling.hashSample(df, "id", 60).collect().map(_.getLong(0)).toSet
    assert(s30a.subsetOf(s60))
  }

  test("per-group cap keeps at most n per group, deterministically") {
    import spark.implicits._
    val df = (0L until 900L).map(i => (i, s"g${i % 3}")).toDF("id", "grp")
    val capped = Sampling.capPerGroup(df, "id", "grp", n = 10)
    val byGroup = capped.collect().map(r => (r.getString(1), r.getLong(0)))
      .groupBy(_._1)
    assert(byGroup.keySet == Set("g0", "g1", "g2"))
    byGroup.values.foreach(g => assert(g.length == 10))
    // determinism: same kept set on re-execution
    val again = Sampling.capPerGroup(df, "id", "grp", n = 10)
      .collect().map(_.getLong(0)).toSet
    assert(again == capped.collect().map(_.getLong(0)).toSet)
    // a group smaller than the cap survives whole
    val small = Sampling.capPerGroup(
      Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("id", "grp"), "id", "grp", 5)
    assert(small.count() == 3)
  }

  test("two-phase cap equals the global hash-rank definition") {
    import spark.implicits._
    // skewed groups: g0 has 700 rows, g1 200, g2 100 — exercises whole
    // buckets kept, whole buckets dropped, and the boundary bucket
    val df = (0L until 1000L)
      .map(i => (i, if (i < 700) "g0" else if (i < 900) "g1" else "g2"))
      .toDF("id", "grp")
    // reference: the single-window global rank (the definition)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp"))
      .orderBy(Dedup.baseHash32(col("id").cast("string")), col("id"))
    val expect = df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= 37).drop("__rk")
      .collect().map(_.getLong(0)).toSet
    // tiny bucket count forces many rows per bucket → boundary-bucket
    // tiebreak does real work; default bucket count must agree too
    for (b <- Seq(4, 16, 1024)) {
      val got = Sampling.capPerGroup(df, "id", "grp", n = 37, buckets = b)
        .collect().map(_.getLong(0)).toSet
      assert(got == expect, s"buckets=$b diverged from global rank")
    }
    // null group key survives (null-safe join)
    val withNull = Seq((1L, "x"), (2L, null.asInstanceOf[String]),
      (3L, null.asInstanceOf[String])).toDF("id", "grp")
    assert(Sampling.capPerGroup(withNull, "id", "grp", 1).count() == 2L)
    // n larger than every group keeps everything; n = 0 keeps nothing
    assert(Sampling.capPerGroup(df, "id", "grp", n = 100000).count() == 1000L)
    assert(Sampling.capPerGroup(df, "id", "grp", n = 0).count() == 0L)
  }

  test("hash shards partition the corpus and stats balance it") {
    import spark.implicits._
    val df = (0L until 2000L).map(i => (i, i % 7 + 1)).toDF("id", "w")
    val stats = Sampling.shardStats(df, "id", "w", nShards = 16).collect()
    // every row lands in exactly one shard; totals reconcile
    assert(stats.map(_.getLong(1)).sum == 2000L)
    assert(stats.map(_.getLong(2)).sum == (0L until 2000L).map(_ % 7 + 1).sum)
    assert(stats.map(_.getLong(0)).toSet.subsetOf((0L until 16L).toSet))
    // md5 is uniform: no shard more than 2x the mean
    assert(stats.map(_.getLong(1)).max < 2 * 2000 / 16)
    // membership is deterministic: shardId is a pure function of id
    val s1 = df.select(Sampling.shardId(col("id"), 16)).collect().map(_.getLong(0))
    val s2 = df.select(Sampling.shardId(col("id"), 16)).collect().map(_.getLong(0))
    assert(s1.sameElements(s2))
  }

  test("writeSharded lays out one directory per shard, round-trips, no file spray") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toString
    val df = (0L until 500L).map(i => (i, s"doc$i")).toDF("id", "text")
    Sampling.writeSharded(df, "id", nShards = 8, path = dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == 500L)
    // shard column survives as partition column and matches shardId
    val bad = back.filter(Sampling.shardId(col("id"), 8) =!= col("shard")).count()
    assert(bad == 0L)
    // repartition-aligned write: each shard directory holds ONE data file,
    // not one per input task
    val shardDirs = new java.io.File(dir).listFiles().filter(_.getName.startsWith("shard="))
    assert(shardDirs.length == 8)
    shardDirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${d.getName} has ${files.length} files")
    }
  }

  test("split labels are stable, exhaustive, and rate-accurate") {
    import spark.implicits._
    val df = (0L until 3000L).toDF("id")
    val labeled = df.select(col("id"),
      Sampling.splitLabel(col("id"), Seq("val" -> 10, "test" -> 10)).as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    // exhaustive: every doc gets exactly one of the three labels
    assert(labeled.map(_._2).toSet == Set("train", "val", "test"))
    val byLabel = labeled.groupBy(_._2).view.mapValues(_.length).toMap
    assert(math.abs(byLabel("val") / 3000.0 - 0.10) < 0.03)
    assert(math.abs(byLabel("test") / 3000.0 - 0.10) < 0.03)
    // growth stability: the same doc keeps its label in a larger corpus
    val bigger = (0L until 6000L).toDF("id").select(col("id"),
      Sampling.splitLabel(col("id"), Seq("val" -> 10, "test" -> 10)).as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    labeled.foreach { case (id, l) => assert(bigger(id) == l) }
  }

  test("epoch expansion replicates by integer part and hash-slices the fraction") {
    import spark.implicits._
    val df = (0L until 1000L).map(i => (i, if (i < 500) "en" else "zh"))
      .toDF("id", "lang")
    val out = Sampling.epochExpand(df, "id", "lang",
      Map("en" -> 250, "zh" -> 40), defaultCenti = 100)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byId = out.groupBy(_._1).view.mapValues(_.length).toMap
    // en: every doc 2 or 3 times; zh: 0 or 1 times (subsample)
    (0L until 500L).foreach(i => assert(Set(2, 3)(byId.getOrElse(i, 0))))
    (500L until 1000L).foreach(i => assert(Set(0, 1)(byId.getOrElse(i, 0))))
    // totals near 2.5x and 0.4x
    val en = out.count(_._2 == "en"); val zh = out.count(_._2 == "zh")
    assert(math.abs(en / 500.0 - 2.5) < 0.15)
    assert(math.abs(zh / 500.0 - 0.4) < 0.15)
    // copy ordinals are 1..n per doc
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.sameElements(1L to rows.length))
    }
  }

  test("per-purpose salts keep composed selections independent of splits") {
    import spark.implicits._
    val df = (0L until 4000L).toDF("id")
    val split = df.select(col("id"),
      Sampling.splitLabel(col("id"), Seq("val" -> 10, "test" -> 10)).as("split"))
    // 0.3-epoch subsample composed AFTER splitting (the documented
    // pipeline order): unsalted it would keep hv<30 ⊇ val (hv<10) — 100%
    // of val and only 25% of train; salted it realizes ~30% in EVERY split
    val mixed = Sampling.epochExpand(split.withColumn("src", lit("x")),
      "id", "src", Map("x" -> 30)).groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val splitSizes = split.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Seq("val", "test", "train").foreach { s =>
      val frac = mixed.getOrElse(s, 0L).toDouble / splitSizes(s)
      assert(math.abs(frac - 0.30) < 0.08,
        s"epoch subsample realized $frac of '$s' (want ~0.30)")
    }
    // shard 20 ways: unsalted, shard = h%20 and val = h%100<10 would pack
    // every val doc into shards 0–9; salted, all 20 shards see all splits
    val sharded = split.withColumn("shard", Sampling.shardId(col("id"), 20))
    val shardSplits = sharded.groupBy("shard")
      .agg(countDistinct(col("split")).as("k"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(shardSplits.size == 20 && shardSplits.values.forall(_ == 3L))
    // sampling 50% composed with the split keeps ~50% of val, not all of it
    val kept = Sampling.hashSample(split, "id", 50)
      .filter(col("split") === "val").count().toDouble
    val valN = splitSizes("val").toDouble
    assert(math.abs(kept / valN - 0.5) < 0.1,
      s"sample kept ${kept / valN} of val (want ~0.5)")
  }

  test("stratified sample applies per-stratum rates") {
    import spark.implicits._
    val df = (0L until 3000L).map(i => (i, if (i % 3 == 0) "en" else "rare"))
      .toDF("id", "lang")
    val kept = Sampling.stratifiedHashSample(df, "id", "lang",
      Map("en" -> 20), defaultPct = 100).collect()
    val (en, rare) = kept.partition(_.getString(1) == "en")
    assert(rare.length == 2000) // 100%: every rare row survives
    assert(math.abs(en.length / 1000.0 - 0.20) < 0.06)
  }

  test("weight budget matches the global running-sum definition (sweep)") {
    import spark.implicits._
    // oracle = the single-window global definition the scale form must
    // equal bit-for-bit; tiny bucket count forces boundary buckets
    (0 until 6).foreach { trial =>
      val rnd = new scala.util.Random(100L + trial)
      val rows = (0L until 400L).map(i =>
        (i, s"s${i % 3}", rnd.nextInt(20).toLong)) // zero weights included
      val df = rows.toDF("id", "src", "w")
      val budget = 50L + rnd.nextInt(300)
      val got = Sampling.weightBudget(df, "id", "w", "src", budget, buckets = 8)
        .collect().map(_.getLong(0)).toSet
      val hv = Dedup.baseHash32(concat(col("id").cast("string"), lit(":budget")))
      val win = org.apache.spark.sql.expressions.Window
        .partitionBy(col("src")).orderBy(hv, col("id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val want = df.withColumn("__run", sum(col("w")).over(win))
        .filter(col("__run") <= budget).collect().map(_.getLong(0)).toSet
      assert(got == want, s"trial $trial budget=$budget")
    }
  }

  test("weight budget keeps boundary zero-weight rows and drops over-budget heads") {
    import spark.implicits._
    // one row heavier than the whole budget: nothing from that stratum
    val heavy = Seq((1L, "a", 100L), (2L, "a", 100L)).toDF("id", "src", "w")
    assert(Sampling.weightBudget(heavy, "id", "w", "src", 40L).count() == 0)
    // zero-weight rows cost nothing and survive regardless of position
    val zeros = (0L until 50L).map(i => (i, "z", 0L)).toDF("id", "src", "w")
    assert(Sampling.weightBudget(zeros, "id", "w", "src", 0L).count() == 50)
  }

  test("temperature mix weights are sqrt-flattened, integer-exact, and sum to ~1e6") {
    import spark.implicits._
    // 10000 vs 100 tokens: T=1 shares 99%/1%; T=0.5 flattens to 10:1
    val df = Seq.tabulate(100)(i => ("big", 100L)) ++ Seq(("small", 100L))
    val out = Sampling.temperatureMixWeights(
      df.toDF("src", "w"), "src", "w", temperature = 0.5)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (_, bigW, bigScore, bigPpm) = out("big")
    val (_, smallW, smallScore, smallPpm) = out("small")
    assert(bigW == 10000L && smallW == 100L)
    // exact integer contract: score = floor(1e6 * sqrt(weight))
    assert(bigScore == math.floor(1e6 * math.sqrt(10000.0)).toLong)
    assert(smallScore == math.floor(1e6 * math.sqrt(100.0)).toLong)
    assert(bigPpm == bigScore * 1000000L / (bigScore + smallScore))
    // flattening: 100x the tokens gets only 10x the share
    assert(math.abs(bigPpm.toDouble / smallPpm - 10.0) < 0.01)
    // shares sum to 1e6 minus integer-division dust
    assert(bigPpm + smallPpm <= 1000000L && bigPpm + smallPpm > 999998L)
    intercept[IllegalArgumentException] {
      Sampling.temperatureMixWeights(df.toDF("src", "w"), "src", "w", 0.7)
    }
  }

  test("topPerGroupByScore survives adversarial scores: ties, zeros, band edges") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // scores sit exactly ON bit-length band boundaries (1,2,4,8...),
    // include heavy ties and zeros — the cases banding gets wrong first
    val rnd = new scala.util.Random(42)
    val rows = (1L to 400L).map { id =>
      val score = rnd.nextInt(5) match {
        case 0 => 0L
        case 1 => 1L << rnd.nextInt(8)            // exact band edges
        case 2 => (1L << rnd.nextInt(8)) - 1      // just below an edge
        case 3 => 7L                               // massive tie group
        case _ => rnd.nextInt(1000).toLong
      }
      (id, s"g${id % 5}", score)
    }
    val df = rows.toDF("id", "grp", "score")
    Seq(1, 7, 50).foreach { n =>
      val got = Sampling.topPerGroupByScore(df, "id", "grp", "score", n)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("grp")).orderBy(col("score").desc, col("id"))
      val want = df.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= n).drop("rk")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got == want, s"n=$n under adversarial scores")
    }
  }

  test("globalOrder survives skewed bins and singleton buckets") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // one bin holds 90% of rows; bins are non-contiguous longs
    val rows = (1L to 500L).map(id => (id, if (id <= 450) 7L else id % 3 * 100))
    val df = rows.toDF("id", "bin")
    val got = Sampling.globalOrder(df, "id", "bin")
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(got.map(_._2).sorted.toSeq == (0L until 500L).toSeq)
    val naive = df
      .withColumn("hv", graft.operators.Dedup.baseHash32(
        concat(col("id").cast("string"), lit(":order"))))
      .orderBy(col("bin"), col("hv"), col("id"))
      .select(col("id")).collect().map(_.getLong(0))
    assert(got.sortBy(_._2).map(_._1).sameElements(naive))
  }

  test("topPerGroupByScore equals the naive per-group rank (sweep)") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.01")
      .select(col("doc_id"), col("source"), col("n_chars"))
    Seq(1, 3, 10, 1000).foreach { n =>
      val got = Sampling.topPerGroupByScore(docs, "doc_id", "source", "n_chars", n)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("n_chars").desc, col("doc_id"))
      val want = docs.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= n).drop("rk")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(got == want, s"n=$n: banded selection != naive rank")
    }
  }
}
