package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-column data profiling — the schema-health stage a pipeline runs
  * before trusting a new drop of data (row/null/distinct counts, string
  * min/max per column), one row per profiled column.
  *
  * Scale shape: ONE aggregation over one scan. The multiple exact
  * distinct counts plan as a single Expand (one row per (input row,
  * column)) feeding a partial/final aggregate — the standard Spark
  * multi-count-distinct strategy: map-side combine still applies per
  * expanded group, nothing is collected, and the output is exactly
  * |columns| rows. Distinctness is counted over xxhash64 of the value,
  * NOT the value itself, so the Expand/shuffle carries fixed 8-byte
  * keys even for a 100 TB text column (the corpus-shuffle discipline of
  * the dedup family; a 64-bit collision under-counting by one is the
  * documented negligible-probability convention — the oracle counts raw
  * values and hash-matches). Min/max compare as STRINGS (cast first) so
  * the profile row shape is column-type-agnostic — they cost nothing at
  * scale because partial aggregation collapses each partition to one
  * value before anything shuffles. For approximate profiling at extreme
  * widths, pass `approxDistinct = true`: countDistinct swaps for
  * approx_count_distinct (HLL++) per column and the plan loses the
  * Expand — and with it the per-(row × column) shuffle row — entirely;
  * one partial/final aggregate over the scan is all that remains. The
  * approximate path is NOT cross-engine exact (HLL estimates differ by
  * implementation), so its registry entry records rows-only, the q44
  * convention.
  */
object Profile {

  /** Profile `cols` (default: every column) of `df`:
    * (column, n_rows, n_null, n_distinct, min_str, max_str). */
  def profile(df: DataFrame, cols: Seq[String] = Nil,
              approxDistinct: Boolean = false): DataFrame = {
    val names = if (cols.nonEmpty) cols else df.columns.toSeq
    require(names.nonEmpty, "profile needs at least one column")
    val aggs: Seq[Column] = names.flatMap { c =>
      val s = col(c).cast("string")
      val hashed = when(col(c).isNotNull, xxhash64(s))
      Seq(count(lit(1)).as(s"__n_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
        // 8-byte hash distinct: xxhash64(null-in) is null-out via the
        // when(), so null exclusion matches count(DISTINCT raw)
        (if (approxDistinct) approx_count_distinct(hashed)
         else countDistinct(hashed)).as(s"__d_$c"),
        min(s).as(s"__min_$c"),
        max(s).as(s"__max_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = names.map { c =>
      struct(lit(c).as("column"), col(s"__n_$c").as("n_rows"),
        col(s"__null_$c").as("n_null"), col(s"__d_$c").as("n_distinct"),
        col(s"__min_$c").as("min_str"), col(s"__max_$c").as("max_str"))
    }
    wide.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  /** Pairwise cosine² between GROUPS' item-count distributions — "do
    * these two sources publish the same distribution" (mirror feeds,
    * re-crawls, laundered copies), answered at the distribution level
    * where document-level dedup sees nothing. cos² = dot²/(‖a‖²·‖b‖²)
    * is an exact rational of integer counts; reported as
    * ⌊scale·dot²/(n2a·n2b)⌋ with DECIMAL(38,0) squares.
    *
    * Scale: the inverted-index shape — counts key on the 60-bit item
    * hash, the pair dot is a self-equi-join ON THE ITEM (each item
    * contributes its groups² pairs, bounded by group count, never an
    * all-pairs of items), and norms join in at |groups| rows. Output
    * is |groups|² rows at most.
    *
    * @return (g_a, g_b, dot, cos2_micro) with g_a < g_b */
  def distributionCosine(df: DataFrame, groupCol: String, itemCol: Column,
                         scale: Long = 1000000L): DataFrame = {
    require(scale >= 1L, s"scale must be positive, got $scale")
    val counts = df
      .select(col(groupCol).as("__g"),
        graft.operators.Dedup.baseHash60(itemCol).as("__ih"))
      .groupBy(col("__g"), col("__ih"))
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint()
    val norms = counts.groupBy(col("__g"))
      .agg(sum(expr("CAST(__c AS DECIMAL(38,0)) * __c")).as("__n2"))
    val a = counts.select(col("__ih"), col("__g").as("g_a"), col("__c").as("__ca"))
    val b = counts.select(col("__ih"), col("__g").as("g_b"), col("__c").as("__cb"))
    a.join(b, Seq("__ih"))
      .filter(col("g_a") < col("g_b"))
      .groupBy(col("g_a"), col("g_b"))
      // the dot accumulates in the SAME decimal lane as the norms —
      // by Cauchy-Schwarz it reaches the same magnitudes, and a raw
      // long product would wrap exactly where the norms are protected;
      // the BIGINT output cast fails loudly (ANSI) past 2^63
      .agg(sum(expr("CAST(__ca AS DECIMAL(38,0)) * __cb")).as("__dot"))
      .join(norms.select(col("__g").as("g_a"), col("__n2").as("__na")), Seq("g_a"))
      .join(norms.select(col("__g").as("g_b"), col("__n2").as("__nb")), Seq("g_b"))
      .select(col("g_a"), col("g_b"),
        expr("CAST(__dot AS BIGINT)").as("dot"),
        expr(s"CAST((${scale}L * __dot * __dot)" +
          " div (__na * __nb) AS BIGINT)").as("cos2_micro"))
  }

  /** Gini diversity card per group — the log-free concentration
    * metric (1 − Σp²; 0 = one item owns the group, →1 = uniform):
    * the "is this source a million copies of one template" governance
    * check that an entropy card cannot state exactly (log is not
    * cross-engine exact; the Gini rational is). Reported as
    * ⌊scale·(n² − Σc²)/n²⌋ with the sums in DECIMAL(38,0).
    *
    * Scale: one (group, item) count aggregation — map-side combined,
    * itemCol hashed to 60 bits first so text never shuffles — then a
    * |groups|-row re-aggregation. Nothing data-sized survives the
    * first groupBy.
    *
    * @return (groupCol, n_items, n_distinct, gini_micro) */
  def giniDiversity(df: DataFrame, groupCol: String, itemCol: Column,
                    scale: Long = 1000000L): DataFrame = {
    require(scale >= 1L, s"scale must be positive, got $scale")
    val counts = df
      .select(col(groupCol),
        graft.operators.Dedup.baseHash60(itemCol).as("__ih"))
      .groupBy(col(groupCol), col("__ih"))
      .agg(count(lit(1)).as("__c"))
    counts.groupBy(col(groupCol))
      .agg(sum(col("__c")).as("n_items"),
        count(lit(1)).as("n_distinct"),
        sum(expr("CAST(__c AS DECIMAL(38,0)) * __c")).as("__s2"))
      .select(col(groupCol), col("n_items"), col("n_distinct"),
        expr(s"CAST((${scale}L * (CAST(n_items AS DECIMAL(38,0)) * n_items" +
          " - __s2)) div (CAST(n_items AS DECIMAL(38,0)) * n_items)" +
          " AS BIGINT)").as("gini_micro"))
  }

  /** χ² association card between two categorical columns — the "is
    * language independent of source" governance check (a skewed
    * association in a training mix is a bias finding): each (a, b)
    * cell contributes ⌊scale·(O·N − R·C)² / (N·R·C)⌋, the exact
    * integer form of (O−E)²/E scaled by N (multiply (O−E)²/E by N²/N²:
    * numerator (O·N−R·C)², denominator N·R·C — one floor per cell, so
    * the whole card replays cross-engine; Σ cells ≈ scale·N·χ²).
    *
    * Scale: one contingency aggregation (map-side combined) + two
    * marginal re-aggregations of the |A|·|B|-sized cell table + a
    * 1-row total — everything after the first groupBy is
    * contingency-sized. Squares run in DECIMAL(38,0) (O·N overflows a
    * long at ~3·10⁹ rows; the governance lane must not wrap).
    *
    * @return (aCol, bCol, n, chi_micro) one row per observed cell */
  def chiSquareCard(df: DataFrame, aCol: String, bCol: String,
                    scale: Long = 1000000L): DataFrame = {
    require(scale >= 1L, s"scale must be positive, got $scale")
    val cells = df.groupBy(col(aCol), col(bCol))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val rowTot = cells.groupBy(col(aCol)).agg(sum(col("n")).as("__r"))
    val colTot = cells.groupBy(col(bCol)).agg(sum(col("n")).as("__c"))
    val total = cells.agg(sum(col("n")).as("__t"))
    cells.join(rowTot, Seq(aCol)).join(colTot, Seq(bCol))
      .crossJoin(broadcast(total))
      .withColumn("__num", expr(
        "CAST(n AS DECIMAL(38,0)) * __t - CAST(__r AS DECIMAL(38,0)) * __c"))
      .select(col(aCol), col(bCol), col("n"),
        expr(s"CAST(($scale" +
          "L * __num * __num) div (CAST(__t AS DECIMAL(38,0)) * __r * __c)" +
          " AS BIGINT)").as("chi_micro"))
  }

  /** Two-arm A/B experiment card with an EXACT Welch test decision —
    * "did arm B move the metric, per metric, with no floats anywhere":
    * units (users) aggregate to one integer value each, arms compare
    * by Welch's unequal-variance t², and both the statistic and the
    * significance flag are stated as exact integer comparisons, so the
    * ship/no-ship boundary replays bit-for-bit (a float z at the
    * threshold is precisely where an experiment framework must not
    * flap).
    *
    * Exactness: with per-arm sufficient statistics (n, Σx, Σx²) over
    * integer unit values, Welch's t² = Δ²/(s²ₐ/nₐ + s²ᵦ/nᵦ) is the
    * RATIONAL t² = Δnum²·(nₐ−1)(nᵦ−1) / Dv where
    * Δnum = Σxₐ·nᵦ − Σxᵦ·nₐ and
    * Dv = (nₐΣx²ₐ−Σxₐ²)·nᵦ²(nᵦ−1) + (nᵦΣx²ᵦ−Σxᵦ²)·nₐ²(nₐ−1).
    * One floor for t2_micro; significance is the cross-multiplied
    * comparison 10⁴·Δnum²·(nₐ−1)(nᵦ−1) > z2ThresholdBp·Dv (default
    * 38416 bp = 1.96², the two-sided 5% normal bound — arms large
    * enough to A/B test are far past the t-distribution's small-n
    * correction). The whole lane runs in DECIMAL(38,0) and fails
    * LOUDLY on overflow (ANSI) — |Σx|·n must stay under 10¹⁹, so
    * center or rescale a huge-cent metric first (the corrCard bound).
    * Degenerate cells (an arm with < 2 units, or zero variance in
    * both arms) report t2_micro = 0, significant = 0: no measurable
    * variance means no test, not an infinite statistic.
    *
    * Scale: two map-side-combined aggregations over one scan — per
    * (metric, unit, arm) then per (metric, arm) — and a |metrics|-row
    * self-join of the two arm slices. Nothing row-sized survives the
    * first groupBy; the decision arithmetic runs on |metrics| rows.
    *
    * @param armCol  0/1 arm assignment — MUST be a deterministic
    *                function of the unit (e.g. `pmod(user_id, 2)`);
    *                a unit in both arms would double-count
    * @param valueCents integer metric contribution per row
    * @return (metric, n_a, n_b, sum_a_cents, sum_b_cents, delta_sign,
    *         t2_micro, significant) */
  def abWelchCard(df: DataFrame, metricCol: String, unitCol: String,
                  armCol: Column, valueCents: Column,
                  z2ThresholdBp: Long = 38416L,
                  scale: Long = 1000000L): DataFrame = {
    require(scale >= 1L, s"scale must be positive, got $scale")
    require(z2ThresholdBp >= 1L,
      s"z2ThresholdBp must be positive, got $z2ThresholdBp")
    val perUnit = df
      .groupBy(col(metricCol).as("metric"), col(unitCol).as("__u"),
        armCol.as("__arm"))
      .agg(sum(valueCents).as("__x"))
    val perArm = perUnit
      .withColumn("__xd", col("__x").cast("decimal(38,0)"))
      .groupBy(col("metric"), col("__arm"))
      .agg(count(lit(1)).as("__n"),
        sum(col("__xd")).as("__sx"),
        sum(expr("__xd * __xd")).as("__sxx"))
      .localCheckpoint()
    val a = perArm.filter(col("__arm") === 0)
      .select(col("metric"), col("__n").as("__na"),
        col("__sx").as("__sxa"), col("__sxx").as("__sxxa"))
    val b = perArm.filter(col("__arm") === 1)
      .select(col("metric"), col("__n").as("__nb"),
        col("__sx").as("__sxb"), col("__sxx").as("__sxxb"))
    a.join(b, Seq("metric"))
      .withColumn("__dn", expr(
        "__sxa * CAST(__nb AS DECIMAL(38,0)) - __sxb * CAST(__na AS DECIMAL(38,0))"))
      .withColumn("__aa", expr(
        "CAST(__na AS DECIMAL(38,0)) * __sxxa - __sxa * __sxa"))
      .withColumn("__ab", expr(
        "CAST(__nb AS DECIMAL(38,0)) * __sxxb - __sxb * __sxb"))
      .withColumn("__dv", expr(
        "__aa * CAST(__nb AS DECIMAL(38,0)) * __nb * (__nb - 1)" +
          " + __ab * CAST(__na AS DECIMAL(38,0)) * __na * (__na - 1)"))
      .withColumn("__tn", expr(
        "__dn * __dn * (CAST(__na AS DECIMAL(38,0)) - 1) * (__nb - 1)"))
      .select(col("metric"),
        col("__na").as("n_a"), col("__nb").as("n_b"),
        expr("CAST(__sxa AS BIGINT)").as("sum_a_cents"),
        expr("CAST(__sxb AS BIGINT)").as("sum_b_cents"),
        when(col("__na") >= 2 && col("__nb") >= 2 && col("__dv") > 0,
          signum(col("__dn")).cast("long")).otherwise(lit(0L))
          .as("delta_sign"),
        when(col("__na") >= 2 && col("__nb") >= 2 && col("__dv") > 0,
          expr(s"CAST((${scale}L * __tn) div __dv AS BIGINT)"))
          .otherwise(lit(0L)).as("t2_micro"),
        when(col("__na") >= 2 && col("__nb") >= 2 && col("__dv") > 0 &&
          expr(s"10000 * __tn > ${z2ThresholdBp}L * __dv"), lit(1L))
          .otherwise(lit(0L)).as("significant"))
  }

  /** ⌊10⁶·log₁₀(1+1/d)⌋ for d = 1..9 — Benford's law as integer micro
    * constants, hardcoded so no engine ever evaluates a logarithm. */
  private[graft] val BenfordMicro: Seq[Long] =
    Seq(301029L, 176091L, 124938L, 96910L, 79181L,
      66946L, 57991L, 51152L, 45757L)

  /** Benford first-digit audit per group — the forensic data-quality
    * check for amount-like columns (invoice totals, prices, transfer
    * sizes): organically-generated amounts follow log₁₀(1+1/d) digit
    * frequencies; fabricated or truncated feeds don't. The expected
    * frequencies are HARDCODED integer micro constants
    * ([[BenfordMicro]]) — no log is ever evaluated, so observed,
    * expected and deviation all replay bit-for-bit cross-engine.
    *
    * Semantics: only amounts ≥ 1 participate (the first significant
    * digit of the integer part; sub-unit amounts would need decimal
    * re-scaling — out of scope, documented). Every group reports all
    * nine digits, zero-filled, so the card's shape is |groups|×9
    * regardless of which digits occur.
    *
    * Scale: one map-side-combined (group, digit) count over one scan;
    * the dense digit axis is GENERATED (|groups|×9, the gapFill law),
    * everything after the first groupBy is axis-sized.
    *
    * @return (groupCol, digit, n_amounts, n_obs, obs_micro, exp_micro,
    *         dev_micro) */
  def benfordCard(df: DataFrame, groupCol: String,
                  amountCol: Column): DataFrame = {
    val digits = df.filter(amountCol >= 1)
      .select(col(groupCol),
        substring(floor(amountCol).cast("long").cast("string"), 1, 1)
          .cast("long").as("digit"))
    val counts = digits.groupBy(col(groupCol), col("digit"))
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint()
    val totals = counts.groupBy(col(groupCol))
      .agg(sum(col("__c")).as("n_amounts"))
    val expected = array(BenfordMicro.map(lit): _*)
    val axis = totals.select(col(groupCol), col("n_amounts"),
      explode(sequence(lit(1L), lit(9L))).as("digit"))
    axis.join(counts, Seq(groupCol, "digit"), "left")
      .withColumn("n_obs", coalesce(col("__c"), lit(0L)))
      .select(col(groupCol), col("digit"), col("n_amounts"), col("n_obs"),
        expr("(1000000L * n_obs) div n_amounts").as("obs_micro"),
        element_at(expected, col("digit").cast("int")).as("exp_micro"))
      .withColumn("dev_micro",
        abs(col("obs_micro") - col("exp_micro")))
  }

  /** Per-group Pearson correlation between two INTEGER features,
    * integer-exact — the feature-drift card a pipeline runs when a
    * derived signal (token count, quality score) should track a raw one
    * (char length) and silent divergence means a bug upstream.
    *
    * Exactness: r itself needs a square root, so the card reports
    * r² in micro-units plus the sign — r² = num²/(dx·dy) is a RATIONAL
    * of the six integer sufficient statistics (n, Σx, Σy, Σxy, Σx²,
    * Σy²), and ⌊10⁶·num²/(dx·dy)⌋ with ONE floor replays bit-for-bit
    * cross-engine (the BM25 discipline; a float corr() would not).
    * The whole lane runs in DECIMAL(38,0) — Σx² overflows a long as
    * soon as |x| passes ~3·10⁹·√n, and a silent double round-trip here
    * is exactly the bug class this card exists to catch. The decimal
    * lane's own bound is |num| < 10¹⁹ (num² must fit 38 digits); past
    * it the arithmetic fails LOUDLY (ANSI overflow) instead of
    * degrading — center/rescale the feature first. Constant features
    * (dx·dy = 0) report (0, 0).
    *
    * Scale: one map-side-combined aggregation over one scan — six
    * decimal sums per group, |groups| output rows, nothing else moves. */
  def corrCard(df: DataFrame, groupCol: String, xCol: String,
               yCol: String, scale: Long = 1000000L): DataFrame = {
    require(scale >= 1L, s"scale must be positive, got $scale")
    val x = col(xCol).cast("decimal(38,0)")
    val y = col(yCol).cast("decimal(38,0)")
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(x).as("__sx"), sum(y).as("__sy"),
        sum(x * y).as("__sxy"), sum(x * x).as("__sxx"),
        sum(y * y).as("__syy"))
      .withColumn("__num", expr(
        "CAST(n AS DECIMAL(38,0)) * __sxy - CAST(__sx AS DECIMAL(38,0)) * __sy"))
      .withColumn("__dx", expr(
        "CAST(n AS DECIMAL(38,0)) * __sxx - CAST(__sx AS DECIMAL(38,0)) * __sx"))
      .withColumn("__dy", expr(
        "CAST(n AS DECIMAL(38,0)) * __syy - CAST(__sy AS DECIMAL(38,0)) * __sy"))
      .select(col(groupCol), col("n"),
        when(col("__dx") > 0 && col("__dy") > 0,
          expr(s"CAST((${scale}L * __num * __num) div (__dx * __dy) AS BIGINT)"))
          .otherwise(lit(0L)).as("corr2_micro"),
        when(col("__dx") > 0 && col("__dy") > 0,
          signum(col("__num")).cast("long")).otherwise(lit(0L)).as("corr_sign"))
  }
}
