package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.IntMath

/** Ordered-funnel and cohort-retention analytics — the two queries
  * every behavioural log answers first ("how many users made it
  * view → click → purchase, in order?", "how do signup cohorts decay
  * week over week?").
  *
  * Funnel shape: the k-step ordered funnel is k−1 chained
  * `min(ts WHERE type = step AND ts > prev)` aggregations, every one
  * keyed by the user — ONE hash partitioning that AQE reuses across
  * the chain (no sort, no per-user state machine, no window over the
  * whole event history). Strictly-after semantics (`ts > prev`): a
  * same-microsecond event does not advance the funnel, and each step's
  * timestamp is the EARLIEST valid one (the standard unordered-events
  * funnel definition; the DuckDB oracle replays it as chained CTEs).
  *
  * Retention shape: anchor per user (earliest `anchorType` event),
  * then one distinct-count over (cohort week, week offset) — integer
  * week arithmetic (`floordiv` of epoch-micros) so both engines land
  * on identical buckets; users without an anchor or with pre-anchor
  * activity rows simply contribute nothing (offset < 0 is filtered,
  * matching the oracle).
  *
  * Scale (100 TB): all joins/aggregations share the user key; the
  * funnel's intermediate relations are |users|-sized (tiny next to
  * |events|), and retention is one join + one aggregation. Nothing
  * here holds per-user event lists in memory.
  */
object Funnel {

  /** Per-user earliest completion time of each funnel step, in order.
    * Output: (user, t0, t1, ..., t{k-1}) with NULL once a step is not
    * reached. */
  def userSteps(events: DataFrame, userCol: String, tsCol: String,
                typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t0"))
    steps.zipWithIndex.drop(1).foldLeft(first) { case (prev, (step, i)) =>
      val nxt = events.filter(col(typeCol) === step)
        .select(col(userCol), col(tsCol).as("__ts"))
        .join(prev.select(col(userCol), col(s"t${i - 1}").as("__prev")),
          userCol)
        .filter(col("__ts") > col("__prev"))
        .groupBy(col(userCol)).agg(min(col("__ts")).as(s"t$i"))
      prev.join(nxt, Seq(userCol), "left")
    }
  }

  /** The funnel card: one row per step with users reaching it and the
    * conversion from step 0 in integer basis points. */
  def card(events: DataFrame, userCol: String, tsCol: String,
           typeCol: String, steps: Seq[String]): DataFrame =
    cardFrom(userSteps(events, userCol, tsCol, typeCol, steps), steps)

  /** [[userSteps]] with a completion deadline — every later step must
    * land within `windowSec` of the STEP-0 time (the product-analytics
    * "converted within 24 h of first view" funnel; the unbounded form
    * overstates conversion by counting week-later purchases). Same
    * strictly-after, earliest-valid semantics inside the window; the
    * deadline comparison is integer epoch-micros, engine-portable.
    * Same scale shape as [[userSteps]] — the deadline rides the
    * existing per-step join as one more predicate, |users|-sized
    * intermediates throughout. */
  def windowedUserSteps(events: DataFrame, userCol: String, tsCol: String,
                        typeCol: String, steps: Seq[String],
                        windowSec: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(windowSec >= 1, s"windowSec must be positive, got $windowSec")
    val us = windowSec * 1000000L
    val first = events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t0"))
    steps.zipWithIndex.drop(1).foldLeft(first) { case (prev, (step, i)) =>
      val nxt = events.filter(col(typeCol) === step)
        .select(col(userCol), col(tsCol).as("__ts"))
        .join(prev.select(col(userCol), col(s"t${i - 1}").as("__prev"),
          col("t0").as("__t0")), userCol)
        .filter(col("__ts") > col("__prev") &&
          unix_micros(col("__ts")) <= unix_micros(col("__t0")) + us)
        .groupBy(col(userCol)).agg(min(col("__ts")).as(s"t$i"))
      prev.join(nxt, Seq(userCol), "left")
    }
  }

  /** [[card]] under the [[windowedUserSteps]] deadline. */
  def windowedCard(events: DataFrame, userCol: String, tsCol: String,
                   typeCol: String, steps: Seq[String],
                   windowSec: Long): DataFrame =
    cardFrom(windowedUserSteps(events, userCol, tsCol, typeCol, steps,
      windowSec), steps)

  private def cardFrom(per: DataFrame, steps: Seq[String]): DataFrame = {
    val aggs = steps.indices.map(i =>
      count(col(s"t$i")).as(s"n$i"))
    // ONE row — localCheckpoint so the k unioned per-step selects
    // below don't each re-execute the whole chained-join pipeline
    // (Spark re-plans the subtree per consumer)
    val totals = per.agg(aggs.head, aggs.tail: _*).localCheckpoint()
    val rows = steps.indices.map { i =>
      totals.select(lit(i).as("step"), lit(steps(i)).as("step_name"),
        col(s"n$i").as("n_users"),
        // n0 = 0 (nobody reached step 0): conversion is 0, not NaN
        when(col("n0") === 0, lit(0L))
          .otherwise(floor(col(s"n$i") * 10000 / col("n0")).cast("long"))
          .as("conv_bp"))
    }
    rows.reduce(_ unionByName _)
  }

  private val WeekUs = 7L * 86400L * 1000000L

  /** Cohort retention matrix: users anchored by their earliest
    * `anchorType` event; one row per (cohort_week, week_offset) with
    * the distinct active users. Weeks are integer epoch-week indexes
    * (floordiv of epoch micros — engine-portable, no calendar). */
  /** First-order Markov transition matrix over each user's ordered
    * event stream — the behavior model behind "what usually follows a
    * view": counts of adjacent (from, to) type pairs under the total
    * (ts, id) order, with the conditional probability in integer
    * micro-units (⌊10⁶·n(from,to)/n(from,·)⌋ — one truncating division
    * per cell, so the matrix replays cross-engine).
    *
    * Scale: one exchange on the user for the lag pass (shared with any
    * sibling per-user window), then a map-side-combined |types|² count
    * aggregation; the denominator join runs on the |types|-sized
    * margin frame. Each user's FIRST event has no predecessor and
    * feeds no cell.
    *
    * @return (from_type, to_type, n, p_micro) */
  def transitionMatrix(events: DataFrame, userCol: String, tsCol: String,
                       idCol: String, typeCol: String,
                       scale: Long = 1000000L): DataFrame = {
    require(scale >= 1L, s"scale must be positive, got $scale")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(idCol))
    val pairs = events
      .withColumn("__prev", lag(col(typeCol), 1).over(w))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__prev").as("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n"))
      // the |types|²-sized matrix feeds both the output and its own
      // margins — checkpoint once or the per-user lag pass over the
      // corpus runs twice
      .localCheckpoint()
    val fromTot = pairs.groupBy(col("from_type")).agg(sum(col("n")).as("__ft"))
    pairs.join(fromTot, Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        expr(s"(${scale}L * n) div __ft").as("p_micro"))
  }

  /** Frequent event paths — k-length sliding windows of each user's
    * time-ordered event-type sequence, counted corpus-wide with a
    * support floor: the "what do users actually do" path-mining
    * companion to [[transitionMatrix]] (which is this at k = 2 with
    * probabilities). Output: (path, n_occ, n_users), paths joined with
    * `sep`.
    *
    * Scale: the k−1 lags all ride the ONE per-user sort window (a
    * single shuffle on the user key — the sessionize partitioning);
    * path counts combine map-side, and `minSupport` prunes the
    * long-tail paths before the distinct-user count aggregates. The
    * tie order inside a user is (ts, id) — total, so replay-stable.
    * CONTRACT: event types must not contain `sep` (a type containing
    * the separator would alias two different paths — guarded). */
  def frequentPaths(events: DataFrame, userCol: String, tsCol: String,
                    idCol: String, typeCol: String, k: Int = 3,
                    minSupport: Long = 2L, sep: String = ">"): DataFrame = {
    require(k >= 2 && k <= 8, s"path length k must be in [2, 8], got $k")
    require(minSupport >= 1L, s"minSupport must be >= 1, got $minSupport")
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val guarded = when(col(typeCol).contains(lit(sep)),
      raise_error(concat(lit(s"frequentPaths: event type contains '$sep': "),
        col(typeCol)))).otherwise(col(typeCol))
    val lags = (k - 1 to 1 by -1).map(j => lag(guarded, j).over(w))
    val elems = lags :+ guarded
    val withPath = events
      // concat_ws silently skips NULLs, so gate on EVERY element: a
      // not-yet-full window drops, and so does any window crossing a
      // NULL event type — otherwise the (k-1)-gram it silently emits
      // would alias a real shorter path (the oracle's || concatenation
      // null-propagates, so anything less diverges from it)
      .withColumn("__full", elems.map(_.isNotNull).reduce(_ && _))
      .withColumn("__path", concat_ws(sep, elems: _*))
    withPath.filter(col("__full"))
      .groupBy(col("__path").as("path"))
      .agg(count(lit(1)).as("n_occ"),
        countDistinct(col(userCol)).as("n_users"))
      .filter(col("n_occ") >= minSupport)
  }

  /** Discrete-time churn hazard card — the CONDITIONAL decay curve
    * [[retention]] cannot state: for each week k since a user's anchor
    * event, of the users still observable at week k (their last event
    * falls in week ≥ k), what fraction made week k their last
    * ("churned at k")? hazard = d_k/n_k, the per-week exit rate —
    * retention's unconditional counts hide whether decay is front-
    * loaded or constant; the hazard is the curve that answers it.
    *
    * Semantics: anchor = earliest `anchorType` event; a user's "last
    * week" is ⌊(last event − anchor)/week⌋ over ALL their events
    * (integer floordiv of epoch micros). The card is right-censored at
    * the corpus edge: users whose last week is the global maximum may
    * simply not have lived longer — that week's hazard is an
    * OVERESTIMATE by construction (documented; a production run feeds
    * a closed observation window). hazard_micro = ⌊10⁶·d_k/n_k⌋, one
    * truncating division per row.
    *
    * Scale: two user-keyed aggregations collapse the corpus to one row
    * per anchored user; the at-risk counts come from exploding each
    * user's 0..last_week range — |users| × weeks rows, calendar-
    * bounded (the gapFill axis law), map-side combined, window-free.
    *
    * @return (week_offset, n_at_risk, n_churned, hazard_micro) */
  def hazardCard(events: DataFrame, userCol: String, tsCol: String,
                 typeCol: String, anchorType: String,
                 scale: Long = 1000000L): DataFrame = {
    require(scale >= 1L, s"scale must be positive, got $scale")
    val anchors = events.filter(col(typeCol) === anchorType)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("__anchor"))
    val lastWeek = events.select(col(userCol), col(tsCol))
      .join(anchors, userCol)
      .groupBy(col(userCol), col("__anchor"))
      .agg(max(col(tsCol)).as("__last"))
      .select(col(userCol),
        IntMath.floordiv(
          unix_micros(col("__last")) - unix_micros(col("__anchor")), WeekUs)
          .as("__lw"))
      .localCheckpoint()
    val atRisk = lastWeek
      .select(explode(sequence(lit(0L), col("__lw"))).as("week_offset"))
      .groupBy(col("week_offset"))
      .agg(count(lit(1)).as("n_at_risk"))
    val churned = lastWeek
      .groupBy(col("__lw").as("week_offset"))
      .agg(count(lit(1)).as("n_churned"))
    atRisk.join(churned, Seq("week_offset"), "left")
      .select(col("week_offset"), col("n_at_risk"),
        coalesce(col("n_churned"), lit(0L)).as("n_churned"))
      .withColumn("hazard_micro",
        expr(s"(${scale}L * n_churned) div n_at_risk"))
  }

  def retention(events: DataFrame, userCol: String, tsCol: String,
                typeCol: String, anchorType: String): DataFrame = {
    val anchors = events.filter(col(typeCol) === anchorType)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("__anchor"))
    events.select(col(userCol), col(tsCol))
      .join(anchors, userCol)
      .select(col(userCol),
        IntMath.floordiv(unix_micros(col("__anchor")), WeekUs)
          .as("cohort_week"),
        IntMath.floordiv(
          unix_micros(col(tsCol)) - unix_micros(col("__anchor")), WeekUs)
          .as("week_offset"))
      .filter(col("week_offset") >= 0)
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col(userCol)).as("n_users"))
  }
}
