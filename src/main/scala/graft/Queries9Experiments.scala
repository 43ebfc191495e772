package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Funnel, GraphStats, Profile, Skyline, TimeSeries}

/** Registry slice 9 (round 14): experimentation and forecasting
  * analytics — the exact-integer Welch A/B decision card, the
  * seasonal-naive forecast backtest, the per-group Pareto skyline,
  * the Benford first-digit forensic audit, deterministic label-
  * propagation communities, the deadline-bounded funnel, and the
  * discrete-time churn hazard curve. */
private[graft] trait Queries9Experiments extends Queries8Analytics {

  // ---------------------------------------------------------------------
  // q226 — A/B experiment card with an EXACT Welch decision
  // (operators/Profile.abWelchCard): users split by id parity, per-user
  // integer-cent metric totals per event type, Welch t² and the 5%
  // significance flag both stated as DECIMAL(38,0) cross-multiplied
  // integer comparisons — the ship/no-ship boundary replays
  // bit-for-bit (a float z at the threshold is where an experiment
  // framework must not flap). Units = users observed on the metric
  // (documented; exposure logs would widen the frame, not the math).
  // ---------------------------------------------------------------------
  private[graft] def q226AbWelch(spark: SparkSession, dir: String): DataFrame =
    Profile.abWelchCard(Tables.events(spark, dir),
      "event_type", "user_id", pmod(col("user_id"), lit(2)),
      floor(col("value") * lit(100.0)).cast("long"))

  private[graft] val q226Sql =
    """WITH pu AS (
      |  SELECT event_type AS metric, user_id, user_id % 2 AS arm,
      |    CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS HUGEINT) AS x
      |  FROM events GROUP BY 1, 2, 3),
      |pa AS (
      |  SELECT metric, arm, CAST(count(*) AS HUGEINT) AS n,
      |    sum(x) AS sx, sum(x * x) AS sxx
      |  FROM pu GROUP BY 1, 2),
      |j AS (
      |  SELECT a.metric, a.n AS na, b.n AS nb, a.sx AS sxa, b.sx AS sxb,
      |    a.sxx AS sxxa, b.sxx AS sxxb
      |  FROM pa a JOIN pa b ON a.metric = b.metric
      |  WHERE a.arm = 0 AND b.arm = 1),
      |c AS (
      |  SELECT metric, na, nb, sxa, sxb,
      |    sxa * nb - sxb * na AS dn,
      |    (na * sxxa - sxa * sxa) * nb * nb * (nb - 1)
      |      + (nb * sxxb - sxb * sxb) * na * na * (na - 1) AS dv
      |  FROM j)
      |SELECT metric, CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
      |  CAST(sxa AS BIGINT) AS sum_a_cents, CAST(sxb AS BIGINT) AS sum_b_cents,
      |  CAST(CASE WHEN na >= 2 AND nb >= 2 AND dv > 0
      |    THEN sign(dn) ELSE 0 END AS BIGINT) AS delta_sign,
      |  CAST(CASE WHEN na >= 2 AND nb >= 2 AND dv > 0
      |    THEN (1000000 * dn * dn * (na - 1) * (nb - 1)) // dv
      |    ELSE 0 END AS BIGINT) AS t2_micro,
      |  CAST(CASE WHEN na >= 2 AND nb >= 2 AND dv > 0
      |        AND 10000 * dn * dn * (na - 1) * (nb - 1) > 38416 * dv
      |    THEN 1 ELSE 0 END AS BIGINT) AS significant
      |FROM c""".stripMargin

  // ---------------------------------------------------------------------
  // q227 — seasonal-naive forecast backtest (operators/TimeSeries
  // .forecastBacktest): daily integer-cent series per event type over
  // the generated dense axis, lag-7 vs lag-1 baselines scored by total
  // absolute error — the zero-parameter floor any trained forecaster
  // must beat. Everything after the one (key, bucket) cent aggregation
  // is axis-sized; both lags ride ONE per-key sort window.
  // ---------------------------------------------------------------------
  private[graft] def q227ForecastBacktest(spark: SparkSession, dir: String): DataFrame =
    TimeSeries.forecastBacktest(Tables.events(spark, dir),
      "event_type", "ts", "value", bucketSec = 86400L, season = 7)

  private[graft] val q227Sql =
    """WITH b AS (SELECT event_type,
      |    epoch_us(ts) // 86400000000 AS bucket_id,
      |    CAST(floor(value * 100) AS BIGINT) AS cents FROM events),
      |c AS (SELECT event_type, bucket_id, CAST(sum(cents) AS BIGINT) AS n
      |      FROM b GROUP BY 1, 2),
      |st AS (SELECT min(bucket_id) AS lo, max(bucket_id) AS hi FROM b),
      |days AS (SELECT unnest(range(lo, hi + 1)) AS bucket_id FROM st),
      |types AS (SELECT DISTINCT event_type FROM events),
      |dense AS (SELECT t.event_type, d.bucket_id,
      |    CAST(COALESCE(c.n, 0) AS BIGINT) AS v
      |  FROM types t CROSS JOIN days d
      |  LEFT JOIN c ON c.event_type = t.event_type
      |             AND c.bucket_id = d.bucket_id),
      |lg AS (SELECT event_type, bucket_id, v,
      |    lag(v, 7) OVER w AS ls, lag(v, 1) OVER w AS l1
      |  FROM dense WINDOW w AS (PARTITION BY event_type ORDER BY bucket_id)),
      |sc AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_eval,
      |    CAST(sum(abs(v - ls)) AS BIGINT) AS sae_seasonal_cents,
      |    CAST(sum(abs(v - l1)) AS BIGINT) AS sae_naive_cents
      |  FROM lg WHERE ls IS NOT NULL GROUP BY 1)
      |SELECT event_type, n_eval, sae_seasonal_cents, sae_naive_cents,
      |  CAST(sae_seasonal_cents // n_eval AS BIGINT) AS mae_seasonal_cents,
      |  CAST(sae_naive_cents // n_eval AS BIGINT) AS mae_naive_cents,
      |  CASE WHEN sae_seasonal_cents < sae_naive_cents THEN 'seasonal'
      |       WHEN sae_seasonal_cents > sae_naive_cents THEN 'naive'
      |       ELSE 'tie' END AS winner
      |FROM sc""".stripMargin

  // ---------------------------------------------------------------------
  // q228 — per-brand Pareto skyline (operators/Skyline.paretoFront):
  // parts no other same-brand part beats on both price (minimize,
  // integer cents) and size (maximize). Spark runs the sort-scan
  // frontier (one window over DISTINCT points — value-domain-sized,
  // never row-sized); the oracle enumerates dominance naively with
  // NOT EXISTS. The two derivations selecting the identical point set
  // is the certificate (the q191 two-orders convention).
  // ---------------------------------------------------------------------
  private[graft] def q228Skyline(spark: SparkSession, dir: String): DataFrame =
    Skyline.paretoFront(
      Tables.part(spark, dir).select(col("p_brand"),
        floor(col("p_retailprice") * lit(100.0)).cast("long")
          .as("price_cents"),
        col("p_size").cast("long").as("size")),
      "p_brand", "price_cents", "size")

  private[graft] val q228Sql =
    """WITH p AS (SELECT p_brand,
      |    CAST(floor(p_retailprice * 100) AS BIGINT) AS price_cents,
      |    CAST(p_size AS BIGINT) AS size FROM part),
      |pts AS (SELECT p_brand, price_cents, size,
      |    CAST(count(*) AS BIGINT) AS n_points FROM p GROUP BY 1, 2, 3)
      |SELECT a.p_brand, a.price_cents, a.size, a.n_points
      |FROM pts a WHERE NOT EXISTS (
      |  SELECT 1 FROM pts b WHERE b.p_brand = a.p_brand
      |    AND b.price_cents <= a.price_cents AND b.size >= a.size
      |    AND (b.price_cents < a.price_cents OR b.size > a.size))""".stripMargin

  // ---------------------------------------------------------------------
  // q229 — Benford first-digit audit (operators/Profile.benfordCard)
  // over order totals per priority class: observed digit shares vs the
  // HARDCODED ⌊10⁶·log₁₀(1+1/d)⌋ constants — no engine evaluates a
  // logarithm, so the forensic deviation column replays bit-for-bit.
  // Dense 9-digit axis per group, zero-filled (the gapFill law).
  // ---------------------------------------------------------------------
  private[graft] def q229Benford(spark: SparkSession, dir: String): DataFrame =
    Profile.benfordCard(Tables.orders(spark, dir),
      "o_orderpriority", col("o_totalprice"))

  private[graft] val q229Sql = {
    val expArr = Profile.BenfordMicro.mkString("[", ", ", "]")
    s"""WITH d AS (SELECT o_orderpriority,
       |    CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
       |      1, 1) AS BIGINT) AS digit
       |  FROM orders WHERE o_totalprice >= 1),
       |c AS (SELECT o_orderpriority, digit, CAST(count(*) AS BIGINT) AS n_obs
       |      FROM d GROUP BY 1, 2),
       |tot AS (SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_amounts
       |        FROM d GROUP BY 1),
       |axis AS (SELECT t.o_orderpriority, t.n_amounts,
       |    CAST(g.k AS BIGINT) AS digit
       |  FROM tot t, LATERAL UNNEST(generate_series(1, 9)) AS g(k)),
       |exp AS (SELECT CAST(t.k AS BIGINT) AS digit,
       |    (CAST($expArr AS BIGINT[]))[t.k] AS exp_micro
       |  FROM LATERAL UNNEST(generate_series(1, 9)) AS t(k))
       |SELECT a.o_orderpriority, a.digit, a.n_amounts,
       |  COALESCE(c.n_obs, CAST(0 AS BIGINT)) AS n_obs,
       |  CAST((1000000 * COALESCE(c.n_obs, 0)) // a.n_amounts AS BIGINT)
       |    AS obs_micro,
       |  e.exp_micro,
       |  abs(CAST((1000000 * COALESCE(c.n_obs, 0)) // a.n_amounts AS BIGINT)
       |      - e.exp_micro) AS dev_micro
       |FROM axis a
       |LEFT JOIN c ON c.o_orderpriority = a.o_orderpriority
       |           AND c.digit = a.digit
       |JOIN exp e ON e.digit = a.digit""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q230 — deterministic label-propagation communities (operators/
  // GraphStats.labelPropagation) over the shared q165/q191 link graph:
  // three SYNCHRONOUS plurality-with-self-vote rounds with the (count
  // desc, label asc) total tie order — async LPA's run-order
  // dependence and pure-synchronous LPA's bipartite oscillation are
  // both removed (the self-vote damps flips to neighbors-outvote-me
  // only). Spark's argmax is a window-free partial-aggregable
  // max(struct(count, −label)); the oracle replays the same three
  // rounds as unrolled CTEs with a row_number argmax. Identical final
  // labelling is the certificate.
  // ---------------------------------------------------------------------
  private[graft] def q230LabelProp(spark: SparkSession, dir: String): DataFrame =
    GraphStats.labelPropagation(q165Edges(spark, dir), rounds = 3)

  private[graft] val q230Sql = {
    val rounds = (1 to 3).map { i =>
      s"""v$i AS (SELECT u.b AS v, l.label FROM und u
         |  JOIN l${i - 1} l ON l.v = u.a
         |  UNION ALL
         |  SELECT u.a, l.label FROM und u JOIN l${i - 1} l ON l.v = u.b
         |  UNION ALL
         |  SELECT v, label FROM l${i - 1}),
         |c$i AS (SELECT v, label, count(*) AS c FROM v$i GROUP BY 1, 2),
         |l$i AS (SELECT v, label FROM (
         |  SELECT *, row_number() OVER (PARTITION BY v
         |    ORDER BY c DESC, label) AS rn FROM c$i) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
       |raw AS (SELECT doc_id AS src, (doc_id * 7 + 13 * t.k) % nn.n AS dst
       |        FROM documents, nn,
       |        LATERAL UNNEST(generate_series(1, 1 + doc_id % 3)) AS t(k)),
       |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       |        FROM raw WHERE src <> dst),
       |nodes AS (SELECT a AS v FROM und UNION SELECT b FROM und),
       |l0 AS (SELECT v, v AS label FROM nodes),
       |$rounds,
       |sz AS (SELECT label, CAST(count(*) AS BIGINT) AS n_members
       |       FROM l3 GROUP BY 1)
       |SELECT l.v AS doc_id, l.label AS community, sz.n_members
       |FROM l3 l JOIN sz USING (label)""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q231 — deadline-bounded funnel (operators/Funnel.windowedCard):
  // view → click → purchase where every later step lands within ONE
  // HOUR of the first view — the unbounded q172 form overstates
  // conversion by counting week-later purchases. Same chained
  // min-per-step aggregations on the user key; the deadline rides the
  // existing per-step join as one integer epoch-micros predicate.
  // ---------------------------------------------------------------------
  private[graft] def q231WindowedFunnel(spark: SparkSession, dir: String): DataFrame =
    Funnel.windowedCard(Tables.events(spark, dir),
      "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"), windowSec = 3600L)

  /** The deadline-funnel per-step CTE chain, shared by q231 (the card)
    * and q233 (conversion-latency percentiles over the same steps). */
  private[graft] val q231Cte =
    """t0 AS (SELECT user_id, min(ts) AS t FROM events
      |            WHERE event_type = 'view' GROUP BY 1),
      |t1 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
      |       JOIN t0 ON e.user_id = t0.user_id
      |       WHERE e.event_type = 'click' AND e.ts > t0.t
      |         AND epoch_us(e.ts) <= epoch_us(t0.t) + 3600000000 GROUP BY 1),
      |t2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
      |       JOIN t1 ON e.user_id = t1.user_id
      |       JOIN t0 ON e.user_id = t0.user_id
      |       WHERE e.event_type = 'purchase' AND e.ts > t1.t
      |         AND epoch_us(e.ts) <= epoch_us(t0.t) + 3600000000 GROUP BY 1)""".stripMargin

  private[graft] val q231Sql =
    s"""WITH $q231Cte,
      |n AS (SELECT (SELECT count(*) FROM t0) AS n0,
      |             (SELECT count(*) FROM t1) AS n1,
      |             (SELECT count(*) FROM t2) AS n2)
      |SELECT 0 AS step, 'view' AS step_name, n0 AS n_users,
      |  CAST(FLOOR(n0 * 10000.0 / n0) AS BIGINT) AS conv_bp FROM n
      |UNION ALL
      |SELECT 1, 'click', n1, CAST(FLOOR(n1 * 10000.0 / n0) AS BIGINT) FROM n
      |UNION ALL
      |SELECT 2, 'purchase', n2, CAST(FLOOR(n2 * 10000.0 / n0) AS BIGINT) FROM n""".stripMargin

  // ---------------------------------------------------------------------
  // q232 — discrete-time churn hazard curve (operators/Funnel
  // .hazardCard): for each week since signup, of the users still
  // observable then, the fraction whose LAST event fell in that week —
  // the conditional exit rate q173's unconditional retention counts
  // can't state. Right-censored at the corpus edge (documented in the
  // operator); the at-risk denominators come from exploding each
  // user's 0..last_week range — calendar-bounded, window-free.
  // ---------------------------------------------------------------------
  private[graft] def q232Hazard(spark: SparkSession, dir: String): DataFrame =
    Funnel.hazardCard(Tables.events(spark, dir),
      "user_id", "ts", "event_type", anchorType = "signup")

  // ---------------------------------------------------------------------
  // q233 — funnel conversion-latency percentiles: the "how fast do
  // converters convert" companion to q231's "how many", composing
  // Funnel.windowedUserSteps with the exact rank-selection percentile
  // engine (Percentiles.byRank) over integer seconds-to-step. Values
  // are deadline-bounded (≤ 3600 distinct), so the per-pair histogram
  // state is domain-bounded — the byRank scale contract holds by
  // construction.
  // ---------------------------------------------------------------------
  private[graft] def q233FunnelLatency(spark: SparkSession, dir: String): DataFrame = {
    val per = Funnel.windowedUserSteps(Tables.events(spark, dir),
      "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"), windowSec = 3600L)
    val click = per.filter(col("t1").isNotNull)
      .select(lit("view>click").as("step_pair"),
        expr("(unix_micros(t1) - unix_micros(t0)) DIV 1000000").as("secs"))
    val purchase = per.filter(col("t2").isNotNull)
      .select(lit("view>purchase").as("step_pair"),
        expr("(unix_micros(t2) - unix_micros(t0)) DIV 1000000").as("secs"))
    graft.operators.Percentiles.byRank(click.unionByName(purchase),
      "step_pair", "secs",
      Seq("p50_s" -> 0.5, "p90_s" -> 0.9, "p99_s" -> 0.99))
  }

  private[graft] val q233Sql =
    s"""WITH $q231Cte,
      |lat AS (SELECT 'view>click' AS step_pair,
      |          (epoch_us(t1.t) - epoch_us(t0.t)) // 1000000 AS secs
      |        FROM t1 JOIN t0 USING (user_id)
      |        UNION ALL
      |        SELECT 'view>purchase',
      |          (epoch_us(t2.t) - epoch_us(t0.t)) // 1000000
      |        FROM t2 JOIN t0 USING (user_id)),
      |r AS (SELECT step_pair, secs,
      |        row_number() OVER (PARTITION BY step_pair ORDER BY secs) AS rn,
      |        count(*) OVER (PARTITION BY step_pair) AS n FROM lat)
      |SELECT step_pair,
      |  MIN(CASE WHEN rn = CAST(floor((n-1) * 0.5) AS BIGINT) + 1
      |      THEN secs END) AS p50_s,
      |  MIN(CASE WHEN rn = CAST(floor((n-1) * 0.9) AS BIGINT) + 1
      |      THEN secs END) AS p90_s,
      |  MIN(CASE WHEN rn = CAST(floor((n-1) * 0.99) AS BIGINT) + 1
      |      THEN secs END) AS p99_s,
      |  CAST(MAX(n) AS BIGINT) AS n_rows
      |FROM r GROUP BY step_pair""".stripMargin

  // ---------------------------------------------------------------------
  // q234 — degree assortativity (operators/GraphStats
  // .degreeAssortativity) of the shared q165/q191 link graph: Pearson
  // r² (micro) + sign over endpoint-degree pairs, both orientations
  // per undirected edge, through the corrCard integer-sufficient-
  // statistics lane. One output row; the structural "hubs link to
  // hubs?" summary after triangles (q191) and cores (q202).
  // ---------------------------------------------------------------------
  private[graft] def q234Assortativity(spark: SparkSession, dir: String): DataFrame =
    GraphStats.degreeAssortativity(q165Edges(spark, dir))

  private[graft] val q234Sql =
    """WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
      |raw AS (SELECT doc_id AS src, (doc_id * 7 + 13 * t.k) % nn.n AS dst
      |        FROM documents, nn,
      |        LATERAL UNNEST(generate_series(1, 1 + doc_id % 3)) AS t(k)),
      |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      |        FROM raw WHERE src <> dst),
      |deg AS (SELECT v, CAST(count(*) AS BIGINT) AS deg FROM
      |        (SELECT a AS v FROM und UNION ALL SELECT b AS v FROM und)
      |        GROUP BY v),
      |wd AS (SELECT CAST(da.deg AS HUGEINT) AS dx, CAST(db.deg AS HUGEINT) AS dy
      |       FROM und u JOIN deg da ON da.v = u.a JOIN deg db ON db.v = u.b),
      |sym AS (SELECT dx AS x, dy AS y FROM wd
      |        UNION ALL SELECT dy, dx FROM wd),
      |a AS (SELECT CAST(count(*) AS HUGEINT) AS n, sum(x) AS sx, sum(y) AS sy,
      |        sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
      |      FROM sym)
      |SELECT 'link_graph' AS graph, CAST(n AS BIGINT) AS n,
      |  CAST(CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
      |    THEN (1000000 * (n * sxy - sx * sy) * (n * sxy - sx * sy))
      |         // ((n * sxx - sx * sx) * (n * syy - sy * sy))
      |    ELSE 0 END AS BIGINT) AS corr2_micro,
      |  CAST(CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
      |    THEN sign(n * sxy - sx * sy) ELSE 0 END AS BIGINT) AS corr_sign
      |FROM a""".stripMargin

  // ---------------------------------------------------------------------
  // q235 — vocabulary-growth / Heaps-law card (operators/CorpusStats
  // .heapsCard): per 50-document ingestion band, token occurrences,
  // NEW types (first-band via min over 60-bit token hashes; the oracle
  // mins raw strings — agreement certifies the hash lane), and the
  // cumulative type-token ratio in micro-units. Cumulatives are
  // generated by the axis²-bounded band explode, window-free.
  // ---------------------------------------------------------------------
  private[graft] def q235Heaps(spark: SparkSession, dir: String): DataFrame =
    graft.operators.CorpusStats.heapsCard(Tables.documents(spark, dir),
      "doc_id", "text", bandWidth = 50L)

  private[graft] val q235Sql =
    """WITH tk AS (SELECT doc_id // 50 AS band,
      |    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
      |  FROM documents),
      |occ AS (SELECT band, CAST(count(*) AS BIGINT) AS n_tokens
      |        FROM tk GROUP BY 1),
      |fb AS (SELECT w, min(band) AS band FROM tk GROUP BY 1),
      |nt AS (SELECT band, CAST(count(*) AS BIGINT) AS new_types
      |       FROM fb GROUP BY 1),
      |bands AS (SELECT o.band, o.n_tokens,
      |    CAST(COALESCE(nt.new_types, 0) AS BIGINT) AS new_types
      |  FROM occ o LEFT JOIN nt USING (band)),
      |cums AS (SELECT b2.band AS band,
      |    CAST(sum(b1.n_tokens) AS BIGINT) AS cum_tokens,
      |    CAST(sum(b1.new_types) AS BIGINT) AS cum_types
      |  FROM bands b1 JOIN bands b2 ON b1.band <= b2.band GROUP BY 1)
      |SELECT b.band, b.n_tokens, b.new_types, c.cum_tokens, c.cum_types,
      |  CAST((1000000 * c.cum_types) // c.cum_tokens AS BIGINT) AS ttr_micro
      |FROM bands b JOIN cums c USING (band)""".stripMargin

  // ---------------------------------------------------------------------
  // q236 — co-purchase basket lift (operators/NgramModel.basketLift):
  // customer-level baskets of distinct parts, pair support with a
  // support-5 floor, lift = c(ab)·N/(c(a)·c(b)) in micro-units — the
  // association-rules miner in its transactional form (the q218
  // document-token form's retail sibling). Pair cost is per-basket
  // C(size, 2), guarded by the maxBasket cap (one consistent excluded
  // universe).
  // ---------------------------------------------------------------------
  private[graft] def q236CopurchaseLift(spark: SparkSession, dir: String): DataFrame = {
    val facts = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), col("l_partkey"))
    graft.operators.NgramModel.basketLift(facts, "o_custkey", "l_partkey",
      minSupport = 5L, maxBasket = 256L)
  }

  private[graft] val q236Sql =
    """WITH items AS (SELECT DISTINCT o.o_custkey AS b, l.l_partkey AS i
      |    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
      |kept AS (SELECT * FROM items WHERE b IN (
      |    SELECT b FROM items GROUP BY b HAVING count(*) <= 256)),
      |nn AS (SELECT CAST(count(DISTINCT b) AS BIGINT) AS n FROM kept),
      |freq AS (SELECT i, CAST(count(*) AS BIGINT) AS d FROM kept GROUP BY 1),
      |pairs AS (SELECT a.i AS item_a, b.i AS item_b,
      |    CAST(count(*) AS BIGINT) AS n_both
      |  FROM kept a JOIN kept b ON a.b = b.b AND a.i < b.i
      |  GROUP BY 1, 2 HAVING count(*) >= 5)
      |SELECT p.item_a, p.item_b, p.n_both, fa.d AS n_a, fb.d AS n_b,
      |  CAST((1000000 * CAST(p.n_both AS HUGEINT) * nn.n)
      |    // (CAST(fa.d AS HUGEINT) * fb.d) AS BIGINT) AS lift_micro
      |FROM pairs p
      |JOIN freq fa ON fa.i = p.item_a
      |JOIN freq fb ON fb.i = p.item_b
      |CROSS JOIN nn""".stripMargin

  // ---------------------------------------------------------------------
  // q237 — k-anonymity audit (operators/Scrub.kAnonymityCard) over the
  // documents quasi-identifiers (lang, source, 200-char length band):
  // per threshold k ∈ {2, 5, 10}, groups below k and the exact share
  // of rows at re-identification risk in basis points — the governance
  // companion to PII redaction (q54/q98 remove direct identifiers;
  // this measures what the quasi columns still leak).
  // ---------------------------------------------------------------------
  private[graft] def q237KAnonymity(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Scrub.kAnonymityCard(
      Tables.documents(spark, dir)
        .select(col("lang"), col("source"),
          expr("n_chars DIV 200").as("len_band")),
      Seq("lang", "source", "len_band"), ks = Seq(2L, 5L, 10L))

  private[graft] val q237Sql =
    """WITH g AS (SELECT lang, source, n_chars // 200 AS len_band,
      |    CAST(count(*) AS BIGINT) AS c
      |  FROM documents GROUP BY 1, 2, 3),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_groups,
      |    CAST(sum(c) AS BIGINT) AS n_rows,
      |    CAST(min(c) AS BIGINT) AS min_group_size FROM g),
      |pk AS (SELECT CAST(t.k AS BIGINT) AS k,
      |    CAST(sum(CASE WHEN g.c < t.k THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_groups_below,
      |    CAST(sum(CASE WHEN g.c < t.k THEN g.c ELSE 0 END) AS BIGINT)
      |      AS n_rows_at_risk
      |  FROM g, LATERAL UNNEST([2, 5, 10]) AS t(k) GROUP BY 1)
      |SELECT pk.k, tot.n_groups, tot.n_rows, pk.n_groups_below,
      |  pk.n_rows_at_risk, tot.min_group_size,
      |  CAST((10000 * pk.n_rows_at_risk) // tot.n_rows AS BIGINT) AS risk_bp
      |FROM pk CROSS JOIN tot""".stripMargin

  // ---------------------------------------------------------------------
  // q238 — RFM customer segmentation: recency (last order day) /
  // frequency (order count) / monetary (exact cent total) each cut
  // into equal-frequency quartiles by the two-phase banded rank engine
  // (Sampling.equalFreqBins — the q211 engine applied three times on
  // one |customers|-sized frame), then the 4×4×4 segment census. The
  // oracle replays the same (value, custkey) global ranks.
  // ---------------------------------------------------------------------
  private[graft] def q238Rfm(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Sampling
    val per = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(expr(
        "max(unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 1000000 DIV 86400)")
        .as("r_day"),
        count(lit(1)).as("n_orders"),
        sum(floor(col("o_totalprice") * 100).cast("long"))
          .as("monetary_cents"))
      .withColumn("__all", lit("all")) // NOT "__g": equalFreqBins' internal name
      .localCheckpoint() // three bin passes + the census share one build
    // r19 restructure (guide §2.6 "overlap independent jobs", applied
    // inside one DAG): the three quartile passes each depend only on
    // `per` — chaining them (binned(binned(binned(per,..)..)..)) made
    // every pass's exchanges wait on the previous pass's output, while
    // three independent passes joined back on the customer key let the
    // scheduler run their stages concurrently. Each bin is the same
    // (value, custkey) rank over the same frame, so the result is
    // unchanged (oracle re-verified both SFs).
    def binOf(v: String, out: String, bw: Long) =
      Sampling.equalFreqBins(per, "__all", v, "o_custkey", nBins = 4,
        bandWidth = bw)
        .select(col("o_custkey"), col("bin").as(out))
    binOf("r_day", "r_bin", 30L)
      .join(binOf("n_orders", "f_bin", 1L), "o_custkey")
      .join(binOf("monetary_cents", "m_bin", 10000000L), "o_custkey")
      .join(per.select(col("o_custkey"), col("monetary_cents")), "o_custkey")
      .groupBy(col("r_bin"), col("f_bin"), col("m_bin"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("monetary_cents")).as("sum_monetary_cents"))
  }

  private[graft] val q238Sql =
    """WITH per AS (SELECT o_custkey,
      |    max(epoch_us(o_orderdate) // 1000000 // 86400) AS r_day,
      |    CAST(count(*) AS BIGINT) AS n_orders,
      |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS monetary_cents
      |  FROM orders GROUP BY 1),
      |r AS (SELECT *,
      |    CAST((4 * (row_number() OVER (ORDER BY r_day, o_custkey) - 1))
      |      // (count(*) OVER ()) AS BIGINT) AS r_bin,
      |    CAST((4 * (row_number() OVER (ORDER BY n_orders, o_custkey) - 1))
      |      // (count(*) OVER ()) AS BIGINT) AS f_bin,
      |    CAST((4 * (row_number() OVER (ORDER BY monetary_cents, o_custkey) - 1))
      |      // (count(*) OVER ()) AS BIGINT) AS m_bin
      |  FROM per)
      |SELECT r_bin, f_bin, m_bin, CAST(count(*) AS BIGINT) AS n_customers,
      |  CAST(sum(monetary_cents) AS BIGINT) AS sum_monetary_cents
      |FROM r GROUP BY 1, 2, 3""".stripMargin

  private[graft] val q232Sql =
    """WITH a AS (SELECT user_id, min(ts) AS anchor FROM events
      |           WHERE event_type = 'signup' GROUP BY 1),
      |lw AS (SELECT e.user_id,
      |        CAST((epoch_us(max(e.ts)) - epoch_us(a.anchor))
      |          // 604800000000 AS BIGINT) AS lwk
      |       FROM events e JOIN a ON e.user_id = a.user_id
      |       GROUP BY e.user_id, a.anchor),
      |ar AS (SELECT CAST(t.k AS BIGINT) AS week_offset,
      |         CAST(count(*) AS BIGINT) AS n_at_risk
      |       FROM lw, LATERAL UNNEST(generate_series(0, lwk)) AS t(k)
      |       GROUP BY 1),
      |ch AS (SELECT lwk AS week_offset, CAST(count(*) AS BIGINT) AS n_churned
      |       FROM lw GROUP BY 1)
      |SELECT ar.week_offset, ar.n_at_risk,
      |  COALESCE(ch.n_churned, CAST(0 AS BIGINT)) AS n_churned,
      |  CAST((1000000 * COALESCE(ch.n_churned, 0)) // ar.n_at_risk AS BIGINT)
      |    AS hazard_micro
      |FROM ar LEFT JOIN ch USING (week_offset)""".stripMargin
}
