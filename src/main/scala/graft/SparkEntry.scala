package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.codec.{DnsWire, DnstapCodec}
import graft.dns.{DnsAnalog, DnstapRows}
import graft.functions.{Anonymize, DnsNames, IpFunctions, VectorFunctions}
import graft.operators.{AsOfMatch, CorpusStats, Dedup, GroupingSetCounter, MediaCodec, Multimodal, NgramModel, Packing, Percentiles, Quantize, Sampling, Scrub, Similarity, SkewAgg, TextAnalysis}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator from SURVEY.md §2 (or a
  * post-parity extension operator), expressed Spark-first over the driver
  * testdata tables; [[oracleSql]] carries the DuckDB-equivalent SQL used by
  * the correctness gate. Column names are aliased identically on both sides
  * (the driver sorts columns by name before hashing).
  *
  * Numeric determinism policy (Spark vs DuckDB must hash-match):
  *   - money/quantity sums go through exact DECIMAL arithmetic, cast to
  *     DOUBLE only at the end (one deterministic rounding);
  *   - averages are a single double division of exact parts;
  *   - integer-division latency semantics of the reference
  *     (aggregator.go:496) use floor() in both dialects (DuckDB CAST
  *     rounds, Spark CAST truncates — floor sidesteps both).
  */
object SparkEntry {

  private case class Q(name: String,
                       fn: (SparkSession, String) => DataFrame,
                       sql: Option[String])

  /** Exact 2-dp decimal view of a double money/quantity column. */
  private def dec(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q2_query_groupingsets")(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------------
  // q1 — pricing-summary aggregation (TPC-H Q1 shape): the reference's
  // downstream-query surface is filter→groupBy→agg (SURVEY §2.9); this is
  // the canonical Spark form with pushed-down filter + partial aggregation.
  // ---------------------------------------------------------------------
  private def q1LineitemAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cutoff = java.sql.Timestamp.valueOf("1998-09-01 00:00:00")
    Tables.lineitem(spark, dir)
      .filter($"l_shipdate" <= lit(cutoff))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum(dec($"l_quantity")).cast("double").as("sum_qty"),
        sum(dec($"l_extendedprice")).cast("double").as("sum_base_price"),
        sum((dec($"l_extendedprice") * (lit(1) - dec($"l_discount")))
          .cast(DecimalType(18, 4))).cast("double").as("sum_disc_price"),
        sum((dec($"l_extendedprice") * (lit(1) - dec($"l_discount")) *
          (lit(1) + dec($"l_tax"))).cast(DecimalType(18, 6)))
          .cast("double").as("sum_charge"),
        (sum(dec($"l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
  }

  private val q1Sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) * (1 + CAST(l_tax AS DECIMAL(12,2))) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------------
  // q2/q3 — the reference's core operator: multi-grouping-set dedup count
  // with __ANY__ sentinel (A1/A2, aggregator.go:240-330), on the events→DNS
  // analog mapping. One Expand + one shuffle (see GroupingSetCounter).
  // ---------------------------------------------------------------------
  private def q2QueryGroupingSets(spark: SparkSession, dir: String): DataFrame =
    GroupingSetCounter(DnsAnalog.queries(Tables.events(spark, dir)),
      fixed = Seq("identity"), address = Seq("query_address"),
      question = Seq("question_name", "question_type"), tsCol = "ts")

  private val q2Sql =
    s"""${DnsAnalog.oracleCte}
      |SELECT identity,
      |  CASE WHEN GROUPING(query_address)=1 THEN '__ANY__' ELSE query_address END AS query_address,
      |  CASE WHEN GROUPING(question_name)=1 THEN '__ANY__' ELSE question_name END AS question_name,
      |  CASE WHEN GROUPING(question_type)=1 THEN '__ANY__' ELSE question_type END AS question_type,
      |  COUNT(*) AS counter, MIN(ts) AS first_seen
      |FROM dns
      |GROUP BY GROUPING SETS ((identity, query_address, question_name, question_type),
      |                        (identity, query_address),
      |                        (identity, question_name, question_type))""".stripMargin

  private def q3ResponseGroupingSets(spark: SparkSession, dir: String): DataFrame =
    GroupingSetCounter(
      DnsAnalog.responses(Tables.events(spark, dir)).filter(!col("is_success")),
      fixed = Seq("identity", "response_status"), address = Seq("query_address"),
      question = Seq("question_name", "question_type"), tsCol = "ts")

  private val q3Sql =
    s"""${DnsAnalog.oracleCte}
      |SELECT identity, response_status,
      |  CASE WHEN GROUPING(query_address)=1 THEN '__ANY__' ELSE query_address END AS query_address,
      |  CASE WHEN GROUPING(question_name)=1 THEN '__ANY__' ELSE question_name END AS question_name,
      |  CASE WHEN GROUPING(question_type)=1 THEN '__ANY__' ELSE question_type END AS question_type,
      |  COUNT(*) AS counter, MIN(ts) AS first_seen
      |FROM dns
      |WHERE response_status <> 'NOERROR'
      |GROUP BY GROUPING SETS ((identity, response_status, query_address, question_name, question_type),
      |                        (identity, response_status, query_address),
      |                        (identity, response_status, question_name, question_type))""".stripMargin

  // q4 — pass-through mode (A3, Aggregate=false, aggregator.go:556-586):
  // the identity plan, one output row per input with counter=1.
  private def q4Passthrough(spark: SparkSession, dir: String): DataFrame =
    DnsAnalog.responses(Tables.events(spark, dir)).select(
      col("ts").as("response_time"), col("identity"), col("response_status"),
      col("query_address"), col("question_name"), col("question_type"),
      col("counter"))

  private val q4Sql =
    s"""${DnsAnalog.oracleCte}
      |SELECT ts AS response_time, identity, response_status, query_address,
      |       question_name, question_type, CAST(1 AS BIGINT) AS counter
      |FROM dns""".stripMargin

  // ---------------------------------------------------------------------
  // q5/q6 — query↔response latency matching (SURVEY §2.6) + per-identity
  // average (A4), batch analog: as-of match via one window pass (AsOfMatch).
  // clicks play queries, purchases play responses, user_id is the match key.
  // ---------------------------------------------------------------------
  private def q5Deltas(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "purchase"))
    AsOfMatch.deltas(ev, keyCols = Seq("user_id"), tsCol = "ts",
        tieBreak = "event_id",
        isQuery = col("event_type") === "click",
        isResponse = col("event_type") === "purchase")
      .select(concat(lit("srv"), (col("user_id") % 4).cast("string")).as("identity"),
        col("ts").as("response_time"), col("delta_us"))
  }

  private val q5MatchCte =
    """WITH m AS (
      |  SELECT user_id, ts, event_type,
      |         last_value(CASE WHEN event_type='click' THEN ts END IGNORE NULLS)
      |           OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS qts
      |  FROM events WHERE event_type IN ('click','purchase')),
      |deltas AS (
      |  SELECT 'srv' || CAST(user_id % 4 AS VARCHAR) AS identity,
      |         ts AS response_time,
      |         epoch_us(ts) - epoch_us(qts) AS delta_us
      |  FROM m WHERE event_type='purchase' AND qts IS NOT NULL)""".stripMargin

  private val q5Sql = s"$q5MatchCte\nSELECT identity, response_time, delta_us FROM deltas"

  private def q6LatencyAvg(spark: SparkSession, dir: String): DataFrame =
    AsOfMatch.avgByIdentity(q5Deltas(spark, dir), "identity")

  private val q6Sql =
    s"""$q5MatchCte
      |SELECT identity,
      |       CAST(FLOOR(SUM(delta_us) * 1.0 / COUNT(*)) AS BIGINT) AS avg_delta_us,
      |       COUNT(*) AS n_samples
      |FROM deltas GROUP BY identity""".stripMargin

  // ---------------------------------------------------------------------
  // q7–q10 — the documented downstream query surface (SURVEY §2.9,
  // doc/quickstart.md:97-154): top-k, time-bucketed series, latency series.
  // ---------------------------------------------------------------------
  private def q7TopAddresses(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id").cast("string").as("query_address"))
      .agg(count(lit(1)).as("counter"))
      .orderBy(desc("counter"), asc("query_address"))
      .limit(10)

  private val q7Sql =
    """SELECT CAST(user_id AS VARCHAR) AS query_address, COUNT(*) AS counter
      |FROM events GROUP BY 1 ORDER BY counter DESC, query_address LIMIT 10""".stripMargin

  private def q8TopNxdomain(spark: SparkSession, dir: String): DataFrame =
    DnsAnalog.responses(Tables.events(spark, dir))
      .filter(col("response_status") === "NXDOMAIN")
      .groupBy(concat(col("question_name"), lit(" "), col("question_type")).as("name_type"))
      .agg(count(lit(1)).as("counter"))
      .orderBy(desc("counter"), asc("name_type"))
      .limit(10)

  private val q8Sql =
    s"""${DnsAnalog.oracleCte}
      |SELECT question_name || ' ' || question_type AS name_type, COUNT(*) AS counter
      |FROM dns WHERE response_status = 'NXDOMAIN'
      |GROUP BY 1 ORDER BY counter DESC, name_type LIMIT 10""".stripMargin

  private def q9NonOkTimeseries(spark: SparkSession, dir: String): DataFrame =
    DnsAnalog.responses(Tables.events(spark, dir))
      .filter(!col("is_success"))
      .groupBy(date_trunc("hour", col("ts")).as("bucket"), col("response_status"))
      .agg(count(lit(1)).as("counter"))

  private val q9Sql =
    s"""${DnsAnalog.oracleCte}
      |SELECT date_trunc('hour', ts) AS bucket, response_status, COUNT(*) AS counter
      |FROM dns WHERE response_status <> 'NOERROR' GROUP BY 1, 2""".stripMargin

  private def q10LatencyTimeseries(spark: SparkSession, dir: String): DataFrame =
    q5Deltas(spark, dir)
      .groupBy(date_trunc("hour", col("response_time")).as("bucket"), col("identity"))
      .agg(floor(sum(col("delta_us")) / count(lit(1))).as("avg_delta_us"))

  private val q10Sql =
    s"""$q5MatchCte
      |SELECT date_trunc('hour', response_time) AS bucket, identity,
      |       CAST(FLOOR(SUM(delta_us) * 1.0 / COUNT(*)) AS BIGINT) AS avg_delta_us
      |FROM deltas GROUP BY 1, 2""".stripMargin

  // ---------------------------------------------------------------------
  // q11–q13 — the source-path scalar/generator operators (SURVEY §2.2/2.3):
  // P2 IP rendering as a codegen'd Catalyst expression, P3/P4 code→name
  // tables, F1 questions-explode. Exercised on synthetic inputs derived from
  // events/documents; the oracle recomputes the same values independently.
  // ---------------------------------------------------------------------
  private def q11IpRender(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(col("event_id"),
      IpFunctions.ipv4_string((col("event_id") * lit(2654435761L)) % lit(4294967296L))
        .as("ip"))

  private val q11Sql =
    """SELECT event_id,
      |  CAST((x // 16777216) % 256 AS VARCHAR) || '.' || CAST((x // 65536) % 256 AS VARCHAR)
      |    || '.' || CAST((x // 256) % 256 AS VARCHAR) || '.' || CAST(x % 256 AS VARCHAR) AS ip
      |FROM (SELECT event_id, (event_id * 2654435761) % 4294967296 AS x FROM events)""".stripMargin

  private def q12DnsNames(spark: SparkSession, dir: String): DataFrame = {
    val m = col("user_id") % 7
    val qcode = when(m === 0, 1).when(m === 1, 5).when(m === 2, 15)
      .when(m === 3, 16).when(m === 4, 28).when(m === 5, 65).otherwise(9999)
    val rcode = when(col("value") < 2, 0).when(col("value") < 10, 3).otherwise(2)
    Tables.events(spark, dir).select(col("event_id"),
      DnsNames.qtype_name(qcode).as("qtype_name"),
      DnsNames.rcode_name(rcode).as("rcode_name"))
  }

  private val q12Sql =
    """SELECT event_id,
      |  CASE user_id % 7 WHEN 0 THEN 'A' WHEN 1 THEN 'CNAME' WHEN 2 THEN 'MX'
      |       WHEN 3 THEN 'TXT' WHEN 4 THEN 'AAAA' WHEN 5 THEN 'HTTPS'
      |       ELSE 'TYPE9999' END AS qtype_name,
      |  CASE WHEN value < 2 THEN 'NOERROR' WHEN value < 10 THEN 'NXDOMAIN'
      |       ELSE 'SERVFAIL' END AS rcode_name
      |FROM events""".stripMargin

  private def q13ExplodeTokens(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("token")).limit(20)

  private val q13Sql =
    """SELECT token, COUNT(*) AS n FROM (
      |  SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
      |WHERE token <> '' GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin

  // ---------------------------------------------------------------------
  // q14–q16 — the relational surface Spark gives for free over the output
  // tables (SURVEY §2.10: the reference answers these downstream; our engine
  // exposes them as first-class operators): star-schema join with broadcast
  // dims, window-function top-n per group, gap-based sessionization (the
  // batch form of a session window).
  // ---------------------------------------------------------------------
  private def q14JoinEnrich(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    // nation/region are tiny at any SF (25/5 rows) -> broadcast; customer
    // scales with SF -> shuffle hash/sort-merge picked by Catalyst+AQE.
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(dec(col("o_totalprice"))).cast("double").as("revenue"),
           count(lit(1)).as("n_orders"))
  }

  private val q14Sql =
    """SELECT r_name, n_name,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_orders
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name""".stripMargin

  private def q15WindowTopn(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
  }

  private val q15Sql =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |         ROW_NUMBER() OVER (PARTITION BY o_custkey
      |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) t WHERE rn <= 3""".stripMargin

  private def q16Sessionize(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapUs = 48L * 3600 * 1000000 // 48h inactivity closes a session
    Tables.events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
             unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_no", sum(col("new_sess"))
        .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_no"))
      .agg(count(lit(1)).as("n_events"),
           min(col("ts")).as("session_start"), max(col("ts")).as("session_end"))
  }

  private val q16Sql =
    """WITH g AS (
      |  SELECT user_id, event_id, ts,
      |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |  FROM events),
      |s AS (
      |  SELECT user_id, ts,
      |         CAST(SUM(CASE WHEN prev_ts IS NULL
      |                    OR epoch_us(ts) - epoch_us(prev_ts) > 172800000000
      |                  THEN 1 ELSE 0 END)
      |           OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
      |  FROM g)
      |SELECT user_id, session_no, COUNT(*) AS n_events,
      |       MIN(ts) AS session_start, MAX(ts) AS session_end
      |FROM s GROUP BY user_id, session_no""".stripMargin

  // ---------------------------------------------------------------------
  // q17–q21 — training-data pipeline text operators over `documents`:
  // token/quality stats, language ID, canonical fingerprint, exact dedup,
  // n-gram-Jaccard near-dup via inverted-index join (operators/TextAnalysis,
  // operators/Dedup). All pure codegen'd column expressions, no UDFs.
  // ---------------------------------------------------------------------
  private def q17TextStats(spark: SparkSession, dir: String): DataFrame = {
    val t = col("text")
    Tables.documents(spark, dir).select(col("doc_id"),
      TextAnalysis.tokenCount(t).as("n_tokens"),
      TextAnalysis.bpeTokenCount(t).as("n_bpe_tokens"),
      TextAnalysis.punctRatio(t).as("punct_ratio"),
      TextAnalysis.avgTokenLen(t).as("avg_token_len"),
      TextAnalysis.stopwordRatio(t).as("stopword_ratio"),
      TextAnalysis.qualityScore(t).as("quality"))
  }

  private val q17Sql =
    """WITH t AS (SELECT doc_id, text,
      |             list_filter(string_split(text,' '), x -> x <> '') AS toks,
      |             CASE WHEN length(text)=0 THEN 0.0
      |                  ELSE length(regexp_replace(text,'[^.,!?;:]','','g'))*1.0/length(text)
      |             END AS pr
      |           FROM documents)
      |SELECT doc_id,
      |  CAST(len(toks) AS BIGINT) AS n_tokens,
      |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe_tokens,
      |  pr AS punct_ratio,
      |  CASE WHEN len(toks)=0 THEN 0.0
      |       ELSE list_sum(list_transform(toks, x -> length(x)))*1.0/len(toks) END AS avg_token_len,
      |  CASE WHEN len(toks)=0 THEN 0.0
      |       ELSE len(list_filter(toks, x -> list_contains(['the','and','of','to','in','a','is'], x)))*1.0/len(toks) END AS stopword_ratio,
      |  LEAST(1.0, len(toks)/100.0) * (1.0 - pr) AS quality
      |FROM t""".stripMargin

  private def q18LangId(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_pred"))

  // Generated from the same marker table as TextAnalysis.langId — no drift.
  private val q18Sql = {
    val scores = TextAnalysis.LangMarkers.map { case (lang, words) =>
      val s = words.map(w => s"(CASE WHEN contains(p, ' $w ') THEN 1 ELSE 0 END)")
        .mkString(" + ")
      (lang, s"s_$lang", s"$s AS s_$lang")
    }
    val langs = scores.map(_._1)
    val chain = langs.init.zipWithIndex.map { case (lang, i) =>
      val rest = langs.drop(i + 1).map(l => s"s_$lang >= s_$l").mkString(" AND ")
      s"WHEN $rest THEN '$lang'"
    }.mkString(" ")
    s"""WITH s AS (SELECT doc_id, ${scores.map(_._3).mkString(", ")}
       |           FROM (SELECT doc_id, ' ' || text || ' ' AS p FROM documents))
       |SELECT doc_id, CASE $chain ELSE '${langs.last}' END AS lang_pred FROM s""".stripMargin
  }

  private def q19Fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))

  private val q19Sql =
    """SELECT doc_id,
      |  md5(trim(regexp_replace(regexp_replace(lower(text), '[.,!?;:]', '', 'g'),
      |                          '\s+', ' ', 'g'))) AS fp
      |FROM documents""".stripMargin

  private def q20DedupExact(spark: SparkSession, dir: String): DataFrame =
    Dedup.exact(Tables.documents(spark, dir), "doc_id", "text")

  private val q20Sql =
    """SELECT md5(text) AS content_hash, MIN(doc_id) AS keeper, COUNT(*) AS n_docs
      |FROM documents GROUP BY 1""".stripMargin

  // skew guard ON at the registration: shingles in >10% of the corpus are
  // boilerplate that would fan out quadratically in the inverted-index
  // join; at the driver SFs the cap drops nothing (max df is 25 of 5000
  // docs at sf0.1), so the oracle — which applies the identical cap —
  // certifies the guard really is a no-op on clean data
  private def q21NgramJaccard(spark: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(Tables.documents(spark, dir), "doc_id", "text",
      n = 3, threshold = 0.5, maxShingleDfFrac = 0.1)

  /** q21's pair-pipeline CTE block, shared verbatim by the q48/q52
    * clustering oracles (appended after WITH / WITH RECURSIVE). */
  private val q21PairCtes =
    """t AS (SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS tk FROM documents),
      |sh0 AS (SELECT DISTINCT doc_id AS doc, sg FROM (
      |  SELECT doc_id, unnest(CASE WHEN len(tk) >= 3
      |    THEN list_transform(generate_series(1, len(tk)-2), i -> tk[i]||' '||tk[i+1]||' '||tk[i+2])
      |    ELSE [] END) AS sg FROM t)),
      |nd AS (SELECT COUNT(DISTINCT doc_id) AS n FROM documents),
      |dfq AS (SELECT sg, count(*) AS df FROM sh0 GROUP BY 1),
      |sh AS (SELECT sh0.doc, sh0.sg FROM sh0 JOIN dfq USING (sg)
      |       CROSS JOIN nd WHERE df <= CEIL(n * 0.1)),
      |sz AS (SELECT doc, count(*) AS s FROM sh GROUP BY 1),
      |i AS (SELECT a.doc AS x, b.doc AS y, count(*) AS c
      |      FROM sh a JOIN sh b ON a.sg = b.sg AND a.doc < b.doc GROUP BY 1, 2)""".stripMargin

  private val q21Sql =
    s"""WITH $q21PairCtes
      |SELECT x AS doc_a, y AS doc_b, c*1.0/(sa.s + sb.s - c) AS jaccard
      |FROM i JOIN sz sa ON i.x = sa.doc JOIN sz sb ON i.y = sb.doc
      |WHERE c*1.0/(sa.s + sb.s - c) >= 0.5""".stripMargin

  // ---------------------------------------------------------------------
  // q22–q24 — similarity search over embeddings (operators/Similarity):
  // exact brute-force top-k, LSH-bucketed ANN (the scale path), and
  // embedding-cosine near-dup pairs. Cosine is a codegen'd native
  // expression; the DuckDB oracle reproduces the identical left-to-right
  // double accumulation via list_reduce (verified bit-exact).
  // ---------------------------------------------------------------------
  /** DuckDB cosine with the same op order as functions.VectorOps.cosine. */
  private def duckCosine(a: String, b: String): String =
    s"list_reduce(list_transform(generate_series(1, len($a)), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x,y) -> x+y)" +
      s" / (sqrt(list_reduce(list_transform(generate_series(1, len($a)), i -> CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE)), (x,y) -> x+y))" +
      s" * sqrt(list_reduce(list_transform(generate_series(1, len($b)), i -> CAST($b[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x,y) -> x+y)))"

  private def corpus(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))

  private def probes(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir).filter(col("vec_id") < 3)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))

  private def q22KnnBruteforce(spark: SparkSession, dir: String): DataFrame =
    Similarity.knnBruteForce(corpus(spark, dir), probes(spark, dir), k = 5)

  private val q22Sql =
    s"""WITH p AS (SELECT vec_id AS probe_id, embedding AS pe FROM embeddings WHERE vec_id < 3),
      |s AS (SELECT probe_id, e.vec_id, ${duckCosine("pe", "e.embedding")} AS cosine
      |      FROM p, embeddings e WHERE e.vec_id <> p.probe_id),
      |r AS (SELECT probe_id, vec_id, cosine,
      |        CAST(ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id) AS BIGINT) AS rn
      |      FROM s)
      |SELECT probe_id, vec_id, cosine, rn FROM r WHERE rn <= 5""".stripMargin

  private def q23AnnLsh(spark: SparkSession, dir: String): DataFrame =
    Similarity.annLshBucketed(corpus(spark, dir), probes(spark, dir), k = 3)

  private val q23Sql =
    s"""WITH eb AS (SELECT vec_id, embedding, ${duckHyperplaneBucket("embedding", 0, 6)} AS bucket FROM embeddings),
      |p AS (SELECT vec_id AS probe_id, embedding AS pe, bucket AS pbucket FROM eb WHERE vec_id < 3),
      |s AS (SELECT probe_id, e.vec_id, ${duckCosine("pe", "e.embedding")} AS cosine
      |      FROM p JOIN eb e ON e.bucket = p.pbucket AND e.vec_id <> p.probe_id),
      |r AS (SELECT probe_id, vec_id, cosine,
      |        CAST(ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id) AS BIGINT) AS rn
      |      FROM s)
      |SELECT probe_id, vec_id, cosine, rn FROM r WHERE rn <= 3""".stripMargin

  private def q24EmbeddingDedup(spark: SparkSession, dir: String): DataFrame =
    Similarity.embeddingCosinePairs(corpus(spark, dir), threshold = 0.4)

  private val q24Sql =
    s"""SELECT vec_a, vec_b, cosine FROM (
      |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |         ${duckCosine("a.embedding", "b.embedding")} AS cosine
      |  FROM embeddings a, embeddings b WHERE a.vec_id < b.vec_id) t
      |WHERE cosine >= 0.4""".stripMargin

  // ---------------------------------------------------------------------
  // q25 — end-to-end dnstap codec drive (S3/S4 + P1–P8 + F1): events rows
  // are rendered into real dnstap protobuf frames (ProtoWriter + DNS wire
  // encoder), then decoded back through the full source path
  // (DnstapCodec.decode → DnsWire.parse → DnstapRows.toQueryRows). The
  // oracle recomputes the expected rows directly from events — any codec
  // bug breaks the hash match. Deserialization is inherently row-wise, so
  // this is a typed Dataset map (the one sanctioned non-columnar stage,
  // SURVEY §4 "custom work").
  // ---------------------------------------------------------------------
  private def q25DnstapPipeline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val qtypeCodes = Array(1, 5, 15, 16, 28, 65, 9999)
    val frames = Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        get_json_object(col("props"), "$.k").as("k"))
      .as[(Long, java.sql.Timestamp, Long, String, String)]
      .map { case (eventId, ts, userId, eventType, k) =>
        val addr = Array(
          ((userId >> 24) & 0xff).toByte, ((userId >> 16) & 0xff).toByte,
          ((userId >> 8) & 0xff).toByte, (userId & 0xff).toByte)
        val wire = DnsWire.encode((eventId % 65536).toInt, 0, isResponse = false,
          Seq(DnsWire.Question(s"q$k.example.com.", qtypeCodes((userId % 7).toInt))))
        val inst = ts.toInstant
        DnstapCodec.encode(DnstapCodec.Frame(DnstapCodec.TypeMessage, Some(eventType),
          Some(DnstapCodec.Message(DnstapCodec.ClientQuery,
            queryAddress = Some(addr),
            queryPort = Some((1024 + userId % 60000).toInt),
            queryTimeSec = Some(inst.getEpochSecond),
            queryTimeNsec = Some(inst.getNano),
            queryMessage = Some(wire)))))
      }
    frames
      .flatMap(b => DnstapCodec.decode(b).toSeq.flatMap(f => DnstapRows.toQueryRows(f)))
      .select(col("queryTime").as("query_time"), col("identity"),
        col("queryAddress").as("query_address"), col("queryPort").as("query_port"),
        col("questionName").as("question_name"), col("questionType").as("question_type"),
        col("id").cast("long").as("id"), col("counter"))
  }

  private val q25Sql =
    """SELECT ts AS query_time, event_type AS identity,
      |  CAST((user_id // 16777216) % 256 AS VARCHAR) || '.' ||
      |    CAST((user_id // 65536) % 256 AS VARCHAR) || '.' ||
      |    CAST((user_id // 256) % 256 AS VARCHAR) || '.' ||
      |    CAST(user_id % 256 AS VARCHAR) AS query_address,
      |  CAST(1024 + user_id % 60000 AS INTEGER) AS query_port,
      |  'q' || json_extract_string(props, '$.k') || '.example.com.' AS question_name,
      |  CASE user_id % 7 WHEN 0 THEN 'A' WHEN 1 THEN 'CNAME' WHEN 2 THEN 'MX'
      |       WHEN 3 THEN 'TXT' WHEN 4 THEN 'AAAA' WHEN 5 THEN 'HTTPS'
      |       ELSE 'TYPE9999' END AS question_type,
      |  event_id % 65536 AS id,
      |  CAST(1 AS BIGINT) AS counter
      |FROM events""".stripMargin

  // ---------------------------------------------------------------------
  // q26–q28 — sketch-based dedup (operators/Dedup): MinHash signatures +
  // banded LSH candidates with exact-Jaccard verify, and 64-bit SimHash
  // fingerprints + hamming-distance pairs via 16-bit-band blocking. Oracle
  // SQL is generated from the same coefficient tables as the Scala
  // operators, over the shared dialect-portable base hash
  // (first 8 hex chars of md5 as an integer).
  // ---------------------------------------------------------------------
  private val shingleCte =
    """WITH t AS (SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS tk FROM documents),
      |sh AS (SELECT DISTINCT doc_id AS doc, sg FROM (
      |  SELECT doc_id, unnest(CASE WHEN len(tk) >= 3
      |    THEN list_transform(generate_series(1, len(tk)-2), i -> tk[i]||' '||tk[i+1]||' '||tk[i+2])
      |    ELSE [] END) AS sg FROM t))""".stripMargin

  private def q26MinhashLsh(spark: SparkSession, dir: String): DataFrame =
    Dedup.minHashLshPairs(Tables.documents(spark, dir), "doc_id", "text",
      n = 3, rowsPerBand = 3, threshold = 0.3)

  private val q26Sql = {
    val p = Dedup.MinHashP
    val minExprs = Dedup.MinHashCoeffs.zipWithIndex
      .map { case ((a, b), i) => s"MIN((h*$a+$b)%$p) AS m$i" }.mkString(", ")
    val bandSelects = (0 until Dedup.MinHashCoeffs.length / 3).map { bi =>
      val cat = (0 until 3).map(j => s"CAST(m${bi * 3 + j} AS VARCHAR)")
        .mkString(" || ',' || ")
      s"SELECT doc, $bi AS band, $cat AS bv FROM sig"
    }.mkString(" UNION ALL ")
    s"""$shingleCte,
      |hh AS (SELECT DISTINCT doc, CAST(('0x' || substr(md5(sg),1,15)) AS BIGINT) AS h FROM sh),
      |sig AS (SELECT doc, $minExprs FROM (SELECT doc, h % $p AS h FROM hh) GROUP BY doc),
      |bands AS ($bandSelects),
      |cand AS (SELECT DISTINCT a.doc AS x, b.doc AS y FROM bands a
      |         JOIN bands b ON a.band = b.band AND a.bv = b.bv AND a.doc < b.doc),
      |sz AS (SELECT doc, count(*) AS s FROM hh GROUP BY doc),
      |i AS (SELECT x, y, count(*) AS c FROM cand
      |      JOIN hh sa ON sa.doc = x JOIN hh sb ON sb.doc = y AND sa.h = sb.h
      |      GROUP BY x, y)
      |SELECT x AS doc_a, y AS doc_b, c*1.0/(za.s + zb.s - c) AS jaccard
      |FROM i JOIN sz za ON x = za.doc JOIN sz zb ON y = zb.doc
      |WHERE c*1.0/(za.s + zb.s - c) >= 0.3""".stripMargin
  }

  private val simhashCte = {
    // 64 bits from two 32-bit halves of one md5 (mirrors Dedup.simHash);
    // bit 63 adds Long.MinValue — two's complement, no BIGINT overflow
    // because bits 0–62 sum to at most 2^63−1.
    val sums = (0 until 64).map { j =>
      val src = if (j < 32) s"(hlo >> $j)" else s"(hhi >> ${j - 32})"
      s"SUM(CASE WHEN $src & 1 = 1 THEN 1 ELSE -1 END) AS s$j"
    }.mkString(", ")
    val bits = (0 until 64).map { j =>
      val w = if (j == 63) "(-9223372036854775807 - 1)" else s"${1L << j}"
      s"(CASE WHEN s$j > 0 THEN $w ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH tk AS (SELECT DISTINCT doc_id,
      |              unnest(list_filter(string_split(text,' '), x -> x <> '')) AS tok
      |            FROM documents),
      |h AS (SELECT doc_id, CAST(('0x' || substr(md5(tok),1,8)) AS BIGINT) AS hlo,
      |             CAST(('0x' || substr(md5(tok),9,8)) AS BIGINT) AS hhi FROM tk),
      |s AS (SELECT doc_id, $sums FROM h GROUP BY doc_id),
      |sim AS (SELECT doc_id, CAST($bits AS BIGINT) AS simhash FROM s)""".stripMargin
  }

  private def q27Simhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.simHash(Tables.documents(spark, dir), "doc_id", "text")

  private val q27Sql = s"$simhashCte\nSELECT doc_id, simhash FROM sim"

  private def q28SimhashPairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.simHashPairs(Tables.documents(spark, dir), "doc_id", "text",
      maxHamming = 3)

  private val q28Sql =
    s"""$simhashCte,
      |bands AS (SELECT doc_id, simhash, band, (simhash >> (band*16)) & 65535 AS bv
      |          FROM sim CROSS JOIN (SELECT unnest([0,1,2,3]) AS band)),
      |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |                a.simhash AS sa, b.simhash AS sb
      |         FROM bands a JOIN bands b
      |           ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id)
      |SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
      |FROM cand WHERE bit_count(xor(sa, sb)) <= 3""".stripMargin

  // ---------------------------------------------------------------------
  // q29–q31 — multimodal binary-column plumbing (operators/Multimodal):
  // documents are packed into a deterministic fake media container
  // (binary column), then decoded back through batch-wise partition maps
  // (metadata extract, feature extract, frame sampling). The oracle
  // recomputes every output directly from the source text, so any bug in
  // the binary round-trip breaks the hash match.
  // ---------------------------------------------------------------------
  private def mediaOf(spark: SparkSession, dir: String) =
    Multimodal.attachMedia(Tables.documents(spark, dir))

  private def q29MediaMetadata(spark: SparkSession, dir: String): DataFrame =
    Multimodal.extractMetadata(mediaOf(spark, dir)).toDF()

  private val q29Sql =
    """SELECT doc_id, 'grft' AS format,
      |  CAST(64 + doc_id % 1024 AS INTEGER) AS width,
      |  CAST(64 + (doc_id * 7) % 768 AS INTEGER) AS height,
      |  CAST(16 + strlen(text) AS BIGINT) AS n_bytes
      |FROM documents""".stripMargin

  private def q30MediaFeatures(spark: SparkSession, dir: String): DataFrame =
    Multimodal.extractFeatures(mediaOf(spark, dir)).toDF()

  private val q30Sql =
    """WITH f AS (SELECT doc_id, strlen(text) AS pl,
      |             COALESCE(list_sum(list_transform(string_split(text,''), c -> ord(c))), 0) AS cps,
      |             length(text) AS n_cp
      |           FROM documents)
      |SELECT doc_id, CAST(16 + pl AS BIGINT) AS n_bytes,
      |  CAST((pl + 255) // 256 AS BIGINT) AS n_frames,
      |  CAST(cps % 1000000007 AS BIGINT) AS checksum,
      |  CAST(CASE WHEN n_cp = 0 THEN 0 ELSE cps // n_cp END AS BIGINT) AS avg_codepoint
      |FROM f""".stripMargin

  private def q31FrameSample(spark: SparkSession, dir: String): DataFrame =
    Multimodal.frameSample(mediaOf(spark, dir), every = 2).toDF()

  private val q31Sql =
    """WITH f AS (SELECT doc_id, strlen(text) AS pl,
      |             (strlen(text) + 255) // 256 AS nf
      |           FROM documents),
      |x AS (SELECT doc_id, pl, unnest(generate_series(0, nf - 1, 2)) AS i FROM f)
      |SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
      |  CAST(16 + i * 256 AS BIGINT) AS frame_off,
      |  CAST(LEAST(256, pl - i * 256) AS BIGINT) AS frame_len
      |FROM x""".stripMargin

  // ---------------------------------------------------------------------
  // q32–q34 — analytics depth: exact per-group percentiles by rank
  // selection (integer-deterministic, no interpolation-formula drift
  // between engines), df-normalized term relevance ranking (TF-IDF shape
  // without log(), which is not bit-portable), and dedup as row selection
  // (the surviving corpus, not just the duplicate report).
  // ---------------------------------------------------------------------
  // Exact percentiles WITHOUT a per-identity window: a window partitioned
  // by a 4-value key puts every identity's full delta set in one task's
  // sort — a single-reducer bottleneck at scale. Instead: two-phase rank
  // selection. Phase 1 histograms (identity, delta_us) — a hash aggregate
  // with map-side combine, parallel across all 32+ partitions. Phase 2
  // folds each identity's SORTED histogram once (single aggregate() pass)
  // to pick the values at the p50/p95 ranks. State per identity is
  // #distinct-values, not #rows; at 100 TB you'd bucket delta_us first
  // (e.g. floor to ms) to bound it — the selection fold is unchanged.
  private def q32LatencyPercentiles(spark: SparkSession, dir: String): DataFrame =
    latencyPercentilesByRank(spark, dir, bucketUs = 1L)

  /** Shared percentile engine; `bucketUs` > 1 floors deltas to the bucket
    * (e.g. 1000 = millisecond resolution) BEFORE the histogram, bounding
    * per-identity aggregation state to range/bucketUs distinct values no
    * matter how many rows flow in — the realizable 100 TB path (q47).
    * bucketUs = 1 keeps microsecond-exact semantics (q32). */
  private def latencyPercentilesByRank(spark: SparkSession, dir: String,
                                       bucketUs: Long): DataFrame =
    Percentiles.byRank(q5Deltas(spark, dir), "identity", "delta_us",
      Seq("p50_us" -> 0.5, "p95_us" -> 0.95), bucket = bucketUs)
      .withColumnRenamed("n_rows", "n_samples")

  /** Rank-selection percentile oracle over `deltas`, with optional
    * bucketing mirrored from latencyPercentilesByRank. */
  private def percentileSql(bucketUs: Long): String = {
    val d =
      if (bucketUs <= 1L) "deltas"
      else s"(SELECT identity, CAST(FLOOR(delta_us / $bucketUs) * $bucketUs AS BIGINT) AS delta_us FROM deltas)"
    s"""$q5MatchCte,
      |r AS (SELECT identity, delta_us,
      |        ROW_NUMBER() OVER (PARTITION BY identity ORDER BY delta_us) AS rn,
      |        COUNT(*) OVER (PARTITION BY identity) AS n
      |      FROM $d AS db)
      |SELECT identity,
      |  MAX(CASE WHEN rn = FLOOR((n-1) * 0.5) + 1 THEN delta_us END) AS p50_us,
      |  MAX(CASE WHEN rn = FLOOR((n-1) * 0.95) + 1 THEN delta_us END) AS p95_us,
      |  COUNT(*) AS n_samples
      |FROM r GROUP BY identity""".stripMargin
  }

  private val q32Sql = percentileSql(1L)

  private def q33Tfidf(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
    val tf = toks.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    // corpus size rides the plan as a broadcast 1-row aggregate — building
    // this query runs NO job (an eager count() here would execute one every
    // time the plan is constructed)
    val nDocs = Tables.documents(spark, dir)
      .agg(countDistinct(col("doc_id")).cast("double").as("n_docs"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(desc("score"), asc("tok"))
    // No broadcast hint on dfreq: a web-scale vocabulary (hundreds of
    // millions of terms) blows past any broadcast cap, and tf/dfreq share
    // the `tok` shuffle key anyway — AQE still picks broadcast at small
    // SF on its own. The 1-row nDocs aggregate stays hinted: it is
    // constant-sized at any scale.
    tf.join(dfreq, "tok")
      .crossJoin(broadcast(nDocs))
      .withColumn("score", col("tf") * col("n_docs") / col("df"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("tok"), col("score"), col("rank"))
  }

  private val q33Sql =
    """WITH toks AS (SELECT doc_id, unnest(list_filter(string_split(text,' '), x -> x <> '')) AS tok
      |              FROM documents),
      |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
      |dfreq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
      |n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
      |s AS (SELECT doc_id, tf.tok, tf * 1.0 * n_docs / df AS score
      |      FROM tf JOIN dfreq ON tf.tok = dfreq.tok CROSS JOIN n),
      |r AS (SELECT doc_id, tok, score,
      |        CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, tok) AS BIGINT) AS rank
      |      FROM s)
      |SELECT doc_id, tok, score, rank FROM r WHERE rank <= 3""".stripMargin

  private def q34DedupKeep(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("content_hash"))
    Tables.documents(spark, dir)
      .withColumn("content_hash", md5(col("text").cast("binary")))
      .withColumn("keeper", min(col("doc_id")).over(w))
      .filter(col("doc_id") === col("keeper"))
      .select(col("doc_id"), col("content_hash"))
  }

  private val q34Sql =
    """SELECT doc_id, content_hash FROM (
      |  SELECT doc_id, md5(text) AS content_hash,
      |         MIN(doc_id) OVER (PARTITION BY md5(text)) AS keeper
      |  FROM documents) t
      |WHERE doc_id = keeper""".stripMargin

  // ---------------------------------------------------------------------
  // q35/q36 — native event-time windowing (the streaming pipeline uses
  // processing-time triggers per the reference's W1/W2; these exercise the
  // event-time operators Spark adds on top): tumbling window() and
  // gap-based session_window(), both batch-checkable against the oracle
  // (session semantics mirror q16's manual window-function form).
  // ---------------------------------------------------------------------
  private def q35TumblingWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).cast("double").as("sum_value"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
        col("event_type"), col("n"), col("sum_value"))

  private val q35Sql =
    """SELECT time_bucket(INTERVAL 6 HOUR, ts) AS w_start,
      |       time_bucket(INTERVAL 6 HOUR, ts) + INTERVAL 6 HOUR AS w_end,
      |       event_type, COUNT(*) AS n,
      |       CAST(SUM(value) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2, 3""".stripMargin

  private def q36SessionWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(session_window(col("ts"), "48 hours"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"))

  // session_window closes after 48h inactivity; its window.start is the
  // first event's ts — identical to q16's lag-based session derivation.
  private val q36Sql =
    """WITH g AS (
      |  SELECT user_id, ts,
      |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |  FROM events),
      |s AS (
      |  SELECT user_id, ts,
      |         CAST(SUM(CASE WHEN prev_ts IS NULL
      |                    OR epoch_us(ts) - epoch_us(prev_ts) > 172800000000
      |                  THEN 1 ELSE 0 END)
      |           OVER (PARTITION BY user_id ORDER BY ts
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
      |  FROM g)
      |SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
      |FROM s GROUP BY user_id, session_no""".stripMargin

  // ---------------------------------------------------------------------
  // q37 — salted two-phase aggregation (operators/SkewAgg): identical
  // result to a direct groupBy (the oracle is the plain GROUP BY), but no
  // single reducer owns a hot key. Integer aggregates only — salted
  // double-summation would reorder float addition.
  // ---------------------------------------------------------------------
  private def q37SaltedAddrCounts(spark: SparkSession, dir: String): DataFrame =
    SkewAgg.countSumBy(DnsAnalog.queries(Tables.events(spark, dir)),
      keys = Seq("query_address"), sumCols = Nil, salts = 8)

  private val q37Sql =
    s"""${DnsAnalog.oracleCte}
      |SELECT query_address, COUNT(*) AS n FROM dns GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // q38 — set operations (SURVEY §2.10: relational surface Spark adds over
  // the reference's tables): clients that queried but never hit NXDOMAIN,
  // via EXCEPT (distinct set difference).
  // ---------------------------------------------------------------------
  private def q38CleanClients(spark: SparkSession, dir: String): DataFrame = {
    val dns = DnsAnalog.responses(Tables.events(spark, dir))
    dns.select(col("query_address"))
      .except(dns.filter(col("response_status") === "NXDOMAIN")
        .select(col("query_address")))
  }

  private val q38Sql =
    s"""${DnsAnalog.oracleCte}
      |SELECT query_address FROM dns
      |EXCEPT
      |SELECT query_address FROM dns WHERE response_status = 'NXDOMAIN'""".stripMargin

  // ---------------------------------------------------------------------
  // q39/q40 — IVF coarse-quantizer ANN (operators/Similarity.annIvf) and
  // the ROLLUP aggregation surface (reference's fixed 3-set grouping is
  // q2/q3; Spark exposes full rollup/cube for free — SURVEY §2.10).
  // ---------------------------------------------------------------------
  private def q39AnnIvf(spark: SparkSession, dir: String): DataFrame =
    Similarity.annIvf(corpus(spark, dir), probes(spark, dir), k = 3, nCells = 8)

  /** IVF oracle with first-N centroids; nprobe > 1 lets a probe search
    * its nprobe nearest cells (multi-probe — corpus stays single-cell, so
    * no pair can duplicate). */
  private def ivfSql(nprobe: Int): String =
    s"""WITH c AS (SELECT vec_id AS cell, embedding AS ce FROM embeddings WHERE vec_id < 8),
      |ca AS (SELECT vec_id, embedding, cell FROM (
      |  SELECT e.vec_id, e.embedding, c.cell,
      |         ROW_NUMBER() OVER (PARTITION BY e.vec_id
      |           ORDER BY ${duckCosine("e.embedding", "ce")} DESC, c.cell) AS crn
      |  FROM embeddings e CROSS JOIN c) WHERE crn = 1),
      |p0 AS (SELECT vec_id AS probe_id, embedding AS pe FROM embeddings WHERE vec_id < 3),
      |pa AS (SELECT probe_id, pe, cell AS pcell FROM (
      |  SELECT p0.probe_id, p0.pe, c.cell,
      |         ROW_NUMBER() OVER (PARTITION BY p0.probe_id
      |           ORDER BY ${duckCosine("pe", "ce")} DESC, c.cell) AS crn
      |  FROM p0 CROSS JOIN c) WHERE crn <= $nprobe),
      |s AS (SELECT probe_id, ca.vec_id, ${duckCosine("pe", "ca.embedding")} AS cosine
      |      FROM pa JOIN ca ON ca.cell = pa.pcell AND ca.vec_id <> pa.probe_id),
      |r AS (SELECT probe_id, vec_id, cosine,
      |        CAST(ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id) AS BIGINT) AS rn
      |      FROM s)
      |SELECT probe_id, vec_id, cosine, rn FROM r WHERE rn <= 3""".stripMargin

  private val q39Sql = ivfSql(1)

  private def q40RollupRevenue(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(sum(dec(col("o_totalprice"))).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"))
  }

  private val q40Sql =
    """SELECT r_name, n_name,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_orders
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP (r_name, n_name)""".stripMargin

  // ---------------------------------------------------------------------
  // q41 — pivot (cross-tab): response-status counts per identity. Spark
  // plans a pivot with explicit values as a single aggregation pass.
  // ---------------------------------------------------------------------
  private def q41PivotStatus(spark: SparkSession, dir: String): DataFrame =
    DnsAnalog.responses(Tables.events(spark, dir))
      .groupBy(col("identity"))
      .pivot("response_status", Seq("NOERROR", "NXDOMAIN", "SERVFAIL"))
      .agg(count(lit(1)))
      .select(col("identity"),
        coalesce(col("NOERROR"), lit(0L)).as("n_noerror"),
        coalesce(col("NXDOMAIN"), lit(0L)).as("n_nxdomain"),
        coalesce(col("SERVFAIL"), lit(0L)).as("n_servfail"))

  private val q41Sql =
    s"""${DnsAnalog.oracleCte}
      |SELECT identity,
      |  COUNT(CASE WHEN response_status = 'NOERROR' THEN 1 END) AS n_noerror,
      |  COUNT(CASE WHEN response_status = 'NXDOMAIN' THEN 1 END) AS n_nxdomain,
      |  COUNT(CASE WHEN response_status = 'SERVFAIL' THEN 1 END) AS n_servfail
      |FROM dns GROUP BY identity""".stripMargin

  // q42 — INTERSECT: addresses that produced both NXDOMAIN and SERVFAIL.
  private def q42RepeatOffenders(spark: SparkSession, dir: String): DataFrame = {
    val dns = DnsAnalog.responses(Tables.events(spark, dir))
    dns.filter(col("response_status") === "NXDOMAIN").select(col("query_address"))
      .intersect(dns.filter(col("response_status") === "SERVFAIL")
        .select(col("query_address")))
  }

  private val q42Sql =
    s"""${DnsAnalog.oracleCte}
      |SELECT query_address FROM dns WHERE response_status = 'NXDOMAIN'
      |INTERSECT
      |SELECT query_address FROM dns WHERE response_status = 'SERVFAIL'""".stripMargin

  // q43 — ranking-function variants beyond row_number (q15): dense_rank of
  // question popularity per identity, with percent-free integer semantics.
  private def q43DenseRank(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = DnsAnalog.queries(Tables.events(spark, dir))
      .groupBy(col("identity"), col("question_name"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("identity")).orderBy(desc("n"), asc("question_name"))
    counts
      .withColumn("dr", dense_rank().over(w).cast("long"))
      .filter(col("dr") <= 5)
  }

  private val q43Sql =
    s"""${DnsAnalog.oracleCte}
      |SELECT identity, question_name, n, dr FROM (
      |  SELECT identity, question_name, COUNT(*) AS n,
      |         CAST(DENSE_RANK() OVER (PARTITION BY identity
      |           ORDER BY COUNT(*) DESC, question_name) AS BIGINT) AS dr
      |  FROM dns GROUP BY identity, question_name) t
      |WHERE dr <= 5""".stripMargin

  // q44 — approximate distinct counts (HyperLogLog++): the only viable
  // distinct-cardinality shape at 100 TB (exact distinct shuffles every
  // key; HLL shuffles fixed-size sketches). Not oracle-expressible —
  // registered without SQL, so the driver records the weaker rows>0 check.
  private def q44ApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    DnsAnalog.queries(Tables.events(spark, dir))
      .groupBy(col("identity"))
      .agg(approx_count_distinct(col("query_address"), rsd = 0.01)
        .as("approx_addrs"),
        count(lit(1)).as("n_rows"))

  // ---------------------------------------------------------------------
  // q45 — embedding near-dup pairs, multi-table hyperplane-LSH blocked:
  // the production-scale sibling of q24 (which stays registered as the
  // exact recall oracle but is excluded from the bench headline — its
  // inequality join is a cartesian by construction). Candidates come from
  // a (table, bucket) equi-join over 8 tables × 4 sign bits of fixed
  // random hyperplanes; the oracle recomputes the identical buckets from
  // the same HyperPlanes coefficient table (q26 MinHashCoeffs pattern),
  // with the same left-to-right double accumulation — bit-exact.
  // ---------------------------------------------------------------------
  private def q45EmbeddingDedupLsh(spark: SparkSession, dir: String): DataFrame =
    Similarity.embeddingCosinePairsBucketed(corpus(spark, dir), threshold = 0.4)

  /** DuckDB form of VectorFunctions.hyperplaneBucket over the same fixed
    * coefficients: integer-valued plane entries make every product exact,
    * and `t1 + t2 + ...` associates left like the Scala dot loop. */
  private def duckHyperplaneBucket(e: String, tbl: Int, bits: Int): String = {
    val bitExprs = (0 until bits).map { i =>
      val plane = graft.functions.VectorFunctions.HyperPlanes(tbl * bits + i)
      // COALESCE: embeddings shorter than the 64-dim plane contribute 0
      // for the missing dims, matching the Scala dot's min-length loop
      // (without it one NULL index would null the whole sum and collapse
      // every bucket to 0)
      val dot = plane.zipWithIndex.map { case (c, j) =>
        s"COALESCE(CAST($e[${j + 1}] AS DOUBLE),0.0)*(${c.toDouble})"
      }.mkString(" + ")
      s"(CASE WHEN $dot > 0 THEN ${1L << i} ELSE 0 END)"
    }
    "CAST(" + bitExprs.mkString(" + ") + " AS BIGINT)"
  }

  private val q45Sql = {
    val tables = 8
    val bits = 4
    val bucketCols = (0 until tables)
      .map(t => s"${duckHyperplaneBucket("embedding", t, bits)} AS b$t")
      .mkString(", ")
    val anyTable = (0 until tables).map(t => s"a.b$t = b.b$t").mkString(" OR ")
    s"""WITH eb AS (SELECT vec_id, embedding, $bucketCols FROM embeddings)
      |SELECT vec_a, vec_b, cosine FROM (
      |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |         ${duckCosine("a.embedding", "b.embedding")} AS cosine
      |  FROM eb a JOIN eb b ON a.vec_id < b.vec_id AND ($anyTable)) t
      |WHERE cosine >= 0.4""".stripMargin
  }

  // q47 — the percentile engine's bounded-state scale mode: deltas floored
  // to milliseconds before the histogram, so per-identity aggregation
  // state is at most range/1000 distinct buckets regardless of row volume
  // (the documented 100 TB mitigation for q32, now a first-class
  // oracle-checked query rather than a comment).
  private def q47LatencyPercentilesMs(spark: SparkSession, dir: String): DataFrame =
    latencyPercentilesByRank(spark, dir, bucketUs = 1000L)

  private val q47Sql = percentileSql(1000L)

  // ---------------------------------------------------------------------
  // q48 — dedup clustering: connected components over the n-gram-Jaccard
  // pair graph (q21's edges), collapsing transitive duplicate chains
  // (A~B, B~C ⇒ one group even though A and C were never compared) to a
  // per-document component label. Spark side is iterative min-label
  // propagation (Dedup.connectedComponents); the oracle is DuckDB's
  // recursive CTE computing min reachable id — two utterly different
  // fixpoint engines agreeing bit-for-bit. The Jaccard graph (not the
  // SimHash one) is the edge set because a transitive-closure ORACLE is
  // only tractable on a sparse graph: this corpus's SimHash pairs form a
  // 4497-doc quasi-clique at sf0.1 whose closure is quadratic — the
  // Spark propagation handles it fine (O(E) per round), but certifying
  // it in SQL would take the oracle minutes.
  // ---------------------------------------------------------------------
  private def q48DedupClusters(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val edges = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.5, maxShingleDfFrac = 0.1)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    Dedup.connectedComponents(docs.select(col("doc_id").as("id")), edges)
      .select(col("id").as("doc_id"), col("component"))
  }

  /** Shared recursive min-label closure over the q21 pair graph (same
    * edge CTEs; recursion pruned to labels that can still win: a label ≥
    * dst always loses to dst's own id). */
  /** The thresholded candidate→pair join shared by every consumer of
    * q21's pair graph (q48 closure, q91/q92/q93 diagnostics): one
    * definition of the join shape and the 0.5 Jaccard threshold, so the
    * diagnostics can never drift from the dedup they describe. Callers
    * prepend their own SELECT list. */
  private val q21PairJoin =
    """FROM i JOIN sz sa ON i.x = sa.doc JOIN sz sb ON i.y = sb.doc
      |      WHERE c*1.0/(sa.s + sb.s - c) >= 0.5""".stripMargin

  private val q48Closure =
    s"""WITH RECURSIVE $q21PairCtes,
      |p AS (SELECT x AS src, y AS dst
      |      $q21PairJoin),
      |e AS (SELECT src, dst FROM p UNION ALL SELECT dst, src FROM p),
      |r(v, l) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT e.dst, r.l FROM r JOIN e ON e.src = r.v WHERE r.l < e.dst)""".stripMargin

  private val q48Sql =
    s"$q48Closure\nSELECT v AS doc_id, MIN(l) AS component FROM r GROUP BY v"

  // q52 — the end of the dedup story: the corpus that SURVIVES transitive
  // near-dup collapse (one keeper — the minimum id — per q48 component).
  // Composes clustering with keep-selection exactly like a production
  // pipeline would feed training data.
  private def q52TransitiveDedupKeep(spark: SparkSession, dir: String): DataFrame =
    q48DedupClusters(spark, dir)
      .filter(col("doc_id") === col("component"))
      .select(col("doc_id"))

  private val q52Sql =
    s"$q48Closure\nSELECT v AS doc_id FROM r GROUP BY v HAVING v = MIN(l)"

  // q49 — multi-probe IVF: the recall knob of a production IVF index
  // (probe the 2 nearest cells instead of 1; cost ×nprobe, recall →
  // brute force as nprobe → nCells). First-N centroids keep it
  // oracle-exact.
  private def q49AnnIvfMultiprobe(spark: SparkSession, dir: String): DataFrame =
    Similarity.annIvf(corpus(spark, dir), probes(spark, dir), k = 3,
      nCells = 8, nprobe = 2)

  private val q49Sql = ivfSql(2)

  // q50 — stratified deterministic sampling: rebalance the training mix
  // by language (downsample the dominant strata, keep the rest) with an
  // RNG-free hash predicate — replay-stable and exactly reproducible by
  // the oracle, which no rand()-based sample can certify.
  private def q50StratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val langs = Tables.documents(spark, dir)
      .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_pred"))
    Sampling.stratifiedHashSample(langs, "doc_id", "lang_pred",
      Map("en" -> 40, "es" -> 70), defaultPct = 100)
  }

  private val q50Sql =
    s"""WITH langs AS (
      |$q18Sql
      |),
      |h AS (SELECT doc_id, lang_pred,
      |        CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':sample'), 1, 8)) AS BIGINT) % 100 AS hv
      |      FROM langs)
      |SELECT doc_id, lang_pred FROM h
      |WHERE hv < (CASE lang_pred WHEN 'en' THEN 40 WHEN 'es' THEN 70 ELSE 100 END)""".stripMargin

  // q53 — per-group deterministic cap: at most N docs per predicted
  // language, chosen by hash rank (a pure function of the data, so the
  // oracle certifies the exact kept set — "at most N per domain" is the
  // standard training-mix balancing step).
  private def q53PerGroupCap(spark: SparkSession, dir: String): DataFrame = {
    val langs = Tables.documents(spark, dir)
      .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_pred"))
    Sampling.capPerGroup(langs, "doc_id", "lang_pred", n = 25)
  }

  private val q53Sql =
    s"""WITH langs AS (
      |$q18Sql
      |),
      |r AS (SELECT doc_id, lang_pred,
      |        ROW_NUMBER() OVER (PARTITION BY lang_pred
      |          ORDER BY CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT), doc_id) AS rk
      |      FROM langs)
      |SELECT doc_id, lang_pred FROM r WHERE rk <= 25""".stripMargin

  // q46 — IVF ANN with Lloyd-trained (spherical k-means) centroids: the
  // production quantizer for q39's machinery. Training is an explicit
  // bounded action (hash-sampled collect + driver-local Lloyd, see
  // Similarity.trainIvfCentroids); the trained centroids ride the search
  // plan as a broadcast literal table. Lloyd isn't expressible in the SQL
  // oracle → registered rows-only (like q44); recall vs both the exact
  // top-k and the first-N quantizer is asserted in SimilaritySpec.
  private def q46AnnIvfKmeans(spark: SparkSession, dir: String): DataFrame =
    Similarity.annIvfKmeans(corpus(spark, dir), probes(spark, dir),
      k = 3, nCells = 8)

  // q51 — sequence packing (operators/Packing): documents greedily packed
  // into fixed-token-capacity training sequences, first-fit decreasing
  // per hash partition. Pack assignment depends on Spark's hash
  // partitioning, which no SQL oracle can reproduce → rows-only check;
  // the packing invariants (capacity, tiling offsets, waste bound) are
  // asserted in PackingSpec instead.
  private def q51SequencePacking(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), TextAnalysis.bpeTokenCount(col("text")).as("n_tokens"))
    Packing.packSequences(toks, "doc_id", "n_tokens", capacity = 256)
  }

  // ---------------------------------------------------------------------
  // q54–q57 — corpus scrubbing + anonymization (operators/Scrub,
  // functions/Anonymize): PII redaction with audit counts, Gopher-style
  // repetition quality rules, benchmark decontamination, and PII-safe
  // export. All per-row maps except q56's broadcast semi-join — nothing
  // here shuffles the corpus.
  // ---------------------------------------------------------------------

  // q54 — PII redaction. The driver corpus is synthetic word salad with
  // no PII, so the query PLANTS deterministic PII per doc (email + IPv4 +
  // phone derived from doc_id, identically in the oracle) and then
  // scrubs it: the oracle certifies the regex semantics agree between
  // engines on every row, not just that clean text passes through.
  /** Deterministic planted-PII text shared by q54 and q98 — ONE
    * definition per engine side so the two queries can never drift onto
    * different planted corpora (each is only gated against its own
    * oracle copy otherwise). */
  private def plantedPii: Column = concat(col("text"),
    lit(" contact user"), col("doc_id").cast("string"),
    lit("@mail.example.com from 10."),
    (col("doc_id") % 250).cast("string"), lit(".0.7 call 555-"),
    lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-"),
    lpad((col("doc_id") % 10000).cast("string"), 4, "0"))

  /** DuckDB form of [[plantedPii]] (aliased `t`). ONE LINE on purpose:
    * the callers interpolate it into stripMargin blocks, where a
    * leading `||` continuation would be eaten as a margin. */
  private val plantedPiiSql: String =
    "text || ' contact user' || CAST(doc_id AS VARCHAR) || " +
      "'@mail.example.com from 10.' || CAST(doc_id % 250 AS VARCHAR) || " +
      "'.0.7 call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || " +
      "'-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t"

  private def q54PiiRedact(spark: SparkSession, dir: String): DataFrame = {
    val planted = plantedPii
    val counts = Scrub.piiCounts(planted).map { case (n, c) => c.as(n) }
    Tables.documents(spark, dir)
      .select(Seq(col("doc_id")) ++ counts :+
        Scrub.redactPii(planted).as("clean_text"): _*)
  }

  private val q54Sql = {
    // the patterns are RE2-safe and SQL single-quoted literals don't
    // process backslashes, so they embed verbatim — one definition,
    // zero drift between engines
    val email = Scrub.EmailPattern
    val ip = Scrub.Ipv4Pattern
    val phone = Scrub.PhonePattern
    s"""WITH p AS (SELECT doc_id,
      |  $plantedPiiSql
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(t, '$email')) AS BIGINT) AS n_emails,
      |  CAST(len(regexp_extract_all(t, '$ip')) AS BIGINT) AS n_ipv4,
      |  CAST(len(regexp_extract_all(t, '$phone')) AS BIGINT) AS n_phones,
      |  regexp_replace(regexp_replace(regexp_replace(t,
      |    '$email', '<EMAIL>', 'g'), '$ip', '<IP>', 'g'),
      |    '$phone', '<PHONE>', 'g') AS clean_text
      |FROM p""".stripMargin
  }

  // q55 — repetition quality rules (Gopher §A.1-style): duplicate-token
  // share, most-common-token share, duplicate-bigram share, and the keep
  // verdict. Token array materialized once per row (generator-token
  // rule), metrics are pure array expressions.
  private def q55RepetitionQuality(spark: SparkSession, dir: String): DataFrame = {
    val tk = col("__tk")
    Tables.documents(spark, dir)
      .withColumn("__tk", TextAnalysis.tokens(col("text")))
      .select(col("doc_id"),
        TextAnalysis.dupTokenRatio(tk).as("dup_token_ratio"),
        TextAnalysis.topTokenFraction(tk).as("top_token_frac"),
        TextAnalysis.dupBigramFraction(tk).as("dup_bigram_frac"),
        (TextAnalysis.dupTokenRatio(tk) < 0.6 &&
          TextAnalysis.topTokenFraction(tk) < 0.12).cast("int").as("keep"))
  }

  private val q55Sql =
    """WITH t AS (SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS tk FROM documents),
      |m AS (SELECT doc_id, len(tk) AS n, len(list_distinct(tk)) AS d,
      |        list_aggregate(list_transform(list_distinct(tk),
      |          u -> len(list_filter(tk, x -> x = u))), 'max') AS mx,
      |        CASE WHEN len(tk) >= 2
      |          THEN list_transform(generate_series(1, len(tk)-1), i -> tk[i]||' '||tk[i+1])
      |          ELSE [] END AS bg
      |      FROM t)
      |SELECT doc_id,
      |  CASE WHEN n=0 THEN 0.0 ELSE (n-d)*1.0/n END AS dup_token_ratio,
      |  CASE WHEN n=0 THEN 0.0 ELSE mx*1.0/n END AS top_token_frac,
      |  CASE WHEN len(bg)=0 THEN 0.0
      |       ELSE (len(bg)-len(list_distinct(bg)))*1.0/len(bg) END AS dup_bigram_frac,
      |  CAST(CASE WHEN n=0 THEN 1
      |       WHEN (n-d)*1.0/n < 0.6 AND mx*1.0/n < 0.12 THEN 1
      |       ELSE 0 END AS INT) AS keep
      |FROM m""".stripMargin

  // q56 — benchmark decontamination: training docs (source <> 'src0')
  // sharing any 5-token shingle with the eval set (source = 'src0') are
  // contaminated. 5-gram collisions are vanishingly rare in random text,
  // so hits mark genuine cross-source duplication — exactly the
  // eval-leakage the operator exists to catch.
  private def q56Decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    Scrub.decontaminate(
      train = docs.filter(col("source") =!= "src0"),
      eval = docs.filter(col("source") === "src0"),
      idCol = "doc_id", textCol = "text", n = 5)
  }

  private val q56Sql =
    """WITH t AS (SELECT doc_id, source, list_filter(string_split(text,' '), x -> x <> '') AS tk FROM documents),
      |sh AS (SELECT DISTINCT doc_id, source, sg FROM (
      |  SELECT doc_id, source, unnest(CASE WHEN len(tk) >= 5
      |    THEN list_transform(generate_series(1, len(tk)-4),
      |           i -> tk[i]||' '||tk[i+1]||' '||tk[i+2]||' '||tk[i+3]||' '||tk[i+4])
      |    ELSE [] END) AS sg FROM t)),
      |ev AS (SELECT DISTINCT sg FROM sh WHERE source = 'src0')
      |SELECT s.doc_id, COUNT(*) AS n_hits
      |FROM sh s JOIN ev USING (sg) WHERE s.source <> 'src0'
      |GROUP BY s.doc_id""".stripMargin

  // q57 — PII-safe export (functions/Anonymize): the q11 address analog
  // truncated to /24 and the user identity replaced by a salted SHA-256
  // pseudonym — stable for joins, unlinkable without the salt.
  private def q57Anonymize(spark: SparkSession, dir: String): DataFrame = {
    val x = (col("user_id") * lit(2654435761L)) % lit(4294967296L)
    Tables.events(spark, dir).select(col("event_id"),
      Anonymize.pseudonym(col("user_id"), "graft-export").as("user_pseudonym"),
      IpFunctions.ipv4_string(Anonymize.ipv4Truncate(x, 24)).as("ip_24"))
  }

  private val q57Sql =
    """SELECT event_id,
      |  sha256('graft-export:' || CAST(user_id AS VARCHAR)) AS user_pseudonym,
      |  CAST((x // 16777216) % 256 AS VARCHAR) || '.' || CAST((x // 65536) % 256 AS VARCHAR)
      |    || '.' || CAST((x // 256) % 256 AS VARCHAR) || '.0' AS ip_24
      |FROM (SELECT event_id, user_id,
      |        (user_id * 2654435761) % 4294967296 AS x FROM events)""".stripMargin

  // q58 — token-rarity quality stats (operators/CorpusStats): the
  // integer-exact unigram-LM proxy — occurrences of corpus-rare tokens
  // per doc, in basis points. The vocabulary is never broadcast or
  // collected: two token-keyed shuffles and one doc-keyed aggregation.
  private def q58RareTokens(spark: SparkSession, dir: String): DataFrame =
    CorpusStats.rareTokenStats(Tables.documents(spark, dir),
      "doc_id", "text", rareBelow = 10L)

  private val q58Sql =
    """WITH toks AS (SELECT doc_id, unnest(list_filter(string_split(text,' '), x -> x <> '')) AS tok
      |              FROM documents),
      |cf AS (SELECT tok, COUNT(*) AS cf FROM toks GROUP BY 1)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
      |  CAST(SUM(CASE WHEN cf < 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
      |  CAST(FLOOR(SUM(CASE WHEN cf < 10 THEN 1 ELSE 0 END) * 10000 / COUNT(*)) AS BIGINT) AS rare_bp
      |FROM toks JOIN cf USING (tok)
      |GROUP BY doc_id""".stripMargin

  // q59 — deterministic shard balance report (operators/Sampling): hash
  // sharding a 100 TB corpus for an N-way training job, with the cheap
  // preflight aggregation that catches a skewed shard before the GPUs do.
  private def q59ShardStats(spark: SparkSession, dir: String): DataFrame =
    Sampling.shardStats(Tables.documents(spark, dir),
      "doc_id", "n_chars", nShards = 16)

  private val q59Sql =
    """WITH h AS (SELECT doc_id, n_chars,
      |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':shard'), 1, 8)) AS BIGINT) % 16 AS shard
      |  FROM documents)
      |SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_weight,
      |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
      |FROM h GROUP BY 1""".stripMargin

  // q60 — cross-source duplication matrix (operators/CorpusStats):
  // distinct shared 5-gram shingles per source pair — mirror/leakage
  // analytics at n-gram granularity. Shingle hashes shuffle, never text;
  // per-shingle fan-out bounded by sources².
  private def q60SourceOverlap(spark: SparkSession, dir: String): DataFrame =
    CorpusStats.sourceOverlap(Tables.documents(spark, dir),
      "text", "source", n = 5)

  private val q60Sql =
    """WITH t AS (SELECT source, list_filter(string_split(text,' '), x -> x <> '') AS tk FROM documents),
      |sh AS (SELECT DISTINCT source, sg FROM (
      |  SELECT source, unnest(CASE WHEN len(tk) >= 5
      |    THEN list_transform(generate_series(1, len(tk)-4),
      |           i -> tk[i]||' '||tk[i+1]||' '||tk[i+2]||' '||tk[i+3]||' '||tk[i+4])
      |    ELSE [] END) AS sg FROM t))
      |SELECT a.source AS src_a, b.source AS src_b,
      |  CAST(COUNT(*) AS BIGINT) AS shared_shingles
      |FROM sh a JOIN sh b ON a.sg = b.sg AND a.source < b.source
      |GROUP BY 1, 2""".stripMargin

  // q61 — incremental ingestion dedup (operators/Dedup): a ~10% hash
  // slice plays the "new crawl batch", the rest the existing corpus;
  // batch docs near-duplicating the corpus are flagged WITHOUT a corpus
  // self-join. The asymmetric inverted-index probe is the shape that
  // admits a daily drop against a 100 TB corpus.
  private def q61IncrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val slice = pmod(Dedup.baseHash32(col("doc_id").cast("string")), lit(10))
    Dedup.incrementalJaccardPairs(
      corpus = docs.filter(slice =!= 0),
      batch = docs.filter(slice === 0),
      idCol = "doc_id", textCol = "text", n = 3, threshold = 0.5,
      maxShingleDfFrac = 0.1)
  }

  // shared by q61 (plain) and q68 (bloom-prefiltered — the prefilter is
  // semantics-preserving, so BOTH certify against this same pipeline,
  // which is exactly what q68 exists to prove)
  private def incrementalDedupSql(threshold: String) =
    s"""WITH t AS (SELECT doc_id,
      |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10 AS hv,
      |    list_filter(string_split(text,' '), x -> x <> '') AS tk FROM documents),
      |sh0 AS (SELECT DISTINCT doc_id AS doc, hv, sg FROM (
      |  SELECT doc_id, hv, unnest(CASE WHEN len(tk) >= 3
      |    THEN list_transform(generate_series(1, len(tk)-2), i -> tk[i]||' '||tk[i+1]||' '||tk[i+2])
      |    ELSE [] END) AS sg FROM t)),
      |ncorp AS (SELECT count(DISTINCT doc_id) AS n FROM t WHERE hv <> 0),
      |viral AS (SELECT sg FROM sh0, ncorp WHERE hv <> 0
      |          GROUP BY sg, n HAVING count(*) > ceil(n * 0.1)),
      |sh AS (SELECT * FROM sh0 WHERE sg NOT IN (SELECT sg FROM viral)),
      |sz AS (SELECT doc, count(*) AS s FROM sh GROUP BY 1),
      |i AS (SELECT b.doc AS x, c.doc AS y, count(*) AS cnt
      |      FROM sh b JOIN sh c ON b.sg = c.sg AND b.hv = 0 AND c.hv <> 0
      |      GROUP BY 1, 2)
      |SELECT x AS batch_doc, y AS corpus_doc,
      |  cnt*1.0/(sa.s + sb.s - cnt) AS jaccard
      |FROM i JOIN sz sa ON i.x = sa.doc JOIN sz sb ON i.y = sb.doc
      |WHERE cnt*1.0/(sa.s + sb.s - cnt) >= $threshold""".stripMargin

  private val q61Sql = incrementalDedupSql("0.5")

  // q62 — deterministic train/val/test split (operators/Sampling): hash-
  // range labels that never move a document between splits as the corpus
  // grows — eval stays eval forever.
  private def q62Split(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(col("doc_id"),
      Sampling.splitLabel(col("doc_id"),
        Seq("val" -> 10, "test" -> 10), rest = "train").as("split"))

  private val q62Sql =
    """SELECT doc_id,
      |  CASE WHEN hv < 10 THEN 'val' WHEN hv < 20 THEN 'test'
      |       ELSE 'train' END AS split
      |FROM (SELECT doc_id,
      |        CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS hv
      |      FROM documents)""".stripMargin

  // q63 — epoch-weighted mixture expansion (operators/Sampling): English
  // seen 1.4 times per run, Chinese subsampled to 0.3, everything else
  // exactly once — the source-weighting step that turns a curated corpus
  // into an actual training mix. Row-local generate, no shuffle.
  private def q63EpochMix(spark: SparkSession, dir: String): DataFrame =
    Sampling.epochExpand(
      Tables.documents(spark, dir).select(col("doc_id"), col("lang")),
      "doc_id", "lang", Map("en" -> 140, "zh" -> 30), defaultCenti = 100)

  private val q63Sql =
    """WITH h AS (SELECT doc_id, lang,
      |    CASE lang WHEN 'en' THEN 140 WHEN 'zh' THEN 30 ELSE 100 END AS centi,
      |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':epoch'), 1, 8)) AS BIGINT) % 100 AS hv
      |  FROM documents),
      |c AS (SELECT doc_id, lang,
      |        centi // 100 + CASE WHEN hv < centi % 100 THEN 1 ELSE 0 END AS n
      |      FROM h)
      |SELECT doc_id, lang, CAST(unnest(generate_series(1, CAST(n AS BIGINT))) AS BIGINT) AS copy
      |FROM c WHERE n >= 1""".stripMargin

  // q64 — max-seq-len chunking (operators/CorpusStats): long documents
  // become several fixed-window training sequences; row-local generate +
  // array slice, no shuffle at any size.
  private def q64Chunk(spark: SparkSession, dir: String): DataFrame =
    CorpusStats.chunk(Tables.documents(spark, dir), "doc_id", "text",
      seqLen = 32)

  private val q64Sql =
    """WITH t AS (SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS tk FROM documents),
      |n AS (SELECT doc_id, tk, len(tk) AS n FROM t WHERE len(tk) > 0),
      |c AS (SELECT doc_id, tk, n,
      |        unnest(generate_series(0, CAST((n-1) // 32 AS BIGINT))) AS ci
      |      FROM n)
      |SELECT doc_id, CAST(ci AS BIGINT) AS chunk_idx,
      |  array_to_string(list_slice(tk, ci*32 + 1, ci*32 + 32), ' ') AS chunk_text,
      |  CAST(LEAST(32, n - ci*32) AS BIGINT) AS chunk_tokens
      |FROM c""".stripMargin

  // q65 — the curation capstone: the manifest of documents that actually
  // reach training. Composes transitive near-dup keep (q48/q52) ∩
  // repetition quality (q55) ∖ benchmark contamination (q56), then stamps
  // each survivor with its growth-stable split (q62) and shard (q59).
  // The oracle rebuilds the entire pipeline — recursive closure included —
  // in one DuckDB query: two engines agreeing on a five-stage pipeline
  // end to end.
  private def q65TrainingManifest(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // the keeper set IS q52 — call it, so a future change to the keep
    // rule cannot silently diverge the manifest from the dedup surface
    val keepers = q52TransitiveDedupKeep(spark, dir)
    val contaminated = Scrub.decontaminate(
        docs.filter(col("source") =!= "src0"),
        docs.filter(col("source") === "src0"),
        "doc_id", "text", n = 5)
      .select(col("doc_id"))
    val tk = col("__tk")
    docs.filter(col("source") =!= "src0")
      .join(keepers, Seq("doc_id"), "left_semi")
      .join(contaminated, Seq("doc_id"), "left_anti")
      .withColumn("__tk", TextAnalysis.tokens(col("text")))
      .filter(TextAnalysis.dupTokenRatio(tk) < 0.6 &&
        TextAnalysis.topTokenFraction(tk) < 0.12)
      .select(col("doc_id"),
        Sampling.splitLabel(col("doc_id"),
          Seq("val" -> 10, "test" -> 10), rest = "train").as("split"),
        Sampling.shardId(col("doc_id"), 16).as("shard"))
  }

  private val q65Sql =
    s"""$q48Closure,
      |keep48 AS (SELECT v AS doc_id FROM r GROUP BY v HAVING v = MIN(l)),
      |t5 AS (SELECT doc_id, source, list_filter(string_split(text,' '), x -> x <> '') AS tk FROM documents),
      |sh5 AS (SELECT DISTINCT doc_id, source, sg FROM (
      |  SELECT doc_id, source, unnest(CASE WHEN len(tk) >= 5
      |    THEN list_transform(generate_series(1, len(tk)-4),
      |           k -> tk[k]||' '||tk[k+1]||' '||tk[k+2]||' '||tk[k+3]||' '||tk[k+4])
      |    ELSE [] END) AS sg FROM t5)),
      |ev5 AS (SELECT DISTINCT sg FROM sh5 WHERE source = 'src0'),
      |cont AS (SELECT DISTINCT s.doc_id FROM sh5 s JOIN ev5 USING (sg)
      |         WHERE s.source <> 'src0'),
      |rep AS (SELECT doc_id FROM (
      |    SELECT doc_id, len(tk) AS n, len(list_distinct(tk)) AS d,
      |      list_aggregate(list_transform(list_distinct(tk),
      |        u -> len(list_filter(tk, x -> x = u))), 'max') AS mx
      |    FROM t5 WHERE source <> 'src0')
      |  WHERE n = 0 OR ((n-d)*1.0/n < 0.6 AND mx*1.0/n < 0.12))
      |SELECT d.doc_id,
      |  CASE WHEN hv100 < 10 THEN 'val' WHEN hv100 < 20 THEN 'test'
      |       ELSE 'train' END AS split,
      |  hv32 % 16 AS shard
      |FROM (SELECT doc_id, source,
      |        CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS hv100,
      |        CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':shard'), 1, 8)) AS BIGINT) AS hv32
      |      FROM documents) d
      |JOIN keep48 ON d.doc_id = keep48.doc_id
      |JOIN rep ON d.doc_id = rep.doc_id
      |WHERE d.source <> 'src0'
      |  AND d.doc_id NOT IN (SELECT doc_id FROM cont)""".stripMargin

  // ---------------------------------------------------------------------
  // q66 — span-level duplicate coverage (Lee et al. exact-substring dedup
  // signal): per doc, how many token positions sit inside an 8-token
  // window that occurs ≥2× corpus-wide. Spark joins on portable 60-bit
  // window hashes and computes the interval union analytically; the
  // oracle joins on the window text and reproduces the same
  // sorted-starts/clipped-gap union with lead(). Integer outputs keep the
  // comparison hash-exact.
  // ---------------------------------------------------------------------
  private def q66DupSpanCoverage(spark: SparkSession, dir: String): DataFrame =
    Dedup.duplicateSpanCoverage(Tables.documents(spark, dir),
      "doc_id", "text", k = 8)

  private val q66Sql =
    """WITH t AS (SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS tk FROM documents),
      |w AS (SELECT doc_id,
      |        unnest(CASE WHEN len(tk) >= 8 THEN generate_series(1, len(tk)-7) ELSE [] END) AS pos,
      |        unnest(CASE WHEN len(tk) >= 8
      |          THEN list_transform(generate_series(1, len(tk)-7),
      |                 i -> list_aggregate(tk[i:i+7], 'string_agg', ' '))
      |          ELSE [] END) AS wt
      |      FROM t),
      |d AS (SELECT wt FROM w GROUP BY wt HAVING count(*) >= 2),
      |s AS (SELECT doc_id, pos FROM w JOIN d USING (wt)),
      |c AS (SELECT doc_id, sum(g) AS covered_tokens, count(*) AS dup_windows FROM (
      |        SELECT doc_id,
      |          least(coalesce(lead(pos) OVER (PARTITION BY doc_id ORDER BY pos) - pos, 8), 8) AS g
      |        FROM s) GROUP BY doc_id)
      |SELECT t.doc_id, len(tk) AS n_tokens,
      |  CAST(coalesce(covered_tokens, 0) AS BIGINT) AS covered_tokens,
      |  CAST(coalesce(dup_windows, 0) AS BIGINT) AS dup_windows
      |FROM t LEFT JOIN c USING (doc_id)""".stripMargin

  // ---------------------------------------------------------------------
  // q67 — CCNet-style n-gram commonness: trigram count model trained on
  // the trusted source (src0), every other doc scored by integer match
  // statistics against it. The integer "model mass" is the
  // dialect-portable stand-in for KenLM log-prob (monotone in the same
  // direction, hash-exact across engines).
  // ---------------------------------------------------------------------
  private def q67NgramCommonness(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    NgramModel.ngramCommonness(
      docs.filter(col("source") =!= "src0"),
      docs.filter(col("source") === "src0"),
      "doc_id", "text", n = 3)
  }

  private val q67Sql =
    """WITH t AS (SELECT doc_id, source, list_filter(string_split(text,' '), x -> x <> '') AS tk FROM documents),
      |g AS (SELECT doc_id, source,
      |        unnest(CASE WHEN len(tk) >= 3
      |          THEN list_transform(generate_series(1, len(tk)-2), i -> tk[i]||' '||tk[i+1]||' '||tk[i+2])
      |          ELSE [] END) AS ng
      |      FROM t),
      |m AS (SELECT ng, count(*) AS mc FROM g WHERE source = 'src0' GROUP BY 1),
      |s AS (SELECT doc_id, count(*) AS total, count(mc) AS matched,
      |        sum(coalesce(mc, 0)) AS mass
      |      FROM g LEFT JOIN m USING (ng) WHERE source <> 'src0' GROUP BY 1)
      |SELECT d.doc_id,
      |  CAST(coalesce(total, 0) AS BIGINT) AS total_ngrams,
      |  CAST(coalesce(matched, 0) AS BIGINT) AS matched_ngrams,
      |  CAST(coalesce(mass, 0) AS BIGINT) AS model_mass
      |FROM documents d LEFT JOIN s USING (doc_id)
      |WHERE d.source <> 'src0'""".stripMargin

  // ---------------------------------------------------------------------
  // q68 — bloom-prefiltered incremental dedup (operators/Dedup +
  // functions/BloomMightContainLong): q61's asymmetric probe with the
  // runtime semi-join reduction enabled — a Bloom sketch of the batch
  // shingle hashes prunes the corpus index at its scan, before the
  // candidate join's exchange. The prefilter is semantics-preserving, so
  // the oracle is the SAME pipeline as q61's (at this registration's
  // threshold): two engines agreeing here certifies the sketch pruned
  // nothing it shouldn't have.
  // ---------------------------------------------------------------------
  private def q68IncrementalDedupBloom(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val slice = pmod(Dedup.baseHash32(col("doc_id").cast("string")), lit(10))
    Dedup.incrementalJaccardPairs(
      corpus = docs.filter(slice =!= 0),
      batch = docs.filter(slice === 0),
      idCol = "doc_id", textCol = "text", n = 3, threshold = 0.4,
      maxShingleDfFrac = 0.1, bloomFpp = 0.03)
  }

  private val q68Sql = incrementalDedupSql("0.4")

  // ---------------------------------------------------------------------
  // q69 — per-source token budget (operators/Sampling.weightBudget):
  // each source contributes at most 400 tokens to the mix, docs admitted
  // in salted-hash order — the budget-shaped sibling of q53's per-group
  // cap, exact against the oracle's running-sum window while running as
  // the two-phase bucket histogram at scale.
  // ---------------------------------------------------------------------
  private def q69TokenBudget(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
    Sampling.weightBudget(docs, "doc_id", "n_tokens", "source", budget = 400L)
  }

  private val q69Sql =
    """WITH t AS (SELECT doc_id, source,
      |    CAST(len(list_filter(string_split(text,' '), x -> x <> '')) AS BIGINT) AS n_tokens,
      |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':budget'), 1, 8)) AS BIGINT) AS hv
      |  FROM documents),
      |r AS (SELECT doc_id, source, n_tokens,
      |        SUM(n_tokens) OVER (PARTITION BY source ORDER BY hv, doc_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
      |      FROM t)
      |SELECT doc_id, source, n_tokens FROM r WHERE run <= 400""".stripMargin

  // ---------------------------------------------------------------------
  // q70 — temperature-flattened mixture weights (operators/Sampling):
  // per-source sampling shares ∝ sqrt(source token mass), T=0.5 — the
  // multilingual rebalance that upweights low-resource sources. sqrt is
  // IEEE-correctly-rounded in both engines (pow is not — why T is
  // restricted), and everything after floor(10^6·sqrt) is integer-exact,
  // so the ppm shares certify hash-exact.
  // ---------------------------------------------------------------------
  private def q70TemperatureMix(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("source"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
    Sampling.temperatureMixWeights(docs, "source", "n_tokens", temperature = 0.5)
  }

  private val q70Sql =
    """WITH t AS (SELECT source,
      |    len(list_filter(string_split(text,' '), x -> x <> '')) AS w FROM documents),
      |p AS (SELECT source AS stratum, CAST(count(*) AS BIGINT) AS n_docs,
      |        CAST(sum(w) AS BIGINT) AS total_weight FROM t GROUP BY 1),
      |s AS (SELECT stratum, n_docs, total_weight,
      |        CAST(floor(1000000.0 * sqrt(CAST(total_weight AS DOUBLE))) AS BIGINT) AS score
      |      FROM p),
      |tot AS (SELECT sum(score) AS ts FROM s)
      |SELECT stratum, n_docs, total_weight, score,
      |  CAST((score * 1000000) // ts AS BIGINT) AS weight_ppm
      |FROM s, tot""".stripMargin

  // ---------------------------------------------------------------------
  // q71 — vocabulary-drift matrix (operators/CorpusStats.vocabDrift):
  // top-40 token sets per source, pairwise Jaccard — the rank-based
  // distribution-shift monitor between corpus slices. The top-k runs as
  // the frequency-banded two-phase rank (q53's trick keyed on count bit
  // length), never a whole-vocabulary single-task sort.
  // ---------------------------------------------------------------------
  private def q71VocabDrift(spark: SparkSession, dir: String): DataFrame =
    CorpusStats.vocabDrift(Tables.documents(spark, dir), "source", "text", k = 40)

  private val q71Sql =
    """WITH t AS (SELECT source,
      |    unnest(list_filter(string_split(text,' '), x -> x <> '')) AS tok FROM documents),
      |c AS (SELECT source, tok, count(*) AS c FROM t GROUP BY 1, 2),
      |r AS (SELECT source, tok,
      |        ROW_NUMBER() OVER (PARTITION BY source ORDER BY c DESC, tok) AS rk
      |      FROM c),
      |k AS (SELECT source, tok FROM r WHERE rk <= 40),
      |sz AS (SELECT source, count(*) AS s FROM k GROUP BY 1),
      |i AS (SELECT a.source AS src_a, b.source AS src_b, count(*) AS shared
      |      FROM k a JOIN k b ON a.tok = b.tok AND a.source < b.source
      |      GROUP BY 1, 2)
      |SELECT src_a, src_b, CAST(shared AS BIGINT) AS shared_topk,
      |  shared*1.0/(sa.s + sb.s - shared) AS jaccard
      |FROM i JOIN sz sa ON i.src_a = sa.source JOIN sz sb ON i.src_b = sb.source""".stripMargin

  // ---------------------------------------------------------------------
  // q72 — span-level duplicate REMOVAL (operators/Dedup
  // .removeDuplicateSpans): q66's coverage signal applied as an edit —
  // tokens inside any corpus-duplicated 8-gram window are cut and the
  // survivors re-join in order. The oracle rebuilds the cut with a
  // position anti-join + ordered string_agg: two engines agreeing on
  // every cleaned BODY (not just counts) certifies the interval
  // semantics exactly.
  // ---------------------------------------------------------------------
  private def q72RemoveDupSpans(spark: SparkSession, dir: String): DataFrame =
    Dedup.removeDuplicateSpans(Tables.documents(spark, dir), "doc_id", "text",
      k = 8)

  private val q72Sql =
    """WITH t AS (SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS tk FROM documents),
      |w AS (SELECT doc_id,
      |        unnest(CASE WHEN len(tk) >= 8 THEN generate_series(1, len(tk)-7) ELSE [] END) AS pos,
      |        unnest(CASE WHEN len(tk) >= 8
      |          THEN list_transform(generate_series(1, len(tk)-7),
      |                 i -> list_aggregate(tk[i:i+7], 'string_agg', ' '))
      |          ELSE [] END) AS wt
      |      FROM t),
      |d AS (SELECT wt FROM w GROUP BY wt HAVING count(*) >= 2),
      |s AS (SELECT doc_id, pos FROM w JOIN d USING (wt)),
      |cov AS (SELECT DISTINCT doc_id, unnest(generate_series(pos, pos + 7)) AS cp FROM s),
      |toks AS (SELECT doc_id, unnest(tk) AS tok, unnest(generate_series(1, len(tk))) AS p FROM t),
      |kept AS (SELECT toks.doc_id, tok, p FROM toks
      |         LEFT JOIN cov ON toks.doc_id = cov.doc_id AND toks.p = cov.cp
      |         WHERE cov.cp IS NULL),
      |kc AS (SELECT doc_id, count(*) AS c,
      |         string_agg(tok, ' ' ORDER BY p) AS txt FROM kept GROUP BY doc_id)
      |SELECT t.doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
      |  CAST(coalesce(kc.c, 0) AS BIGINT) AS kept_tokens,
      |  coalesce(kc.txt, '') AS clean_text
      |FROM t LEFT JOIN kc USING (doc_id)""".stripMargin

  // ---------------------------------------------------------------------
  // q73 — boilerplate-shingle report (operators/CorpusStats
  // .boilerplateShingles): the 3-gram shingles in at least 1% of docs,
  // with document frequency — the inspection report behind the df skew
  // caps q21/q61/q68 apply mechanically.
  // ---------------------------------------------------------------------
  private def q73Boilerplate(spark: SparkSession, dir: String): DataFrame =
    CorpusStats.boilerplateShingles(Tables.documents(spark, dir), "doc_id",
      "text", n = 3, minDfFrac = 0.01)

  private val q73Sql =
    """WITH t AS (SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS tk FROM documents),
      |sh AS (SELECT DISTINCT doc_id, sg FROM (
      |  SELECT doc_id, unnest(CASE WHEN len(tk) >= 3
      |    THEN list_transform(generate_series(1, len(tk)-2), i -> tk[i]||' '||tk[i+1]||' '||tk[i+2])
      |    ELSE [] END) AS sg FROM t)),
      |n AS (SELECT count(DISTINCT doc_id) AS nd FROM documents)
      |SELECT sg AS shingle, CAST(count(*) AS BIGINT) AS df,
      |  CAST(floor(count(*) * 10000 / nd) AS BIGINT) AS df_bp
      |FROM sh, n GROUP BY sg, nd HAVING count(*) >= ceil(nd * 0.01)""".stripMargin

  // ---------------------------------------------------------------------
  // q74 — SemDeDup semantic dedup (operators/Similarity.semanticDedup,
  // arXiv:2303.09540): IVF-cell partition (first-8 deterministic
  // centroids, the q39 trick) + within-cell cosine near-neighbor search;
  // a vector is dropped iff a lower-id cell-mate with cosine >= 0.4
  // exists. The quadratic term is bounded per cell exactly as IVF bounds
  // search cost; only (cell, id) ints shuffle out of the pair join.
  // ---------------------------------------------------------------------
  private def q74SemanticDedup(spark: SparkSession, dir: String): DataFrame = {
    val c = corpus(spark, dir)
    val cents = c.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cell"), col("embedding").as("ce"))
    Similarity.semanticDedup(c, cents, threshold = 0.4)
  }

  private val q74Sql =
    s"""WITH c AS (SELECT vec_id AS cell, embedding AS ce FROM embeddings WHERE vec_id < 8),
      |ca AS (SELECT vec_id, embedding, cell FROM (
      |  SELECT e.vec_id, e.embedding, c.cell,
      |         ROW_NUMBER() OVER (PARTITION BY e.vec_id
      |           ORDER BY ${duckCosine("e.embedding", "ce")} DESC, c.cell) AS crn
      |  FROM embeddings e CROSS JOIN c) WHERE crn = 1),
      |d AS (SELECT DISTINCT b.vec_id FROM ca a JOIN ca b
      |      ON a.cell = b.cell AND a.vec_id < b.vec_id
      |      WHERE ${duckCosine("a.embedding", "b.embedding")} >= 0.4)
      |SELECT ca.vec_id, ca.cell, (d.vec_id IS NULL) AS keep
      |FROM ca LEFT JOIN d ON ca.vec_id = d.vec_id""".stripMargin

  // ---------------------------------------------------------------------
  // q75 — product-quantization ADC search (operators/Quantize): 4x16-dim
  // subspaces, 16 deterministic first-N codewords each (SQL-reproducible
  // training, the q39 trick per subspace). Encode is a pure narrow
  // projection against the literal codebook (no join, no shuffle);
  // search joins broadcast per-probe distance tables against the
  // exploded 4-byte codes — at scale the corpus side moves codes, never
  // floats. Per-sub distances are summed in fixed sub order, keeping the
  // double sum bit-deterministic for the oracle.
  // ---------------------------------------------------------------------
  private def q75PqAdc(spark: SparkSession, dir: String): DataFrame = {
    val c = corpus(spark, dir)
    val books = Quantize.pqCodebooks(c, "vec_id", "embedding", m = 4, ksub = 16)
    val codes = Quantize.pqEncode(c, "vec_id", "embedding", books)
    Quantize.pqSearchAdc(codes, probes(spark, dir), k = 5, books)
  }

  /** Left-to-right squared-L2 between 16-element windows of two list
    * columns at 1-based offset `sub`*16 (mirrors Quantize.subL2). */
  private def duckSubL2(a: String, b: String, sub: String): String =
    s"list_reduce(list_transform(generate_series(1, 16), i -> " +
      s"(CAST($a[$sub*16+i] AS DOUBLE) - CAST($b[$sub*16+i] AS DOUBLE)) * " +
      s"(CAST($a[$sub*16+i] AS DOUBLE) - CAST($b[$sub*16+i] AS DOUBLE))), (x,y) -> x+y)"

  private val q75Sql =
    s"""WITH sub AS (SELECT unnest(generate_series(0, 3)) AS sub),
      |cb AS (SELECT s.sub, e.vec_id AS code, e.embedding AS cv
      |       FROM embeddings e CROSS JOIN sub s WHERE e.vec_id < 16),
      |enc AS (SELECT vec_id, sub, code FROM (
      |  SELECT x.vec_id, cb.sub, cb.code,
      |         ROW_NUMBER() OVER (PARTITION BY x.vec_id, cb.sub
      |           ORDER BY ${duckSubL2("x.embedding", "cb.cv", "cb.sub")}, cb.code) AS rn
      |  FROM embeddings x CROSS JOIN cb) WHERE rn = 1),
      |dt AS (SELECT p.vec_id AS probe_id, cb.sub, cb.code,
      |         ${duckSubL2("p.embedding", "cb.cv", "cb.sub")} AS d
      |       FROM embeddings p CROSS JOIN cb WHERE p.vec_id < 3),
      |s AS (SELECT dt.probe_id, enc.vec_id,
      |        SUM(CASE WHEN dt.sub = 0 THEN d END) + SUM(CASE WHEN dt.sub = 1 THEN d END)
      |        + SUM(CASE WHEN dt.sub = 2 THEN d END) + SUM(CASE WHEN dt.sub = 3 THEN d END) AS adist
      |      FROM enc JOIN dt ON enc.sub = dt.sub AND enc.code = dt.code
      |      WHERE enc.vec_id <> dt.probe_id GROUP BY 1, 2),
      |r AS (SELECT probe_id, vec_id, adist,
      |        CAST(ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY adist, vec_id) AS BIGINT) AS rn
      |      FROM s)
      |SELECT probe_id, vec_id, adist, rn FROM r WHERE rn <= 5""".stripMargin

  // ---------------------------------------------------------------------
  // q76 — int8 scalar quantization report (operators/Quantize
  // .int8Quantize): per-vector symmetric scale, reconstruction MSE, and
  // a code checksum. floor(x+0.5) quantization on both sides (dialects
  // disagree on round()'s tie rule); all accumulation left-to-right
  // double. One narrow codegen'd projection — no shuffle at any scale.
  // ---------------------------------------------------------------------
  private def q76Int8Quantize(spark: SparkSession, dir: String): DataFrame =
    Quantize.int8Quantize(corpus(spark, dir), "vec_id", "embedding")

  private val q76QvSql: String =
    "CASE WHEN scale = 0 THEN 0.0 ELSE LEAST(127.0, GREATEST(-127.0, " +
      "FLOOR(CAST(x AS DOUBLE) / scale + 0.5))) END"

  private val q76Sql =
    s"""WITH s AS (SELECT vec_id, embedding,
      |    list_reduce(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))),
      |      (a, b) -> CASE WHEN b > a THEN b ELSE a END) / 127.0 AS scale
      |  FROM embeddings)
      |SELECT vec_id, scale,
      |  list_reduce(list_transform(embedding,
      |    x -> (CAST(x AS DOUBLE) - ($q76QvSql) * scale)
      |       * (CAST(x AS DOUBLE) - ($q76QvSql) * scale)),
      |    (x, y) -> x + y) / len(embedding) AS mse,
      |  CAST(list_reduce(list_transform(embedding, x -> CAST(($q76QvSql) AS BIGINT)),
      |    (x, y) -> x + y) AS BIGINT) AS code_sum
      |FROM s""".stripMargin

  // ---------------------------------------------------------------------
  // q77 — deterministic global curriculum order (operators/Sampling
  // .globalOrder): length-binned curriculum (bin = n_chars/500 capped at
  // 9) with a salted-hash shuffle within bins and an exact global 0-based
  // position. The oracle states the single-sort definition; the operator
  // runs the two-phase bucket-histogram form whose only unbounded-window
  // input is the bins x buckets histogram, never data rows.
  // ---------------------------------------------------------------------
  private def q77CurriculumOrder(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        least(lit(9L), floor(col("n_chars") / lit(500.0)).cast("long")).as("bin"))
    Sampling.globalOrder(docs, "doc_id", "bin")
      .select(col("doc_id"), col("bin"), col("pos"))
  }

  private val q77Sql =
    """WITH t AS (SELECT doc_id,
      |    LEAST(9, CAST(floor(n_chars / 500.0) AS BIGINT)) AS bin,
      |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':order'), 1, 8)) AS BIGINT) AS hv
      |  FROM documents)
      |SELECT doc_id, bin,
      |  CAST(ROW_NUMBER() OVER (ORDER BY bin, hv, doc_id) - 1 AS BIGINT) AS pos
      |FROM t""".stripMargin

  // ---------------------------------------------------------------------
  // q78 — PQ recall report: per-probe overlap between the ADC top-5
  // (q75's pipeline) and the exact L2 top-5 — the quality-measurement
  // side of quantized search, certified end-to-end (both rankings and
  // the overlap count reproduce in SQL). Integer-exact output.
  // ---------------------------------------------------------------------
  private def q78PqRecall(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = corpus(spark, dir)
    val p = probes(spark, dir)
    val adc = q75PqAdc(spark, dir).select(col("probe_id"), col("vec_id"))
    // the exact-L2 side broadcasts the probes under the same ENFORCED
    // maxProbes bound as knnBruteForce — an unguarded inline broadcast
    // here would OOM silently on an unbounded probe table
    val scored = c.crossJoin(
        Similarity.guardedProbeBroadcast(p, 1L << 20, "q78PqRecall"))
      .filter(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        VectorFunctions.subvector_l2(col("pe"), col("embedding"), 0).as("l2"))
    val w = Window.partitionBy(col("probe_id")).orderBy(asc("l2"), asc("vec_id"))
    val exact = scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5).select(col("probe_id"), col("vec_id"))
    val overlap = exact.join(adc, Seq("probe_id", "vec_id"))
      .groupBy(col("probe_id")).agg(count(lit(1)).as("__hit"))
    p.select(col("probe_id"))
      .join(overlap, Seq("probe_id"), "left")
      .select(col("probe_id"),
        coalesce(col("__hit"), lit(0L)).as("n_hit"),
        (coalesce(col("__hit"), lit(0L)) * 2000).as("recall_bp"))
  }

  /** Full-width left-to-right squared L2 (mirrors SubvectorL2 at offset
    * 0 with a full-length right side). */
  private def duckL2Full(a: String, b: String): String =
    s"list_reduce(list_transform(generate_series(1, len($a)), i -> " +
      s"(CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)) * " +
      s"(CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))), (x,y) -> x+y)"

  private val q78Sql =
    s"""WITH sub AS (SELECT unnest(generate_series(0, 3)) AS sub),
      |cb AS (SELECT s.sub, e.vec_id AS code, e.embedding AS cv
      |       FROM embeddings e CROSS JOIN sub s WHERE e.vec_id < 16),
      |enc AS (SELECT vec_id, sub, code FROM (
      |  SELECT x.vec_id, cb.sub, cb.code,
      |         ROW_NUMBER() OVER (PARTITION BY x.vec_id, cb.sub
      |           ORDER BY ${duckSubL2("x.embedding", "cb.cv", "cb.sub")}, cb.code) AS rn
      |  FROM embeddings x CROSS JOIN cb) WHERE rn = 1),
      |dt AS (SELECT p.vec_id AS probe_id, cb.sub, cb.code,
      |         ${duckSubL2("p.embedding", "cb.cv", "cb.sub")} AS d
      |       FROM embeddings p CROSS JOIN cb WHERE p.vec_id < 3),
      |s AS (SELECT dt.probe_id, enc.vec_id,
      |        SUM(CASE WHEN dt.sub = 0 THEN d END) + SUM(CASE WHEN dt.sub = 1 THEN d END)
      |        + SUM(CASE WHEN dt.sub = 2 THEN d END) + SUM(CASE WHEN dt.sub = 3 THEN d END) AS adist
      |      FROM enc JOIN dt ON enc.sub = dt.sub AND enc.code = dt.code
      |      WHERE enc.vec_id <> dt.probe_id GROUP BY 1, 2),
      |adc AS (SELECT probe_id, vec_id FROM (
      |  SELECT probe_id, vec_id,
      |         ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY adist, vec_id) AS rn
      |  FROM s) WHERE rn <= 5),
      |ex AS (SELECT probe_id, vec_id FROM (
      |  SELECT p.vec_id AS probe_id, e.vec_id,
      |         ROW_NUMBER() OVER (PARTITION BY p.vec_id
      |           ORDER BY ${duckL2Full("p.embedding", "e.embedding")}, e.vec_id) AS rn
      |  FROM embeddings p CROSS JOIN embeddings e
      |  WHERE p.vec_id < 3 AND e.vec_id <> p.vec_id) WHERE rn <= 5),
      |ov AS (SELECT adc.probe_id, count(*) AS c
      |       FROM adc JOIN ex ON adc.probe_id = ex.probe_id AND adc.vec_id = ex.vec_id
      |       GROUP BY 1)
      |SELECT p0.probe_id, CAST(coalesce(c, 0) AS BIGINT) AS n_hit,
      |  CAST(coalesce(c, 0) * 2000 AS BIGINT) AS recall_bp
      |FROM (SELECT vec_id AS probe_id FROM embeddings WHERE vec_id < 3) p0
      |LEFT JOIN ov USING (probe_id)""".stripMargin

  // ---------------------------------------------------------------------
  // q79 — semantic-cluster x source mix (documents ⋈ embeddings on id +
  // IVF cell assignment): which sources dominate which semantic region —
  // the cross-modal training-mix diagnostic. Shares are integer basis
  // points (exact in both dialects); the cell-total window partitions on
  // cell over per-(cell,source) aggregates, bounded by |sources|.
  // ---------------------------------------------------------------------
  private def q79ClusterSourceMix(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    val c = corpus(spark, dir)
    val cents = Similarity.collectCentroids(c.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cell"), col("embedding").as("ce")))
    val ca = c
      .withColumn("cell", Similarity.cellAssignExpr(cents, col("embedding")))
      .select(col("vec_id"), col("cell"))
    val counts = docs.join(ca, docs("doc_id") === ca("vec_id"))
      .groupBy(col("cell"), col("source")).agg(count(lit(1)).as("n_docs"))
    val wc = Window.partitionBy(col("cell"))
    counts.withColumn("__tot", sum(col("n_docs")).over(wc))
      .select(col("cell"), col("source"), col("n_docs"),
        call_function("div", col("n_docs") * lit(10000L), col("__tot"))
          .as("share_bp"))
  }

  private val q79Sql =
    s"""WITH c AS (SELECT vec_id AS cell, embedding AS ce FROM embeddings WHERE vec_id < 8),
      |ca AS (SELECT vec_id, cell FROM (
      |  SELECT e.vec_id, c.cell,
      |         ROW_NUMBER() OVER (PARTITION BY e.vec_id
      |           ORDER BY ${duckCosine("e.embedding", "ce")} DESC, c.cell) AS crn
      |  FROM embeddings e CROSS JOIN c) WHERE crn = 1),
      |n AS (SELECT cell, source, CAST(count(*) AS BIGINT) AS n_docs
      |      FROM documents d JOIN ca ON d.doc_id = ca.vec_id
      |      GROUP BY 1, 2)
      |SELECT cell, source, n_docs,
      |  CAST((n_docs * 10000) // (SUM(n_docs) OVER (PARTITION BY cell)) AS BIGINT) AS share_bp
      |FROM n""".stripMargin

  // ---------------------------------------------------------------------
  // q80 — ADC search with Lloyd-TRAINED PQ codebooks (the production
  // variant of q75; training is a bounded driver-side sample action, not
  // SQL-expressible — rows-only check, the q46 precedent). Same
  // encode/search plans; only the literal codebook differs.
  // ---------------------------------------------------------------------
  private def q80PqAdcTrained(spark: SparkSession, dir: String): DataFrame = {
    val c = corpus(spark, dir)
    val books = Quantize.pqTrainCodebooks(c, "vec_id", "embedding",
      m = 4, ksub = 16, iters = 5, sampleN = 512)
    val codes = Quantize.pqEncode(c, "vec_id", "embedding", books)
    Quantize.pqSearchAdc(codes, probes(spark, dir), k = 5, books)
  }

  // ---------------------------------------------------------------------
  // q81 — hard-negative mining (operators/Similarity.hardNegatives):
  // per-probe top-3 most-similar DIFFERENT-label vectors via the IVF
  // cell join — the batch-construction step of contrastive training.
  // Label mismatch is evaluated inside the join, before ranking.
  // ---------------------------------------------------------------------
  private def q81HardNegatives(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val c = e.select(col("vec_id"), col("embedding"), col("label"))
    val p = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"),
        col("label").as("plabel"))
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cell"), col("embedding").as("ce"))
    Similarity.hardNegatives(c, p, k = 3, cents)
  }

  private val q81Sql =
    s"""WITH c AS (SELECT vec_id AS cell, embedding AS ce FROM embeddings WHERE vec_id < 8),
      |ca AS (SELECT vec_id, embedding, label, cell FROM (
      |  SELECT e.vec_id, e.embedding, e.label, c.cell,
      |         ROW_NUMBER() OVER (PARTITION BY e.vec_id
      |           ORDER BY ${duckCosine("e.embedding", "ce")} DESC, c.cell) AS crn
      |  FROM embeddings e CROSS JOIN c) WHERE crn = 1),
      |p0 AS (SELECT vec_id AS probe_id, embedding AS pe, label AS plabel
      |       FROM embeddings WHERE vec_id < 3),
      |pa AS (SELECT probe_id, pe, plabel, cell AS pcell FROM (
      |  SELECT p0.probe_id, p0.pe, p0.plabel, c.cell,
      |         ROW_NUMBER() OVER (PARTITION BY p0.probe_id
      |           ORDER BY ${duckCosine("pe", "ce")} DESC, c.cell) AS crn
      |  FROM p0 CROSS JOIN c) WHERE crn = 1),
      |s AS (SELECT probe_id, ca.vec_id, ca.label AS neg_label,
      |        ${duckCosine("pe", "ca.embedding")} AS cosine
      |      FROM pa JOIN ca ON ca.cell = pa.pcell AND ca.vec_id <> pa.probe_id
      |        AND ca.label <> pa.plabel),
      |r AS (SELECT probe_id, vec_id, neg_label, cosine,
      |        CAST(ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cosine DESC, vec_id) AS BIGINT) AS rn
      |      FROM s)
      |SELECT probe_id, vec_id, neg_label, cosine, rn FROM r WHERE rn <= 3""".stripMargin

  // ---------------------------------------------------------------------
  // q82 — first-round BPE pair statistics (operators/CorpusStats
  // .bpePairCounts): top-20 adjacent character pairs weighted by word
  // frequency — tokenizer-training counting over the vocabulary-bounded
  // distinct-word table, global top-k via count-bit-length banding.
  // ---------------------------------------------------------------------
  private def q82BpePairs(spark: SparkSession, dir: String): DataFrame =
    CorpusStats.bpePairCounts(Tables.documents(spark, dir), "text", k = 20)

  private val q82Sql =
    """WITH w AS (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w FROM documents),
      |wc AS (SELECT w, count(*) AS c FROM w GROUP BY 1),
      |p AS (SELECT unnest(list_transform(generate_series(1, len(w) - 1), i -> substr(w, i, 2))) AS pair, c
      |      FROM wc WHERE len(w) >= 2),
      |g AS (SELECT pair, CAST(sum(c) AS BIGINT) AS n_occ FROM p GROUP BY 1),
      |r AS (SELECT pair, n_occ,
      |        CAST(ROW_NUMBER() OVER (ORDER BY n_occ DESC, pair) AS BIGINT) AS rk
      |      FROM g)
      |SELECT pair, n_occ, rk FROM r WHERE rk <= 20""".stripMargin

  // ---------------------------------------------------------------------
  // q83 — two-stage quantized retrieval (operators/Quantize
  // .pqSearchRefined): ADC top-20 shortlist, then exact L2 re-rank of
  // ONLY those 20 per probe — recall recovery with a bounded
  // full-precision read (|probes| x 20 rows, broadcast against the
  // scan). QuantizeSpec measures the recall gain over raw ADC (q78).
  // ---------------------------------------------------------------------
  private def q83PqRefine(spark: SparkSession, dir: String): DataFrame = {
    val c = corpus(spark, dir)
    val books = Quantize.pqCodebooks(c, "vec_id", "embedding", m = 4, ksub = 16)
    val codes = Quantize.pqEncode(c, "vec_id", "embedding", books)
    Quantize.pqSearchRefined(codes, c, probes(spark, dir),
      shortlistK = 20, k = 5, books)
  }

  private val q83Sql =
    s"""WITH sub AS (SELECT unnest(generate_series(0, 3)) AS sub),
      |cb AS (SELECT s.sub, e.vec_id AS code, e.embedding AS cv
      |       FROM embeddings e CROSS JOIN sub s WHERE e.vec_id < 16),
      |enc AS (SELECT vec_id, sub, code FROM (
      |  SELECT x.vec_id, cb.sub, cb.code,
      |         ROW_NUMBER() OVER (PARTITION BY x.vec_id, cb.sub
      |           ORDER BY ${duckSubL2("x.embedding", "cb.cv", "cb.sub")}, cb.code) AS rn
      |  FROM embeddings x CROSS JOIN cb) WHERE rn = 1),
      |dt AS (SELECT p.vec_id AS probe_id, cb.sub, cb.code,
      |         ${duckSubL2("p.embedding", "cb.cv", "cb.sub")} AS d
      |       FROM embeddings p CROSS JOIN cb WHERE p.vec_id < 3),
      |s AS (SELECT dt.probe_id, enc.vec_id,
      |        SUM(CASE WHEN dt.sub = 0 THEN d END) + SUM(CASE WHEN dt.sub = 1 THEN d END)
      |        + SUM(CASE WHEN dt.sub = 2 THEN d END) + SUM(CASE WHEN dt.sub = 3 THEN d END) AS adist
      |      FROM enc JOIN dt ON enc.sub = dt.sub AND enc.code = dt.code
      |      WHERE enc.vec_id <> dt.probe_id GROUP BY 1, 2),
      |sl AS (SELECT probe_id, vec_id FROM (
      |  SELECT probe_id, vec_id,
      |         ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY adist, vec_id) AS rn
      |  FROM s) WHERE rn <= 20),
      |rf AS (SELECT sl.probe_id, sl.vec_id,
      |         ${duckL2Full("p.embedding", "e.embedding")} AS l2
      |       FROM sl JOIN embeddings p ON p.vec_id = sl.probe_id
      |            JOIN embeddings e ON e.vec_id = sl.vec_id),
      |r AS (SELECT probe_id, vec_id, l2,
      |        CAST(ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY l2, vec_id) AS BIGINT) AS rn
      |      FROM rf)
      |SELECT probe_id, vec_id, l2, rn FROM r WHERE rn <= 5""".stripMargin

  // ---------------------------------------------------------------------
  // q84 — cross-modal manifest: the corpus that survives BOTH text-side
  // transitive near-dup collapse (q52's connected-components keepers)
  // AND embedding-side semantic dedup (q74's SemDeDup keepers), joined
  // on doc_id = vec_id. One oracle certifies the recursive-CTE closure,
  // the IVF assignment, the within-cell pair search, and the join
  // end-to-end — the "text dedup alone is not enough" curation step.
  // ---------------------------------------------------------------------
  private def q84CrossModalManifest(spark: SparkSession, dir: String): DataFrame = {
    val textKeep = q52TransitiveDedupKeep(spark, dir)
    val semKeep = q74SemanticDedup(spark, dir)
      .filter(col("keep")).select(col("vec_id").as("doc_id"))
    textKeep.join(semKeep, Seq("doc_id"))
  }

  private val q84Sql =
    s"""$q48Closure,
      |tkeep AS (SELECT v AS doc_id FROM r GROUP BY v HAVING v = MIN(l)),
      |cc AS (SELECT vec_id AS cell, embedding AS ce FROM embeddings WHERE vec_id < 8),
      |ca2 AS (SELECT vec_id, embedding, cell FROM (
      |  SELECT e2.vec_id, e2.embedding, cc.cell,
      |         ROW_NUMBER() OVER (PARTITION BY e2.vec_id
      |           ORDER BY ${duckCosine("e2.embedding", "ce")} DESC, cc.cell) AS crn
      |  FROM embeddings e2 CROSS JOIN cc) WHERE crn = 1),
      |sdup AS (SELECT DISTINCT b.vec_id FROM ca2 a JOIN ca2 b
      |         ON a.cell = b.cell AND a.vec_id < b.vec_id
      |         WHERE ${duckCosine("a.embedding", "b.embedding")} >= 0.4)
      |SELECT tkeep.doc_id FROM tkeep
      |JOIN ca2 ON ca2.vec_id = tkeep.doc_id
      |LEFT JOIN sdup ON sdup.vec_id = tkeep.doc_id
      |WHERE sdup.vec_id IS NULL""".stripMargin

  // ---------------------------------------------------------------------
  // q85 — incremental semantic dedup (operators/Similarity
  // .semanticDedupIncremental): which batch embeddings already have a
  // semantic near-dup in the corpus — the embedding-side sibling of
  // q61/q68's text-side delta probe. Batch side broadcasts; the corpus
  // never shuffles and never self-joins.
  // ---------------------------------------------------------------------
  private def q85IncrementalSemanticDedup(spark: SparkSession, dir: String): DataFrame = {
    val e = corpus(spark, dir)
    val slice = pmod(Dedup.baseHash32(col("vec_id").cast("string")), lit(10))
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cell"), col("embedding").as("ce"))
    Similarity.semanticDedupIncremental(
      corpus = e.filter(slice =!= 0), batch = e.filter(slice === 0),
      cents = cents, threshold = 0.35)
  }

  private val q85Sql =
    s"""WITH c AS (SELECT vec_id AS cell, embedding AS ce FROM embeddings WHERE vec_id < 8),
      |a AS (SELECT vec_id, embedding,
      |        CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10 AS sl
      |      FROM embeddings),
      |ca AS (SELECT vec_id, embedding, cell FROM (
      |  SELECT a.vec_id, a.embedding, c.cell,
      |         ROW_NUMBER() OVER (PARTITION BY a.vec_id
      |           ORDER BY ${duckCosine("a.embedding", "ce")} DESC, c.cell) AS crn
      |  FROM a CROSS JOIN c WHERE a.sl <> 0) WHERE crn = 1),
      |ba AS (SELECT vec_id, embedding, cell FROM (
      |  SELECT a.vec_id, a.embedding, c.cell,
      |         ROW_NUMBER() OVER (PARTITION BY a.vec_id
      |           ORDER BY ${duckCosine("a.embedding", "ce")} DESC, c.cell) AS crn
      |  FROM a CROSS JOIN c WHERE a.sl = 0) WHERE crn = 1)
      |SELECT vec_id, dup_of, cosine FROM (
      |  SELECT ba.vec_id, ca.vec_id AS dup_of,
      |         ${duckCosine("ba.embedding", "ca.embedding")} AS cosine
      |  FROM ca JOIN ba ON ca.cell = ba.cell)
      |WHERE cosine >= 0.35""".stripMargin

  // ---------------------------------------------------------------------
  // q86 — tokenizer vocabulary build (operators/CorpusStats.buildVocab):
  // frequency-filtered tokens with contiguous frequency-ranked ids —
  // the vocab artifact every tokenizer assumes, computed as the banded
  // two-phase global rank (no global sort; nothing collected).
  // ---------------------------------------------------------------------
  private def q86BuildVocab(spark: SparkSession, dir: String): DataFrame =
    CorpusStats.buildVocab(Tables.documents(spark, dir), "text", minCount = 5L)

  private val q86Sql =
    """WITH t AS (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok FROM documents),
      |c AS (SELECT tok, CAST(count(*) AS BIGINT) AS n_occ FROM t GROUP BY 1 HAVING count(*) >= 5)
      |SELECT tok AS token, n_occ,
      |  CAST(ROW_NUMBER() OVER (ORDER BY n_occ DESC, tok) - 1 AS BIGINT) AS token_id
      |FROM c""".stripMargin

  // ---------------------------------------------------------------------
  // q87 — top-N-by-score per group (operators/Sampling
  // .topPerGroupByScore): the 10 longest documents per source (long-
  // context mining) — score-ordered sibling of q53's hash cap, banded by
  // score bit length so no full-group window ever forms.
  // ---------------------------------------------------------------------
  private def q87LongestPerSource(spark: SparkSession, dir: String): DataFrame =
    Sampling.topPerGroupByScore(
      Tables.documents(spark, dir).select(col("doc_id"), col("source"), col("n_chars")),
      "doc_id", "source", "n_chars", n = 10)

  private val q87Sql =
    """SELECT doc_id, source, n_chars FROM (
      |  SELECT doc_id, source, n_chars,
      |         ROW_NUMBER() OVER (PARTITION BY source
      |           ORDER BY n_chars DESC, doc_id) AS rk
      |  FROM documents)
      |WHERE rk <= 10""".stripMargin

  // ---------------------------------------------------------------------
  // q88 — fuzzy decontamination (operators/Scrub.fuzzyDecontaminate):
  // train docs within 30% edit distance of an eval doc, candidates
  // blocked by shared 5-gram shingles — catches paraphrased eval leaks
  // that q56's exact shingle overlap underweights. levenshtein has
  // identical integer semantics in both engines, so the oracle
  // certifies the distances themselves. The blocking stage runs with
  // the viral-shingle df cap ON (>10% of train docs, the q91-q93
  // convention) and the oracle applies the IDENTICAL cap, so the
  // hash also certifies the capped candidate universe.
  // ---------------------------------------------------------------------
  private def q88FuzzyDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    Scrub.fuzzyDecontaminate(
      train = docs.filter(col("source") =!= "src0"),
      eval = docs.filter(col("source") === "src0"),
      idCol = "doc_id", textCol = "text", n = 5, maxDistBp = 3000L,
      maxShingleDfFrac = 0.1)
  }

  private val q88Sql =
    """WITH t AS (SELECT doc_id, source, text, list_filter(string_split(text,' '), x -> x <> '') AS tk FROM documents),
      |sh AS (SELECT DISTINCT doc_id, source, sg FROM (
      |  SELECT doc_id, source, unnest(CASE WHEN len(tk) >= 5
      |    THEN list_transform(generate_series(1, len(tk)-4),
      |           i -> tk[i]||' '||tk[i+1]||' '||tk[i+2]||' '||tk[i+3]||' '||tk[i+4])
      |    ELSE [] END) AS sg FROM t)),
      |ev AS (SELECT doc_id AS eval_id, sg FROM sh WHERE source = 'src0'),
      |tr AS (SELECT doc_id, sg FROM sh WHERE source <> 'src0'),
      |nt AS (SELECT COUNT(DISTINCT doc_id) AS n FROM documents WHERE source <> 'src0'),
      |viral AS (SELECT sg FROM tr GROUP BY sg
      |          HAVING COUNT(*) > (SELECT ceil(n * 0.1) FROM nt)),
      |trc AS (SELECT doc_id, sg FROM tr WHERE sg NOT IN (SELECT sg FROM viral)),
      |cand AS (SELECT DISTINCT s.doc_id, e.eval_id
      |         FROM trc s JOIN ev e USING (sg)),
      |d AS (SELECT c.doc_id, c.eval_id,
      |        CAST(levenshtein(a.text, b.text) AS BIGINT) AS lev,
      |        CAST(floor(levenshtein(a.text, b.text) * 10000 /
      |          greatest(len(a.text), len(b.text))) AS BIGINT) AS dist_bp
      |      FROM cand c JOIN documents a ON a.doc_id = c.doc_id
      |                  JOIN documents b ON b.doc_id = c.eval_id)
      |SELECT doc_id, eval_id, lev, dist_bp FROM d WHERE dist_bp <= 3000""".stripMargin

  // ---------------------------------------------------------------------
  // q89 — per-source length percentiles (operators/Percentiles.byRank,
  // the generalized q32/q47 engine on the curation domain): the
  // data-card length-distribution stat per source, exact nearest-rank
  // over a (source, n_chars) histogram — no per-row window, no sort.
  // ---------------------------------------------------------------------
  private def q89LengthPercentiles(spark: SparkSession, dir: String): DataFrame =
    Percentiles.byRank(Tables.documents(spark, dir), "source", "n_chars",
      Seq("p25_chars" -> 0.25, "p50_chars" -> 0.5,
        "p75_chars" -> 0.75, "p95_chars" -> 0.95))

  private val q89Sql =
    """WITH r AS (SELECT source, n_chars,
      |        ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars) AS rn,
      |        COUNT(*) OVER (PARTITION BY source) AS n
      |      FROM documents WHERE n_chars IS NOT NULL)
      |SELECT source,
      |  MIN(CASE WHEN rn = CAST(floor((n-1) * 0.25) AS BIGINT) + 1 THEN n_chars END) AS p25_chars,
      |  MIN(CASE WHEN rn = CAST(floor((n-1) * 0.5) AS BIGINT) + 1 THEN n_chars END) AS p50_chars,
      |  MIN(CASE WHEN rn = CAST(floor((n-1) * 0.75) AS BIGINT) + 1 THEN n_chars END) AS p75_chars,
      |  MIN(CASE WHEN rn = CAST(floor((n-1) * 0.95) AS BIGINT) + 1 THEN n_chars END) AS p95_chars,
      |  CAST(MAX(n) AS BIGINT) AS n_rows
      |FROM r GROUP BY source""".stripMargin

  // ---------------------------------------------------------------------
  // q90 — vocabulary encode (operators/CorpusStats.encodeWithVocab):
  // q86's vocab applied back to the corpus — per-doc token/OOV counts
  // and an id-sum checksum that pins the id assignments end-to-end
  // (build + encode certified by one oracle). Vocabulary flows through
  // the token-keyed join, never broadcast.
  // ---------------------------------------------------------------------
  private def q90VocabEncode(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    CorpusStats.encodeWithVocab(docs, "doc_id", "text",
      CorpusStats.buildVocab(docs, "text", minCount = 5L))
  }

  private val q90Sql =
    """WITH t AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok FROM documents),
      |c AS (SELECT tok, count(*) AS n_occ FROM t GROUP BY 1 HAVING count(*) >= 5),
      |v AS (SELECT tok, CAST(ROW_NUMBER() OVER (ORDER BY n_occ DESC, tok) - 1 AS BIGINT) AS token_id FROM c)
      |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
      |  CAST(sum(CASE WHEN v.token_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
      |  CAST(sum(coalesce(v.token_id, 0)) AS BIGINT) AS id_sum
      |FROM t LEFT JOIN v USING (tok)
      |GROUP BY t.doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q91 — split-leakage report: near-duplicate pairs (q21's inverted-
  // index Jaccard) that STRADDLE a q62 split boundary — a near-dup of a
  // held-out document sitting in train is eval contamination that
  // document-level dedup alone won't surface if the pipeline splits
  // before deduplicating. Composes the pair operator with the split
  // labels; one oracle certifies pairs + labels + the straddle filter.
  // ---------------------------------------------------------------------
  private def q91SplitLeakage(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      n = 3, threshold = 0.5, maxShingleDfFrac = 0.1)
    // labels computed ONCE PER DOC and joined ABOVE the pair
    // aggregation — inlining the md5 label expression on doc_a/doc_b
    // lets Catalyst push the straddle filter below the aggregate onto
    // the raw shingle-match rows, evaluating two md5s on tens of
    // millions of candidates instead of thousands of docs (measured
    // 6.9 s -> 0.9 s at sf0.1; same rows, same oracle). The label side
    // is deliberately NOT hint-broadcast: it is one row per document,
    // which at corpus scale is a table, not a literal — AQE broadcasts
    // the post-aggregation pair side (tiny) instead.
    val labels = docs.select(col("doc_id"),
      Sampling.splitLabel(col("doc_id"),
        Seq("val" -> 10, "test" -> 10), rest = "train").as("split"))
    pairs
      .join(labels.select(col("doc_id").as("doc_a"),
        col("split").as("split_a")), Seq("doc_a"))
      .join(labels.select(col("doc_id").as("doc_b"),
        col("split").as("split_b")), Seq("doc_b"))
      .filter(col("split_a") =!= col("split_b"))
      .select(col("doc_a"), col("doc_b"), col("jaccard"),
        col("split_a"), col("split_b"))
  }

  private val q91Sql =
    s"""WITH $q21PairCtes,
      |p AS (SELECT x AS doc_a, y AS doc_b, c*1.0/(sa.s + sb.s - c) AS jaccard
      |      $q21PairJoin),
      |l AS (SELECT doc_a, doc_b, jaccard,
      |        CAST(('0x' || substr(md5(CAST(doc_a AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS ha,
      |        CAST(('0x' || substr(md5(CAST(doc_b AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS hb
      |      FROM p)
      |SELECT doc_a, doc_b, jaccard,
      |  CASE WHEN ha < 10 THEN 'val' WHEN ha < 20 THEN 'test' ELSE 'train' END AS split_a,
      |  CASE WHEN hb < 10 THEN 'val' WHEN hb < 20 THEN 'test' ELSE 'train' END AS split_b
      |FROM l
      |WHERE (CASE WHEN ha < 10 THEN 'val' WHEN ha < 20 THEN 'test' ELSE 'train' END)
      |   <> (CASE WHEN hb < 10 THEN 'val' WHEN hb < 20 THEN 'test' ELSE 'train' END)""".stripMargin

  // ---------------------------------------------------------------------
  // q92 — near-dup degree report: per document, how many near-duplicate
  // partners it has in the q21 pair graph (0 for most) — the dedup
  // diagnostic that separates a one-off copy from a template family
  // (high-degree nodes are boilerplate hubs; they also predict CC
  // fixpoint cost). Degree aggregation runs over the tiny pair set.
  // ---------------------------------------------------------------------
  private def q92DupDegree(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      n = 3, threshold = 0.5, maxShingleDfFrac = 0.1)
    val deg = pairs
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("degree"))
    docs.select(col("doc_id")).join(deg, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("degree"), lit(0L)).as("degree"))
  }

  private val q92Sql =
    s"""WITH $q21PairCtes,
      |p AS (SELECT x, y
      |      $q21PairJoin),
      |d AS (SELECT v AS doc_id, CAST(count(*) AS BIGINT) AS degree FROM (
      |        SELECT x AS v FROM p UNION ALL SELECT y AS v FROM p) GROUP BY 1)
      |SELECT doc_id, CAST(coalesce(degree, 0) AS BIGINT) AS degree
      |FROM documents LEFT JOIN d USING (doc_id)""".stripMargin

  // ---------------------------------------------------------------------
  // q93 — per-source dedup-rate report: what fraction of each source's
  // documents has at least one near-dup partner anywhere in the corpus
  // (integer basis points) — the "which feed is recycling content"
  // curation summary. Duplicated-id set and source labels both join
  // ABOVE the pair aggregation (the q91 lesson).
  // ---------------------------------------------------------------------
  private def q93SourceDupRate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      n = 3, threshold = 0.5, maxShingleDfFrac = 0.1)
    val dup = pairs
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
      .distinct().withColumn("__isdup", lit(1L))
    docs.select(col("doc_id"), col("source"))
      .join(dup, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("__isdup"), lit(0L))).as("n_dup"))
      .select(col("source"), col("n_docs"), col("n_dup"),
        floor(col("n_dup") * 10000 / col("n_docs")).cast("long").as("dup_bp"))
  }

  private val q93Sql =
    s"""WITH $q21PairCtes,
      |p AS (SELECT x, y
      |      $q21PairJoin),
      |d AS (SELECT DISTINCT v AS doc_id FROM (
      |        SELECT x AS v FROM p UNION ALL SELECT y AS v FROM p)),
      |j AS (SELECT source, documents.doc_id,
      |        CASE WHEN d.doc_id IS NULL THEN 0 ELSE 1 END AS isdup
      |      FROM documents LEFT JOIN d ON documents.doc_id = d.doc_id)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(isdup) AS BIGINT) AS n_dup,
      |  CAST(floor(sum(isdup) * 10000 / count(*)) AS BIGINT) AS dup_bp
      |FROM j GROUP BY source""".stripMargin

  // ---------------------------------------------------------------------
  // q94 — Zipf band histogram: token types and occurrence mass per
  // frequency bit-length band — the corpus-health sketch (a healthy
  // natural-language corpus shows the Zipf staircase; a synthetic or
  // template-heavy one shows a spike). Integer-exact: the band is the
  // binary-string length of the count in both dialects.
  // ---------------------------------------------------------------------
  private def q94ZipfBands(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("f"))
      .groupBy(length(bin(col("f"))).cast("long").as("freq_bits"))
      .agg(count(lit(1)).as("n_token_types"), sum(col("f")).as("total_occurrences"))

  private val q94Sql =
    """WITH t AS (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok FROM documents),
      |c AS (SELECT tok, count(*) AS f FROM t GROUP BY 1)
      |SELECT CAST(length(bin(f)) AS BIGINT) AS freq_bits,
      |  CAST(count(*) AS BIGINT) AS n_token_types,
      |  CAST(sum(f) AS BIGINT) AS total_occurrences
      |FROM c GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // q95 — document novelty: the share of a document's distinct 3-gram
  // shingles that appear in NO other document (integer basis points) —
  // the informativeness signal dual to q73's boilerplate report (df-1
  // shingles are this document's unique content). One shingle-keyed df
  // aggregation + one per-doc aggregation; hashes shuffle, never text.
  // ---------------------------------------------------------------------
  private def q95Novelty(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val sh = docs
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("__tk"))
      .select(col("doc_id"),
        explode(TextAnalysis.shinglesOfTokens(col("__tk"), 3)).as("sg"))
      .select(col("doc_id"), xxhash64(col("sg")).as("h"))
      .distinct()
    val dfreq = sh.groupBy(col("h")).agg(count(lit(1)).as("__df"))
    sh.join(dfreq, "h")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("__df") === 1, 1L).otherwise(0L)).as("n_unique"))
      .select(col("doc_id"), col("n_shingles"), col("n_unique"),
        floor(col("n_unique") * 10000 / col("n_shingles")).cast("long")
          .as("novelty_bp"))
  }

  private val q95Sql =
    """WITH t AS (SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS tk FROM documents),
      |sh AS (SELECT DISTINCT doc_id, sg FROM (
      |  SELECT doc_id, unnest(CASE WHEN len(tk) >= 3
      |    THEN list_transform(generate_series(1, len(tk)-2), i -> tk[i]||' '||tk[i+1]||' '||tk[i+2])
      |    ELSE [] END) AS sg FROM t)),
      |d AS (SELECT sg, count(*) AS df FROM sh GROUP BY 1)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
      |  CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
      |  CAST(floor(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) * 10000 / count(*)) AS BIGINT) AS novelty_bp
      |FROM sh JOIN d USING (sg) GROUP BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q96 — duplicate-cluster size histogram: how many q48 components
  // have 1, 2, 3... members — the one-line answer to "is duplication a
  // few giant template families or many small copies", which decides
  // between span removal (q72) and doc dropping (q52). Two tiny
  // aggregations over the component labels.
  // ---------------------------------------------------------------------
  private def q96ClusterSizes(spark: SparkSession, dir: String): DataFrame =
    q48DedupClusters(spark, dir)
      .groupBy(col("component")).agg(count(lit(1)).as("sz"))
      .groupBy(col("sz").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))

  private val q96Sql =
    s"""$q48Closure,
      |m AS (SELECT v AS doc_id, MIN(l) AS component FROM r GROUP BY v),
      |s AS (SELECT component, CAST(count(*) AS BIGINT) AS cluster_size
      |      FROM m GROUP BY 1)
      |SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
      |FROM s GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // q97 — per-source rarity percentiles: the Percentiles engine applied
  // to q58's integer rarity score keyed by source — "which feeds skew
  // gibberish-heavy" as exact distribution stats, not means. Composes
  // two operators; one oracle certifies the whole chain.
  // ---------------------------------------------------------------------
  private def q97SourceRarityPercentiles(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val rare = CorpusStats.rareTokenStats(docs, "doc_id", "text", rareBelow = 10L)
    val withSource = rare.join(docs.select(col("doc_id"), col("source")), "doc_id")
    Percentiles.byRank(withSource, "source", "rare_bp",
      Seq("p50_rare_bp" -> 0.5, "p95_rare_bp" -> 0.95))
  }

  private val q97Sql =
    """WITH toks AS (SELECT doc_id, unnest(list_filter(string_split(text,' '), x -> x <> '')) AS tok
      |              FROM documents),
      |cf AS (SELECT tok, COUNT(*) AS cf FROM toks GROUP BY 1),
      |rb AS (SELECT doc_id,
      |         CAST(FLOOR(SUM(CASE WHEN cf < 10 THEN 1 ELSE 0 END) * 10000 / COUNT(*)) AS BIGINT) AS rare_bp
      |       FROM toks JOIN cf USING (tok) GROUP BY doc_id),
      |j AS (SELECT d.source, rb.rare_bp FROM rb JOIN documents d USING (doc_id)),
      |r AS (SELECT source, rare_bp,
      |        ROW_NUMBER() OVER (PARTITION BY source ORDER BY rare_bp) AS rn,
      |        COUNT(*) OVER (PARTITION BY source) AS n
      |      FROM j)
      |SELECT source,
      |  MIN(CASE WHEN rn = CAST(floor((n-1) * 0.5) AS BIGINT) + 1 THEN rare_bp END) AS p50_rare_bp,
      |  MIN(CASE WHEN rn = CAST(floor((n-1) * 0.95) AS BIGINT) + 1 THEN rare_bp END) AS p95_rare_bp,
      |  CAST(MAX(n) AS BIGINT) AS n_rows
      |FROM r GROUP BY source""".stripMargin

  // ---------------------------------------------------------------------
  // q98 — PII audit rollup by source (q54's planted-pattern counts
  // aggregated per feed): the compliance summary a scrub pass reports —
  // which sources carry the PII burden. One map-side-combined
  // aggregation over codegen'd regex counts.
  // ---------------------------------------------------------------------
  private def q98PiiBySource(spark: SparkSession, dir: String): DataFrame = {
    val counts = Scrub.piiCounts(plantedPii).map { case (n, c) => c.as(n) }
    Tables.documents(spark, dir)
      .select(Seq(col("source")) ++ counts: _*)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_emails")).as("total_emails"),
        sum(col("n_ipv4")).as("total_ipv4"),
        sum(col("n_phones")).as("total_phones"))
  }

  private val q98Sql =
    s"""WITH p AS (SELECT source,
      |  $plantedPiiSql
      |  FROM documents)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(len(regexp_extract_all(t, '${Scrub.EmailPattern}'))) AS BIGINT) AS total_emails,
      |  CAST(sum(len(regexp_extract_all(t, '${Scrub.Ipv4Pattern}'))) AS BIGINT) AS total_ipv4,
      |  CAST(sum(len(regexp_extract_all(t, '${Scrub.PhonePattern}'))) AS BIGINT) AS total_phones
      |FROM p GROUP BY source""".stripMargin

  // ---------------------------------------------------------------------
  // q99 — bucketed length percentiles (operators/Percentiles.byRank with
  // the `bucket` knob): q89's per-source length distribution with values
  // floored into 64-char buckets BEFORE the histogram — the bounded-state
  // path for unbounded domains (state per key = distinct BUCKETS, not
  // distinct values; the q47 latency-ms pattern applied to lengths).
  // Percentiles land on bucket boundaries, a documented resolution
  // trade; q89 (exact) is unchanged.
  // ---------------------------------------------------------------------
  private def q99LengthPercentilesBucketed(spark: SparkSession, dir: String): DataFrame =
    Percentiles.byRank(Tables.documents(spark, dir), "source", "n_chars",
      Seq("p25_bucket" -> 0.25, "p50_bucket" -> 0.5,
        "p75_bucket" -> 0.75, "p95_bucket" -> 0.95), bucket = 64L)

  private val q99Sql =
    """WITH b AS (SELECT source,
      |        CAST(floor(n_chars / 64) * 64 AS BIGINT) AS v
      |      FROM documents WHERE n_chars IS NOT NULL),
      |r AS (SELECT source, v,
      |        ROW_NUMBER() OVER (PARTITION BY source ORDER BY v) AS rn,
      |        COUNT(*) OVER (PARTITION BY source) AS n
      |      FROM b)
      |SELECT source,
      |  MIN(CASE WHEN rn = CAST(floor((n-1) * 0.25) AS BIGINT) + 1 THEN v END) AS p25_bucket,
      |  MIN(CASE WHEN rn = CAST(floor((n-1) * 0.5) AS BIGINT) + 1 THEN v END) AS p50_bucket,
      |  MIN(CASE WHEN rn = CAST(floor((n-1) * 0.75) AS BIGINT) + 1 THEN v END) AS p75_bucket,
      |  MIN(CASE WHEN rn = CAST(floor((n-1) * 0.95) AS BIGINT) + 1 THEN v END) AS p95_bucket,
      |  CAST(MAX(n) AS BIGINT) AS n_rows
      |FROM r GROUP BY source""".stripMargin

  // ---------------------------------------------------------------------
  // q100 — composite quality filter (operators/TextAnalysis.qualityGate):
  // the C4/Gopher-style curation gate as ONE integer-exact scan-level
  // predicate — length band, duplicate-token and top-token repetition
  // caps, stopword floor, all cross-multiplied (no float division), so
  // the entire pipeline is a single pushed-down filter over one scan
  // (no shuffle, no join; the plan audit pins filter-at-scan).
  // ---------------------------------------------------------------------
  private def q100QualityFilter(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("__tk", TextAnalysis.tokens(col("text")))
      .filter(TextAnalysis.qualityGate(col("__tk"), minTokens = 20, maxTokens = 2000))
      .select(col("doc_id"), col("source"),
        size(col("__tk")).cast("long").as("n_tokens"))

  private val q100Sql =
    """WITH t AS (SELECT doc_id, source, list_filter(string_split(text,' '), x -> x <> '') AS tk FROM documents),
      |m AS (SELECT doc_id, source, len(tk) AS n, len(list_distinct(tk)) AS d,
      |        list_aggregate(list_transform(list_distinct(tk),
      |          u -> len(list_filter(tk, x -> x = u))), 'max') AS mx,
      |        len(list_filter(tk, x -> x IN ('the','and','of','to','in','a','is'))) AS stop
      |      FROM t)
      |SELECT doc_id, source, CAST(n AS BIGINT) AS n_tokens
      |FROM m
      |WHERE n >= 20 AND n <= 2000
      |  AND (n - d) * 10 < n * 6
      |  AND mx * 100 < n * 12
      |  AND stop * 20 >= n""".stripMargin

  // ---------------------------------------------------------------------
  // q101 — leakage-free splitting: train/val/test assignment hashed on
  // the q48 dedup-cluster COMPONENT instead of the document id, so every
  // near-duplicate chain lands in one split BY CONSTRUCTION — the
  // preventive counterpart of the q91 straddle report (which measures
  // exactly the leakage a per-doc split admits). Singleton components
  // (component = own id) hash identically to q62's per-doc split, so
  // only duplicate clusters move. Cost is the q48 fixpoint + one hash
  // projection; no additional shuffle beyond the closure itself.
  // ---------------------------------------------------------------------
  private def q101ClusterSplit(spark: SparkSession, dir: String): DataFrame =
    q48DedupClusters(spark, dir)
      .select(col("doc_id"),
        Sampling.splitLabel(col("component"),
          Seq("val" -> 10, "test" -> 10), rest = "train").as("split"))

  private val q101Sql =
    s"""$q48Closure,
      |comp AS (SELECT v AS doc_id, MIN(l) AS component FROM r GROUP BY v),
      |h AS (SELECT doc_id,
      |        CAST(('0x' || substr(md5(CAST(component AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS hv
      |      FROM comp)
      |SELECT doc_id,
      |  CASE WHEN hv < 10 THEN 'val' WHEN hv < 20 THEN 'test' ELSE 'train' END AS split
      |FROM h""".stripMargin

  // ---------------------------------------------------------------------
  // q102/q103 — REAL media codecs (operators/MediaCodec): PNG IHDR with
  // CRC verification, JPEG marker-segment walk to SOF0, WAV RIFF chunk
  // walk — replacing the synthetic GRFT container (q29–q31, kept as the
  // plumbing oracle) with parsers valid on any real file of these
  // formats. The encoder builds real format bytes deterministically
  // from (doc_id, text) and corrupts every 37th row format-specifically
  // (CRC flip / truncation / bad form type); the oracle recomputes every
  // header field and exact container byte count from doc_id + strlen —
  // a drift anywhere in the 3 binary layouts breaks the hash. q103 is
  // the decode-audit ledger: corrupt rows are dropped WITH a count,
  // never silently.
  // ---------------------------------------------------------------------
  private def realMediaOf(spark: SparkSession, dir: String) =
    MediaCodec.attachMedia(Tables.documents(spark, dir))

  private def q102MediaCodec(spark: SparkSession, dir: String): DataFrame =
    MediaCodec.extractMetadata(realMediaOf(spark, dir)).toDF()

  private val q102Sql =
    """WITH d AS (SELECT doc_id, strlen(text) AS pl FROM documents
      |           WHERE doc_id % 37 <> 0)
      |SELECT doc_id,
      |  CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'wav' END AS format,
      |  CAST(CASE doc_id % 3 WHEN 0 THEN 64 + doc_id % 1024
      |                       WHEN 1 THEN 64 + (doc_id * 5) % 1024 END AS INTEGER) AS width,
      |  CAST(CASE doc_id % 3 WHEN 0 THEN 64 + (doc_id * 7) % 768
      |                       WHEN 1 THEN 64 + (doc_id * 3) % 1024 END AS INTEGER) AS height,
      |  CAST(CASE doc_id % 3 WHEN 0 THEN 8 + 8 * (doc_id % 2)
      |                       WHEN 1 THEN 8 ELSE 16 END AS INTEGER) AS bit_depth,
      |  CAST(CASE doc_id % 3 WHEN 2 THEN 1 + doc_id % 2 ELSE 3 END AS INTEGER) AS channels,
      |  CAST(CASE doc_id % 3 WHEN 2 THEN
      |         CASE (doc_id // 3) % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000 ELSE 32000 END
      |       END AS INTEGER) AS sample_rate,
      |  CAST(CASE doc_id % 3 WHEN 2 THEN (pl * 1000) //
      |         ((CASE (doc_id // 3) % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000 ELSE 32000 END)
      |          * (1 + doc_id % 2) * 2)
      |       END AS BIGINT) AS duration_ms,
      |  CAST(CASE doc_id % 3 WHEN 0 THEN 57 + pl WHEN 1 THEN 45 + pl
      |       ELSE 44 + pl + pl % 2 END AS BIGINT) AS n_bytes
      |FROM d""".stripMargin

  private def q103MediaAudit(spark: SparkSession, dir: String): DataFrame =
    MediaCodec.audit(realMediaOf(spark, dir))

  private val q103Sql =
    """WITH s AS (SELECT
      |    CASE WHEN doc_id % 37 = 0 THEN 'corrupt'
      |         WHEN doc_id % 3 = 0 THEN 'png'
      |         WHEN doc_id % 3 = 1 THEN 'jpeg' ELSE 'wav' END AS status,
      |    CASE WHEN doc_id % 37 = 0 AND doc_id % 3 = 1 THEN 10
      |         WHEN doc_id % 3 = 0 THEN 57 + strlen(text)
      |         WHEN doc_id % 3 = 1 THEN 45 + strlen(text)
      |         ELSE 44 + strlen(text) + strlen(text) % 2 END AS len
      |  FROM documents)
      |SELECT status, count(*) AS n_docs, CAST(sum(len) AS BIGINT) AS n_bytes
      |FROM s GROUP BY status""".stripMargin

  // ---------------------------------------------------------------------
  // q104 — model-based quality score (TextAnalysis.bowScore): the
  // CCNet/GPT-3-style hashed bag-of-words linear classifier as a pure
  // scan-level expression — fixed-point literal weights, feature-hashed
  // token buckets, integer-exact banding by cross-multiplication (the
  // q100 discipline). The oracle interpolates the SAME Scala weight
  // list into its SQL, so the two sides cannot drift. Plan: one scan,
  // no shuffle/join (pinned in PlanAuditSpec).
  // ---------------------------------------------------------------------

  /** Fixed-point (×1000) weights for the q104 hashed BoW quality model,
    * 32 buckets — stands in for an offline-trained linear model shipped
    * with the job as a literal. */
  private val BowWeights: Seq[Int] = Seq(
    312, -184, 77, -451, 208, 129, -63, 540,
    -291, 18, 344, -127, 92, -385, 461, -22,
    153, -509, 276, 64, -148, 398, -236, 11,
    487, -73, 329, -412, 188, -57, 243, -316)

  private def q104BowQuality(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("__tk", TextAnalysis.tokens(col("text")))
      .select(col("doc_id"),
        size(col("__tk")).cast("long").as("n_tokens"),
        TextAnalysis.bowScore(col("__tk"), BowWeights).as("score"))
      .withColumn("label",
        when(col("score") >= col("n_tokens") * 100, "high")
          .when(col("score") < col("n_tokens") * -100, "low")
          .otherwise("mid"))

  private val q104Sql =
    s"""WITH t AS (SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS tk
      |           FROM documents),
      |s AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
      |        CAST(COALESCE(list_aggregate(list_transform(tk, tok ->
      |          list_extract(${BowWeights.mkString("[", ",", "]")},
      |            CAST(('0x' || substr(md5(tok), 1, 8)) AS BIGINT) % 32 + 1)),
      |          'sum'), 0) AS BIGINT) AS score
      |      FROM t)
      |SELECT doc_id, n_tokens, score,
      |  CASE WHEN score >= n_tokens * 100 THEN 'high'
      |       WHEN score < n_tokens * -100 THEN 'low' ELSE 'mid' END AS label
      |FROM s""".stripMargin

  // ---------------------------------------------------------------------
  // q105 — iterative BPE tokenizer training (CorpusStats.bpeTrainMerges):
  // k merge rounds, each argmax-ing pair counts over the vocabulary-
  // bounded distinct-word table and folding the merge through every
  // word's symbol array (localCheckpoint per round — the CC-loop
  // discipline). The oracle GENERATES the same k rounds as chained
  // MATERIALIZED CTEs: per round a pair-count argmax with the identical
  // (n DESC, a, b) tie-break, then the identical left-to-right
  // non-overlapping merge as a sentinel-delimited list_reduce fold — so
  // the certified output is the merge SEQUENCE itself, hash-exact.
  // ---------------------------------------------------------------------
  private val BpeRounds = 6

  private def q105BpeMerges(spark: SparkSession, dir: String): DataFrame =
    CorpusStats.bpeTrainMerges(Tables.documents(spark, dir), "text", BpeRounds)

  /** The k-round BPE training CTE chain (shared by q105/q110):
    * w0..w{k or k-1}, m0..m{k-1}. `finalWords=true` also materializes
    * the post-ALL-merges word table w{k} (q110 encodes against it);
    * false stops at the last pick (q105 only needs the merge rows). */
  private def bpeTrainingCtes(finalWords: Boolean): String = {
    val sep = "chr(1)"
    val w0 =
      s"""WITH w0 AS MATERIALIZED (
        |  SELECT CAST(count(*) AS BIGINT) AS wc, string_split(w, '') AS sym
        |  FROM (SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
        |        FROM documents)
        |  WHERE NOT contains(w, $sep)
        |  GROUP BY w)""".stripMargin
    val rounds = (0 until BpeRounds).map { i =>
      val pick =
        s"""m$i AS MATERIALIZED (
          |  SELECT pr.a AS a, pr.b AS b, CAST(SUM(wc) AS BIGINT) AS n
          |  FROM (SELECT wc, unnest(list_transform(range(1, len(sym)),
          |          j -> {'a': sym[j], 'b': sym[j+1]})) AS pr
          |        FROM w$i WHERE len(sym) >= 2)
          |  GROUP BY 1, 2 ORDER BY n DESC, a, b LIMIT 1)""".stripMargin
      val merge =
        s"""w${i + 1} AS MATERIALIZED (
          |  SELECT wc, list_filter(string_split(
          |    list_reduce(list_prepend($sep, sym), (acc, x) ->
          |      CASE WHEN x = m.b AND ends_with(acc, $sep || m.a || $sep)
          |           THEN substr(acc, 1, length(acc) - length(m.a) - 1)
          |                  || m.a || m.b || $sep
          |           ELSE acc || x || $sep END),
          |    $sep), s -> s <> '') AS sym
          |  FROM w$i, m$i m)""".stripMargin
      if (i < BpeRounds - 1 || finalWords) s"$pick,\n$merge" else pick
    }
    s"$w0,\n${rounds.mkString(",\n")}"
  }

  private val q105Sql: String = {
    val union = (0 until BpeRounds).map { i =>
      s"SELECT ${i + 1} AS round, a AS left_sym, b AS right_sym, " +
        s"a || b AS merged, n AS n_occ FROM m$i"
    }.mkString("\nUNION ALL ")
    s"${bpeTrainingCtes(finalWords = false)}\n$union"
  }

  // ---------------------------------------------------------------------
  // q110 — BPE corpus encoding (CorpusStats.bpeEncodedCounts): apply the
  // q105-trained tokenizer and certify per-document post-merge token
  // counts — the number the packing/chunking budget actually pays.
  // Spark computes symbol counts once per DISTINCT word and meets the
  // token stream via an 8-byte-hash join (never re-running merges, never
  // shuffling word text); the oracle re-derives the same counts from the
  // final w{k} table, joining occurrences by the reconstructed word.
  // ---------------------------------------------------------------------
  private def q110BpeEncode(spark: SparkSession, dir: String): DataFrame =
    CorpusStats.bpeEncodedCounts(Tables.documents(spark, dir),
      "doc_id", "text", BpeRounds)

  // NOTE: the CTE chain is concatenated OUTSIDE the stripMargin — the
  // embedded SQL has continuation lines starting with "||" that an outer
  // stripMargin would truncate to "|" (bitwise-or)
  private val q110Sql: String =
    bpeTrainingCtes(finalWords = true) + ",\n" +
      s"""v AS (SELECT array_to_string(sym, '') AS word, len(sym) AS nsym
        |      FROM w$BpeRounds),
        |occ AS (SELECT doc_id,
        |          unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS word
        |        FROM documents)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
        |  CAST(sum(nsym) AS BIGINT) AS n_bpe_tokens
        |FROM occ JOIN v USING (word)
        |WHERE NOT contains(word, chr(1))
        |GROUP BY doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q106 — Unicode NFC normalization (functions.Normalize, codegen'd
  // java.text.Normalizer): the canonicalization stage the dedup family
  // orders FIRST (normalize → tokenize → shingle/hash). The testdata is
  // pure ASCII (where NFC is identity), so the query deterministically
  // SYNTHESIZES decomposed text on both sides — every 'e' becomes
  // e + U+0301 combining acute — and certifies that NFC recomposes it
  // to the precomposed U+00E9 form: lengths shrink by exactly the
  // accent count and the normalized string equals the independently
  // built precomposed replacement, char-for-char, vs DuckDB's
  // nfc_normalize. Scan-level, no shuffle.
  // ---------------------------------------------------------------------
  private def q106NfcNormalize(spark: SparkSession, dir: String): DataFrame = {
    val nfc = (c: Column) => graft.functions.Normalize.normalize(c, "NFC")
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        regexp_replace(col("text"), "e", "e\u0301").as("__synth"),
        regexp_replace(col("text"), "e", "\u00e9").as("__pre"))
      .select(col("doc_id"),
        length(col("__synth")).cast("long").as("len_raw"),
        length(nfc(col("__synth"))).cast("long").as("len_nfc"),
        (nfc(col("__synth")) === col("__pre")).as("nfc_eq_precomposed"))
  }

  private val q106Sql =
    """WITH s AS (SELECT doc_id, replace(text, 'e', 'e' || chr(769)) AS synth,
      |                  replace(text, 'e', chr(233)) AS pre
      |           FROM documents)
      |SELECT doc_id, CAST(length(synth) AS BIGINT) AS len_raw,
      |  CAST(length(nfc_normalize(synth)) AS BIGINT) AS len_nfc,
      |  nfc_normalize(synth) = pre AS nfc_eq_precomposed
      |FROM s""".stripMargin

  // ---------------------------------------------------------------------
  // q107 — per-source DATA CARD: the release-notes rollup composing the
  // existing diagnostics into one row per source — doc count + near-dup
  // rate (q93), median length bucket (q99), planted-PII density (q98),
  // corpus-novelty share (q95 aggregated source-wise as an exact
  // cross-ratio, not a mean of ratios), and dominant predicted language
  // (q18 counts + per-source argmax). The Spark side literally calls
  // the registered query functions and joins on `source` (#sources
  // rows — broadcast-trivial); the oracle nests the SAME per-query SQL
  // as subqueries, so the rollup cannot drift from the diagnostics it
  // summarizes. Heavy lifting stays in the component pipelines, each
  // already plan-audited; the rollup adds only source-keyed joins.
  // ---------------------------------------------------------------------
  private def q107DataCard(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val srcOf = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    val dup = q93SourceDupRate(spark, dir)
      .select(col("source"), col("n_docs"), col("dup_bp"))
    val nov = q95Novelty(spark, dir).join(srcOf, "doc_id")
      .groupBy(col("source"))
      .agg(floor(sum(col("n_unique")) * 10000 / sum(col("n_shingles")))
        .cast("long").as("novelty_bp"))
    val len = q99LengthPercentilesBucketed(spark, dir)
      .select(col("source"), col("p50_bucket").as("p50_chars"))
    val pii = q98PiiBySource(spark, dir)
      .select(col("source"),
        (col("total_emails") + col("total_ipv4") + col("total_phones"))
          .cast("long").as("n_pii"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("cnt").desc, col("lang_pred"))
    val lang = q18LangId(spark, dir).join(srcOf, "doc_id")
      .groupBy(col("source"), col("lang_pred")).agg(count(lit(1)).as("cnt"))
      .withColumn("__rk", row_number().over(w)).filter(col("__rk") === 1)
      .select(col("source"), col("lang_pred").as("top_lang"))
    dup.join(nov, "source").join(len, "source")
      .join(pii, "source").join(lang, "source")
  }

  private val q107Sql =
    s"""WITH d93 AS (SELECT source, n_docs, dup_bp FROM ($q93Sql)),
      |nov AS (SELECT d.source,
      |          CAST(floor(sum(n.n_unique) * 10000 / sum(n.n_shingles)) AS BIGINT)
      |            AS novelty_bp
      |        FROM ($q95Sql) n JOIN documents d USING (doc_id)
      |        GROUP BY d.source),
      |len AS (SELECT source, p50_bucket AS p50_chars FROM ($q99Sql)),
      |pii AS (SELECT source,
      |          CAST(total_emails + total_ipv4 + total_phones AS BIGINT) AS n_pii
      |        FROM ($q98Sql)),
      |lc AS (SELECT d.source, l.lang_pred, count(*) AS cnt
      |       FROM ($q18Sql) l JOIN documents d USING (doc_id) GROUP BY 1, 2),
      |lang AS (SELECT source, lang_pred AS top_lang FROM (
      |           SELECT source, lang_pred,
      |             ROW_NUMBER() OVER (PARTITION BY source
      |               ORDER BY cnt DESC, lang_pred) AS rk
      |           FROM lc) WHERE rk = 1)
      |SELECT source, n_docs, dup_bp, p50_chars, novelty_bp, n_pii, top_lang
      |FROM d93 JOIN nov USING (source) JOIN len USING (source)
      |  JOIN pii USING (source) JOIN lang USING (source)""".stripMargin

  // ---------------------------------------------------------------------
  // q108/q109 — real media DECODE, past headers (MediaCodec): q108 reads
  // the signed 16-bit little-endian PCM samples out of the WAV data
  // chunk and certifies integer signal stats (count, peak, energy, floor
  // mean) — the oracle recomputes every sample from the source bytes, so
  // a one-sample decode error breaks the hash. q109 decodes tiny REAL
  // PNGs end-to-end — IDAT is a genuine zlib stream (JDK Inflater),
  // scanlines carry real filter bytes — and certifies pixel stats; every
  // 41st image has its zlib header flipped, exercising the inflate
  // failure path (distinct from q102's CRC-flip slice). Both are narrow
  // partition-local maps; sample/pixel bytes never shuffle.
  // ---------------------------------------------------------------------
  private def q108PcmStats(spark: SparkSession, dir: String): DataFrame =
    MediaCodec.pcmStats(realMediaOf(spark, dir)).toDF()

  private val q108Sql =
    """WITH d AS (SELECT doc_id, text, strlen(text) AS pl FROM documents
      |           WHERE doc_id % 37 <> 0 AND doc_id % 3 = 2),
      |s AS (SELECT doc_id, pl // 2 AS n,
      |        list_transform(range(0, pl // 2), i ->
      |          CASE WHEN ord(substr(text, CAST(2*i + 2 AS INTEGER), 1)) >= 128
      |               THEN ord(substr(text, CAST(2*i + 1 AS INTEGER), 1))
      |                    + 256 * ord(substr(text, CAST(2*i + 2 AS INTEGER), 1)) - 65536
      |               ELSE ord(substr(text, CAST(2*i + 1 AS INTEGER), 1))
      |                    + 256 * ord(substr(text, CAST(2*i + 2 AS INTEGER), 1)) END) AS smp
      |      FROM d)
      |SELECT doc_id, CAST(n AS BIGINT) AS n_samples,
      |  CAST(COALESCE(list_aggregate(list_transform(smp, x -> abs(x)), 'max'), 0) AS INTEGER) AS peak,
      |  CAST(COALESCE(list_aggregate(list_transform(smp, x -> x * x), 'sum'), 0) AS BIGINT) AS sum_sq,
      |  CAST(CASE WHEN n = 0 THEN 0
      |       ELSE list_aggregate(list_transform(smp, x -> abs(x)), 'sum') // n
      |       END AS BIGINT) AS mean_abs
      |FROM s""".stripMargin

  private def q109PixelStats(spark: SparkSession, dir: String): DataFrame =
    MediaCodec.pixelStats(
      MediaCodec.attachImages(Tables.documents(spark, dir))).toDF()

  private val q109Sql =
    """WITH d AS (SELECT doc_id, text, strlen(text) AS pl FROM documents
      |           WHERE doc_id % 41 <> 0),
      |dim AS (SELECT doc_id, text, pl,
      |          CAST(4 + doc_id % 8 AS INTEGER) AS w,
      |          CAST(3 + doc_id % 5 AS INTEGER) AS h
      |        FROM d),
      |px AS (SELECT doc_id, w, h,
      |         list_transform(range(0, w * h * 3), j ->
      |           CASE WHEN pl = 0 THEN 0
      |                ELSE ord(substr(text, CAST((j % pl) + 1 AS INTEGER), 1))
      |           END) AS p
      |       FROM dim)
      |SELECT doc_id, w AS width, h AS height, CAST(w * h AS BIGINT) AS n_pixels,
      |  CAST(list_aggregate(p, 'sum') AS BIGINT) AS sum_rgb,
      |  CAST(list_aggregate(p, 'max') AS INTEGER) AS max_byte
      |FROM px""".stripMargin

  // ---------------------------------------------------------------------
  // q111 — curation funnel: the stage-by-stage attrition ledger of the
  // q65 manifest pipeline (raw → transitive-dedup keep → decontaminated
  // → repetition quality), one row per stage with surviving doc count —
  // the "where did my corpus go" report every curation run publishes
  // next to its manifest. Reuses the SAME operator calls as q65 (the
  // CC fixpoint is localCheckpointed at construction, so the three
  // stages that include it re-execute only post-checkpoint stages), and
  // the oracle reuses q65's CTE definitions — the funnel cannot drift
  // from the manifest it explains.
  // ---------------------------------------------------------------------
  private def q111CurationFunnel(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val raw = docs.filter(col("source") =!= "src0")
      .select(col("doc_id"), col("text"))
    val keepers = q52TransitiveDedupKeep(spark, dir)
    val contaminated = Scrub.decontaminate(
        docs.filter(col("source") =!= "src0"),
        docs.filter(col("source") === "src0"),
        "doc_id", "text", n = 5)
      .select(col("doc_id"))
    // ONE pass: per-doc stage flags, then a single global aggregation —
    // a union of per-stage counts would re-execute the shared
    // decontamination/gate subtrees once per branch (the dominant
    // remaining cost is the q48 fixpoint, which runs at construction
    // either way)
    val tk = col("__tk")
    val flags = raw
      .join(keepers.select(col("doc_id"), lit(1L).as("__k")),
        Seq("doc_id"), "left")
      .join(contaminated.select(col("doc_id"), lit(1L).as("__c")),
        Seq("doc_id"), "left")
      .withColumn("__tk", TextAnalysis.tokens(col("text")))
      .select(coalesce(col("__k"), lit(0L)).as("k"),
        (lit(1L) - coalesce(col("__c"), lit(0L))).as("notc"),
        when(TextAnalysis.dupTokenRatio(tk) < 0.6 &&
          TextAnalysis.topTokenFraction(tk) < 0.12, 1L).otherwise(0L).as("g"))
    flags
      .agg(count(lit(1)).as("n1"), sum(col("k")).as("n2"),
        sum(col("k") * col("notc")).as("n3"),
        sum(col("k") * col("notc") * col("g")).as("n4"))
      .select(explode(array(
        struct(lit(1).as("stage"), lit("raw").as("stage_name"),
          col("n1").as("n_docs")),
        struct(lit(2).as("stage"), lit("dedup_keep").as("stage_name"),
          col("n2").as("n_docs")),
        struct(lit(3).as("stage"), lit("decontaminated").as("stage_name"),
          col("n3").as("n_docs")),
        struct(lit(4).as("stage"), lit("quality").as("stage_name"),
          col("n4").as("n_docs")))).as("r"))
      .select(col("r.stage").as("stage"), col("r.stage_name").as("stage_name"),
        col("r.n_docs").as("n_docs"))
  }

  private val q111Sql =
    s"""$q48Closure,
      |keep48 AS (SELECT v AS doc_id FROM r GROUP BY v HAVING v = MIN(l)),
      |t5 AS (SELECT doc_id, source, list_filter(string_split(text,' '), x -> x <> '') AS tk FROM documents),
      |sh5 AS (SELECT DISTINCT doc_id, source, sg FROM (
      |  SELECT doc_id, source, unnest(CASE WHEN len(tk) >= 5
      |    THEN list_transform(generate_series(1, len(tk)-4),
      |           k -> tk[k]||' '||tk[k+1]||' '||tk[k+2]||' '||tk[k+3]||' '||tk[k+4])
      |    ELSE [] END) AS sg FROM t5)),
      |ev5 AS (SELECT DISTINCT sg FROM sh5 WHERE source = 'src0'),
      |cont AS (SELECT DISTINCT s.doc_id FROM sh5 s JOIN ev5 USING (sg)
      |         WHERE s.source <> 'src0'),
      |rep AS (SELECT doc_id FROM (
      |    SELECT doc_id, len(tk) AS n, len(list_distinct(tk)) AS d,
      |      list_aggregate(list_transform(list_distinct(tk),
      |        u -> len(list_filter(tk, x -> x = u))), 'max') AS mx
      |    FROM t5 WHERE source <> 'src0')
      |  WHERE n = 0 OR ((n-d)*1.0/n < 0.6 AND mx*1.0/n < 0.12)),
      |raw AS (SELECT doc_id FROM documents WHERE source <> 'src0'),
      |s1 AS (SELECT doc_id FROM raw JOIN keep48 USING (doc_id)),
      |s2 AS (SELECT s1.doc_id FROM s1 LEFT JOIN cont ON s1.doc_id = cont.doc_id
      |       WHERE cont.doc_id IS NULL),
      |s3 AS (SELECT s2.doc_id FROM s2 JOIN rep ON s2.doc_id = rep.doc_id)
      |SELECT 1 AS stage, 'raw' AS stage_name,
      |  CAST((SELECT count(*) FROM raw) AS BIGINT) AS n_docs
      |UNION ALL SELECT 2, 'dedup_keep', CAST((SELECT count(*) FROM s1) AS BIGINT)
      |UNION ALL SELECT 3, 'decontaminated', CAST((SELECT count(*) FROM s2) AS BIGINT)
      |UNION ALL SELECT 4, 'quality', CAST((SELECT count(*) FROM s3) AS BIGINT)""".stripMargin

  // ---------------------------------------------------------------------
  // q112 — compressibility quality signal (functions.DeflateSize): zlib
  // ratio in basis points per document, banded into the standard
  // curation buckets (too-compressible = templated/looped text,
  // incompressible = already-compressed or random junk). Scan-level,
  // no shuffle. ROWS-ONLY by design: deflate output is deterministic
  // per zlib build but not portable across engines — value semantics
  // are pinned by `DeflateSizeSpec` instead (the HLL/packing contract).
  // ---------------------------------------------------------------------
  private def q112CompressionQuality(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        octet_length(col("text")).cast("long").as("n_bytes"),
        graft.functions.Compressibility.deflateSize(col("text")).cast("long")
          .as("z_bytes"))
      .withColumn("ratio_bp",
        floor(col("z_bytes") * 10000 / col("n_bytes")).cast("long"))
      .withColumn("band",
        when(col("ratio_bp") < 2000, "looped")
          .when(col("ratio_bp") > 9000, "incompressible")
          .otherwise("prose"))

  // ---------------------------------------------------------------------
  // q113 — normalization-closed dedup: the certified demonstration that
  // the q106 NFC stage closes the mixed-encoding under-dedup gap. The
  // corpus is doubled into a composed (U+00E9) and a decomposed
  // (e + U+0301) variant of every document; exact dedup on raw bytes
  // only pairs the documents whose variants are byte-identical (no 'e'
  // at all), while dedup on NFC-normalized text pairs ALL of them. Two
  // aggregate rows (method, group counts) certify both sides.
  // ---------------------------------------------------------------------
  private def q113NfcDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val composed = docs.select(col("doc_id"),
      regexp_replace(col("text"), "e", "\u00e9").as("text"))
    val decomposed = docs.select((col("doc_id") + 1000000L).as("doc_id"),
      regexp_replace(col("text"), "e", "e\u0301").as("text"))
    val u = composed.union(decomposed)
    val nfc = graft.functions.Normalize.normalize(col("text"), "NFC")
    val keyed = u.select(lit("raw").as("method"), md5(col("text")).as("h"))
      .union(u.select(lit("nfc").as("method"), md5(nfc).as("h")))
    keyed.groupBy(col("method"), col("h")).agg(count(lit(1)).as("c"))
      .groupBy(col("method"))
      .agg(count(lit(1)).as("n_groups"),
        sum(when(col("c") > 1, 1L).otherwise(0L)).as("n_dup_groups"))
  }

  private val q113Sql =
    """WITH u AS (
      |  SELECT doc_id, replace(text, 'e', chr(233)) AS text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, replace(text, 'e', 'e' || chr(769)) FROM documents),
      |r AS (SELECT 'raw' AS method, md5(text) AS h FROM u
      |      UNION ALL SELECT 'nfc', md5(nfc_normalize(text)) FROM u),
      |g AS (SELECT method, h, count(*) AS c FROM r GROUP BY 1, 2)
      |SELECT method, CAST(count(*) AS BIGINT) AS n_groups,
      |  CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_groups
      |FROM g GROUP BY method""".stripMargin

  // ---------------------------------------------------------------------
  // q114 — per-column data profile (operators/Profile): row/null/exact-
  // distinct counts and string-collated min/max for every documents
  // column, one aggregation pass (multi-count-distinct plans as a single
  // Expand). The drop-preflight next to the q107 data card.
  // ---------------------------------------------------------------------
  private def q114Profile(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Profile.profile(Tables.documents(spark, dir))

  private val q114Sql = {
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    cols.map { c =>
      s"""SELECT '$c' AS column, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
        |  min(CAST($c AS VARCHAR)) AS min_str, max(CAST($c AS VARCHAR)) AS max_str
        |FROM documents""".stripMargin
    }.mkString("\nUNION ALL ")
  }

  // ---------------------------------------------------------------------
  // q115 — eval-set integrity, q56 reversed: per EVAL document, how many
  // distinct 5-gram shingles it shares with the training corpus — "is my
  // benchmark already memorizable from the train set", the report an
  // eval-suite owner publishes. Plan note: with the sides swapped the
  // "eval" argument IS the big corpus, so the call passes
  // maxEvalShingles = 0 — the documented degrade that drops the guarded
  // broadcast and lets AQE run a plain 8-byte-hash shuffle join (text
  // still never shuffles). The oracle is q56's with the sides swapped.
  // ---------------------------------------------------------------------
  private def q115EvalContamination(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    Scrub.decontaminate(
      train = docs.filter(col("source") === "src0"),
      eval = docs.filter(col("source") =!= "src0"),
      idCol = "doc_id", textCol = "text", n = 5,
      maxEvalShingles = 0)
  }

  private val q115Sql =
    """WITH t AS (SELECT doc_id, source, list_filter(string_split(text,' '), x -> x <> '') AS tk FROM documents),
      |sh AS (SELECT DISTINCT doc_id, source, sg FROM (
      |  SELECT doc_id, source, unnest(CASE WHEN len(tk) >= 5
      |    THEN list_transform(generate_series(1, len(tk)-4),
      |           i -> tk[i]||' '||tk[i+1]||' '||tk[i+2]||' '||tk[i+3]||' '||tk[i+4])
      |    ELSE [] END) AS sg FROM t)),
      |tr AS (SELECT DISTINCT sg FROM sh WHERE source <> 'src0')
      |SELECT s.doc_id, COUNT(*) AS n_hits
      |FROM sh s JOIN tr USING (sg) WHERE s.source = 'src0'
      |GROUP BY s.doc_id""".stripMargin

  // ---------------------------------------------------------------------
  // q116 — IVF recall report: overlap of the q49 multiprobe top-3 with
  // the exact cosine top-3 (q22 restricted), per probe, in integer basis
  // points — the recall@k number an ANN deployment publishes next to its
  // nprobe setting (the q78 report, for the IVF family). Composes the
  // two registered queries verbatim; the oracle nests their SQL, so the
  // report cannot drift from the surfaces it measures.
  // ---------------------------------------------------------------------
  private def q116IvfRecall(spark: SparkSession, dir: String): DataFrame = {
    val ivf = q49AnnIvfMultiprobe(spark, dir).select(col("probe_id"), col("vec_id"))
    val exact = q22KnnBruteforce(spark, dir)
      .filter(col("rn") <= 3).select(col("probe_id"), col("vec_id"))
    val hits = exact.join(ivf, Seq("probe_id", "vec_id"))
      .groupBy(col("probe_id")).agg(count(lit(1)).as("__hit"))
    probes(spark, dir).select(col("probe_id"))
      .join(hits, Seq("probe_id"), "left")
      .select(col("probe_id"),
        coalesce(col("__hit"), lit(0L)).as("n_hit"),
        floor(coalesce(col("__hit"), lit(0L)) * 10000 / 3).cast("long")
          .as("recall_bp"))
  }

  private val q116Sql =
    s"""WITH ex AS (SELECT probe_id, vec_id FROM (${q22Sql}) WHERE rn <= 3),
      |iv AS (SELECT probe_id, vec_id FROM (${q49Sql})),
      |h AS (SELECT probe_id, count(*) AS hit
      |      FROM ex JOIN iv USING (probe_id, vec_id) GROUP BY 1),
      |pp AS (SELECT vec_id AS probe_id FROM embeddings WHERE vec_id < 3)
      |SELECT probe_id, CAST(COALESCE(hit, 0) AS BIGINT) AS n_hit,
      |  CAST(COALESCE(hit, 0) * 10000 // 3 AS BIGINT) AS recall_bp
      |FROM pp LEFT JOIN h USING (probe_id)""".stripMargin

  // ---------------------------------------------------------------------
  // q117/q118 — the full sniffing-chain oracle (MediaCodec.encodeExt):
  // every parser the chain can reach — PNG, JPEG, WAV, BMP, GIF — gets
  // an end-to-end CORRECTNESS row from ONE 5-format binary column,
  // closing the r9 gap where BMP/GIF were unit-tested but never driven
  // through the registry. Same discipline as q102/q103: every header
  // field and exact container byte count derive from (doc_id,
  // strlen(text)), every 37th row is corrupted through a format-DISTINCT
  // failure path (PNG CRC flip / JPEG truncation / WAV form type / BMP
  // planes / GIF signature), and q118 is the counted drop ledger. BMP
  // rows where doc_id % 7 == 0 store a negative (top-down) height, so
  // the magnitude branch is oracle-covered too. Narrow maps; payload
  // bytes never shuffle.
  // ---------------------------------------------------------------------
  private def extMediaOf(spark: SparkSession, dir: String) =
    MediaCodec.attachMediaExt(Tables.documents(spark, dir))

  private def q117MediaCodecExt(spark: SparkSession, dir: String): DataFrame =
    MediaCodec.extractMetadata(extMediaOf(spark, dir)).toDF()

  private val q117Sql =
    """WITH d AS (SELECT doc_id, strlen(text) AS pl FROM documents
      |           WHERE doc_id % 37 <> 0)
      |SELECT doc_id,
      |  CASE doc_id % 5 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' WHEN 2 THEN 'wav'
      |                  WHEN 3 THEN 'bmp' ELSE 'gif' END AS format,
      |  CAST(CASE doc_id % 5 WHEN 0 THEN 64 + doc_id % 1024
      |                       WHEN 1 THEN 64 + (doc_id * 5) % 1024
      |                       WHEN 3 THEN 16 + doc_id % 512
      |                       WHEN 4 THEN 1 + doc_id % 640 END AS INTEGER) AS width,
      |  CAST(CASE doc_id % 5 WHEN 0 THEN 64 + (doc_id * 7) % 768
      |                       WHEN 1 THEN 64 + (doc_id * 3) % 1024
      |                       WHEN 3 THEN 16 + (doc_id * 3) % 512
      |                       WHEN 4 THEN 1 + (doc_id * 11) % 480 END AS INTEGER) AS height,
      |  CAST(CASE doc_id % 5 WHEN 0 THEN 8 + 8 * (doc_id % 2)
      |                       WHEN 1 THEN 8 WHEN 2 THEN 16 WHEN 3 THEN 8
      |                       ELSE (doc_id % 8) + 1 END AS INTEGER) AS bit_depth,
      |  CAST(CASE doc_id % 5 WHEN 0 THEN 3 WHEN 1 THEN 3
      |                       WHEN 2 THEN 1 + doc_id % 2
      |                       WHEN 3 THEN CASE doc_id % 3 WHEN 0 THEN 1
      |                                   WHEN 1 THEN 3 ELSE 4 END
      |                       ELSE 1 END AS INTEGER) AS channels,
      |  CAST(CASE doc_id % 5 WHEN 2 THEN
      |         CASE (doc_id // 3) % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000 ELSE 32000 END
      |       END AS INTEGER) AS sample_rate,
      |  CAST(CASE doc_id % 5 WHEN 2 THEN (pl * 1000) //
      |         ((CASE (doc_id // 3) % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000 ELSE 32000 END)
      |          * (1 + doc_id % 2) * 2)
      |       END AS BIGINT) AS duration_ms,
      |  CAST(CASE doc_id % 5 WHEN 0 THEN 57 + pl WHEN 1 THEN 45 + pl
      |       WHEN 2 THEN 44 + pl + pl % 2 WHEN 3 THEN 54 + pl
      |       ELSE 14 + pl END AS BIGINT) AS n_bytes
      |FROM d""".stripMargin

  private def q118MediaAuditExt(spark: SparkSession, dir: String): DataFrame =
    MediaCodec.audit(extMediaOf(spark, dir))

  private val q118Sql =
    """WITH s AS (SELECT
      |    CASE WHEN doc_id % 37 = 0 THEN 'corrupt'
      |         WHEN doc_id % 5 = 0 THEN 'png'
      |         WHEN doc_id % 5 = 1 THEN 'jpeg'
      |         WHEN doc_id % 5 = 2 THEN 'wav'
      |         WHEN doc_id % 5 = 3 THEN 'bmp' ELSE 'gif' END AS status,
      |    CASE WHEN doc_id % 37 = 0 AND doc_id % 5 = 1 THEN 10
      |         WHEN doc_id % 5 = 0 THEN 57 + strlen(text)
      |         WHEN doc_id % 5 = 1 THEN 45 + strlen(text)
      |         WHEN doc_id % 5 = 2 THEN 44 + strlen(text) + strlen(text) % 2
      |         WHEN doc_id % 5 = 3 THEN 54 + strlen(text)
      |         ELSE 14 + strlen(text) END AS len
      |  FROM documents)
      |SELECT status, count(*) AS n_docs, CAST(sum(len) AS BIGINT) AS n_bytes
      |FROM s GROUP BY status""".stripMargin

  // ---------------------------------------------------------------------
  // q119 — perceptual image dedup: the multimodal analogue of the text
  // near-dup family, composing the REAL pixel decoder (q109) with the
  // banded hamming machinery (q28). documents → fixed 8×8 REAL PNG
  // thumbnails (the standardize-then-hash pipeline shape) → decode →
  // 63-bit dHash (integer grayscale, nearest-neighbour grid — 63 bits
  // so the fingerprint stays positive in every engine's signed int64) →
  // 21-bit×3 band join, pairs within hamming ≤ 2. Exact-duplicate texts
  // produce hamming-0 pairs; near-dup texts (the q21/q26 families)
  // produce hamming-1 pairs at sf0.01 — both slices live in the
  // testdata. The oracle recomputes every pixel, every grayscale
  // sample, and every hash bit from (doc_id, text), then brute-forces
  // all pairs — certifying both the decode→hash arithmetic AND that
  // banding loses no pair. Plan: only (id, 8-byte hash) rows shuffle;
  // pixels never leave their partition.
  // ---------------------------------------------------------------------
  private def q119ImageDedup(spark: SparkSession, dir: String): DataFrame =
    Dedup.hammingPairs63(
      MediaCodec.dHashes(
        MediaCodec.attachThumbnails(Tables.documents(spark, dir))).toDF(),
      "doc_id", "dhash", maxHamming = 2)

  /** CTE list (no WITH) computing img_dh(doc_id, dhash) — shared by
    * q119 and the q124 multimodal closure. */
  private val imageDhCtes =
    """img_d AS (SELECT doc_id, text, strlen(text) AS pl FROM documents
      |          WHERE doc_id % 41 <> 0),
      |img_px AS (SELECT doc_id,
      |         list_transform(range(0, 192), k ->
      |           CASE WHEN pl = 0 THEN 0
      |                ELSE ord(substr(text, CAST((k % pl) + 1 AS INTEGER), 1))
      |           END) AS p
      |       FROM img_d),
      |img_gg AS (SELECT doc_id,
      |         list_transform(range(0, 70), t ->
      |           (p[CAST(3 * (((t // 10) * 8 // 7) * 8 + (t % 10) * 8 // 10) + 1 AS INTEGER)]
      |          + p[CAST(3 * (((t // 10) * 8 // 7) * 8 + (t % 10) * 8 // 10) + 2 AS INTEGER)]
      |          + p[CAST(3 * (((t // 10) * 8 // 7) * 8 + (t % 10) * 8 // 10) + 3 AS INTEGER)]) // 3) AS g
      |       FROM img_px),
      |img_dh AS (SELECT doc_id,
      |         CAST(list_sum(list_transform(range(0, 63), b ->
      |           CASE WHEN g[CAST((b // 9) * 10 + (b % 9) + 2 AS INTEGER)]
      |                     > g[CAST((b // 9) * 10 + (b % 9) + 1 AS INTEGER)]
      |                THEN (1::BIGINT << CAST(b AS INTEGER)) ELSE 0 END)) AS BIGINT) AS dhash
      |       FROM img_gg)""".stripMargin

  private val q119Sql =
    s"""WITH $imageDhCtes
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  CAST(bit_count(xor(a.dhash, b.dhash)) AS BIGINT) AS hamming
      |FROM img_dh a JOIN img_dh b ON a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.dhash, b.dhash)) <= 2""".stripMargin

  // ---------------------------------------------------------------------
  // q120/q121 — audio near-dup: the PCM analogue of q27/q28 and the
  // third leg of the multimodal dedup story (text / image / audio).
  // documents → REAL WAV (every 43rd RIFF-broken → decode drops) →
  // 16-bit PCM decode (the q108-certified path) → 60-bit integer
  // sign-of-difference fingerprint (Haitsma & Kalker's public scheme,
  // FFT-free: per-frame energy / sign-crossings / peak, one bit per
  // adjacent-frame rise) → the q119 band join. q120 certifies EVERY
  // per-doc fingerprint bit-for-bit (so an error on an unpaired doc
  // still breaks the hash); q121 emits the near-dup pairs. Only
  // (id, 8-byte fingerprint) rows shuffle; samples never leave their
  // partition.
  // ---------------------------------------------------------------------
  private def audioFpOf(spark: SparkSession, dir: String) =
    MediaCodec.audioFingerprints(
      MediaCodec.attachAudio(Tables.documents(spark, dir)))

  private def q120AudioFingerprint(spark: SparkSession, dir: String): DataFrame =
    audioFpOf(spark, dir).toDF()

  private def q121AudioDedup(spark: SparkSession, dir: String): DataFrame =
    Dedup.hammingPairs63(audioFpOf(spark, dir).toDF(),
      "doc_id", "fingerprint", maxHamming = 2)

  /** CTE list (no WITH) computing au_fp(doc_id, fingerprint): text →
    * 16-bit LE samples (the q108 formula) → 21-frame integer features →
    * 60-bit fingerprint. Shared by q120/q121 and the q124 closure. */
  private val audioFpCtes =
    """au_d AS (SELECT doc_id, text, strlen(text) AS pl FROM documents
      |         WHERE doc_id % 43 <> 0),
      |au_s AS (SELECT doc_id, pl // 2 AS n,
      |        list_transform(range(0, pl // 2), i ->
      |          CASE WHEN ord(substr(text, CAST(2*i + 2 AS INTEGER), 1)) >= 128
      |               THEN ord(substr(text, CAST(2*i + 1 AS INTEGER), 1))
      |                    + 256 * ord(substr(text, CAST(2*i + 2 AS INTEGER), 1)) - 65536
      |               ELSE ord(substr(text, CAST(2*i + 1 AS INTEGER), 1))
      |                    + 256 * ord(substr(text, CAST(2*i + 2 AS INTEGER), 1)) END) AS smp
      |      FROM au_d),
      |au_fe AS (SELECT doc_id,
      |        list_transform(range(0, 21), f -> COALESCE(list_sum(list_transform(
      |          list_slice(smp, CAST(f*n//21 + 1 AS INTEGER), CAST((f+1)*n//21 AS INTEGER)),
      |          x -> abs(x))), 0)) AS e,
      |        list_transform(range(0, 21), f -> COALESCE(list_sum(list_transform(
      |          range(f*n//21 + 1, (f+1)*n//21), k ->
      |            CASE WHEN (smp[CAST(k+1 AS INTEGER)] >= 0) <> (smp[CAST(k AS INTEGER)] >= 0)
      |                 THEN 1 ELSE 0 END)), 0)) AS z,
      |        list_transform(range(0, 21), f -> COALESCE(list_aggregate(list_transform(
      |          list_slice(smp, CAST(f*n//21 + 1 AS INTEGER), CAST((f+1)*n//21 AS INTEGER)),
      |          x -> abs(x)), 'max'), 0)) AS p
      |      FROM au_s),
      |au_fp AS (SELECT doc_id,
      |  CAST(list_sum(list_transform(range(0, 20), k ->
      |      CASE WHEN e[CAST(k+2 AS INTEGER)] > e[CAST(k+1 AS INTEGER)]
      |           THEN (1::BIGINT << CAST(k AS INTEGER)) ELSE 0 END
      |    + CASE WHEN z[CAST(k+2 AS INTEGER)] > z[CAST(k+1 AS INTEGER)]
      |           THEN (1::BIGINT << CAST(k+20 AS INTEGER)) ELSE 0 END
      |    + CASE WHEN p[CAST(k+2 AS INTEGER)] > p[CAST(k+1 AS INTEGER)]
      |           THEN (1::BIGINT << CAST(k+40 AS INTEGER)) ELSE 0 END)) AS BIGINT) AS fingerprint
      |FROM au_fe)""".stripMargin

  private val q120Sql =
    s"""WITH $audioFpCtes
      |SELECT doc_id, fingerprint FROM au_fp""".stripMargin

  private val q121Sql =
    s"""WITH $audioFpCtes
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  CAST(bit_count(xor(a.fingerprint, b.fingerprint)) AS BIGINT) AS hamming
      |FROM au_fp a JOIN au_fp b ON a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.fingerprint, b.fingerprint)) <= 2""".stripMargin

  // ---------------------------------------------------------------------
  // q122 — DEEP BPE training (rows-only BY DESIGN): the same
  // bpeTrainCore code path q105 certifies hash-exactly at k = 6, run
  // with a 200-merge depth BUDGET (bpeTrainMergesCapped: trains to
  // corpus exhaustion when the vocabulary is shallower, as at small
  // sf) — the scale surface of the r12 BATCHED trainer (up to 64
  // fold-safe merges speculated per distributed job, replay-validated
  // against the driver ledger for byte-exact sequential semantics;
  // pinned by BpeFuzzSpec against an in-memory reference at random k
  // plus dedicated batching/truncation cases). A 200-round chain of
  // materialized DuckDB CTEs would dominate the oracle run's wall clock
  // for zero extra semantic signal, so this entry records the rows-only
  // check and exists chiefly for the BENCH: q122/q105 wall ratio far
  // under the k-ratio (200/6 ≈ 33×) is the recorded evidence that deep
  // trainings no longer pay one driver round-trip per merge.
  // ---------------------------------------------------------------------
  private def q122BpeDeep(spark: SparkSession, dir: String): DataFrame =
    CorpusStats.bpeTrainMergesCapped(Tables.documents(spark, dir), "text", 200)

  // ---------------------------------------------------------------------
  // q123 — approximate profile (rows-only BY DESIGN): q114's profiler
  // with `approxDistinct = true` — the 100 TB wide-table path, where the
  // exact multi-count-distinct's Expand (one shuffle row per row ×
  // column) is the scale killer and HLL++ per column keeps the plan a
  // single partial/final aggregate over one scan. HLL estimates are not
  // cross-engine portable (the q44 convention), so the registry records
  // rows-only; the NO-EXPAND plan property is pinned in PlanAuditSpec.
  // ---------------------------------------------------------------------
  private def q123ProfileApprox(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Profile.profile(Tables.documents(spark, dir),
      approxDistinct = true)

  // ---------------------------------------------------------------------
  // q124 — multimodal dedup clusters: the capstone of the dedup family.
  // A document is a duplicate if ANY modality says so — text (the q21
  // Jaccard graph, q48's edge set), image (q119 dHash pairs), or audio
  // (q121 fingerprint pairs) — so the three pair sets union into one
  // edge list and connected components collapse transitive chains
  // ACROSS modalities (text-dup A~B and image-dup B~C put A and C in
  // one cluster even though no single modality compared them). Output
  // is the q48-shaped (doc_id, component) map over every document.
  // Oracle: one recursive min-label closure over the union of the three
  // already-certified pair CTEs — the clusters cannot drift from the
  // pair queries they compose. Plan: each modality contributes only
  // 8-byte-keyed pairs; the CC fixpoint runs over (id, id) edges.
  // ---------------------------------------------------------------------
  private def q124MultimodalDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val text = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.5, maxShingleDfFrac = 0.1)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val image = Dedup.hammingPairs63(
        MediaCodec.dHashes(MediaCodec.attachThumbnails(docs)).toDF(),
        "doc_id", "dhash", maxHamming = 2)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val audio = Dedup.hammingPairs63(
        MediaCodec.audioFingerprints(MediaCodec.attachAudio(docs)).toDF(),
        "doc_id", "fingerprint", maxHamming = 2)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val edges = text.unionByName(image).unionByName(audio).distinct()
    Dedup.connectedComponents(docs.select(col("doc_id").as("id")), edges)
      .select(col("id").as("doc_id"), col("component"))
  }

  private val q124Sql =
    s"""WITH RECURSIVE $q21PairCtes,
      |mm_tp AS (SELECT x AS src, y AS dst
      |      $q21PairJoin),
      |$imageDhCtes,
      |mm_ip AS (SELECT a.doc_id AS src, b.doc_id AS dst
      |      FROM img_dh a JOIN img_dh b ON a.doc_id < b.doc_id
      |      WHERE bit_count(xor(a.dhash, b.dhash)) <= 2),
      |$audioFpCtes,
      |mm_ap AS (SELECT a.doc_id AS src, b.doc_id AS dst
      |      FROM au_fp a JOIN au_fp b ON a.doc_id < b.doc_id
      |      WHERE bit_count(xor(a.fingerprint, b.fingerprint)) <= 2),
      |mm_p AS (SELECT src, dst FROM mm_tp UNION
      |         SELECT src, dst FROM mm_ip UNION
      |         SELECT src, dst FROM mm_ap),
      |mm_e AS (SELECT src, dst FROM mm_p UNION ALL SELECT dst, src FROM mm_p),
      |mm_r(v, l) AS (
      |  SELECT doc_id, doc_id FROM documents
      |  UNION
      |  SELECT mm_e.dst, mm_r.l FROM mm_r JOIN mm_e ON mm_e.src = mm_r.v
      |  WHERE mm_r.l < mm_e.dst)
      |SELECT v AS doc_id, MIN(l) AS component FROM mm_r GROUP BY v""".stripMargin

  // ---------------------------------------------------------------------

  private val registry: Seq[Q] = Seq(
    Q("q1_lineitem_agg", q1LineitemAgg, Some(q1Sql)),
    Q("q2_query_groupingsets", q2QueryGroupingSets, Some(q2Sql)),
    Q("q3_response_groupingsets", q3ResponseGroupingSets, Some(q3Sql)),
    Q("q4_passthrough", q4Passthrough, Some(q4Sql)),
    Q("q5_latency_deltas", q5Deltas, Some(q5Sql)),
    Q("q6_latency_avg", q6LatencyAvg, Some(q6Sql)),
    Q("q7_top_addresses", q7TopAddresses, Some(q7Sql)),
    Q("q8_top_nxdomain", q8TopNxdomain, Some(q8Sql)),
    Q("q9_nonok_timeseries", q9NonOkTimeseries, Some(q9Sql)),
    Q("q10_latency_timeseries", q10LatencyTimeseries, Some(q10Sql)),
    Q("q11_ip_render", q11IpRender, Some(q11Sql)),
    Q("q12_dns_names", q12DnsNames, Some(q12Sql)),
    Q("q13_explode_tokens", q13ExplodeTokens, Some(q13Sql)),
    Q("q14_join_enrich", q14JoinEnrich, Some(q14Sql)),
    Q("q15_window_topn", q15WindowTopn, Some(q15Sql)),
    Q("q16_sessionize", q16Sessionize, Some(q16Sql)),
    Q("q17_text_stats", q17TextStats, Some(q17Sql)),
    Q("q18_langid", q18LangId, Some(q18Sql)),
    Q("q19_fingerprint", q19Fingerprint, Some(q19Sql)),
    Q("q20_dedup_exact", q20DedupExact, Some(q20Sql)),
    Q("q21_ngram_jaccard", q21NgramJaccard, Some(q21Sql)),
    Q("q22_knn_bruteforce", q22KnnBruteforce, Some(q22Sql)),
    Q("q23_ann_lsh", q23AnnLsh, Some(q23Sql)),
    Q("q24_embedding_dedup", q24EmbeddingDedup, Some(q24Sql)),
    Q("q25_dnstap_pipeline", q25DnstapPipeline, Some(q25Sql)),
    Q("q26_minhash_lsh", q26MinhashLsh, Some(q26Sql)),
    Q("q27_simhash", q27Simhash, Some(q27Sql)),
    Q("q28_simhash_pairs", q28SimhashPairs, Some(q28Sql)),
    Q("q29_media_metadata", q29MediaMetadata, Some(q29Sql)),
    Q("q30_media_features", q30MediaFeatures, Some(q30Sql)),
    Q("q31_frame_sample", q31FrameSample, Some(q31Sql)),
    Q("q32_latency_percentiles", q32LatencyPercentiles, Some(q32Sql)),
    Q("q33_tfidf", q33Tfidf, Some(q33Sql)),
    Q("q34_dedup_keep", q34DedupKeep, Some(q34Sql)),
    Q("q35_tumbling_window", q35TumblingWindow, Some(q35Sql)),
    Q("q36_session_window", q36SessionWindow, Some(q36Sql)),
    Q("q37_salted_addr_counts", q37SaltedAddrCounts, Some(q37Sql)),
    Q("q38_clean_clients", q38CleanClients, Some(q38Sql)),
    Q("q39_ann_ivf", q39AnnIvf, Some(q39Sql)),
    Q("q40_rollup_revenue", q40RollupRevenue, Some(q40Sql)),
    Q("q41_pivot_status", q41PivotStatus, Some(q41Sql)),
    Q("q42_repeat_offenders", q42RepeatOffenders, Some(q42Sql)),
    Q("q43_dense_rank", q43DenseRank, Some(q43Sql)),
    Q("q44_approx_distinct", q44ApproxDistinct, None),
    Q("q45_embedding_dedup_lsh", q45EmbeddingDedupLsh, Some(q45Sql)),
    Q("q46_ann_ivf_kmeans", q46AnnIvfKmeans, None),
    Q("q47_latency_percentiles_ms", q47LatencyPercentilesMs, Some(q47Sql)),
    Q("q48_dedup_clusters", q48DedupClusters, Some(q48Sql)),
    Q("q49_ann_ivf_multiprobe", q49AnnIvfMultiprobe, Some(q49Sql)),
    Q("q50_stratified_sample", q50StratifiedSample, Some(q50Sql)),
    Q("q51_sequence_packing", q51SequencePacking, None),
    Q("q52_transitive_dedup_keep", q52TransitiveDedupKeep, Some(q52Sql)),
    Q("q53_per_group_cap", q53PerGroupCap, Some(q53Sql)),
    Q("q54_pii_redact", q54PiiRedact, Some(q54Sql)),
    Q("q55_repetition_quality", q55RepetitionQuality, Some(q55Sql)),
    Q("q56_decontaminate", q56Decontaminate, Some(q56Sql)),
    Q("q57_anonymize", q57Anonymize, Some(q57Sql)),
    Q("q58_rare_tokens", q58RareTokens, Some(q58Sql)),
    Q("q59_shard_stats", q59ShardStats, Some(q59Sql)),
    Q("q60_source_overlap", q60SourceOverlap, Some(q60Sql)),
    Q("q61_incremental_dedup", q61IncrementalDedup, Some(q61Sql)),
    Q("q62_split", q62Split, Some(q62Sql)),
    Q("q63_epoch_mix", q63EpochMix, Some(q63Sql)),
    Q("q64_chunk", q64Chunk, Some(q64Sql)),
    Q("q65_training_manifest", q65TrainingManifest, Some(q65Sql)),
    Q("q66_dup_span_coverage", q66DupSpanCoverage, Some(q66Sql)),
    Q("q67_ngram_commonness", q67NgramCommonness, Some(q67Sql)),
    Q("q68_incremental_dedup_bloom", q68IncrementalDedupBloom, Some(q68Sql)),
    Q("q69_token_budget", q69TokenBudget, Some(q69Sql)),
    Q("q70_temperature_mix", q70TemperatureMix, Some(q70Sql)),
    Q("q71_vocab_drift", q71VocabDrift, Some(q71Sql)),
    Q("q72_remove_dup_spans", q72RemoveDupSpans, Some(q72Sql)),
    Q("q73_boilerplate", q73Boilerplate, Some(q73Sql)),
    Q("q74_semantic_dedup", q74SemanticDedup, Some(q74Sql)),
    Q("q75_pq_adc", q75PqAdc, Some(q75Sql)),
    Q("q76_int8_quantize", q76Int8Quantize, Some(q76Sql)),
    Q("q77_curriculum_order", q77CurriculumOrder, Some(q77Sql)),
    Q("q78_pq_recall", q78PqRecall, Some(q78Sql)),
    Q("q79_cluster_source_mix", q79ClusterSourceMix, Some(q79Sql)),
    Q("q80_pq_adc_trained", q80PqAdcTrained, None),
    Q("q81_hard_negatives", q81HardNegatives, Some(q81Sql)),
    Q("q82_bpe_pairs", q82BpePairs, Some(q82Sql)),
    Q("q83_pq_refine", q83PqRefine, Some(q83Sql)),
    Q("q84_cross_modal_manifest", q84CrossModalManifest, Some(q84Sql)),
    Q("q85_incremental_semantic_dedup", q85IncrementalSemanticDedup, Some(q85Sql)),
    Q("q86_build_vocab", q86BuildVocab, Some(q86Sql)),
    Q("q87_longest_per_source", q87LongestPerSource, Some(q87Sql)),
    Q("q88_fuzzy_decontaminate", q88FuzzyDecontaminate, Some(q88Sql)),
    Q("q89_length_percentiles", q89LengthPercentiles, Some(q89Sql)),
    Q("q90_vocab_encode", q90VocabEncode, Some(q90Sql)),
    Q("q91_split_leakage", q91SplitLeakage, Some(q91Sql)),
    Q("q92_dup_degree", q92DupDegree, Some(q92Sql)),
    Q("q93_source_dup_rate", q93SourceDupRate, Some(q93Sql)),
    Q("q94_zipf_bands", q94ZipfBands, Some(q94Sql)),
    Q("q95_novelty", q95Novelty, Some(q95Sql)),
    Q("q96_cluster_sizes", q96ClusterSizes, Some(q96Sql)),
    Q("q97_source_rarity_percentiles", q97SourceRarityPercentiles, Some(q97Sql)),
    Q("q98_pii_by_source", q98PiiBySource, Some(q98Sql)),
    Q("q99_length_percentiles_bucketed", q99LengthPercentilesBucketed, Some(q99Sql)),
    Q("q100_quality_filter", q100QualityFilter, Some(q100Sql)),
    Q("q101_cluster_split", q101ClusterSplit, Some(q101Sql)),
    Q("q102_media_codec", q102MediaCodec, Some(q102Sql)),
    Q("q103_media_audit", q103MediaAudit, Some(q103Sql)),
    Q("q104_bow_quality", q104BowQuality, Some(q104Sql)),
    Q("q105_bpe_merges", q105BpeMerges, Some(q105Sql)),
    Q("q106_nfc_normalize", q106NfcNormalize, Some(q106Sql)),
    Q("q107_data_card", q107DataCard, Some(q107Sql)),
    Q("q108_pcm_stats", q108PcmStats, Some(q108Sql)),
    Q("q109_pixel_stats", q109PixelStats, Some(q109Sql)),
    Q("q110_bpe_encode", q110BpeEncode, Some(q110Sql)),
    Q("q111_curation_funnel", q111CurationFunnel, Some(q111Sql)),
    Q("q112_compression_quality", q112CompressionQuality, None),
    Q("q113_nfc_dedup", q113NfcDedup, Some(q113Sql)),
    Q("q114_profile", q114Profile, Some(q114Sql)),
    Q("q115_eval_contamination", q115EvalContamination, Some(q115Sql)),
    Q("q116_ivf_recall", q116IvfRecall, Some(q116Sql)),
    Q("q117_media_codec_ext", q117MediaCodecExt, Some(q117Sql)),
    Q("q118_media_audit_ext", q118MediaAuditExt, Some(q118Sql)),
    Q("q119_image_dedup", q119ImageDedup, Some(q119Sql)),
    Q("q120_audio_fingerprint", q120AudioFingerprint, Some(q120Sql)),
    Q("q121_audio_dedup", q121AudioDedup, Some(q121Sql)),
    Q("q122_bpe_deep", q122BpeDeep, None),
    Q("q123_profile_approx", q123ProfileApprox, None),
    Q("q124_multimodal_dedup", q124MultimodalDedup, Some(q124Sql)),
  )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** The bench headline set: every query except q24, whose all-pairs
    * inequality join is a cartesian BY DESIGN (it is the exact recall
    * oracle for q45's LSH-bucketed scale path and stays in the
    * correctness gate; timing a deliberate O(n²) baseline would only
    * measure the baseline). */
  def benchQueries: Map[String, (SparkSession, String) => DataFrame] =
    queries - "q24_embedding_dedup"

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.sql.map(q.name -> _)).toMap
}
