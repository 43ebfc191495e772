package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.InfoTheory

/** Registry slice 10 (round 14): information-theoretic corpus cards in
  * exact integer micro-bits, all powered by the deterministic
  * fixed-point logarithm (`functions.IntLog.ilog2Micro` — the q147
  * unlock applied as distributed infrastructure): per-source Shannon
  * entropy, KL-divergence drift against the corpus reference, and
  * sublinear tf-idf distinctive terms. Every oracle replays the same
  * 20-step integer iteration in a recursive CTE — scores that are
  * normally the first casualties of a cross-engine gate (they ride on
  * libm logs) register hash-exact here. */
private[graft] trait Queries10Information extends Queries9Experiments {

  /** Recursive-CTE replay of `IntLog.ilog2Micro` over a CTE `vals(v)`
    * that each query defines: bit length via the 63-step shift probe,
    * then the 20-step truncating square-and-compare iteration — pure
    * BIGINT arithmetic, bit-identical to the JVM loop. */
  private[graft] val ilogCteSql: String =
    """ipt AS (SELECT v, (SELECT max(e) FROM range(63) t(e)
      |                   WHERE (v >> CAST(e AS INT)) >= 1) AS ip FROM vals),
      |fx(v, ip, x, acc, i) AS (
      |  SELECT v, ip,
      |    CAST(CASE WHEN ip <= 30 THEN v << CAST(30 - ip AS INT)
      |              ELSE v >> CAST(ip - 30 AS INT) END AS BIGINT),
      |    CAST(0 AS BIGINT), 0 FROM ipt
      |  UNION ALL
      |  SELECT v, ip,
      |    CASE WHEN ((x*x) >> 30) >= 2147483648 THEN ((x*x) >> 30) >> 1
      |         ELSE (x*x) >> 30 END,
      |    CASE WHEN ((x*x) >> 30) >= 2147483648 THEN (acc << 1) | 1
      |         ELSE acc << 1 END,
      |    i + 1 FROM fx WHERE i < 20),
      |ilog AS (SELECT v, (CAST(ip AS BIGINT) << 20) + acc AS lm
      |         FROM fx WHERE i = 20)""".stripMargin

  // ---------------------------------------------------------------------
  // q239 — per-source token-distribution entropy card
  // (operators/InfoTheory.entropyCard): Shannon entropy in exact
  // micro-bits, H_mb = ilog(T) − (Σ c·ilog c) div T over 60-bit token
  // hashes. The lexical-diversity panel of the data card — a source
  // whose entropy collapses between crawls switched to template spam
  // (the information-theoretic sibling of the q235 Heaps card).
  // ---------------------------------------------------------------------
  private[graft] def q239Entropy(spark: SparkSession, dir: String): DataFrame =
    InfoTheory.entropyCard(Tables.documents(spark, dir), "source", "text")

  private[graft] val q239Sql =
    s"""WITH RECURSIVE tok AS (
      |  SELECT source, unnest(list_filter(string_split(text, ' '),
      |    x -> x <> '')) AS t FROM documents),
      |cnt AS (SELECT source, t, CAST(count(*) AS BIGINT) AS c
      |  FROM tok GROUP BY 1, 2),
      |tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS t,
      |    CAST(count(*) AS BIGINT) AS types FROM cnt GROUP BY 1),
      |vals AS (SELECT DISTINCT v FROM (
      |  SELECT c AS v FROM cnt UNION ALL SELECT t FROM tot)),
      |$ilogCteSql,
      |sumci AS (SELECT cnt.source, CAST(sum(c * il.lm) AS BIGINT) AS s
      |  FROM cnt JOIN ilog il ON il.v = cnt.c GROUP BY 1)
      |SELECT tot.source, tot.t AS n_tokens, tot.types AS n_types,
      |  CAST((SELECT lm FROM ilog WHERE v = tot.t) - (sumci.s // tot.t)
      |    AS BIGINT) AS entropy_mb
      |FROM tot JOIN sumci ON sumci.source = tot.source""".stripMargin

  // ---------------------------------------------------------------------
  // q240 — KL-divergence drift card (operators/InfoTheory.klDriftCard):
  // per-source KL(source ‖ corpus) in micro-bits over 1024 md5 buckets,
  // add-one smoothed. The drift companion to q217's cosine: cosine
  // sees direction, KL weighs the tails — boilerplate displacing the
  // long tail moves KL first.
  // ---------------------------------------------------------------------
  private[graft] def q240KlDrift(spark: SparkSession, dir: String): DataFrame =
    InfoTheory.klDriftCard(Tables.documents(spark, dir), "source", "text",
      buckets = 1024)

  private[graft] val q240Sql =
    s"""WITH RECURSIVE tb AS (
      |  SELECT source,
      |    CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT) % 1024 AS b
      |  FROM (SELECT source, unnest(list_filter(string_split(text, ' '),
      |          x -> x <> '')) AS t FROM documents)),
      |gc AS (SELECT source, b, CAST(count(*) AS BIGINT) AS cg
      |       FROM tb GROUP BY 1, 2),
      |cb AS (SELECT b, CAST(count(*) AS BIGINT) AS cc FROM tb GROUP BY 1),
      |gt AS (SELECT source, CAST(sum(cg) AS BIGINT) AS tg FROM gc GROUP BY 1),
      |ct AS (SELECT CAST(count(*) AS BIGINT) AS tc FROM tb),
      |j AS (SELECT a.source, a.tg,
      |    COALESCE(g.cg, 0) + 1 AS cg1, COALESCE(c.cc, 0) + 1 AS cc1,
      |    (SELECT tc FROM ct) AS tc
      |  FROM (SELECT gt.source, gt.tg, r.range AS b
      |        FROM gt CROSS JOIN range(1024) r) a
      |  LEFT JOIN gc g ON g.source = a.source AND g.b = a.b
      |  LEFT JOIN cb c ON c.b = a.b),
      |vals AS (SELECT DISTINCT v FROM (
      |  SELECT cg1 AS v FROM j UNION ALL SELECT cc1 FROM j
      |  UNION ALL SELECT tg + 1024 FROM gt
      |  UNION ALL SELECT tc + 1024 FROM ct)),
      |$ilogCteSql,
      |term AS (SELECT j.source, j.tg,
      |    j.cg1 * (l1.lm - l2.lm - l3.lm + l4.lm) AS trm
      |  FROM j JOIN ilog l1 ON l1.v = j.cg1
      |         JOIN ilog l2 ON l2.v = j.tg + 1024
      |         JOIN ilog l3 ON l3.v = j.cc1
      |         JOIN ilog l4 ON l4.v = j.tc + 1024)
      |SELECT source, CAST(any_value(tg) AS BIGINT) AS n_tokens,
      |  CAST(sum(trm) // (any_value(tg) + 1024) AS BIGINT) AS kl_mb
      |FROM term GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // q241 — tf-idf distinctive terms (operators/InfoTheory
  // .tfidfTopTerms): top-10 per source by sublinear "ltc" weighting
  // ((1 + log2 tf)·log2(N/df)) in micro-bits — group-level tf,
  // corpus-wide document df, top-k via the mergeable k-ledger
  // aggregate (NO per-group sort window; the oracle's window is
  // DuckDB-side only).
  // ---------------------------------------------------------------------
  private[graft] def q241TfidfTerms(spark: SparkSession, dir: String): DataFrame =
    InfoTheory.tfidfTopTerms(Tables.documents(spark, dir), "source",
      "doc_id", "text", k = 10)

  private[graft] val q241Sql =
    s"""WITH RECURSIVE tk AS (
      |  SELECT source, doc_id, t,
      |    CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) AS th
      |  FROM (SELECT source, doc_id,
      |          unnest(list_filter(string_split(text, ' '),
      |            x -> x <> '')) AS t FROM documents)),
      |tf AS (SELECT source, th, CAST(count(*) AS BIGINT) AS tf
      |       FROM tk GROUP BY 1, 2),
      |dfd AS (SELECT th, CAST(count(DISTINCT doc_id) AS BIGINT) AS dfd
      |        FROM tk GROUP BY 1),
      |nn AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n
      |       FROM documents),
      |vals AS (SELECT DISTINCT v FROM (
      |  SELECT tf AS v FROM tf UNION ALL SELECT dfd FROM dfd
      |  UNION ALL SELECT n FROM nn)),
      |$ilogCteSql,
      |w AS (SELECT tf.source, tf.th, tf.tf, dfd.dfd,
      |    ((1048576 + lt.lm) *
      |     ((SELECT lm FROM ilog, nn WHERE v = nn.n) - ld.lm))
      |      // 1048576 AS w
      |  FROM tf JOIN dfd ON dfd.th = tf.th
      |          JOIN ilog lt ON lt.v = tf.tf
      |          JOIN ilog ld ON ld.v = dfd.dfd),
      |r AS (SELECT *, row_number() OVER
      |        (PARTITION BY source ORDER BY w DESC, th ASC) AS rk FROM w),
      |v2 AS (SELECT DISTINCT th, t FROM tk)
      |SELECT r.source, CAST(r.rk AS BIGINT) AS rank, v2.t AS term,
      |  r.tf, r.dfd AS df_docs, CAST(r.w AS BIGINT) AS w_mb
      |FROM r JOIN v2 ON v2.th = r.th WHERE rk <= 10""".stripMargin

  // ---------------------------------------------------------------------
  // q242 — unigram cross-entropy quality bands (operators/InfoTheory
  // .xentQualityCard): per-doc CCNet-style "perplexity" under the
  // corpus MLE unigram model, quantized to exact micro-bits, histogram
  // per source in quarter-bit bands. Low bands = boilerplate, very
  // high = garble; curation keeps the middle.
  // ---------------------------------------------------------------------
  private[graft] def q242XentBands(spark: SparkSession, dir: String): DataFrame =
    InfoTheory.xentQualityCard(Tables.documents(spark, dir), "source",
      "doc_id", "text")

  private[graft] val q242Sql =
    s"""WITH RECURSIVE dt AS (
      |  SELECT source, doc_id,
      |    CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) AS th,
      |    CAST(count(*) AS BIGINT) AS cdt
      |  FROM (SELECT source, doc_id,
      |          unnest(list_filter(string_split(text, ' '),
      |            x -> x <> '')) AS t FROM documents)
      |  GROUP BY 1, 2, 3),
      |voc AS (SELECT th, CAST(sum(cdt) AS BIGINT) AS ct FROM dt GROUP BY 1),
      |tt AS (SELECT CAST(sum(ct) AS BIGINT) AS t FROM voc),
      |vals AS (SELECT DISTINCT v FROM (
      |  SELECT ct AS v FROM voc UNION ALL SELECT t FROM tt)),
      |$ilogCteSql,
      |pd AS (SELECT dt.source, dt.doc_id,
      |    CAST(sum(cdt * ((SELECT lm FROM ilog, tt WHERE v = tt.t) - il.lm))
      |      AS BIGINT) AS num,
      |    CAST(sum(cdt) AS BIGINT) AS len
      |  FROM dt JOIN voc ON voc.th = dt.th JOIN ilog il ON il.v = voc.ct
      |  GROUP BY 1, 2),
      |x AS (SELECT source, num // len AS x FROM pd)
      |SELECT source, CAST(x // 262144 AS BIGINT) AS band,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(min(x) AS BIGINT) AS min_xent_mb,
      |  CAST(max(x) AS BIGINT) AS max_xent_mb
      |FROM x GROUP BY 1, 2""".stripMargin

  // ---------------------------------------------------------------------
  // q243 — mutual-information feature card (operators/InfoTheory
  // .miFeatureCard): top-50 hashed-BoW buckets by MI(source; bucket)
  // contribution in micro-bits — the filter-method feature selector
  // over exactly the buckets the q178 classifier trains on. Empty
  // cells contribute exactly 0 (MLE convention), so no dense axis.
  // ---------------------------------------------------------------------
  private[graft] def q243MiFeatures(spark: SparkSession, dir: String): DataFrame =
    InfoTheory.miFeatureCard(Tables.documents(spark, dir), "source", "text",
      buckets = 1024, k = 50)

  private[graft] val q243Sql =
    s"""WITH RECURSIVE tb AS (
      |  SELECT source,
      |    CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT) % 1024 AS b
      |  FROM (SELECT source, unnest(list_filter(string_split(text, ' '),
      |          x -> x <> '')) AS t FROM documents)),
      |gc AS (SELECT source, b, CAST(count(*) AS BIGINT) AS cgb
      |       FROM tb GROUP BY 1, 2),
      |gt AS (SELECT source, CAST(sum(cgb) AS BIGINT) AS tg FROM gc GROUP BY 1),
      |bt AS (SELECT b, CAST(sum(cgb) AS BIGINT) AS tb2 FROM gc GROUP BY 1),
      |tt AS (SELECT CAST(sum(cgb) AS BIGINT) AS t FROM gc),
      |vals AS (SELECT DISTINCT v FROM (
      |  SELECT cgb AS v FROM gc UNION ALL SELECT tg FROM gt
      |  UNION ALL SELECT tb2 FROM bt UNION ALL SELECT t FROM tt)),
      |$ilogCteSql,
      |term AS (SELECT gc.b, gc.cgb,
      |    gc.cgb * (l1.lm + (SELECT lm FROM ilog, tt WHERE v = tt.t)
      |              - l2.lm - l3.lm) AS trm
      |  FROM gc JOIN gt ON gt.source = gc.source JOIN bt ON bt.b = gc.b
      |       JOIN ilog l1 ON l1.v = gc.cgb
      |       JOIN ilog l2 ON l2.v = gt.tg
      |       JOIN ilog l3 ON l3.v = bt.tb2)
      |SELECT CAST(b AS BIGINT) AS bucket,
      |  CAST(sum(cgb) AS BIGINT) AS n_tokens,
      |  CAST(sum(trm) // (SELECT t FROM tt) AS BIGINT) AS mi_mb
      |FROM term GROUP BY 1
      |ORDER BY mi_mb DESC, bucket ASC LIMIT 50""".stripMargin

  // ---------------------------------------------------------------------
  // q244 — cross-source overlap matrix (operators/Scrub
  // .sourceOverlapMatrix): exact pairwise 3-shingle Jaccard between
  // every source pair in parts-per-million, zero-overlap pairs
  // included — "which ingestion sources feed me the same content".
  // ---------------------------------------------------------------------
  private[graft] def q244SourceOverlap(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Scrub.sourceOverlapMatrix(
      Tables.documents(spark, dir), "source", "text", n = 3)

  private[graft] val q244Sql =
    """WITH t AS (SELECT source, list_filter(string_split(text, ' '),
      |    x -> x <> '') AS tk FROM documents),
      |sh AS (SELECT DISTINCT source AS g,
      |    CAST(('0x' || substr(md5(sg), 1, 15)) AS BIGINT) AS h FROM (
      |  SELECT source, unnest(CASE WHEN len(tk) >= 3
      |    THEN list_transform(generate_series(1, len(tk)-2),
      |           i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
      |    ELSE [] END) AS sg FROM t)),
      |allg AS (SELECT DISTINCT source AS g FROM documents),
      |szx AS (SELECT g, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY 1),
      |sz AS (SELECT allg.g, COALESCE(szx.n, CAST(0 AS BIGINT)) AS n
      |       FROM allg LEFT JOIN szx ON szx.g = allg.g),
      |inter AS (SELECT a.g AS ga, b.g AS gb, CAST(count(*) AS BIGINT) AS nc
      |  FROM sh a JOIN sh b ON a.h = b.h AND a.g < b.g GROUP BY 1, 2)
      |SELECT sa.g AS group_a, sb.g AS group_b, sa.n AS n_a, sb.n AS n_b,
      |  COALESCE(i.nc, CAST(0 AS BIGINT)) AS n_common,
      |  CAST(CASE WHEN sa.n + sb.n - COALESCE(i.nc, 0) = 0 THEN 0
      |    ELSE (1000000 * COALESCE(i.nc, 0)) //
      |      (sa.n + sb.n - COALESCE(i.nc, 0)) END AS BIGINT) AS jaccard_ppm
      |FROM sz sa JOIN sz sb ON sa.g < sb.g
      |LEFT JOIN inter i ON i.ga = sa.g AND i.gb = sb.g""".stripMargin

  // ---------------------------------------------------------------------
  // q245 — PMI collocation mining (operators/InfoTheory
  // .pmiCollocations): every within-document bigram at support >= 5,
  // scored by exact micro-bit pointwise mutual information. High-PMI
  // pairs are multiword expressions; navigation chrome at the top of
  // this card is the template-spam tell.
  // ---------------------------------------------------------------------
  private[graft] def q245PmiCollocations(spark: SparkSession, dir: String): DataFrame =
    InfoTheory.pmiCollocations(Tables.documents(spark, dir), "text",
      minCount = 5L)

  private[graft] val q245Sql =
    s"""WITH RECURSIVE t AS (SELECT list_filter(string_split(text, ' '),
      |    x -> x <> '') AS tk FROM documents),
      |bg AS (SELECT split_part(s, ' ', 1) AS x, split_part(s, ' ', 2) AS y,
      |    CAST(count(*) AS BIGINT) AS c
      |  FROM (SELECT unnest(CASE WHEN len(tk) >= 2
      |    THEN list_transform(generate_series(1, len(tk)-1),
      |           i -> tk[i] || ' ' || tk[i+1])
      |    ELSE [] END) AS s FROM t)
      |  GROUP BY 1, 2),
      |lmx AS (SELECT x, CAST(sum(c) AS BIGINT) AS cx FROM bg GROUP BY 1),
      |rmy AS (SELECT y, CAST(sum(c) AS BIGINT) AS cy FROM bg GROUP BY 1),
      |tt AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM bg),
      |vals AS (SELECT DISTINCT v FROM (
      |  SELECT c AS v FROM bg UNION ALL SELECT cx FROM lmx
      |  UNION ALL SELECT cy FROM rmy UNION ALL SELECT t FROM tt)),
      |$ilogCteSql
      |SELECT bg.x, bg.y, bg.c AS n_xy,
      |  CAST(l1.lm + (SELECT lm FROM ilog, tt WHERE v = tt.t)
      |       - l2.lm - l3.lm AS BIGINT) AS pmi_mb
      |FROM bg JOIN lmx ON lmx.x = bg.x JOIN rmy ON rmy.y = bg.y
      |  JOIN ilog l1 ON l1.v = bg.c
      |  JOIN ilog l2 ON l2.v = lmx.cx
      |  JOIN ilog l3 ON l3.v = rmy.cy
      |WHERE bg.c >= 5""".stripMargin

  // ---------------------------------------------------------------------
  // q246 — bigram entropy rate (operators/InfoTheory
  // .bigramEntropyRate): per-source H(next | current) = H(X,Y) − H(X)
  // in exact micro-bits. Structural-determinism detector: template
  // spam collapses toward 0 even when unigram entropy (q239) still
  // looks healthy.
  // ---------------------------------------------------------------------
  private[graft] def q246BigramEntropy(spark: SparkSession, dir: String): DataFrame =
    InfoTheory.bigramEntropyRate(Tables.documents(spark, dir), "source",
      "text")

  private[graft] val q246Sql =
    s"""WITH RECURSIVE t AS (SELECT source,
      |    list_filter(string_split(text, ' '), x -> x <> '') AS tk
      |  FROM documents),
      |jb AS (SELECT source, split_part(s, ' ', 1) AS x,
      |    split_part(s, ' ', 2) AS y, CAST(count(*) AS BIGINT) AS c
      |  FROM (SELECT source, unnest(CASE WHEN len(tk) >= 2
      |    THEN list_transform(generate_series(1, len(tk)-1),
      |           i -> tk[i] || ' ' || tk[i+1])
      |    ELSE [] END) AS s FROM t)
      |  GROUP BY 1, 2, 3),
      |mx AS (SELECT source, x, CAST(sum(c) AS BIGINT) AS cx
      |       FROM jb GROUP BY 1, 2),
      |tg AS (SELECT source, CAST(sum(c) AS BIGINT) AS tb FROM jb GROUP BY 1),
      |vals AS (SELECT DISTINCT v FROM (
      |  SELECT c AS v FROM jb UNION ALL SELECT cx FROM mx
      |  UNION ALL SELECT tb FROM tg)),
      |$ilogCteSql,
      |hxy AS (SELECT jb.source, CAST(sum(c * il.lm) AS BIGINT) AS s
      |  FROM jb JOIN ilog il ON il.v = jb.c GROUP BY 1),
      |hx AS (SELECT mx.source, CAST(sum(cx * il.lm) AS BIGINT) AS s
      |  FROM mx JOIN ilog il ON il.v = mx.cx GROUP BY 1)
      |SELECT tg.source, tg.tb AS n_bigrams,
      |  CAST((SELECT lm FROM ilog WHERE v = tg.tb) - (hxy.s // tg.tb)
      |    AS BIGINT) AS hxy_mb,
      |  CAST((SELECT lm FROM ilog WHERE v = tg.tb) - (hx.s // tg.tb)
      |    AS BIGINT) AS hx_mb,
      |  CAST((hx.s // tg.tb) - (hxy.s // tg.tb) AS BIGINT) AS cond_mb
      |FROM tg JOIN hxy ON hxy.source = tg.source
      |        JOIN hx ON hx.source = tg.source""".stripMargin

  // ---------------------------------------------------------------------
  // q249 — leave-one-out ablation entropy (operators/InfoTheory
  // .leaveOneOutEntropy): corpus entropy WITHOUT each source, in delta
  // form (only the source's own (token, count) rows are touched; the
  // corpus constant S carries the rest) — the data-ablation card and
  // the incremental-stats law in one: removing a shard updates the
  // card without rescanning the corpus.
  // ---------------------------------------------------------------------
  private[graft] def q249LeaveOneOut(spark: SparkSession, dir: String): DataFrame =
    InfoTheory.leaveOneOutEntropy(Tables.documents(spark, dir), "source",
      "text")

  private[graft] val q249Sql =
    s"""WITH RECURSIVE gt AS (SELECT source, t, CAST(count(*) AS BIGINT) AS c
      |  FROM (SELECT source, unnest(list_filter(string_split(text, ' '),
      |          x -> x <> '')) AS t FROM documents)
      |  GROUP BY 1, 2),
      |cp AS (SELECT t, CAST(sum(c) AS BIGINT) AS cc FROM gt GROUP BY 1),
      |tot AS (SELECT CAST(sum(cc) AS BIGINT) AS tt,
      |        CAST(count(*) AS BIGINT) AS types FROM cp),
      |g2 AS (SELECT source, CAST(sum(c) AS BIGINT) AS tg FROM gt GROUP BY 1),
      |vals AS (SELECT DISTINCT v FROM (
      |  SELECT cc AS v FROM cp
      |  UNION ALL SELECT cc - c FROM gt JOIN cp USING (t) WHERE cc > c
      |  UNION ALL SELECT tt FROM tot
      |  UNION ALL SELECT tt - tg FROM g2, tot WHERE tg < tt)),
      |$ilogCteSql,
      |sc AS (SELECT CAST(sum(cp.cc * il.lm) AS BIGINT) AS s
      |       FROM cp JOIN ilog il ON il.v = cp.cc),
      |d AS (SELECT gt.source, gt.c, cp.cc,
      |    cp.cc * ilc.lm - CASE WHEN cp.cc > gt.c
      |      THEN (cp.cc - gt.c) * ilr.lm ELSE 0 END AS dd
      |  FROM gt JOIN cp USING (t)
      |  JOIN ilog ilc ON ilc.v = cp.cc
      |  LEFT JOIN ilog ilr ON ilr.v = cp.cc - gt.c),
      |agg AS (SELECT source, CAST(sum(c) AS BIGINT) AS tg,
      |    CAST(sum(dd) AS BIGINT) AS dsum,
      |    CAST(sum(CASE WHEN cc = c THEN 1 ELSE 0 END) AS BIGINT) AS gone
      |  FROM d GROUP BY 1),
      |f AS (SELECT a.source, tt - tg AS ntr, types - gone AS nyr,
      |    (SELECT lm FROM ilog WHERE v = tt - tg)
      |      - ((s - dsum) // (tt - tg)) AS hr,
      |    (SELECT lm FROM ilog WHERE v = tt) - (s // tt) AS hc
      |  FROM agg a, tot, sc WHERE tg < tt)
      |SELECT source, CAST(ntr AS BIGINT) AS n_tokens_rest,
      |  CAST(nyr AS BIGINT) AS n_types_rest,
      |  CAST(hr AS BIGINT) AS entropy_mb_rest,
      |  CAST(hc AS BIGINT) AS corpus_mb,
      |  CAST(hr - hc AS BIGINT) AS delta_mb
      |FROM f""".stripMargin

  // ---------------------------------------------------------------------
  // q251 — pairwise symmetric KL drift matrix (operators/InfoTheory
  // .klDriftMatrix): which sources are distributionally alike — each
  // direction is exactly the q240 quantization with the other source
  // standing in for the corpus. Near-zero q244 Jaccard with near-zero
  // KL here is the template-rewrite signature.
  // ---------------------------------------------------------------------
  private[graft] def q251KlMatrix(spark: SparkSession, dir: String): DataFrame =
    InfoTheory.klDriftMatrix(Tables.documents(spark, dir), "source",
      "text", buckets = 256)

  private[graft] val q251Sql =
    s"""WITH RECURSIVE tb AS (
      |  SELECT source,
      |    CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT) % 256 AS b
      |  FROM (SELECT source, unnest(list_filter(string_split(text, ' '),
      |          x -> x <> '')) AS t FROM documents)),
      |gc AS (SELECT source, b, CAST(count(*) AS BIGINT) AS c
      |       FROM tb GROUP BY 1, 2),
      |allg AS (SELECT DISTINCT source FROM documents),
      |gtx AS (SELECT source, CAST(sum(c) AS BIGINT) AS tg FROM gc GROUP BY 1),
      |gt AS (SELECT allg.source, COALESCE(gtx.tg, CAST(0 AS BIGINT)) AS tg
      |       FROM allg LEFT JOIN gtx ON gtx.source = allg.source),
      |ax AS (SELECT a.source AS ga, a.tg AS ta, b.source AS gb, b.tg AS tb2,
      |    r.range AS b
      |  FROM gt a JOIN gt b ON a.source < b.source CROSS JOIN range(256) r),
      |j AS (SELECT ax.ga, ax.gb, ax.ta, ax.tb2,
      |    COALESCE(ca.c, 0) + 1 AS a1, COALESCE(cb.c, 0) + 1 AS b1
      |  FROM ax
      |  LEFT JOIN gc ca ON ca.source = ax.ga AND ca.b = ax.b
      |  LEFT JOIN gc cb ON cb.source = ax.gb AND cb.b = ax.b),
      |vals AS (SELECT DISTINCT v FROM (
      |  SELECT a1 AS v FROM j UNION ALL SELECT b1 FROM j
      |  UNION ALL SELECT tg + 256 FROM gt)),
      |$ilogCteSql,
      |term AS (SELECT j.ga, j.gb, j.ta, j.tb2,
      |    j.a1 * (la.lm - lta.lm - lb.lm + ltb.lm) AS t1,
      |    j.b1 * (lb.lm - ltb.lm - la.lm + lta.lm) AS t2
      |  FROM j JOIN ilog la ON la.v = j.a1
      |         JOIN ilog lb ON lb.v = j.b1
      |         JOIN ilog lta ON lta.v = j.ta + 256
      |         JOIN ilog ltb ON ltb.v = j.tb2 + 256),
      |agg AS (SELECT ga, gb, CAST(any_value(ta) AS BIGINT) AS ta,
      |    CAST(any_value(tb2) AS BIGINT) AS tb2,
      |    CAST(sum(t1) // (any_value(ta) + 256) AS BIGINT) AS klab,
      |    CAST(sum(t2) // (any_value(tb2) + 256) AS BIGINT) AS klba
      |  FROM term GROUP BY 1, 2)
      |SELECT ga AS group_a, gb AS group_b, ta AS n_tokens_a,
      |  tb2 AS n_tokens_b, klab AS kl_ab_mb, klba AS kl_ba_mb,
      |  CAST(klab + klba AS BIGINT) AS skl_mb
      |FROM agg""".stripMargin

  // ---------------------------------------------------------------------
  // q250 — token burstiness card (operators/InfoTheory.burstinessCard):
  // top-50 tokens by exact integer variance-to-mean ratio of per-doc
  // counts over ALL documents — the dispersion axis frequency cards
  // can't see (topical/template tokens concentrate, function words sit
  // near Poisson). Cross-multiplied in DECIMAL/HUGEINT, one truncating
  // division.
  // ---------------------------------------------------------------------
  private[graft] def q250Burstiness(spark: SparkSession, dir: String): DataFrame =
    InfoTheory.burstinessCard(Tables.documents(spark, dir), "doc_id",
      "text", minCount = 5L, k = 50)

  private[graft] val q250Sql =
    """WITH n AS (SELECT CAST(count(DISTINCT doc_id) AS HUGEINT) AS nd
      |           FROM documents),
      |dt AS (SELECT doc_id, t, CAST(count(*) AS BIGINT) AS c
      |  FROM (SELECT doc_id, unnest(list_filter(string_split(text, ' '),
      |          x -> x <> '')) AS t FROM documents)
      |  GROUP BY 1, 2),
      |s AS (SELECT t, CAST(sum(c) AS HUGEINT) AS sx,
      |    CAST(sum(c * c) AS HUGEINT) AS sxx,
      |    CAST(count(*) AS BIGINT) AS ndw FROM dt GROUP BY 1)
      |SELECT t AS token, CAST(sx AS BIGINT) AS n_occ, ndw AS n_docs_with,
      |  CAST((1000000 * (nd * sxx - sx * sx)) // (nd * sx) AS BIGINT)
      |    AS burst_micro
      |FROM s, n WHERE sx >= 5
      |ORDER BY burst_micro DESC, token ASC LIMIT 50""".stripMargin
}
