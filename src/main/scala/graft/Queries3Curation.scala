package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.codec.{DnsWire, DnstapCodec}
import graft.dns.{DnsAnalog, DnstapRows}
import graft.functions.{Anonymize, DnsNames, IpFunctions, VectorFunctions}
import graft.operators.{AsOfMatch, CorpusStats, Dedup, GroupingSetCounter, MediaCodec, Multimodal, NgramModel, Packing, Percentiles, Quantize, Sampling, Scrub, Similarity, SkewAgg, TextAnalysis}

/** Curation and quantization families (q53-q78): per-group caps, PII, decontamination, shards/splits/mixes, dup spans, n-grams, PQ/int8, curriculum.
  *
  * Mechanical r12 split of the former single-file SparkEntry registry;
  * see [[QueriesBase]] for the chaining rationale. */
private[graft] trait Queries3Curation extends Queries2Sketches {

  // q53 — per-group deterministic cap: at most N docs per predicted
  // language, chosen by hash rank (a pure function of the data, so the
  // oracle certifies the exact kept set — "at most N per domain" is the
  // standard training-mix balancing step).
  private[graft] def q53PerGroupCap(spark: SparkSession, dir: String): DataFrame = {
    val langs = Tables.documents(spark, dir)
      .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_pred"))
    Sampling.capPerGroup(langs, "doc_id", "lang_pred", n = 25)
  }

  private[graft] val q53Sql =
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
  private[graft] def q46AnnIvfKmeans(spark: SparkSession, dir: String): DataFrame =
    Similarity.annIvfKmeans(corpus(spark, dir), probes(spark, dir),
      k = 3, nCells = 8)

  // q51 — sequence packing (operators/Packing): documents greedily packed
  // into fixed-token-capacity training sequences, first-fit decreasing
  // per hash partition. Pack assignment depends on Spark's hash
  // partitioning, which no SQL oracle can reproduce → rows-only check;
  // the packing invariants (capacity, tiling offsets, waste bound) are
  // asserted in PackingSpec instead.
  private[graft] def q51SequencePacking(spark: SparkSession, dir: String): DataFrame = {
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
  private[graft] def plantedPii: Column = concat(col("text"),
    lit(" contact user"), col("doc_id").cast("string"),
    lit("@mail.example.com from 10."),
    (col("doc_id") % 250).cast("string"), lit(".0.7 call 555-"),
    lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-"),
    lpad((col("doc_id") % 10000).cast("string"), 4, "0"))

  /** DuckDB form of [[plantedPii]] (aliased `t`). ONE LINE on purpose:
    * the callers interpolate it into stripMargin blocks, where a
    * leading `||` continuation would be eaten as a margin. */
  private[graft] val plantedPiiSql: String =
    "text || ' contact user' || CAST(doc_id AS VARCHAR) || " +
      "'@mail.example.com from 10.' || CAST(doc_id % 250 AS VARCHAR) || " +
      "'.0.7 call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || " +
      "'-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t"

  private[graft] def q54PiiRedact(spark: SparkSession, dir: String): DataFrame = {
    val planted = plantedPii
    val counts = Scrub.piiCounts(planted).map { case (n, c) => c.as(n) }
    Tables.documents(spark, dir)
      .select(Seq(col("doc_id")) ++ counts :+
        Scrub.redactPii(planted).as("clean_text"): _*)
  }

  private[graft] val q54Sql = {
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
  private[graft] def q55RepetitionQuality(spark: SparkSession, dir: String): DataFrame = {
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

  private[graft] val q55Sql =
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
  private[graft] def q56Decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    Scrub.decontaminate(
      train = docs.filter(col("source") =!= "src0"),
      eval = docs.filter(col("source") === "src0"),
      idCol = "doc_id", textCol = "text", n = 5)
  }

  private[graft] val q56Sql =
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
  private[graft] def q57Anonymize(spark: SparkSession, dir: String): DataFrame = {
    val x = (col("user_id") * lit(2654435761L)) % lit(4294967296L)
    Tables.events(spark, dir).select(col("event_id"),
      Anonymize.pseudonym(col("user_id"), "graft-export").as("user_pseudonym"),
      IpFunctions.ipv4_string(Anonymize.ipv4Truncate(x, 24)).as("ip_24"))
  }

  private[graft] val q57Sql =
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
  private[graft] def q58RareTokens(spark: SparkSession, dir: String): DataFrame =
    CorpusStats.rareTokenStats(Tables.documents(spark, dir),
      "doc_id", "text", rareBelow = 10L)

  private[graft] val q58Sql =
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
  private[graft] def q59ShardStats(spark: SparkSession, dir: String): DataFrame =
    Sampling.shardStats(Tables.documents(spark, dir),
      "doc_id", "n_chars", nShards = 16)

  private[graft] val q59Sql =
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
  private[graft] def q60SourceOverlap(spark: SparkSession, dir: String): DataFrame =
    CorpusStats.sourceOverlap(Tables.documents(spark, dir),
      "text", "source", n = 5)

  private[graft] val q60Sql =
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
  private[graft] def q61IncrementalDedup(spark: SparkSession, dir: String): DataFrame = {
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
  private[graft] def incrementalDedupSql(threshold: String) =
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

  private[graft] val q61Sql = incrementalDedupSql("0.5")

  // q62 — deterministic train/val/test split (operators/Sampling): hash-
  // range labels that never move a document between splits as the corpus
  // grows — eval stays eval forever.
  private[graft] def q62Split(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(col("doc_id"),
      Sampling.splitLabel(col("doc_id"),
        Seq("val" -> 10, "test" -> 10), rest = "train").as("split"))

  private[graft] val q62Sql =
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
  private[graft] def q63EpochMix(spark: SparkSession, dir: String): DataFrame =
    Sampling.epochExpand(
      Tables.documents(spark, dir).select(col("doc_id"), col("lang")),
      "doc_id", "lang", Map("en" -> 140, "zh" -> 30), defaultCenti = 100)

  private[graft] val q63Sql =
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
  private[graft] def q64Chunk(spark: SparkSession, dir: String): DataFrame =
    CorpusStats.chunk(Tables.documents(spark, dir), "doc_id", "text",
      seqLen = 32)

  private[graft] val q64Sql =
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
  private[graft] def q65TrainingManifest(spark: SparkSession, dir: String): DataFrame = {
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

  private[graft] val q65Sql =
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
  private[graft] def q66DupSpanCoverage(spark: SparkSession, dir: String): DataFrame =
    Dedup.duplicateSpanCoverage(Tables.documents(spark, dir),
      "doc_id", "text", k = 8)

  private[graft] val q66Sql =
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
  private[graft] def q67NgramCommonness(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    NgramModel.ngramCommonness(
      docs.filter(col("source") =!= "src0"),
      docs.filter(col("source") === "src0"),
      "doc_id", "text", n = 3)
  }

  private[graft] val q67Sql =
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
  private[graft] def q68IncrementalDedupBloom(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val slice = pmod(Dedup.baseHash32(col("doc_id").cast("string")), lit(10))
    Dedup.incrementalJaccardPairs(
      corpus = docs.filter(slice =!= 0),
      batch = docs.filter(slice === 0),
      idCol = "doc_id", textCol = "text", n = 3, threshold = 0.4,
      maxShingleDfFrac = 0.1, bloomFpp = 0.03)
  }

  private[graft] val q68Sql = incrementalDedupSql("0.4")

  // ---------------------------------------------------------------------
  // q69 — per-source token budget (operators/Sampling.weightBudget):
  // each source contributes at most 400 tokens to the mix, docs admitted
  // in salted-hash order — the budget-shaped sibling of q53's per-group
  // cap, exact against the oracle's running-sum window while running as
  // the two-phase bucket histogram at scale.
  // ---------------------------------------------------------------------
  private[graft] def q69TokenBudget(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
    Sampling.weightBudget(docs, "doc_id", "n_tokens", "source", budget = 400L)
  }

  private[graft] val q69Sql =
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
  private[graft] def q70TemperatureMix(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("source"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("n_tokens"))
    Sampling.temperatureMixWeights(docs, "source", "n_tokens", temperature = 0.5)
  }

  private[graft] val q70Sql =
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
  private[graft] def q71VocabDrift(spark: SparkSession, dir: String): DataFrame =
    CorpusStats.vocabDrift(Tables.documents(spark, dir), "source", "text", k = 40)

  private[graft] val q71Sql =
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
  private[graft] def q72RemoveDupSpans(spark: SparkSession, dir: String): DataFrame =
    Dedup.removeDuplicateSpans(Tables.documents(spark, dir), "doc_id", "text",
      k = 8)

  private[graft] val q72Sql =
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
  private[graft] def q73Boilerplate(spark: SparkSession, dir: String): DataFrame =
    CorpusStats.boilerplateShingles(Tables.documents(spark, dir), "doc_id",
      "text", n = 3, minDfFrac = 0.01)

  private[graft] val q73Sql =
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
  private[graft] def q74SemanticDedup(spark: SparkSession, dir: String): DataFrame = {
    val c = corpus(spark, dir)
    val cents = c.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cell"), col("embedding").as("ce"))
    Similarity.semanticDedup(c, cents, threshold = 0.4)
  }

  private[graft] val q74Sql =
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
  private[graft] def q75PqAdc(spark: SparkSession, dir: String): DataFrame = {
    val c = corpus(spark, dir)
    val books = Quantize.pqCodebooks(c, "vec_id", "embedding", m = 4, ksub = 16)
    val codes = Quantize.pqEncode(c, "vec_id", "embedding", books)
    Quantize.pqSearchAdc(codes, probes(spark, dir), k = 5, books)
  }

  /** Left-to-right squared-L2 between 16-element windows of two list
    * columns at 1-based offset `sub`*16 (mirrors Quantize.subL2). */
  private[graft] def duckSubL2(a: String, b: String, sub: String): String =
    s"list_reduce(list_transform(generate_series(1, 16), i -> " +
      s"(CAST($a[$sub*16+i] AS DOUBLE) - CAST($b[$sub*16+i] AS DOUBLE)) * " +
      s"(CAST($a[$sub*16+i] AS DOUBLE) - CAST($b[$sub*16+i] AS DOUBLE))), (x,y) -> x+y)"

  private[graft] val q75Sql =
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
  private[graft] def q76Int8Quantize(spark: SparkSession, dir: String): DataFrame =
    Quantize.int8Quantize(corpus(spark, dir), "vec_id", "embedding")

  private[graft] val q76QvSql: String =
    "CASE WHEN scale = 0 THEN 0.0 ELSE LEAST(127.0, GREATEST(-127.0, " +
      "FLOOR(CAST(x AS DOUBLE) / scale + 0.5))) END"

  private[graft] val q76Sql =
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
  private[graft] def q77CurriculumOrder(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        least(lit(9L), floor(col("n_chars") / lit(500.0)).cast("long")).as("bin"))
    Sampling.globalOrder(docs, "doc_id", "bin")
      .select(col("doc_id"), col("bin"), col("pos"))
  }

  private[graft] val q77Sql =
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
  private[graft] def q78PqRecall(spark: SparkSession, dir: String): DataFrame = {
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
  private[graft] def duckL2Full(a: String, b: String): String =
    s"list_reduce(list_transform(generate_series(1, len($a)), i -> " +
      s"(CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)) * " +
      s"(CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))), (x,y) -> x+y)"

  private[graft] val q78Sql =
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
}
