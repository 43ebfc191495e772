package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.IntLogFunctions.ilog2_micro

/** Information-theoretic corpus cards in EXACT integer micro-bits
  * (2⁻²⁰·log2 units), built on [[graft.functions.IntLog]]'s
  * deterministic fixed-point logarithm: Shannon entropy per group,
  * KL-divergence drift against the corpus reference, and sublinear
  * tf-idf distinctive terms. Every score is a BIGINT both engines
  * reproduce bit-for-bit — the float-log versions of these cards can
  * never be oracle-compared (libm divergence at floor boundaries),
  * which is why entropy/KL/tf-idf are usually the first casualties of
  * a cross-engine correctness gate.
  *
  * Scale shape, shared by all three: tokens hash to fixed-width keys
  * before any shuffle (the dedup-family discipline — text never
  * shuffles), every aggregation is map-side combined, and the
  * post-aggregation frames are vocabulary- or bucket-bounded, so the
  * corpus is touched exactly once per card.
  *
  * Overflow bound (documented, not checked row-wise): Σ c·ilog(c) ≤
  * T·ilog(T) stays inside a signed 64-bit integer for per-group token
  * counts T up to ~1.4×10¹¹ — beyond that, shift to a coarser
  * quantization before summing. */
object InfoTheory {

  /** Per-group Shannon entropy of the token distribution, in
    * micro-bits: H_mb = ilog(T) − (Σ_types c·ilog(c)) div T — the
    * quantized form of H = log2 T − (1/T)·Σ c·log2 c. High-entropy
    * sources are lexically diverse; a collapsing entropy across
    * ingestion rounds is the minted-token / template-spam detector
    * ([[CorpusStats.heapsCard]]'s information-theoretic sibling).
    *
    * One token scan → one (group, token) count aggregation (map-side
    * combined — the keys are RAW single tokens, not hashes: a word is
    * barely wider than an 8-byte hash, grouping is collision-free by
    * construction on both engines, and skipping the per-token md5
    * measured 2× on the whole card) → one per-group fold over the
    * vocabulary-bounded count frame. No joins, no windows.
    *
    * @return (group, n_tokens, n_types, entropy_mb), one row per
    *         group with at least one token. */
  def entropyCard(df: DataFrame, groupCol: String,
                  textCol: String): DataFrame =
    entropyFromCounts(
      df.select(col(groupCol).as("__g"),
          TextAnalysis.tokens(col(textCol)).as("__tk"))
        .select(col("__g"), explode(col("__tk")).as("__t"))
        .groupBy(col("__g"), col("__t"))
        .agg(count(lit(1)).as("__c")),
      "__g", "__c").withColumnRenamed("__g", groupCol)

  /** The entropy fold over an already-aggregated (group, token, count)
    * frame — shared by [[entropyCard]] and the streaming serving path:
    * per-(group, token) counts are ADDITIVE across micro-batch windows,
    * so a streaming job emits windowed count partials and serve-time
    * merges them (one sum) before this fold lands on exactly the batch
    * card (the q207/q227 partials-serving law). Counts must be > 0. */
  def entropyFromCounts(counts: DataFrame, groupCol: String,
                        countCol: String): DataFrame =
    counts.groupBy(col(groupCol))
      .agg(sum(col(countCol)).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(col(countCol) * ilog2_micro(col(countCol))).as("__sumci"))
      .select(col(groupCol), col("n_tokens"), col("n_types"),
        (ilog2_micro(col("n_tokens")) -
          expr("__sumci div n_tokens")).as("entropy_mb"))

  /** Per-group KL-divergence drift card KL(group ‖ corpus) in
    * micro-bits over `buckets` hashed-token buckets, add-one smoothed:
    * kl_mb = (Σ_b (c_gb+1)·lr_b) div (T_g+B) with
    * lr_b = ilog(c_gb+1) − ilog(T_g+B) − ilog(c_cb+1) + ilog(T_c+B) —
    * the quantized Σ p·log2(p/q). The drift companion to the cosine
    * card (q217): cosine sees direction, KL weighs the tails — a
    * source quietly swapping its long tail for boilerplate moves KL
    * first. Near-identical distributions may quantize to a slightly
    * negative kl_mb (true KL ≥ 0); consumers should clamp at read.
    *
    * Scale: the corpus is scanned once into (group, bucket) counts —
    * a ≤ |groups|·B-row aggregation with map-side combine (md5
    * bucketing, the portable hash, replaces the raw token key before
    * the shuffle). The corpus reference (≤ B rows) and the two totals
    * broadcast; the dense (group × bucket) axis never touches text.
    *
    * @return (group, n_tokens, kl_mb), one row per group. */
  def klDriftCard(df: DataFrame, groupCol: String, textCol: String,
                  buckets: Int = 1024): DataFrame = {
    require(buckets >= 1 && buckets <= Importance.MaxBuckets,
      s"buckets must be in [1, ${Importance.MaxBuckets}], got $buckets")
    val spark = df.sparkSession
    val b = lit(buckets.toLong)
    val tb = df.select(col(groupCol).as("__g"),
        TextAnalysis.tokens(col(textCol)).as("__tk"))
      .select(col("__g"), explode(col("__tk")).as("__t"))
      .select(col("__g"), pmod(Dedup.baseHash32(col("__t")), b).as("__b"))
      .localCheckpoint() // feeds group counts AND the corpus reference
    val gc = tb.groupBy(col("__g"), col("__b")).agg(count(lit(1)).as("__cg"))
    val cc = tb.groupBy(col("__b")).agg(count(lit(1)).as("__cc"))
    val gt = gc.groupBy(col("__g")).agg(sum(col("__cg")).as("__tg"))
    val ct = cc.agg(sum(col("__cc")).as("__tc"))
    val axis = gt.crossJoin(
      spark.range(buckets.toLong).select(col("id").as("__b")))
    axis
      .join(gc, Seq("__g", "__b"), "left")
      .join(broadcast(cc), Seq("__b"), "left")
      .crossJoin(broadcast(ct))
      .select(col("__g"), col("__tg"),
        (coalesce(col("__cg"), lit(0L)) + 1L).as("__cg1"),
        (coalesce(col("__cc"), lit(0L)) + 1L).as("__cc1"),
        col("__tc"))
      .select(col("__g"), col("__tg"),
        (col("__cg1") * (ilog2_micro(col("__cg1")) -
          ilog2_micro(col("__tg") + b) -
          ilog2_micro(col("__cc1")) +
          ilog2_micro(col("__tc") + b))).as("__term"))
      .groupBy(col("__g"))
      .agg(first(col("__tg")).as("n_tokens"), sum(col("__term")).as("__kls"))
      .select(col("__g").as(groupCol), col("n_tokens"),
        expr(s"__kls div (n_tokens + ${buckets}L)").as("kl_mb"))
  }

  /** Pairwise symmetric KL drift matrix: for every unordered group
    * pair, KL(a‖b), KL(b‖a) and their sum in exact micro-bits over the
    * same `buckets` hashed-token grid and add-one smoothing as
    * [[klDriftCard]] — each direction is exactly the q240 quantization
    * with the other group standing in for the corpus. The pairwise
    * completion of the drift story: q240 ranks sources against the
    * corpus mean, this says WHICH sources are alike (feed dedup
    * budgeting) and which pair drifted apart between crawls; q244's
    * Jaccard matrix sees shared shingles, this sees shared
    * DISTRIBUTION — near-zero Jaccard with near-zero KL is the
    * template-rewrite signature (same language, no shared text).
    *
    * Scale: one corpus scan → ≤ |groups|·B cell counts; the dense
    * axis is |groups|²/2 · B rows — bounded, but quadratic in groups,
    * so the operator counts groups first and refuses loudly past
    * `maxGroups` (the [[Scrub.sourceOverlapMatrix]] guard). Totals
    * ride the pair axis; the cell frame joins in twice by (group,
    * bucket).
    *
    * @return (group_a, group_b, n_tokens_a, n_tokens_b, kl_ab_mb,
    *         kl_ba_mb, skl_mb) for every pair group_a < group_b. */
  def klDriftMatrix(df: DataFrame, groupCol: String, textCol: String,
                    buckets: Int = 1024, maxGroups: Int = 64): DataFrame = {
    require(buckets >= 1 && buckets <= Importance.MaxBuckets,
      s"buckets must be in [1, ${Importance.MaxBuckets}], got $buckets")
    val spark = df.sparkSession
    // ONE narrow scan serves the guard AND the pair axis, which must
    // include token-less groups (they score the pure-smoothing drift
    // against every partner instead of silently vanishing — the
    // sourceOverlapMatrix completeness convention)
    val groups = df.select(col(groupCol).as("__g")).distinct()
      .localCheckpoint()
    val nGroups = groups.count()
    require(nGroups <= maxGroups,
      s"klDriftMatrix saw $nGroups groups (> $maxGroups): the pair axis " +
        "is |groups|^2 * buckets rows — bucket the group column or " +
        "raise maxGroups deliberately")
    val b = lit(buckets.toLong)
    val gc = df.select(col(groupCol).as("__g"),
        TextAnalysis.tokens(col(textCol)).as("__tk"))
      .select(col("__g"), explode(col("__tk")).as("__t"))
      .select(col("__g"), pmod(Dedup.baseHash32(col("__t")), b).as("__b"))
      .groupBy(col("__g"), col("__b")).agg(count(lit(1)).as("__c"))
      .localCheckpoint() // totals AND both sides of the pair axis
    val gt = groups.join(
        gc.groupBy(col("__g")).agg(sum(col("__c")).as("__tg0")),
        Seq("__g"), "left")
      .select(col("__g"), coalesce(col("__tg0"), lit(0L)).as("__tg"))
    val axis = gt.select(col("__g").as("__ga"), col("__tg").as("__ta"))
      .join(gt.select(col("__g").as("__gb"), col("__tg").as("__tb")),
        col("__ga") < col("__gb"))
      .crossJoin(broadcast(
        spark.range(buckets.toLong).select(col("id").as("__b"))))
    axis
      .join(gc.select(col("__g").as("__ga"), col("__b"),
        col("__c").as("__cga")), Seq("__ga", "__b"), "left")
      .join(gc.select(col("__g").as("__gb"), col("__b"),
        col("__c").as("__cgb")), Seq("__gb", "__b"), "left")
      .select(col("__ga"), col("__gb"), col("__ta"), col("__tb"),
        (coalesce(col("__cga"), lit(0L)) + 1L).as("__a1"),
        (coalesce(col("__cgb"), lit(0L)) + 1L).as("__b1"))
      .select(col("__ga"), col("__gb"), col("__ta"), col("__tb"),
        (col("__a1") * (ilog2_micro(col("__a1")) -
          ilog2_micro(col("__ta") + b) -
          ilog2_micro(col("__b1")) +
          ilog2_micro(col("__tb") + b))).as("__t1"),
        (col("__b1") * (ilog2_micro(col("__b1")) -
          ilog2_micro(col("__tb") + b) -
          ilog2_micro(col("__a1")) +
          ilog2_micro(col("__ta") + b))).as("__t2"))
      .groupBy(col("__ga"), col("__gb"))
      .agg(first(col("__ta")).as("n_tokens_a"),
        first(col("__tb")).as("n_tokens_b"),
        sum(col("__t1")).as("__s1"), sum(col("__t2")).as("__s2"))
      .select(col("__ga").as("group_a"), col("__gb").as("group_b"),
        col("n_tokens_a"), col("n_tokens_b"),
        expr(s"__s1 div (n_tokens_a + ${buckets}L)").as("kl_ab_mb"),
        expr(s"__s2 div (n_tokens_b + ${buckets}L)").as("kl_ba_mb"))
      .withColumn("skl_mb", col("kl_ab_mb") + col("kl_ba_mb"))
  }

  /** Top-`k` DISTINCTIVE terms per group by sublinear tf-idf in
    * micro-bits: w_mb = ((2²⁰ + ilog(tf_g)) · (ilog(N) − ilog(df)))
    * div 2²⁰ — the classic (1 + log2 tf)·log2(N/df) "ltc" weighting,
    * where tf_g counts occurrences in the GROUP and df counts the
    * DOCUMENTS containing the term corpus-wide. The per-source data
    * card's "what words make this source itself" panel.
    *
    * Scale: one hash-only token scan — checkpointed as (group, doc,
    * 60-bit hash), NO term strings — feeds both frequency tables
    * (per-group tf; per-term distinct-doc df); the top-k per group is
    * the mergeable k-ledger aggregate
    * ([[graft.functions.TopKPriorityAgg]] — map-side partials keep
    * ≤ k entries, NO per-group sort window), exact because w_mb <
    * 2⁵³ rides the ledger's double priority losslessly; winners
    * (≤ k·|groups| rows) broadcast against a SECOND narrow tokenize
    * scan to recover term strings — text never shuffles and never
    * enters storage memory.
    *
    * @return (group, rank, term, tf, df_docs, w_mb), rank 1..k by
    *         (w_mb DESC, term-hash ASC). */
  def tfidfTopTerms(docs: DataFrame, groupCol: String, idCol: String,
                    textCol: String, k: Int = 10): DataFrame = {
    require(k >= 1 && k <= 1024, s"k must be in [1, 1024], got $k")
    val tok = docs.select(col(groupCol).as("__g"), col(idCol).as("__d"),
        TextAnalysis.tokens(col(textCol)).as("__tk"))
      .select(col("__g"), col("__d"), explode(col("__tk")).as("__t"))
      .select(col("__g"), col("__d"), Dedup.baseHash60(col("__t")).as("__th"))
      .localCheckpoint() // tf AND df read it — HASH-ONLY (group, doc,
      // 60-bit hash): checkpointing the term string too would
      // materialize every token occurrence WITH its text in storage
      // memory, corpus-sized at 100 TB; winner strings come from the
      // second narrow tokenize scan below instead (r14 verdict fix)
    val tf = tok.groupBy(col("__g"), col("__th")).agg(count(lit(1)).as("__tf"))
    val dfDocs = tok.select(col("__d"), col("__th")).distinct()
      .groupBy(col("__th")).agg(count(lit(1)).as("__df"))
    val n = docs.select(col(idCol)).distinct().count() // ALL docs, even token-less
    // empty corpus: ilog(0) throws — max(n,1) keeps the plan valid and
    // it naturally yields zero rows (the xentQualityCard convention)
    val ilogN = graft.functions.IntLog.ilog2Micro(math.max(n, 1L))
    val scored = tf.join(dfDocs, Seq("__th"))
      .withColumn("__iltf", ilog2_micro(col("__tf")))
      .withColumn("__ildf", ilog2_micro(col("__df")))
      .withColumn("__w",
        expr(s"((1048576L + __iltf) * (${ilogN}L - __ildf)) div 1048576L"))
      .localCheckpoint() // winners AND enriched read it: without the cut
      // the tf⋈df join (the card's dominant shuffle) would execute twice
    // exact double ride: __w ≤ (64+1)·63·2²⁰ ≈ 2³², far below 2⁵³
    val winners = scored
      .groupBy(col("__g"))
      .agg(graft.functions.TopKPriorityFunctions.topk_priority_agg(
        col("__th"), col("__w"), col("__w").cast("double"), k).as("__top"))
      .select(col("__g"), posexplode(col("__top")).as(Seq("__p", "__e")))
      .select(col("__g"), (col("__p") + 1).cast("long").as("rank"),
        col("__e.doc_id").as("__th"), col("__e.w").as("w_mb"))
    // winners are ≤ k·|groups| rows — THEY broadcast; the tf-table and
    // token scans stream against them (text never shuffles), and the
    // term-string recovery DISTINCTs only the winner-filtered slice
    // (a full-vocab distinct measured ~2× the card's cost)
    val enriched = scored.select(col("__g"), col("__th"),
        col("__tf"), col("__df"))
      .join(broadcast(winners), Seq("__g", "__th"))
    // term-string recovery: a SECOND tokenize scan (text column only,
    // never checkpointed, never shuffled before the winner filter) —
    // the broadcast winner-hash semi-filter drops all but ≤ k·|groups|
    // distinct terms before the distinct's shuffle
    val terms = docs.select(TextAnalysis.tokens(col(textCol)).as("__tk"))
      .select(explode(col("__tk")).as("__t"))
      .select(Dedup.baseHash60(col("__t")).as("__th"), col("__t"))
      .join(broadcast(winners.select(col("__th")).distinct()), Seq("__th"))
      .distinct()
    terms.join(broadcast(enriched), Seq("__th"))
      .select(col("__g").as(groupCol), col("rank"), col("__t").as("term"),
        col("__tf").as("tf"), col("__df").as("df_docs"), col("w_mb"))
  }

  /** Per-group histogram of per-document unigram cross-entropy under
    * the corpus MLE model, in micro-bit bands: xent_mb(doc) =
    * (Σ_t∈doc c_dt·(ilog(T) − ilog(c_t))) div len_d — the quantized
    * −(1/len)·Σ log2 p(t), i.e. the CCNet-style "perplexity" quality
    * score with the corpus itself as the language model. Low bands are
    * boilerplate/templates (every token common), very high bands are
    * noise/garble (every token rare); curation keeps the middle. The
    * card is the per-source distribution over `bandMb`-wide bands
    * (default 2¹⁸ = quarter-bit), with band min/max for drill-down.
    *
    * Scale: one token scan → per-(doc, token-hash) counts (map-side
    * combined, 8-byte keys — text never shuffles) feeding BOTH the
    * vocabulary table and the per-doc fold; the only corpus-sized
    * shuffle joins doc-term rows to the vocabulary on the 60-bit hash.
    * The corpus total is one bounded construction-time action (a
    * 1-row aggregate, the q241 `N` convention). Token-less documents
    * are excluded (no distribution to score — documented, like
    * gapFill's NULL-ts exclusion).
    *
    * @return (group, band, n_docs, min_xent_mb, max_xent_mb). */
  def xentQualityCard(docs: DataFrame, groupCol: String, idCol: String,
                      textCol: String, bandMb: Long = 1L << 18): DataFrame = {
    require(bandMb >= 1L, s"bandMb must be >= 1, got $bandMb")
    val dt = docs.select(col(groupCol).as("__g"), col(idCol).as("__d"),
        TextAnalysis.tokens(col(textCol)).as("__tk"))
      .select(col("__g"), col("__d"), explode(col("__tk")).as("__t"))
      .select(col("__g"), col("__d"), Dedup.baseHash60(col("__t")).as("__th"))
      .groupBy(col("__g"), col("__d"), col("__th"))
      .agg(count(lit(1)).as("__cdt"))
      .localCheckpoint() // vocabulary AND the per-doc fold read it
    val vocab = dt.groupBy(col("__th")).agg(sum(col("__cdt")).as("__ct"))
    // corpus total: one row, construction-time — its ilog rides as a literal
    val totRow = vocab.agg(sum(col("__ct"))).head()
    val totalTokens = if (totRow.isNullAt(0)) 0L else totRow.getLong(0)
    val ilogT = graft.functions.IntLog.ilog2Micro(math.max(totalTokens, 1L))
    dt.join(vocab, Seq("__th"))
      .groupBy(col("__g"), col("__d"))
      .agg(sum(col("__cdt") * (lit(ilogT) - ilog2_micro(col("__ct"))))
          .as("__num"),
        sum(col("__cdt")).as("__len"))
      .select(col("__g"), expr("__num div __len").as("__x"))
      .groupBy(col("__g"), expr(s"__x div ${bandMb}L").as("band"))
      .agg(count(lit(1)).as("n_docs"), min(col("__x")).as("min_xent_mb"),
        max(col("__x")).as("max_xent_mb"))
      .select(col("__g").as(groupCol), col("band"), col("n_docs"),
        col("min_xent_mb"), col("max_xent_mb"))
  }

  /** Top-`k` token buckets by mutual-information contribution between
    * group and token — the feature-selection card (information gain per
    * hashed-BoW bucket, exactly the features [[Classifier]] trains on):
    * mi_mb(b) = (Σ_g c_gb·(ilog(c_gb) + ilog(T) − ilog(T_g) −
    * ilog(T_b))) div T, the quantized Σ_g p(g,b)·log2(p(g,b)/(p(g)p(b)))
    * with empty cells contributing exactly 0 (the MLE convention — no
    * smoothing, so no dense axis is ever materialized, unlike the KL
    * card where smoothing is the point). High-MI buckets are the tokens
    * that identify a source; rank-by-MI is the standard filter-method
    * feature selector.
    *
    * Scale: one token scan collapses to ≤ |groups|·B cell counts
    * (map-side combined); group totals (≤ |groups| rows) and bucket
    * totals (≤ B rows) BROADCAST back onto the cell frame; the top-k
    * is a global TakeOrdered (no window, no extra shuffle). The corpus
    * total is the same 1-row construction-time action as
    * [[xentQualityCard]].
    *
    * @return (bucket, n_tokens, mi_mb), the k buckets with highest
    *         mi_mb (ties broken by bucket ASC). */
  def miFeatureCard(df: DataFrame, groupCol: String, textCol: String,
                    buckets: Int = 1024, k: Int = 50): DataFrame = {
    require(buckets >= 1 && buckets <= Importance.MaxBuckets,
      s"buckets must be in [1, ${Importance.MaxBuckets}], got $buckets")
    require(k >= 1 && k <= buckets, s"k must be in [1, $buckets], got $k")
    val b = lit(buckets.toLong)
    val gc = df.select(col(groupCol).as("__g"),
        TextAnalysis.tokens(col(textCol)).as("__tk"))
      .select(col("__g"), explode(col("__tk")).as("__t"))
      .select(col("__g"), pmod(Dedup.baseHash32(col("__t")), b).as("__b"))
      .groupBy(col("__g"), col("__b")).agg(count(lit(1)).as("__cgb"))
      .localCheckpoint() // totals AND the cell fold read it
    val gt = gc.groupBy(col("__g")).agg(sum(col("__cgb")).as("__tg"))
    val bt = gc.groupBy(col("__b")).agg(sum(col("__cgb")).as("__tb"))
    val totRow = gt.agg(sum(col("__tg"))).head()
    val totalTokens = if (totRow.isNullAt(0)) 0L else totRow.getLong(0)
    val ilogT = graft.functions.IntLog.ilog2Micro(math.max(totalTokens, 1L))
    gc.join(broadcast(gt), Seq("__g"))
      .join(broadcast(bt), Seq("__b"))
      .select(col("__b"), col("__cgb"),
        (col("__cgb") * (ilog2_micro(col("__cgb")) + lit(ilogT) -
          ilog2_micro(col("__tg")) - ilog2_micro(col("__tb")))).as("__term"))
      .groupBy(col("__b"))
      .agg(sum(col("__cgb")).as("n_tokens"), sum(col("__term")).as("__s"))
      .select(col("__b").as("bucket"), col("n_tokens"),
        expr(s"__s div ${totalTokens}L").as("mi_mb"))
      .orderBy(col("mi_mb").desc, col("bucket").asc)
      .limit(k)
  }

  /** Corpus-wide (group-col optional elsewhere) bigram counts: one
    * row per ordered within-document token pair, via the shared
    * 2-shingle machinery (tokens contain no spaces, so "x y" splits
    * back losslessly). Map-side combined; the frame is
    * vocabulary²-bounded, not corpus-sized. */
  private def bigramCounts(docs: DataFrame, textCol: String,
                           extraNames: Seq[String] = Nil): DataFrame = {
    def extra: Seq[Column] = extraNames.map(col)
    docs.withColumn("__tk", TextAnalysis.tokens(col(textCol)))
      .select(extra :+
        explode(TextAnalysis.shinglesOfTokens(col("__tk"), 2)).as("__bg"): _*)
      .select(extra :+ split(col("__bg"), " ").getItem(0).as("__x")
        :+ split(col("__bg"), " ").getItem(1).as("__y"): _*)
      .groupBy(extra :+ col("__x") :+ col("__y"): _*)
      .agg(count(lit(1)).as("__c"))
  }

  /** Collocation mining: pointwise mutual information of every
    * within-document bigram at or above `minCount`, in exact
    * micro-bits — pmi_mb = ilog(c_xy) + ilog(T) − ilog(c_x·) −
    * ilog(c_·y), the quantized log2(p(x,y)/(p(x)p(y))) over the bigram
    * universe. High-PMI pairs are multiword expressions ("new york");
    * a corpus whose top collocations are navigation chrome
    * ("click here", "all rights") is template-heavy — the phrase-level
    * sibling of the q243 feature card.
    *
    * Scale: the corpus collapses to vocabulary²-bounded bigram counts
    * in one map-side-combined pass; BOTH marginals derive from that
    * frame (no second scan) and join back on the token key — they are
    * VOCABULARY-sized, so they are deliberately NOT hinted into a
    * broadcast (a web-scale vocabulary runs to 10⁷ rows; AQE still
    * broadcasts when the actual size is small). The total rides a
    * 1-row broadcast. The support floor prunes the scored frame before
    * the joins. No windows, no corpus-sized shuffle after the first
    * aggregation.
    *
    * @return (x, y, n_xy, pmi_mb) for every bigram with n_xy >=
    *         minCount. */
  def pmiCollocations(docs: DataFrame, textCol: String,
                      minCount: Long = 5L): DataFrame = {
    require(minCount >= 1L, s"minCount must be >= 1, got $minCount")
    val bg = bigramCounts(docs, textCol).localCheckpoint() // marginals + total + the scored frame
    val lm = bg.groupBy(col("__x")).agg(sum(col("__c")).as("__cx"))
    val rm = bg.groupBy(col("__y")).agg(sum(col("__c")).as("__cy"))
    val tot = bg.agg(sum(col("__c")).as("__t"))
    bg.where(col("__c") >= minCount)
      .join(lm, Seq("__x"))
      .join(rm, Seq("__y"))
      .crossJoin(broadcast(tot))
      .select(col("__x").as("x"), col("__y").as("y"),
        col("__c").as("n_xy"),
        (ilog2_micro(col("__c")) + ilog2_micro(col("__t")) -
          ilog2_micro(col("__cx")) - ilog2_micro(col("__cy"))).as("pmi_mb"))
  }

  /** Leave-one-out ablation entropy: for every group (source, crawl,
    * shard), the corpus token entropy WITHOUT that group, in exact
    * micro-bits, plus the delta against the full-corpus entropy — the
    * data-ablation card ("which source moves the corpus most"): a
    * large positive delta means removing the source RAISES diversity
    * (it was flooding the corpus with its own distribution), the
    * prioritized-for-dedup signal.
    *
    * Computed in DELTA form, the incremental-stats law: H_rest needs
    * Σ_t c_rest·ilog(c_rest) over ALL tokens, but tokens the group
    * never uses contribute the same term as in the corpus constant, so
    * per group only its OWN (group, token) rows are touched:
    * Σ_rest = S − Σ_{t∈group} [C_t·ilog(C_t) − c_rest·ilog(c_rest)],
    * with the c_rest = 0 term defined as 0 (x·log x → 0). One corpus
    * scan builds both frames; the corpus constants (S, T) are one
    * bounded 1-row action; the join is vocabulary-keyed between
    * vocabulary-bounded frames; output is |groups| rows. Removing a
    * shard updates the card without rescanning the corpus — the same
    * additivity the streaming entropy leg ships.
    *
    * Groups owning the ENTIRE corpus (T_rest = 0) are excluded — there
    * is no rest distribution to score (documented, the token-less-doc
    * convention of [[xentQualityCard]]).
    *
    * @return (group, n_tokens_rest, n_types_rest, entropy_mb_rest,
    *         corpus_mb, delta_mb). */
  def leaveOneOutEntropy(df: DataFrame, groupCol: String,
                         textCol: String): DataFrame = {
    val gt = df.select(col(groupCol).as("__g"),
        TextAnalysis.tokens(col(textCol)).as("__tk"))
      .select(col("__g"), explode(col("__tk")).as("__t"))
      .groupBy(col("__g"), col("__t"))
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint() // corpus counts AND the per-group delta read it
    // rename before the re-aggregation: gt joins back against this
    // frame, and a self-join whose right side still carries the left's
    // column names trips AMBIGUOUS_REFERENCE at resolution
    val corpus = gt.select(col("__t"), col("__c").as("__c0"))
      .groupBy(col("__t"))
      .agg(sum(col("__c0")).as("__cc"))
    val const = corpus.agg(
      sum(col("__cc")).as("__T"),
      count(lit(1)).as("__types"),
      sum(col("__cc") * ilog2_micro(col("__cc"))).as("__S")).head()
    if (const.isNullAt(0)) {
      // empty corpus: keep the documented 6-column schema (a bare
      // emptyDataFrame has ZERO columns and breaks every downstream
      // select), just with no rows
      import org.apache.spark.sql.types.{LongType, StructField, StructType}
      val schema = StructType(
        StructField(groupCol,
          df.schema(df.schema.fieldIndex(groupCol)).dataType) +:
        Seq("n_tokens_rest", "n_types_rest", "entropy_mb_rest",
          "corpus_mb", "delta_mb").map(StructField(_, LongType)))
      return df.sparkSession.createDataFrame(
        df.sparkSession.sparkContext
          .emptyRDD[org.apache.spark.sql.Row], schema)
    }
    val (tTot, types, s) =
      (const.getLong(0), const.getLong(1), const.getLong(2))
    val corpusMb =
      graft.functions.IntLog.ilog2Micro(tTot) - s / tTot
    gt.join(corpus, Seq("__t"))
      .select(col("__g"), col("__c"), col("__cc"),
        (col("__cc") * ilog2_micro(col("__cc")) -
          when(col("__cc") > col("__c"),
            (col("__cc") - col("__c")) * ilog2_micro(col("__cc") - col("__c")))
            .otherwise(lit(0L))).as("__d"))
      .groupBy(col("__g"))
      .agg(sum(col("__c")).as("__tg"), sum(col("__d")).as("__dsum"),
        sum(when(col("__cc") === col("__c"), 1L).otherwise(0L))
          .as("__gone"))
      .where(col("__tg") < tTot) // a group owning everything has no rest
      .select(col("__g").as(groupCol),
        (lit(tTot) - col("__tg")).as("n_tokens_rest"),
        (lit(types) - col("__gone")).as("n_types_rest"),
        (ilog2_micro(lit(tTot) - col("__tg")) -
          expr(s"(${s}L - __dsum) div (${tTot}L - __tg)"))
          .as("entropy_mb_rest"))
      .withColumn("corpus_mb", lit(corpusMb))
      .withColumn("delta_mb", col("entropy_mb_rest") - col("corpus_mb"))
  }

  /** Top-`k` BURSTY tokens: exact integer variance-to-mean ratio of
    * per-document counts, in micro-units —
    * burst_micro = ⌊10⁶·(N·Σx² − (Σx)²) / (N·Σx)⌋ over ALL N documents
    * (absent = 0, which the sufficient statistics encode for free).
    * Topical/template tokens are bursty (VMR ≫ 1: concentrated in few
    * docs), function words sit near Poisson (VMR ≈ 1), and a token
    * appearing exactly once per document everywhere scores exactly 0 —
    * the dispersion axis the pure-frequency cards (q143, q241) cannot
    * see. Products route through DECIMAL(38,0) (the q226 exact-numeric
    * convention) so the cross-multiplied variance never overflows at
    * corpus scale.
    *
    * Scale: one scan → per-(doc, token) counts (map-side combined, raw
    * token keys — the q239 lesson) → one vocabulary-bounded fold to
    * (token, Σx, Σx²); the support floor prunes before the global
    * TakeOrdered top-k. No joins, no windows.
    *
    * @return (token, n_occ, n_docs_with, burst_micro), the k highest
    *         by (burst_micro DESC, token ASC); requires N >= 1 doc. */
  def burstinessCard(docs: DataFrame, idCol: String, textCol: String,
                     minCount: Long = 5L, k: Int = 50): DataFrame = {
    require(minCount >= 1L, s"minCount must be >= 1, got $minCount")
    require(k >= 1, s"k must be >= 1, got $k")
    val nDocs = docs.select(col(idCol)).distinct().count()
    require(nDocs >= 1L, "burstinessCard needs at least one document")
    docs.select(col(idCol).as("__d"),
        TextAnalysis.tokens(col(textCol)).as("__tk"))
      .select(col("__d"), explode(col("__tk")).as("__t"))
      .groupBy(col("__d"), col("__t"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col("__t"))
      .agg(sum(col("__c")).as("__sx"),
        sum(col("__c") * col("__c")).as("__sxx"),
        count(lit(1)).as("n_docs_with"))
      .where(col("__sx") >= minCount)
      .select(col("__t").as("token"), col("__sx").as("n_occ"),
        col("n_docs_with"),
        expr(s"CAST((1000000 * (${nDocs} * CAST(__sxx AS DECIMAL(38,0))" +
          s" - CAST(__sx AS DECIMAL(38,0)) * __sx))" +
          s" div (${nDocs} * CAST(__sx AS DECIMAL(38,0))) AS BIGINT)")
          .as("burst_micro"))
      .orderBy(col("burst_micro").desc, col("token").asc)
      .limit(k)
  }

  /** Per-group bigram entropy rate: H(next | current) = H(X,Y) − H(X)
    * in exact micro-bits, both entropies over the group's bigram
    * universe (the left-marginal unigram distribution sums to the same
    * total, so the subtraction is well-posed). The language-structure
    * card: natural text sits well above 0; template spam collapses
    * toward 0 (every token determines its successor) even when plain
    * unigram entropy (q239) still looks healthy — repetition q55
    * catches literal copies, this catches STRUCTURAL determinism.
    *
    * Scale: one pass to per-group bigram counts (vocabulary²-bounded,
    * map-side combined); the left marginal derives from that frame;
    * two [[entropyFromCounts]] folds join on the group key
    * (group-cardinality-sized frames).
    *
    * @return (group, n_bigrams, hxy_mb, hx_mb, cond_mb), groups with
    *         at least one bigram. */
  def bigramEntropyRate(docs: DataFrame, groupCol: String,
                        textCol: String): DataFrame = {
    val bg = bigramCounts(
        docs.select(col(groupCol).as("__g"), col(textCol).as("__text")),
        "__text", Seq("__g"))
      .localCheckpoint() // joint AND marginal folds read it
    val hxy = entropyFromCounts(
      bg.select(col("__g"), col("__c")), "__g", "__c")
      .select(col("__g"), col("n_tokens").as("n_bigrams"),
        col("entropy_mb").as("hxy_mb"))
    val hx = entropyFromCounts(
      bg.groupBy(col("__g"), col("__x")).agg(sum(col("__c")).as("__cx")),
      "__g", "__cx")
      .select(col("__g"), col("entropy_mb").as("hx_mb"))
    hxy.join(hx, Seq("__g"))
      .select(col("__g").as(groupCol), col("n_bigrams"), col("hxy_mb"),
        col("hx_mb"), (col("hxy_mb") - col("hx_mb")).as("cond_mb"))
  }
}
