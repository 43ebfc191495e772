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
object SparkEntry extends Queries8Analytics {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q2_query_groupingsets")(spark, "/root/testdata/sf0.001")


  // ---------------------------------------------------------------------

  private[graft] val registry: Seq[Q] = Seq(
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
    Q("q125_mp4_meta", q125Mp4Meta, Some(q125Sql)),
    Q("q126_video_audit", q126VideoAudit, Some(q126Sql)),
    Q("q127_video_frames", q127VideoFrames, Some(q127Sql)),
    Q("q128_unigram_seed", q128UnigramSeed, Some(q128Sql)),
    Q("q129_unigram_lm", q129UnigramLm, None),
    Q("q130_unigram_encode", q130UnigramEncode, None),
    Q("q131_range_join", q131RangeJoin, Some(q131Sql)),
    Q("q132_zorder_key", q132ZorderKey, Some(q132Sql)),
    Q("q133_hll_rollup", q133HllRollup, None),
    Q("q134_interval_overlap", q134IntervalOverlap, Some(q134Sql)),
    Q("q135_bpe_apply", q135BpeApply, Some(q135Sql)),
    Q("q136_unigram_apply", q136UnigramApply, None),
    Q("q137_json_props", q137JsonProps, Some(q137Sql)),
    Q("q138_corpus_refresh", q138CorpusRefresh, Some(q138Sql)),
    Q("q139_unigram_full_em", q139UnigramFullEm, None),
    Q("q140_nal_walk", q140NalWalk, Some(q140Sql)),
    Q("q141_nal_audit", q141NalAudit, Some(q141Sql)),
    Q("q142_ppjoin", q142Ppjoin, Some(q142Sql)),
    Q("q143_heavy_hitters", q143HeavyHitters, Some(q143Sql)),
    Q("q144_hh_by_source", q144HhBySource, Some(q144Sql)),
    Q("q145_wordpiece_train", q145WordpieceTrain, None),
    Q("q146_wordpiece_encode", q146WordpieceEncode, None),
    Q("q147_dsir_select", q147DsirSelect, None),
    Q("q148_ppjoin_probe", q148PpjoinProbe, Some(q148Sql)),
    Q("q149_containment", q149Containment, Some(q149Sql)),
    Q("q150_tokenizer_card", q150TokenizerCard, None),
    Q("q151_ivf_artifact", q151IvfArtifact, Some(q49Sql)),
    Q("q152_jsonl_ingest", q152JsonlIngest, Some(q152Sql)),
    Q("q153_avi_meta", q153AviMeta, Some(q153Sql)),
    Q("q154_avi_audit", q154AviAudit, Some(q154Sql)),
    Q("q155_cms_native", q155CmsNative, Some(q155Sql)),
    Q("q156_skew_card", q156SkewCard, Some(q156Sql)),
    Q("q157_sessionize", q157Sessionize, Some(q157Sql)),
    Q("q158_session_funnel", q158SessionFunnel, Some(q158Sql)),
    Q("q159_asof_join", q159AsofJoin, Some(q159Sql)),
    Q("q160_manifest_skip", q160ManifestSkip, Some(q160Sql)),
    Q("q161_html_extract", q161HtmlExtract, Some(q161Sql)),
    Q("q162_html_audit", q162HtmlAudit, Some(q162Sql)),
    Q("q163_cube_route", q163CubeRoute, Some(q163Sql)),
    Q("q164_merge_into", q164MergeInto, Some(q164Sql)),
    Q("q165_pagerank", q165PageRank, Some(q165Sql)),
    Q("q166_blocklist_scan", q166BlocklistScan, Some(q166Sql)),
    Q("q167_pattern_census", q167PatternCensus, Some(q167Sql)),
    Q("q168_bloom_lookup", q168BloomLookup, Some(q168Sql)),
    Q("q169_cube_refresh", q169CubeRefresh, Some(q169Sql)),
    Q("q170_source_pushdown", q170SourcePushdown, Some(q168Sql)),
    Q("q171_bpe_artifact", q171BpeArtifact, Some(q135Sql)),
    Q("q172_funnel", q172Funnel, Some(q172Sql)),
    Q("q173_retention", q173Retention, Some(q173Sql)),
    Q("q174_time_travel", q174TimeTravel, Some(q174Sql)),
    Q("q175_zorder_manifest", q175ZorderManifest, Some(q175Sql)),
    Q("q176_negatives", q176Negatives, Some(q176Sql)),
    Q("q177_session_transcript", q177SessionTranscript, Some(q177Sql)),
    Q("q178_quality_classifier", q178QualityClassifier, None),
    Q("q179_percentile_rollup", q179PercentileRollup, Some(q179Sql)),
    Q("q180_bm25", q180Bm25, Some(q180Sql)),
    Q("q181_rerank", q181Rerank, Some(q181Sql)),
    Q("q182_bm25_refresh", q182Bm25Refresh, Some(q180Sql)),
    Q("q183_phrase_search", q183PhraseSearch, Some(q183Sql)),
    Q("q184_version_diff", q184VersionDiff, Some(q184Sql)),
    Q("q185_sign_project", q185SignProject, Some(q185Sql)),
    Q("q186_rrf_hybrid", q186RrfHybrid, Some(q186Sql)),
    Q("q187_pdf_extract", q187PdfExtract, Some(q187Sql)),
    Q("q188_pdf_audit", q188PdfAudit, Some(q188Sql)),
    Q("q189_retrieval_eval", q189RetrievalEval, Some(q189Sql)),
    Q("q190_gapfill", q190GapFill, Some(q190Sql)),
    Q("q191_triangles", q191Triangles, Some(q191Sql)),
    Q("q192_mmr_rerank", q192Mmr, Some(q192Sql)),
    Q("q193_typo_pairs", q193TypoPairs, Some(q193Sql)),
    Q("q194_priority_sample", q194PrioritySample, Some(q194Sql)),
    Q("q195_rolling_features", q195Rolling, Some(q195Sql)),
    Q("q196_rendezvous_shards", q196Shards, Some(q196Sql)),
    Q("q197_bigram_pred", q197BigramPred, Some(q197Sql)),
    Q("q198_feature_corr", q198FeatureCorr, Some(q198Sql)),
    Q("q199_grouped_sample", q199GroupedSample, Some(q199Sql)),
    Q("q200_er_pairs", q200ErPairs, Some(q200Sql)),
    Q("q201_er_clusters", q201ErClusters, Some(q201Sql)),
    Q("q202_kcore", q202KCore, Some(q202Sql)),
    Q("q203_quality_card", q203QualityCard, Some(q203Sql)),
    Q("q204_cdc_chunks", q204CdcChunks, Some(q204Sql)),
    Q("q205_decayed_features", q205Decayed, Some(q205Sql)),
    Q("q206_attribution", q206Attribution, Some(q206Sql)),
    Q("q207_anomaly_buckets", q207Anomaly, Some(q207Sql)),
    Q("q208_er_probe", q208ErProbe, Some(q208Sql)),
    Q("q209_nearest_join", q209NearestError, Some(q209Sql)),
    Q("q210_rolling_distinct", q210RollingDistinct, Some(q210Sql)),
    Q("q211_feature_bins", q211FeatureBins, Some(q211Sql)),
    Q("q212_chi_square", q212ChiSquare, Some(q212Sql)),
    Q("q213_transitions", q213Transitions, Some(q213Sql)),
    Q("q214_gini_diversity", q214Gini, Some(q214Sql)),
    Q("q215_scd2", q215Scd2, Some(q215Sql)),
    Q("q216_winsorized", q216Winsorized, Some(q216Sql)),
    Q("q217_source_cosine", q217SourceCosine, Some(q217Sql)),
    Q("q218_token_lift", q218TokenLift, Some(q218Sql)),
    Q("q219_snippets", q219Snippets, Some(q219Sql)),
    Q("q220_pit_read", q220PitRead, Some(q220Sql)),
    Q("q221_covered_time", q221CoveredTime, Some(q221Sql)),
    Q("q222_video_frame_hash", q222VideoFrameHash, Some(q222Sql)),
    Q("q223_video_dedup", q223VideoDedup, Some(q223Sql)),
    Q("q224_robust_scale", q224RobustScale, Some(q224Sql)),
    Q("q225_frequent_paths", q225FrequentPaths, Some(q225Sql)),
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

