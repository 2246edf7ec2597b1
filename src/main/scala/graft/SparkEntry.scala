package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the capability each
  * query key covers and §6 for the oracle discipline.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.qRevenueByNation(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.2 relational / OLAP
    "q1_pricing_summary" -> (Queries.q1PricingSummary _),
    "q_revenue_by_nation" -> (Queries.qRevenueByNation _),
    "q_semi_anti" -> (Queries.qSemiAnti _),
    "q_window_topk" -> (Queries.qWindowTopK _),
    "q_running_total" -> (Queries.qRunningTotal _),
    "q_rollup_sales" -> (Queries.qRollupSales _),
    "q_cube_sales" -> (Queries.qCubeSales _),
    "q_grouping_sets" -> (Queries.qGroupingSets _),
    "q_distinct_counts" -> (Queries.qDistinctCounts _),
    "q_top_orders" -> (Queries.qTopOrders _),
    "q_pivot_status" -> (Queries.qPivotStatus _),
    "q_json_extract" -> (Queries.qJsonExtract _),
    "q_sessionize" -> (Queries.qSessionize _),
    "q_event_buckets" -> (Queries.qEventBuckets _),
    "q_asof_join" -> (Queries.qAsofJoin _),
    "q_asof_join_native" -> (Queries.qAsofJoinNative _),
    "q_sample_hash" -> (Queries.qSampleHash _),
    "q_skew_agg" -> (Queries.qSkewAgg _),
    "q_set_ops" -> (Queries.qSetOps _),
    "q_percentiles" -> (Queries.qPercentiles _),
    "q_string_funcs" -> (Queries.qStringFuncs _),
    "q_date_funcs" -> (Queries.qDateFuncs _),
    // §2.1 CDC core
    "cdc_prepare" -> (Queries.cdcPrepare _),
    "cdc_delta_extract" -> (Queries.cdcDeltaExtract _),
    "cdc_latest_per_key" -> (Queries.cdcLatestPerKey _),
    "cdc_merge" -> (Queries.cdcMerge _),
    "cdc_watermark" -> (Queries.cdcWatermark _),
    "cdc_topo_order" -> (Queries.cdcTopoOrder _),
    "fk_orphan_check" -> (Queries.fkOrphanCheck _),
    "stats_rowcounts" -> (Queries.statsRowcounts _),
    "cdc_scd2" -> (Queries.cdcScd2 _),
    "cdc_cascade_delete" -> (QueriesR3.cdcCascadeDelete _),
    "ivm_agg_maintain" -> (QueriesR3.ivmAggMaintain _),
    "stream_ivm_maintain" -> (QueriesR3.streamIvmMaintain _),
    // §2.2 round-2 additions (R20–R25)
    "q_window_ranks" -> (QueriesExt.qWindowRanks _),
    "q_window_range_frame" -> (QueriesExt.qWindowRangeFrame _),
    "q_window_firstlast" -> (QueriesExt.qWindowFirstLast _),
    "q_top_k_agg" -> (QueriesExt.qTopKAgg _),
    "q_histogram" -> (QueriesExt.qHistogram _),
    "q_corr_stats" -> (QueriesExt.qCorrStats _),
    "q_range_join" -> (QueriesExt.qRangeJoin _),
    "q_overlap_join" -> (QueriesExt.qOverlapJoin _),
    "q_array_ops" -> (QueriesExt.qArrayOps _),
    "q_pivot_api" -> (QueriesExt.qPivotApi _),
    "q_scalar_subquery" -> (QueriesExt.qScalarSubquery _),
    "q_embed_stats" -> (QueriesExt.qEmbedStats _),
    "q_resample_ffill" -> (QueriesExt.qResampleFfill _),
    "q_set_ops_all" -> (QueriesExt.qSetOpsAll _),
    "q_outer_join" -> (QueriesExt.qOuterJoin _),
    "q_null_funcs" -> (QueriesExt.qNullFuncs _),
    "q_agg_kit" -> (QueriesExt.qAggKit _),
    "q_math_funcs" -> (QueriesExt.qMathFuncs _),
    // §2.5 text analysis
    "text_tokens" -> (QueriesData.textTokens _),
    "text_repetition" -> (QueriesExt.textRepetition _),
    "text_ngram_topk" -> (QueriesExt.textNgramTopk _),
    "text_tfidf" -> (QueriesExt.textTfidf _),
    "text_sample_stratified" -> (QueriesExt.textSampleStratified _),
    "text_cap_sources" -> (QueriesExt.textCapSources _),
    "text_pack_sequences" -> (QueriesExt.textPackSequences _),
    "text_quality" -> (QueriesData.textQuality _),
    "text_langid" -> (QueriesData.textLangid _),
    "text_fingerprint" -> (QueriesData.textFingerprint _),
    // §2.3 dedup
    "dedup_exact" -> (QueriesData.dedupExact _),
    "dedup_minhash_lsh" -> (QueriesData.dedupMinhashLsh _),
    "dedup_simhash" -> (QueriesData.dedupSimhash _),
    "dedup_ngram_jaccard" -> (QueriesData.dedupNgramJaccard _),
    "dedup_embed_cosine" -> (QueriesData.dedupEmbedCosine _),
    "dedup_embed_lsh" -> (QueriesData.dedupEmbedLsh _),
    "dedup_decontaminate" -> (QueriesData.dedupDecontaminate _),
    "dedup_fuzzy_edit" -> (QueriesExt.dedupFuzzyEdit _),
    "dedup_cluster" -> (QueriesData.dedupCluster _),
    // §2.4 similarity
    "ann_bruteforce_topk" -> (QueriesData.annBruteforceTopk _),
    "ann_ivf_topk" -> (QueriesData.annIvfTopk _),
    "ann_lsh_topk" -> (QueriesData.annLshTopk _),
    "ann_pq_topk" -> (QueriesData.annPqTopk _),
    // §2.6 multimodal
    "mm_binary_meta" -> (QueriesData.mmBinaryMeta _),
    "mm_frame_sample" -> (QueriesData.mmFrameSample _),
    "mm_image_meta" -> (QueriesExt.mmImageMeta _),
    "mm_audio_meta" -> (QueriesExt.mmAudioMeta _),
    // §2.7 streaming
    "stream_window_agg" -> (QueriesData.streamWindowAgg _),
    "stream_cdc_apply" -> (QueriesData.streamCdcApply _),
    "stream_sessionize" -> (QueriesData.streamSessionize _),
    "stream_dedup_exact" -> (QueriesData.streamDedupExact _),
    "stream_near_dup" -> (QueriesData.streamNearDup _),
    "stream_interval_join" -> (QueriesData.streamIntervalJoin _),
    "stream_static_join" -> (QueriesData.streamStaticJoin _),
    "stream_tdigest_rank" -> (QueriesR3.streamTdigestRank _),
    "stream_session_window" -> (QueriesR3.streamSessionWindow _),
    // round-3: sketches, layout, star CC
    "sketch_kmv_distinct" -> (QueriesR3.sketchKmvDistinct _),
    "sketch_tdigest_rank" -> (QueriesR3.sketchTdigestRank _),
    "zorder_cluster" -> (QueriesR3.zorderCluster _),
    "cc_star_cluster" -> (QueriesR3.ccStarCluster _),
    "q_top_k_native" -> (QueriesR3.qTopKNative _),
    "sketch_freq_heavy" -> (QueriesR3.sketchFreqHeavy _),
    "sketch_hll_distinct" -> (QueriesR3.sketchHllDistinct _),
    "sketch_hll_incremental" -> (QueriesR3.sketchHllIncremental _),
    "sketch_cm_counts" -> (QueriesR3.sketchCmCounts _),
    "ann_opq_rotation" -> (QueriesR3.annOpqRotation _),
    "replica_checksum" -> (QueriesR3.replicaChecksum _),
    "q_unpivot" -> (QueriesR3.qUnpivot _),
    "q_equidepth_hist" -> (QueriesR3.qEquidepthHist _),
    "q_rel_division" -> (QueriesR3.qRelDivision _),
    "q_array_agg" -> (QueriesR3.qArrayAgg _),
    "q_mode" -> (QueriesR3.qMode _),
    "corpus_clean" -> (QueriesR3.corpusClean _),
    "embed_clean_ann" -> (QueriesR3.embedCleanAnn _),
    "q_hopping_window" -> (QueriesR3.qHoppingWindow _),
    // §2.1 C9 (hash-checked via the canonical type vocabulary)
    "schema_clone" -> (QueriesData.schemaClone _),
    // round-4 extension: layout, sampling, anomaly, sketch algebra,
    // redaction, CDC audit, streaming heavy hitters, leakage matrix
    "hilbert_cluster" -> (QueriesR4.hilbertCluster _),
    "q_weighted_sample" -> (QueriesR4.qWeightedSample _),
    "q_anomaly_zscore" -> (QueriesR4.qAnomalyZscore _),
    "sketch_kmv_setops" -> (QueriesR4.sketchKmvSetops _),
    "text_redact" -> (QueriesR4.textRedact _),
    "cdc_column_diff" -> (QueriesR4.cdcColumnDiff _),
    "stream_freq_heavy" -> (QueriesR4.streamFreqHeavy _),
    "dedup_cross_source" -> (QueriesR4.dedupCrossSource _),
    "q_funnel" -> (QueriesR4.qFunnel _),
    "q_cohort_retention" -> (QueriesR4.qCohortRetention _),
    "stream_moments" -> (QueriesR4.streamMoments _),
    "dq_constraints" -> (QueriesR4.dqConstraints _),
    "q_event_transitions" -> (QueriesR4.qEventTransitions _),
    "dedup_minhash_estimate" -> (QueriesR4.dedupMinhashEstimate _),
    "text_inverted_index" -> (QueriesR4.textInvertedIndex _),
    "q_dataset_split" -> (QueriesR4.qDatasetSplit _),
    "stream_funnel" -> (QueriesR4.streamFunnel _),
    "sketch_tdigest_incremental" -> (QueriesR4.sketchTdigestIncremental _),
    "sketch_cm_join_size" -> (QueriesR4.sketchCmJoinSize _),
    "entity_resolution" -> (QueriesR4.entityResolution _),
    // round-4 continuation (batch c): queue items + mixture/monitoring ops
    "q_transition_probs" -> (QueriesR5.qTransitionProbs _),
    "q_alloc_budget" -> (QueriesR5.qAllocBudget _),
    "q_cusum_changepoint" -> (QueriesR5.qCusumChangepoint _),
    "q_quantile_bins" -> (QueriesR5.qQuantileBins _),
    "q_sliding_distinct" -> (QueriesR5.qSlidingDistinct _),
    "q_islands" -> (QueriesR5.qIslands _),
    "q_interval_merge" -> (QueriesR5.qIntervalMerge _),
    "graph_triangles" -> (QueriesR5.graphTriangles _),
    "text_search_conjunctive" -> (QueriesR5.textSearchConjunctive _),
    "text_strip_html" -> (QueriesR5.textStripHtml _),
    "text_cooccur" -> (QueriesR5.textCooccur _),
    "stream_transitions" -> (QueriesR5.streamTransitions _),
    "q_rfm_segmentation" -> (QueriesR5.qRfmSegmentation _),
    "q_market_basket" -> (QueriesR5.qMarketBasket _),
    "q_growth_rates" -> (QueriesR5.qGrowthRates _),
    "q_retention_pct" -> (QueriesR5.qRetentionPct _),
    "stream_cusum" -> (QueriesR5.streamCusum _),
    "ann_range_search" -> (QueriesR5.annRangeSearch _),
    // round-4 continuation batch d (the r5+ queue closed)
    "text_bm25" -> (QueriesR6.textBm25 _),
    "q_seq_patterns" -> (QueriesR6.qSeqPatterns _),
    "q_basket_incremental" -> (QueriesR6.qBasketIncremental _),
    "stream_rolling_kmv" -> (QueriesR6.streamRollingKmv _),
    // round-4 continuation batch e
    "q_basket_lift" -> (QueriesR6.qBasketLift _),
    "q_trending_topk" -> (QueriesR6.qTrendingTopk _),
    "graph_pagerank" -> (QueriesR6.graphPagerank _),
    "q_funnel_rates" -> (QueriesR6.qFunnelRates _),
    // round-4 continuation batch f
    "graph_labelprop" -> (QueriesR6.graphLabelprop _),
    "q_source_drift" -> (QueriesR6.qSourceDrift _),
    "cdc_sla_report" -> (QueriesR6.cdcSlaReport _),
    // round-4 continuation batch g
    "graph_summary" -> (QueriesR6.graphSummary _),
    "graph_pagerank_weighted" -> (QueriesR6.graphPagerankWeighted _),
    "dedup_survivorship" -> (QueriesR6.dedupSurvivorship _),
    "q_interarrival_hist" -> (QueriesR6.qInterarrivalHist _),
    // round-4 continuation batch h
    "graph_clustering_coeff" -> (QueriesR6.graphClusteringCoeff _),
    "stream_trending" -> (QueriesR6.streamTrending _),
    "graph_kcore" -> (QueriesR7.graphKcore _),
    "q_kmv_retention" -> (QueriesR7.qKmvRetention _),
    "text_phrase_prox" -> (QueriesR7.textPhraseProx _))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    Queries.sqlRelational ++ Queries.sqlCdc ++ QueriesData.sql ++ QueriesExt.sql ++
      QueriesR3.sql ++ QueriesR4.sql ++ QueriesR5.sql ++ QueriesR6.sql ++
      QueriesR7.sql
}
