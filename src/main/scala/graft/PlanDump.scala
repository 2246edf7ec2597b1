package graft

import java.nio.file.{Files, Paths}

/** Dev tool: dump physical-plan summaries for representative queries to
  * PLANS.md — the reviewable evidence that scans prune, dims broadcast,
  * heavy predicates stay out of join conditions, and codegen spans cover
  * the hot paths. Not part of the driver contract.
  */
object PlanDump {
  val interesting = Seq("FileScan", "Join", "Exchange", "HashAggregate",
    "WholeStageCodegen", "Window", "Generate", "Sort", "Project (",
    "TopKPrune", "TopKFinal", "ObjectHashAggregate")

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get(8)
    val dir = "/root/testdata/sf0.001"
    val names = Seq("q1_pricing_summary", "q_revenue_by_nation", "q_range_join",
      "dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_embed_lsh", "ann_pq_topk",
      "q_asof_join_native", "q_skew_agg", "mm_image_meta", "mm_binary_meta",
      "text_langid", "q_overlap_join", "q_top_k_agg",
      "dedup_decontaminate", "text_cap_sources",
      "q_top_k_native", "sketch_kmv_distinct", "zorder_cluster", "sketch_freq_heavy",
      "corpus_clean", "sketch_hll_distinct", "embed_clean_ann",
      "hilbert_cluster", "q_funnel", "q_cohort_retention", "dq_constraints",
      "dedup_minhash_estimate", "dedup_cross_source", "text_inverted_index",
      "q_weighted_sample", "q_anomaly_zscore", "sketch_kmv_setops",
      "q_transition_probs", "q_cusum_changepoint", "q_sliding_distinct",
      "q_islands", "q_interval_merge", "graph_triangles",
      "text_search_conjunctive", "text_cooccur", "q_alloc_budget",
      "q_quantile_bins",
      "text_bm25", "q_seq_patterns", "q_basket_incremental", "q_basket_lift",
      "q_trending_topk", "graph_pagerank", "graph_labelprop", "graph_summary",
      "dedup_survivorship", "q_interarrival_hist", "q_source_drift",
      "cdc_sla_report", "graph_clustering_coeff",
      "graph_kcore", "text_phrase_prox", "dedup_incremental", "q_twap",
      "q_robust_anomaly", "q_attribution", "graph_bfs",
      "corpus_quality_filter", "cdc_asof_snapshot", "cdc_snapshot_diff",
      "sketch_kmv_cube", "q_share_of_total",
      "text_vocab_encode", "q_basket_triples", "q_latency_percentiles",
      "cdc_backfill_plan", "q_cumulative_distinct", "corpus_top_p",
      "q_also_bought", "stats_column_profile", "q_time_to_convert",
      "q_session_sample", "q_seasonal_residuals", "stats_value_skew",
      "q_asof_forward", "q_weighted_median", "q_longest_streak",
      "q_rank_movers", "mm_video_meta", "mm_content_sniff",
      "cdc_golden_record", "graph_ktruss", "text_bm25_phrase",
      "graph_coreness", "graph_trussness", "zorder_incremental",
      "dedup_substring", "cdc_conflicts", "text_heaps", "q_item_similarity",
      "graph_percolation",
      "graph_coreness_inc", "graph_trussness_inc", "graph_percolation4",
      "graph_sssp", "dedup_sorted_neighborhood", "dq_benford",
      "graph_kpeak", "dedup_linkage_score", "text_mixture_select",
      "text_mixture_weights", "text_mixture_temp", "cdc_vacuum_tombstones",
      "q_sessionize_capped", "graph_path_counts", "graph_harmonic",
      "q_negative_sample", "q_eval_auc", "q_eval_calibration",
      "q_eval_confusion", "q_kfold_assign", "q_eval_kappa",
      "ann_recall_report", "q_time_split", "q_feature_asof",
      "q_skyline", "q_chi2_test", "q_gini_split", "q_eval_gains",
      "q_ewma_smooth", "q_concentration_hhi", "q_eval_mrr",
      "q_rank_normalize", "text_novelty",
      "dedup_setsim_exact", "q_survival_km", "graph_ppr", "q_mannwhitney",
      "q_gini_coeff", "q_drift_tv", "q_spearman", "q_ks_test",
      "q_wasserstein", "q_cramers_v", "q_abc_class",
      "dedup_containment", "q_quantile_shift", "q_holt_trend",
      "q_autocorr", "q_logrank", "graph_betweenness", "graph_eigenvector",
      "graph_assortativity", "graph_modularity", "q_eval_ndcg",
      "q_kendall", "graph_hits", "graph_link_predict", "q_welch_t2",
      "q_holt_winters", "q_forecast_error", "q_seasonal_strength",
      "text_vocab_overlap", "q_decompose_ma", "q_trend_test",
      "q_runs_test", "q_score_quality", "q_rrf_fusion",
      "text_good_turing", "text_zipf", "q_weighted_bottomk",
      "q_spatial_radius_join", "q_spatial_knn", "q_spatial_cluster",
      "q_kmeans_cluster", "q_silhouette", "q_markov_stationary",
      "q_quantile_normalize", "dq_l_diversity", "q_trimmed_mean",
      "text_feature_hash", "q_target_encode", "q_group_split",
      "ann_ivf_kmeans_topk", "mm_flac_meta", "graph_temporal_reach",
      "graph_temporal_latest", "q_rate_limit", "dq_fd_check",
      "graph_rich_club", "q_changepoint_split", "graph_squares",
      "q_max_concurrency", "q_conformal", "q_resample_interp",
      "cdc_bitemporal", "text_concordance", "graph_msf",
      "graph_msf_clusters", "graph_cascade", "graph_influence_rank",
      "q_queue_wait", "graph_embeddedness", "q_diff_in_diff",
      "q_cohort_ltv", "ann_ivf_recall", "dedup_rate_by_source",
      "q_changepoint_multi", "embed_drift", "text_langid_confusion",
      "text_bpe_tokenize", "text_bpe_vocab", "text_bpe_encode",
      "dedup_repeated_spans", "dedup_span_stats", "mm_patch_ahash",
      "q_union_evolve", "dedup_contamination_rate", "delta_roundtrip",
      "iceberg_roundtrip", "graph_walks")
    def squeeze(plan: String): Seq[String] = plan.linesIterator
      .filter(l => interesting.exists(l.contains))
      .map(_.replaceAll("#\\d+L?", "").replaceAll(", \\[plan_id=\\d+\\]", ""))
      .map(l => if (l.length > 200) l.take(197) + "..." else l)
      .toSeq
    val sb = new StringBuilder
    sb.append("# PLANS — physical-plan evidence (sf0.001, post-AQE where materialized)\n\n")
    sb.append("Generated by `graft.PlanDump`. Lines filtered to scans/joins/exchanges/\n")
    sb.append("aggregates/codegen markers. `*(n)` prefixes = whole-stage-codegen spans.\n")
    sb.append("Iterative operators checkpoint their loop state (lineage truncation\n")
    sb.append("hides the rounds from the final plan), so for them the DISTINCT\n")
    sb.append("per-round state plans captured at each checkpoint (via `PlanProbe`)\n")
    sb.append("are listed with their occurrence counts — that is where the\n")
    sb.append("exchanges-per-round live.\n")
    names.foreach { name =>
      PlanProbe.start()
      val df = SparkEntry.queries(name)(spark, dir)
      df.collect()
      val rounds = PlanProbe.drain()
      val lines = squeeze(df.queryExecution.executedPlan.toString())
      sb.append(s"\n## $name\n\n```\n${lines.mkString("\n")}\n```\n")
      if (rounds.nonEmpty) {
        sb.append(s"\nPer-round checkpointed state (${rounds.map(_._2).sum} checkpoints, ${rounds.size} distinct shapes):\n")
        rounds.foreach { case (plan, n) =>
          sb.append(s"\n×$n:\n```\n${squeeze(plan).mkString("\n")}\n```\n")
        }
      }
    }
    Files.writeString(Paths.get("/root/repo/PLANS.md"), sb.toString)
    println("[plandump] wrote PLANS.md")
    spark.stop()
  }
}
