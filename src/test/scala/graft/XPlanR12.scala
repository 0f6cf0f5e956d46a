package graft

import org.apache.spark.sql.SparkSession

/** Scratch (test scope): physical-plan audit of the round-12 queries —
  * counts exchanges / broadcasts / windows and flags single-partition
  * windows (the scale hazard).  Run:
  *   sbt 'Test/runMain graft.XPlanR12 [sfDir]' */
object XPlanR12 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = Seq("sim_ivfpq_topk", "dd_soft_weights", "dd_minhash_recall",
      "dd_lsh_tune", "text_boilerplate", "text_sbo_lm", "o3_interleave",
      "mm_ahash_pairs", "sim_ivfpq_persisted", "mm_ahash_banded",
      "sim_knn_join", "emb_outliers", "dd_source_matrix", "text_oov_rate",
      "text_pmi_top", "p3_exact_split", "o5_export_shards",
      "ev_recency_weights", "sim_knn_join_persisted",
      "ev_asof_join", "ev_funnel", "ev_range_join", "text_normalize",
      "text_lexdiv", "text_zipf", "emb_semantic_contam", "pipeline_curate",
      "dd_cdc_chunks", "text_rep_ngrams", "tpch_bucketed_join",
      "skew_salted_join", "a1_pivot", "ev_cohort_retention", "ev_gaps",
      "dd_edit_confirm", "text_readability", "sim_rerank",
      "ev_session_conversion", "ev_value_outliers", "p3_weighted_quota",
      "a1_length_hist", "a1_rollup", "text_len_quantiles",
      "dd_containment_pairs",
      "text_js_divergence", "ml_knn_classify", "dd_incremental_embed",
      "a1_equidepth_hist", "o5_partitioned_read", "set_vocab_intersect",
      "set_digest_except", "ev_user_rank", "o3_bootstrap",
      "text_langid_acc", "tpch_q1", "tpch_q3", "ev_value_corr",
      "s2_schema_merge", "s3_orc_roundtrip",
      "ev_hourly_dense", "text_hll_union", "o5_compacted_write",
      "tpch_q5", "mm_frame_dedup",
      "text_source_drift", "sim_pq_error", "o5_sorted_layout",
      "ev_transitions", "text_len_pctile", "tpch_q6", "a1_cube",
      "s3_json_roundtrip", "ml_nb_confusion",
      "o5_curriculum", "text_token_downsample", "emb_drift",
      "ev_interval_lookup", "s2_corrupt_tolerant", "text_mad_gate",
      "a1_dq_report", "dd_norm_exact", "ev_funnel_rates",
      "emb_negatives", "emb_hard_negatives", "rlhf_pairs",
      "emb_triplets", "p3_split_manifest", "dd_nn_dist_hist",
      "o5_upsert", "ev_hourly_anomalies",
      "ev_session_hist", "ev_dau_wau", "dd_funnel_report",
      "sim_rerank_recall", "text_fertility", "emb_norm_hist", "pack_efficiency",
      "ev_attribution", "text_ngram_coverage",
      "ev_conversion_lag", "text_char_entropy",
      "join_size_census", "join_bloom_prune", "ev_interpolate",
      "ev_scd2", "ev_path_trigrams", "text_bm25_topk", "ev_rollup_merge",
      "o5_zorder_layout",
      "ev_trailing_features", "a1_manifest", "a1_topk_per_group",
      "emb_gram", "ev_trend_slope", "ev_value_moments",
      "text_vocab_coverage", "ev_ab_test", "a1_fd_check",
      "a1_observed_metrics", "o5_snapshot_diff", "s3_csv_roundtrip",
      "ev_item_cooc", "ev_item_gini", "text_script_profile",
      "ev_xcorr", "text_keyness", "ml_reliability", "a1_dp_counts",
      "a1_expectations", "ev_ingest_lag", "graph_pagerank",
      "ev_audience_overlap", "ev_benford", "o5_time_travel",
      "s1_gen_source", "ml_auc", "ml_pr_curve", "s3_nested_roundtrip",
      "ev_ewma", "ev_cuped", "ml_markov_backtest", "ev_entropy_rate",
      "dd_cluster_purity", "ev_item_trend")
    println("PLAN | query | exchanges | broadcasts | windows | 1-part windows |")
    println("PLAN |---|---|---|---|---|")
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.executedPlan.toString
        val ex = "Exchange hashpartitioning|Exchange rangepartitioning".r
          .findAllIn(plan).length
        val bc = "BroadcastExchange|BroadcastHashJoin|BroadcastNestedLoop".r
          .findAllIn(plan).length
        val wn = "\\bWindow\\b".r.findAllIn(plan).length
        val sp = "Exchange SinglePartition".r.findAllIn(plan).length
        println(s"PLAN | $name | $ex | $bc | $wn | $sp |")
        graft.core.CacheScope.release()
      } catch { case e: Throwable =>
        println(s"PLAN | $name | ERR ${e.toString.take(80)} |")
      }
    }
    spark.stop()
  }
}
