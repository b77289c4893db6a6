package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev utility: dump `explain("formatted")` for headline queries to stdout
  * (captured into PLANS.md). Run:
  *   sbt "runMain graft.tools.ExplainDump /root/testdata/sf0.01"
  */
object ExplainDump {
  val Headline: Seq[String] = Seq(
    "agg_daily_top_titles", "filter_range", "filter_partition_prune",
    "join_broadcast", "join_star", "join_asof", "topk_orderby_limit",
    "sim_topk_cosine", "dedup_minhash", "win_session",
    "win_ntile", "tpch_q10",
    "sim_threshold_lsh", "tpch_q2", "tpch_q21", "sim_ann_ivf", "upsert_scd2",
    "quality_filter_pipeline", "text_chunk", "sample_stratified_hash",
    "ts_resample", "dedup_simhash_hamming", "text_unigram_nll",
    "filter_dynamic_prune", "win_rank_topn",
    "join_range_binned", "text_top_terms_approx",
    "text_repetition", "text_contamination", "sample_domain_mix",
    "embed_kmeans", "dedup_semantic",
    "curation_pipeline_e2e", "curation_pack_sequences", "sample_weighted",
    "graph_pagerank", "embed_quantize",
    "text_perplexity_bucket", "sample_temperature", "dedup_substring",
    "upsert_cdc_apply", "funnel_conversion", "agg_retention_cohort",
    "dq_profile", "dq_constraints", "ts_zscore_outlier", "ts_ewma",
    "text_bm25", "graph_triangle_count", "layout_zorder",
    "win_hopping", "text_quality_classifier", "multimodal_phash_dedup",
    "embed_random_projection", "ts_mad_outlier", "agg_incremental_merge",
    "scan_schema_evolution", "agg_count_min", "gen_inline",
    "curation_shard_balance",
    "ts_interpolate_linear", "join_interval_overlap", "layout_compaction",
    "mine_frequent_pairs", "cdc_derive_changes", "join_asof_native",
    "embed_pca_power", "embed_pca_project", "graph_label_propagation",
    "sim_ann_recall_eval", "text_segment_dedup", "sim_ann_ivf_pq",
    "graph_degree_hist", "dedup_lsh_candidate_eval", "sim_ann_ivf_cell_stats",
    "mine_assoc_rules", "ts_autocorr", "dq_drift_psi", "agg_entropy",
    "embed_cluster_purity", "graph_kcore", "win_gaps_islands",
    "ts_seasonal_decompose", "embed_pq_distortion", "dedup_edit_distance",
    "search_hybrid_rrf", "embed_truncate_recall", "sample_hard_negatives",
    "curation_token_budget", "eval_quality_auc", "eval_calibration_bins",
    "sample_coreset_kcenter", "graph_modularity", "ts_forecast_snaive",
    "sim_mmr_rerank", "mine_seq_pattern",
    "agg_rate_ci", "sample_neyman_alloc", "graph_assortativity",
    "text_zipf_fit", "dq_uniqueness", "eval_cohens_kappa",
    "graph_clustering_coeff", "text_vocab_coverage",
    "mine_frequent_pairs_rel",
    // round-11 additions: the GraftTable-routed reads and the two
    // Zipf-campaign plan rewrites (linear as-of frames, composite
    // hour-bucket range blocking).
    "scan_time_travel", "upsert_keep_latest",
    "join_asof_forward", "join_asof_nearest", "join_range",
    "scan_table_changes", "scan_table_changes_diff", "scan_file_skipping",
    // round-12 addition: the DSv2 partition-manifest day slice
    "scan_partition_manifest",
    // round-13 additions: the SQL DML surface (MERGE/DELETE/UPDATE land
    // before the dumped read; the dump shows the post-DML snapshot scan)
    // and the string-keyed COW merge read
    "upsert_merge_sql", "upsert_string_key",
    // round-14 additions: timestamp time travel and the deletion-vector
    // masked snapshot read (the dump shows the DV filter over the scan)
    "scan_time_travel_ts", "delete_where_dv",
    "delete_where_sql", "update_where_sql",
    // round-14 continuation: the merge-on-read UPDATE/MERGE snapshots
    "update_where_dv", "upsert_merge_dv")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // optional: trailing args restrict the dump to those keys
    val only = args.drop(1).toSet
    val selected = if (only.isEmpty) Headline else Headline.filter(only)
    selected.foreach { name =>
      println(s"\n===== $name =====")
      val df = SparkEntry.queries(name)(spark, sfDir)
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    // join_runtime_bloom: the declared query materializes eagerly inside
    // its conf scope (the returned frame is an InMemoryRelation), so the
    // interesting plan is the inner one, dumped under the same confs.
    if (only.isEmpty || only("join_runtime_bloom")) {
      println(s"\n===== join_runtime_bloom (inner plan, confs armed) =====")
      val confs = graft.rel.Joins.RuntimeBloomConfs
      val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try println(graft.rel.Joins.runtimeBloomPlan(spark, sfDir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }
    // Compact plan fingerprint for EVERY declared query (headline keys
    // included) — one greppable line per key so PLANS.md carries plan
    // evidence for the full surface, not just the formatted headliners.
    // Counts are over the executedPlan STRING: cached-plan renderings
    // inflate scan counts (occurrences ≠ executions), so `cached>0`
    // contextualizes `scans`. BOTH cache layers are cleared before each
    // fingerprint: cacheManager covers Materialize.once (Dataset persist
    // → InMemoryTableScan leaking into later plans), while Materialize.pin
    // persists a raw RDD the cacheManager does NOT track — those blocks
    // need the explicit getPersistentRDDs unpersist or they accumulate
    // monotonically across the ~all-query sweep.
    println("\n===== PLAN FINGERPRINTS (all declared queries) =====")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try {
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        val p = fn(spark, sfDir).queryExecution.executedPlan.toString
        def n(pat: String) = pat.r.findAllIn(p).size
        println(s"FPRINT $name exchanges=${n("Exchange hashpartitioning")}" +
          s" range=${n("Exchange rangepartitioning")}" +
          s" single=${n("Exchange SinglePartition")}" +
          s" scans=${n("Scan parquet")} cached=${n("InMemoryTableScan")}" +
          s" bhj=${n("BroadcastHashJoin")} smj=${n("SortMergeJoin")}" +
          s" bnlj=${n("BroadcastNestedLoopJoin")} win=${n("Window \\[")}" +
          s" wgl=${n("WindowGroupLimit")} topk=${n("TakeOrderedAndProject")}")
      } catch { case e: Throwable =>
        println(s"FPRINT $name ERROR ${e.toString.take(120)}")
      }
    }
    println(s"\nTOTAL_DECLARED_QUERIES=${SparkEntry.queries.size}")
    println(s"ORACLE_QUERIES=${SparkEntry.oracleSql.size}")
    spark.stop()
  }
}
