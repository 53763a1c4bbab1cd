#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with a noop-format write (full computation,
no driver collect — the same shape a cluster job has). Per-query times are
the MEDIAN of --repeats timed runs within one session (after a warm run),
with the within-run relative spread recorded alongside — the methodology
fix for the ±30% cross-day ambient drift that made round-over-round
comparisons noise-bound (VERDICT r4 item 4).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "flagship_pipeline",
    "trends_pipeline_synthetic",
    "pricing_summary",
    "revenue_by_nation",
    "sql_interface_shipping_priority",
    "top_orders_per_customer",
    "rank_window_tiebreak",
    "semi_join_filter",
    "rollup_order_counts",
    "order_gaps_lead_lag",
    "orders_range_join",
    "asof_join_events_orders",
    "sessionize_events",
    "daily_spine_ffill",
    "weekly_event_rollup",
    "exact_dedup",
    "ngram_jaccard_pairs",
    "ngram_jaccard_pairs_capped",
    "minhash_lsh_pairs",
    "near_dup_clusters",
    "near_dup_clusters_lsh",
    "corpus_clean_pipeline",
    "simhash_signatures",
    "simhash_near_dup_pairs",
    "similarity_topk",
    "similarity_topk_lsh",
    "similarity_topk_ivf",
    "label_centroids",
    "text_quality",
    "token_counts",
    "salted_token_counts",
    "term_doc_stats",
    "token_estimate",
    "chargram_minhash",
    "doc_fingerprints",
    "chunk_documents",
    "vocab_coverage",
    "heavy_hitters_per_source",
    "source_report",
    "retention_cohorts",
    "wow_event_growth",
    "quantity_percentiles",
    "profile_lineitem",
    "multimodal_features",
    "hash_sample",
    "stratified_sample",
    "weighted_source_mix",
    "pack_token_shards",
    "repetition_stats",
    "contamination_check",
    "pii_scrub",
    "priority_class_by_status",
    "promo_revenue_share",
    "embedding_normalize",
    "embedding_quantize",
    "order_value_extremes",
    "fuzzy_name_matches",
    "scd2_user_type_history",
    "funnel_conversion",
    "kmeans_assignments",
    "global_row_numbers",
    "zorder_key",
    "doc_commonness",
    "multimodal_frame_sample",
    "orders_above_global_avg",
    "order_date_features",
    "price_histogram",
    "price_quantity_corr",
    "dataset_splits",
    "rolling_7day_user_value",
    "nation_revenue_share",
    "big_order_customers",
    "null_safe_event_join",
    "user_event_sequences",
    # decision-support shape pack (round 2)
    "min_cost_supplier",
    "late_order_priority_counts",
    "important_parts_value",
    "customer_order_distribution",
    "top_revenue_suppliers",
    "supplier_count_by_part_attrs",
    "small_quantity_revenue",
    "disjunctive_part_revenue",
    "excess_stock_suppliers",
    "waiting_orders_suppliers",
    "idle_rich_customers",
    "volume_shipping",
    "nation_market_share",
    "product_type_profit",
    "returned_item_customers",
    "shipmode_priority_counts",
    "duplicate_spans",
    "span_dup_coverage",
    "merge_changeset",
    "referential_integrity_check",
    "grouping_sets_report",
    "rolling_7day_distinct_users",
    "funnel_conversion_windowed",
    "incremental_rollup_merge",
    "user_event_transitions",
    "event_gap_histogram",
    "table_checksum",
    "bucketed_join_rollup",
    "similarity_topk_ivf_prebuilt",
    "scd2_as_of",
    "incremental_minhash_dedup",
    "quality_score_model",
    # corpus versioning / semi-structured / distributions (round 2)
    "snapshot_diff",
    "variant_props_rollup",
    "price_equidepth_histogram",
    # round 4: fast hash family, skew-capped LSH, prefix-filter join,
    # semantic dedup, robust outliers, salted join, forward as-of
    "minhash_lsh_pairs_fast",
    "minhash_lsh_pairs_banddf_capped",
    "prefix_filter_jaccard_pairs",
    "semantic_dedup",
    "event_value_outliers",
    "salted_skew_join_rollup",
    "asof_join_forward",
    # round 4 (cont.): scaled-cell semantic dedup, Catalyst bloom runtime
    # filter, built-in session windows, containment pairs, domain cap, Q6
    "semantic_dedup_scaled",
    "bloom_filtered_join_rollup",
    "session_window_rollup",
    "ngram_containment_pairs",
    "per_source_quality_cap",
    "discounted_revenue",
    "kcenter_diversity_sample",
    "grouped_linear_trend",
    "observed_quality_filter",
    "daily_spine_interpolate",
    "latest_event_per_user",
    "pack_token_shards_scalable",
    "repetition_stats_long",
    "count_min_heavy_hitters",
    "hll_union_weekly_users",
    # round 4 (session 3): graph family, interval sweep, curation CDF,
    # char-level dedup, basket rules, EWMA fold
    "supplier_pagerank",
    "supplier_triangles",
    "max_concurrent_sessions",
    "quality_threshold_for_budget",
    "edit_distance_pairs",
    "brand_assoc_rules",
    "user_value_ewma",
    "supplier_bfs_hops",
    "supplier_clustering_coeff",
    "streaming_semi_join",
    "streaming_user_ewma",
    "consensus_near_dup_pairs",
    "event_pattern_conversions",
    "session_overlap_degree",
    "user_time_weighted_value",
    "calendar_activity_spine",
    "recursive_supplier_reach",
    "quality_canonical_docs",
    "systematic_token_sample",
    "rolling_7day_median_value",
    "event_dow_chi2",
    "nation_share_of_region",
    "session_novelty",
    "weighted_median_price",
    "time_grain_rollup",
    "order_revenue_allocation",
    "corpus_curation_v2",
    "customer_revenue_pareto",
    # round 5: real-codec decode path, distribution/stat audits, pareto
    # frontier, segmentation, sparse lexical similarity, positional
    # phrase search, association lift, interval union, tolerant as-of
    "multimodal_png_decode",
    "benford_price_digits",
    "ks_two_sample",
    "skyline_orders",
    "user_modal_event_type",
    "rfm_segments",
    "user_acquisition_curve",
    "sparse_cosine_pairs",
    "phrase_search",
    "event_type_lift",
    "interval_coverage_per_user",
    "asof_join_tolerance",
    "gdpr_erasure_audit",
    "split_leakage_check",
    "chunk_documents_udtf",
    # round 5 (session 2): transcendental-free weighted sampling, exact
    # CLV channel attribution
    "priority_sample_topk",
    "linear_touch_attribution",
    # round 5 (session 3): graph k-core, concentration/robust/eval stats,
    # exact-rational BM25, kNN label audit, real lossy-codec decode
    "supplier_kcore",
    "revenue_gini",
    "trimmed_mean_order_value",
    "bm25_doc_rank",
    "knn_label_vote",
    "decile_lift_table",
    "multimodal_jpeg_decode",
    "lateral_top_customers_per_nation",
    # round 6: ANN-backed kNN, palette/WAV/MJPG codecs, bitmap distinct
    # family, rank/robust statistics, text analytics, warehouse shapes,
    # graph analytics, planner/sketch/resampling primitives
    "knn_label_vote_ivf",
    "multimodal_palette_png_decode",
    "multimodal_wav_decode",
    "multimodal_mjpeg_frame_sample",
    "bitmap_weekly_users",
    "weekly_user_overlap",
    "streaming_bitmap_distinct",
    "revenue_cusum_max",
    "mann_whitney_u",
    "bigram_collocations",
    "source_vocab_jaccard",
    "simpson_token_diversity",
    "top_keywords_per_doc",
    "table_profile",
    "customer_order_streaks",
    "weekly_seasonal_mae",
    "customer_balance_band_pairs",
    "dpp_partitioned_rollup",
    "copurchase_edge_support",
    "copurchase_degree_histogram",
    "supplier_label_propagation",
    "orders_percentile_ladder",
    "hhi_market_concentration",
    "json_value_histogram",
    "checksum_replica_diff",
    "lsh_tuning_report",
    "embedding_pq_codes",
    "join_cardinality_estimate",
    "cv_fold_assignment",
    "split_label_drift",
    "event_type_pivot",
    "bloom_membership_audit",
    "bootstrap_mean_ci",
    "daily_lag_correlation",
    "temporal_backtest_splits",
    "quantile_normalize_per_source",
    "data_expectations_report",
    "multimodal_color_jpeg_decode",
    "pq_search_adc",
    "shuffle_skew_report",
    "multimodal_wav_frame_features",
    # round 7: full IVF-PQ composition, real decode+resample, 4:2:0 JPEG
    "ivfpq_search",
    "multimodal_resize",
    "multimodal_color_jpeg_subsampled_decode",
    "shuffle_skew_report_composite",
    "multimodal_wav_channel_features",
    "isotonic_revenue_curve",
    "multimodal_color_resize",
    "multimodal_color_jpeg_422_decode",
    "bigram_surprisal_score",
    "hybrid_search_rrf",
    "streaming_late_data_audit",
    "bpe_train_merges",
    "bpe_encode_token_counts",
    "matryoshka_rank_agreement",
    "layout_advisor",
    "streaming_update_mode_rollup",
    "pack_bpe_token_shards",
    "dataset_card_report",
    "eb_shrunk_source_quality",
    "multimodal_resize_420",
    # --- round 8 ---
    "copurchase_edges_capped",
    "bpe_train_merges_bytelevel",
    "streaming_incremental_late_audit",
    "multimodal_thumbnail_grid",
    "bpe_fertility_report",
    "benchmark_contamination_13gram",
    "dsir_importance_weights",
    "unigram_entropy_per_source",
    "curriculum_order_assignment",
    "multimodal_gif_decode",
    "streaming_join_then_rollup",
    "embedding_stats_per_dim",
    "ivf_recall_report",
    "near_dup_cluster_size_histogram",
    "lang_confusion_matrix",
    "hashed_tf_features",
    "zorder_skipping_report",
    "minhash_estimate_error_audit",
    "multimodal_progressive_jpeg_decode",
    "multimodal_adpcm_roundtrip",
    "multimodal_gif_interlaced_decode",
    "multimodal_gif_animation_frames",
    "multimodal_progressive_sa_jpeg_decode",
    "dsir_resample_corpus",
    "multimodal_progressive_ac_refine_decode",
    "bpe_train_merges_deep",
    "multimodal_g711_roundtrip",
    "incremental_join_rollup_merge",
    "quality_calibration_report",
    "padding_waste_report",
    "zipf_fit_report",
    "embedding_label_centroid_distances",
    "streaming_python_datasource_rollup",
    "multimodal_bmp_rle_decode",
    "ngram_novelty_curve",
    "stratified_holdout_exact",
    "supplier_ktruss_profile",
    "pq_distortion_report",
    "dedup_family_agreement",
    "compaction_plan_report",
    "streaming_tick_restart_continuity",
    "cohens_kappa_langid",
    "mann_kendall_trend",
    "theil_sen_slope",
    "pettitt_change_point",
    "multimodal_image_metadata",
    "spearman_daily_correlation",
    "kendall_tau_b_daily",
    "perplexity_bucket_report",
    "priority_sample_per_source",
    "ivfpq_recall_frontier",
    "multimodal_audio_metadata",
    "copurchase_edge_jaccard",
    "wilcoxon_signed_rank_daily",
    "incremental_bitmap_distinct_merge",
    "pipe_syntax_revenue_profile",
    "cliffs_delta_daily",
    "doc_length_percentile_ladder",
    # --- round 11 ---
    "image_dhash_near_dup_pairs",
    "image_perceptual_hashes",
    "image_histogram_equalization",
    "cramers_v_event_dow",
    "isotonic_calibration_per_source",
    "hard_negative_mining",
    "multimodal_audio_quality_report",
    "image_text_dedup_agreement",
    "lateral_topk_orders_per_customer",
    "sql_udf_discounted_revenue",
    "token_budget_mixture_plan",
    "image_dhash_resize_robustness",
    "image_dhash_index_dedup_batch",
    "image_dhash_dihedral",
    "theil_sen_monthly_nation_revenue",
    "winnowing_fingerprint_profile",
    "winnowing_dup_candidates",
    "sq8_recall_report",
    "streaming_dhash_index_maintenance",
    "rendezvous_shard_plan",
    "variant_event_props_rollup",
    "bloom_fpr_curve",
    "image_quadrant_dup_pairs",
    "good_turing_vocab_report",
    "heaps_law_curve",
    "copurchase_degree_assortativity",
    "cross_source_dup_matrix",
    "group_by_all_revenue",
]


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        help="testdata dir (also settable via SPARK_GRAFT_SF_DIR)",
    )
    ap.add_argument(
        "--queries",
        default=None,
        help="comma-separated subset of HEADLINE to run (default: all)",
    )
    ap.add_argument(
        "--repeats", type=int, default=3, help="timed runs per query (median-of)"
    )
    args = ap.parse_args()
    sf_dir = args.sf_dir
    headline = HEADLINE if args.queries is None else args.queries.split(",")
    unknown = set(headline) - set(HEADLINE)
    if unknown:
        raise SystemExit(f"not headline queries: {sorted(unknown)}")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import gc

    qs = entry.queries()
    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}

    def _session_hygiene() -> None:
        # Evict persisted/cached blocks operators left behind and drop
        # references to prior runs' localCheckpoint RDDs, nudging both GCs
        # (the driver GC releases the RDD handles; the JVM ContextCleaner
        # then frees their executor storage). Without this, executor
        # storage pressure from run N taxes run N+1's timing (measured:
        # chargram_minhash 3.3s isolated vs 12s late in a 48-query
        # session; semantic_dedup_scaled 3.1s isolated vs 32s late in a
        # 138-query session).
        spark.catalog.clearCache()
        gc.collect()
        spark.sparkContext._jvm.System.gc()

    for name in headline:
        fn = qs[name]
        _session_hygiene()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm: plan + JIT + OS page cache
        # median-of-N WITHIN one session (VERDICT r4 item 4): best-of
        # rewarded lucky runs and made round-over-round totals compare a
        # lucky sample against a typical one; the median is a consistent
        # estimator, and the within-run relative spread is recorded so the
        # comparator can tell real regressions from measured jitter.
        #
        # Hygiene runs BETWEEN repeats too (r5 fix): localCheckpoint-heavy
        # queries otherwise stack a fresh set of checkpoint blocks per
        # repeat — clearCache() does not free those — so repeats 2..N spill
        # and the median lands on an inflated run (measured: semantic_dedup
        # 2.98s best-of-2 -> 28.6s median-of-3 with within-run spread 1.7,
        # purely from its own accumulated checkpoint blocks). Hygiene sits
        # OUTSIDE the timed section, so each repeat measures the same
        # clean-session cost a cluster job pays.
        runs = []
        for _ in range(args.repeats):
            _session_hygiene()
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        med = statistics.median(runs)
        timings[name] = round(med, 3)
        spreads[name] = round((max(runs) - min(runs)) / med, 3) if med else 0.0

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "headline_queries_total_time",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "agg": f"median-of-{args.repeats}",
        "spread": spreads,  # per-query within-run (max-min)/median
        "sf": float(sf) if sf.replace(".", "", 1).isdigit() else sf,
    }
    # Driver-facing line must FIT a ~4 KB stdout-tail capture (VERDICT r7
    # item 2: r5/r6/r7 all arrived `parsed: null` because a full per-query
    # map is ~6.5 KB and the HEAD of the line was clipped). Emit totals +
    # query count + the slowest-10 map only; the FULL per-query map and the
    # spread map live in BENCH_HISTORY.jsonl, which tools/bench_compare.py
    # already treats as the authoritative record.
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:10])
    compact = {
        "metric": result["metric"],
        "value": result["value"],
        "unit": "sec",
        "n_queries": len(timings),
        "agg": result["agg"],
        "sf": result["sf"],
        "queries": {k: round(v, 2) for k, v in slowest.items()},
        "full_map": "BENCH_HISTORY.jsonl",
    }
    print(json.dumps(compact, separators=(",", ":")))
    # append to the per-query history so regressions the single total hides
    # are visible (tools/bench_compare.py flags drift-adjusted median
    # regressions beyond the recorded within-run spread)
    try:
        hist = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH_HISTORY.jsonl")
        with open(hist, "a") as fh:
            fh.write(json.dumps({"ts": round(time.time(), 1), "cpus": cpus,
                                 **result}) + "\n")
    except OSError:
        pass  # history is best-effort; never fail the bench over it
    spark.stop()


if __name__ == "__main__":
    main()
