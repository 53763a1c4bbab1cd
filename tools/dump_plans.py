#!/usr/bin/env python
"""Dump formatted physical plans for the key queries into docs/plans/ —
reviewable evidence of plan quality (pushdown, broadcasts, exchange counts)
without running Spark. Regenerate after plan-affecting changes:

    python tools/dump_plans.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEY_QUERIES = [
    "flagship_pipeline",
    "trends_pipeline_synthetic",
    "pricing_summary",
    "revenue_by_nation",
    "semi_join_filter",
    "asof_join_events_orders",
    "orders_range_join",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "similarity_topk",
    "sessionize_events",
    "daily_spine_ffill",
    "hash_sample",
    "weighted_source_mix",
    "contamination_check",
    "kmeans_assignments",
    "global_row_numbers",
    "nation_revenue_share",
    "rolling_7day_user_value",
    "funnel_conversion",
    # round 2 additions
    "ngram_jaccard_pairs_capped",
    "chunk_documents",
    "vocab_coverage",
    "heavy_hitters_per_source",
    "source_report",
    "retention_cohorts",
    "wow_event_growth",
    # round 3/4 additions (operators whose returned plan IS the dataflow —
    # materializing/collect-driven entries like bucketed_join_rollup or
    # kcenter would dump a trivial post-materialization plan, so they are
    # covered by tests/test_plans.py instead)
    "volume_shipping",
    "grouping_sets_report",
    "funnel_conversion_windowed",
    "rolling_7day_distinct_users",
    "scd2_as_of",
    "quality_score_model",
    "prefix_filter_jaccard_pairs",
    "semantic_dedup",
    "semantic_dedup_scaled",
    "salted_skew_join_rollup",
    "asof_join_forward",
    "event_value_outliers",
    "session_window_rollup",
    "ngram_containment_pairs",
    "per_source_quality_cap",
    "discounted_revenue",
    "latest_event_per_user",
    "grouped_linear_trend",
    "daily_spine_interpolate",
    "pack_token_shards_scalable",
    "repetition_stats_long",
    "count_min_heavy_hitters",
    "hll_union_weekly_users",
    "supplier_pagerank",
    "supplier_triangles",
    "supplier_bfs_hops",
    "supplier_clustering_coeff",
    "max_concurrent_sessions",
    "quality_threshold_for_budget",
    "edit_distance_pairs",
    "brand_assoc_rules",
    "user_value_ewma",
    "consensus_near_dup_pairs",
    "event_pattern_conversions",
    "session_overlap_degree",
    "user_time_weighted_value",
    "calendar_activity_spine",
    "recursive_supplier_reach",
    "quality_canonical_docs",
]


def main() -> None:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry
    from data_engineer_interview_task_spark.plans import explain_str

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "docs", "plans")
    os.makedirs(out_dir, exist_ok=True)
    qs = entry.queries()
    for name in KEY_QUERIES:
        plan = explain_str(qs[name](spark, "/root/testdata/sf0.01"))
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(f"# {name} — formatted physical plan at sf0.01\n")
            f.write("# regenerate: python tools/dump_plans.py\n\n")
            f.write(plan)
        print("wrote", name)
    spark.stop()


if __name__ == "__main__":
    main()
