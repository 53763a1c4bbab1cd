#!/usr/bin/env python
"""Key-skew diagnostic for join/aggregation planning — the operational
companion to the skew remedies this repo implements (AQE skew-join in
`plans/tuning.py`, manual salting in `maintenance.salted_skew_join_rollup`,
hot-key caps in the dedup family):

  python tools/skew_report.py lineitem l_orderkey [--sf-dir DIR] [--top 10]

Prints ONE JSON line with the key-frequency profile (distinct keys,
mean/p50/p95/p99/max per-key rows, top-N keys, max/mean ratio) and a
remedy suggestion:

  - max/mean <= 4        : no action — hash partitioning balances fine
  - 4 < max/mean <= 50   : AQE skew-join handles it (already enabled)
  - max/mean > 50        : salt the key (see salted_skew_join_rollup) or
                           cap/segregate the hot keys (max_*_df pattern)

One aggregation pass over the key column only (column-pruned scan); the
profile aggregation is key-cardinality-sized."""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("table")
    ap.add_argument("key")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--top", type=int, default=10)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from data_engineer_interview_task_spark.plans import prep_session
    from data_engineer_interview_task_spark.sources import read_table

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("skew_report")
        .config("spark.sql.shuffle.partitions", args.cpus)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    prep_session(spark)

    counts = (
        read_table(spark, args.sf_dir, args.table)
        .groupBy(F.col(args.key).alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    stats = counts.agg(
        F.count(F.lit(1)).alias("distinct_keys"),
        F.sum("n").alias("total_rows"),
        F.expr("percentile(n, 0.5)").alias("p50"),
        F.expr("percentile(n, 0.95)").alias("p95"),
        F.expr("percentile(n, 0.99)").alias("p99"),
        F.max("n").alias("max"),
    ).first()
    top = [
        {"key": str(r.k), "rows": r.n}
        for r in counts.orderBy(F.col("n").desc(), F.col("k").asc())
        .limit(args.top)
        .collect()
    ]
    mean = stats.total_rows / stats.distinct_keys
    ratio = stats.max / mean
    if ratio <= 4:
        remedy = "none: hash partitioning balances this key"
    elif ratio <= 50:
        remedy = "AQE skew-join (enabled by prep_session) splits the hot partitions"
    else:
        remedy = (
            "salt the key (operators/maintenance.salted_skew_join_rollup) "
            "or cap/segregate hot keys (max_shingle_df/max_band_df pattern)"
        )
    print(
        json.dumps(
            {
                "table": args.table,
                "key": args.key,
                "distinct_keys": stats.distinct_keys,
                "total_rows": stats.total_rows,
                "mean_rows_per_key": round(mean, 2),
                "p50": stats.p50,
                "p95": stats.p95,
                "p99": stats.p99,
                "max": stats.max,
                "max_over_mean": round(ratio, 2),
                "top_keys": top,
                "remedy": remedy,
            }
        )
    )


if __name__ == "__main__":
    main()
