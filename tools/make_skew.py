#!/usr/bin/env python
"""Synthesize an ADVERSARIALLY SKEWED copy of a testdata dir: same
schema, same row counts, but heavy-hitter key distributions —
`make_skew.py --src /root/testdata/sf0.1 --dst /tmp/skew` rewrites

- events.user_id: a deterministic ~30% of rows (md5-chosen) collapse
  onto user 0 — one user owns a third of the stream (hot-entity skew for
  sessionization, windows, collect_list folds, stateful streaming);
- lineitem.l_suppkey: ~30% of rows collapse onto supplier 0 (hot-key
  join skew for supplier joins/rollups — the shape AQE skew-join and the
  salting operators exist for).

All other tables copy through unchanged. FK consistency holds (key 0
exists in every domain). The point is a second DATA SHAPE for the oracle
gate: the DuckDB twins recompute on the same skewed inputs, so
`check_oracle.py /tmp/skew <queries>` verifies that correctness —
including window tie-breaks, decimal sums, and state folds — survives a
distribution the fixtures never exercise, and the bench can measure the
skew-handling operators on data that is actually skewed.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", required=True)
    ap.add_argument("--frac", type=int, default=30, help="hot-key percent")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from data_engineer_interview_task_spark.sources import read_table

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("make_skew")
        .config("spark.sql.shuffle.partitions", args.cpus)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def hot(id_col, row_key):
        # md5-keyed: deterministic, engine-independent, rerun-stable
        bucket = F.conv(F.substring(F.md5(row_key.cast("string")), 1, 4), 16, 10)
        return F.when(
            bucket.cast("long") % 100 < args.frac, F.lit(0).cast("long")
        ).otherwise(id_col.cast("long"))

    os.makedirs(args.dst, exist_ok=True)
    for t in TABLES:
        df = read_table(spark, args.src, t)
        if t == "events":
            df = df.withColumn("user_id", hot(F.col("user_id"), F.col("event_id")))
        elif t == "lineitem":
            df = df.withColumn(
                "l_suppkey",
                hot(
                    F.col("l_suppkey"),
                    F.concat_ws("_", "l_orderkey", "l_linenumber"),
                ),
            )
        df.write.mode("overwrite").parquet(os.path.join(args.dst, f"{t}.parquet"))
        print("wrote", t)
    spark.stop()


if __name__ == "__main__":
    main()
