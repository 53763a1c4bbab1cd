#!/usr/bin/env python
"""Capture .explain("formatted") for named queries into plans/r12/.

Usage:
    python tools/plan_r12.py SUFFIX QUERY [QUERY ...] [--sf-dir DIR]

Writes plans/r12/<query>_<SUFFIX>.txt for each query (SUFFIX is
"before" or "after"). Building the DataFrame may execute driver-side
work for harness-shaped entries (streaming runs, iterative loops); the
plan captured is the plan of the RETURNED frame, which for those
entries is the post-materialization read — the convention the
tests/test_plans.py suite documents.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.1"
    for i, a in enumerate(sys.argv[1:]):
        if a == "--sf-dir":
            sf_dir = sys.argv[1:][i + 1]
            args = [x for x in args if x != sf_dir]
    suffix, names = args[0], args[1:]

    import __spark_entry__ as entry
    from pyspark.sql import SparkSession

    from data_engineer_interview_task_spark.plans.tuning import explain_str

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("plan_r12")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    out_dir = os.path.join(REPO, "plans", "r12")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        txt = explain_str(df)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
