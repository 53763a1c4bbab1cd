#!/usr/bin/env python
"""Same-session interleaved A/B of the two PERF_r12 regression flags
(VERDICT r12 next-round item 3): `ivfpq_recall_frontier` and
`bpe_train_merges_deep`, r12 tree (current) vs the pre-optimization
modules (commit 3805206 — the last commit before the r12 optimization
touches). The r12-documented recipe: git-show the old module file, load
it with importlib INSIDE the live package namespace (relative imports
resolve against the current tree), and alternate timed noop-sink runs
NEW/OLD within one session so host oscillation hits both arms equally.
"""

from __future__ import annotations

import gc
import importlib.util
import os
import statistics
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "3805206"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEATS = int(os.environ.get("AB_REPEATS", "4"))


def load_old(relpath: str, name: str):
    src = subprocess.check_output(
        ["git", "-C", os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
         "show", f"{BASE}:{relpath}"]
    )
    fd, path = tempfile.mkstemp(suffix=".py", prefix=name + "_")
    with os.fdopen(fd, "wb") as fh:
        fh.write(src)
    spec = importlib.util.spec_from_file_location(
        f"data_engineer_interview_task_spark.operators.{name}", path
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ab_r13_flags")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from data_engineer_interview_task_spark.operators import similarity, text

    old_sim = load_old(
        "data_engineer_interview_task_spark/operators/similarity.py",
        "similarity_r11",
    )
    old_text = load_old(
        "data_engineer_interview_task_spark/operators/text.py", "text_r11"
    )

    cases = {
        "ivfpq_recall_frontier": (
            lambda: similarity.ivfpq_recall_frontier(spark, SF_DIR),
            lambda: old_sim.ivfpq_recall_frontier(spark, SF_DIR),
        ),
        "bpe_train_merges_deep": (
            lambda: text.bpe_train_merges_deep(spark, SF_DIR),
            lambda: old_text.bpe_train_merges_deep(spark, SF_DIR),
        ),
    }

    def hygiene():
        spark.catalog.clearCache()
        gc.collect()
        spark.sparkContext._jvm.System.gc()

    def timed(fn):
        hygiene()
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        return time.time() - t0

    for qname, (new_fn, old_fn) in cases.items():
        # warm both arms (plan + JIT) before any timed run
        timed(new_fn)
        timed(old_fn)
        new_runs, old_runs = [], []
        for _ in range(REPEATS):
            new_runs.append(timed(new_fn))
            old_runs.append(timed(old_fn))
        print(
            f"{qname}: NEW median {statistics.median(new_runs):.2f}s "
            f"{[round(x,2) for x in new_runs]} | OLD median "
            f"{statistics.median(old_runs):.2f}s {[round(x,2) for x in old_runs]}"
        )


if __name__ == "__main__":
    main()
