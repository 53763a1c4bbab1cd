#!/usr/bin/env python
"""Front-door CLI: run any registered query by name.

Usage:
    python tools/run_query.py QUERY [QUERY ...]
        [--sf-dir /root/testdata/sf0.01] [--show N] [--explain] [--list]

Runs each named query from ``__spark_entry__.queries()`` against the given
scale-factor directory, printing row count and (optionally) the first N
rows and/or the formatted physical plan. ``--list`` prints every
registered query name with its oracle status and exits.

This is the switch-over surface for a reference user: every operator the
engine implements is reachable here by name, with the same (spark, sf_dir)
contract the external driver uses.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("queries", nargs="*", help="registered query names")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--show", type=int, default=0, metavar="N",
                    help="print the first N rows of each result")
    ap.add_argument("--explain", action="store_true",
                    help="print the formatted physical plan")
    ap.add_argument("--list", action="store_true",
                    help="list registered queries and exit")
    args = ap.parse_args()

    import __spark_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()
    if args.list or not args.queries:
        for name in qs:
            kind = "oracle" if name in oracles else "rows-only"
            print(f"{name:40s} {kind}")
        return 0

    unknown = [q for q in args.queries if q not in qs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
        )
        .appName("run-query")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        for name in args.queries:
            t0 = time.monotonic()
            df = qs[name](spark, args.sf_dir)
            if args.explain:
                print(f"=== {name}: plan ===")
                df.explain("formatted")
            n = df.count()
            dt = time.monotonic() - t0
            print(f"{name}: {n} rows in {dt:.2f}s")
            if args.show:
                df.show(args.show, truncate=40)
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
