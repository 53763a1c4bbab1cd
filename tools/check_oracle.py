#!/usr/bin/env python
"""Self-check harness mimicking the driver's correctness gate: run each
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB over the
same parquet, compare row count + column names + order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time
from decimal import Decimal

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        s = df[c]
        kind = s.dtype.kind if hasattr(s.dtype, "kind") else "O"
        if s.dtype == object and s.map(lambda v: isinstance(v, Decimal)).any():
            df[c] = s.map(lambda v: float(v) if isinstance(v, Decimal) else v)
        elif str(s.dtype).startswith("datetime64"):
            df[c] = s.astype("datetime64[us]").astype(str)
        elif kind in "iu":
            df[c] = s.astype("int64")
        elif kind == "f":
            df[c] = s.astype("float64")
        elif s.dtype == object:
            df[c] = s.map(lambda v: str(v))
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        # driver testdata writes single files; Spark-written dirs (e.g.
        # tools/make_sf.py output) hold part files under <table>.parquet/
        path = f"{sf_dir}/{t}.parquet"
        glob = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{glob}')"
        )

    qs, oracles = entry.queries(), entry.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        if name not in oracles:
            status = "ROWS" if len(sdf) > 0 else "FAIL(rows=0)"
            print(f"{status:5} {name}: rows={len(sdf)} ({time.time()-t0:.1f}s) [no oracle]")
            n_rowsonly += 1
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        problems = []
        if len(sdf) != len(ddf):
            problems.append(f"rowcount spark={len(sdf)} duckdb={len(ddf)}")
        if sorted(sdf.columns) != sorted(ddf.columns):
            problems.append(f"cols spark={sorted(sdf.columns)} duckdb={sorted(ddf.columns)}")
        if not problems:
            a, b = normalize(sdf), normalize(ddf)
            if not a.equals(b):
                diff_cols = [c for c in a.columns if not a[c].equals(b[c])]
                problems.append(f"values differ in cols {diff_cols}")
                for c in diff_cols[:2]:
                    neq = a[c] != b[c]
                    idx = neq[neq].index[:3]
                    for i in idx:
                        problems.append(
                            f"  {c}[{i}]: spark={a[c][i]!r} duckdb={b[c][i]!r}"
                        )
        if problems:
            n_fail += 1
            print(f"FAIL  {name} ({time.time()-t0:.1f}s): " + "; ".join(problems))
        else:
            n_pass += 1
            print(f"PASS  {name}: rows={len(sdf)} ({time.time()-t0:.1f}s)")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
