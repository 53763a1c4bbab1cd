#!/usr/bin/env python
"""Synthesize a larger scale factor from an existing testdata dir for
scaling-curve benchmarks (VERDICT r3 item 3): `make_sf.py --src
/root/testdata/sf0.1 --dst /tmp/sfX --mult 10` writes an m-times copy
with the SAME schema and the same per-key statistics.

Scaling rules (chosen so per-query cost curves stay honest at m×):

- Key-bearing tables (customer/supplier/part/orders/lineitem/events)
  are unioned m times with each copy's keys offset by
  copy * (max_key + 1) per key DOMAIN — foreign keys stay consistent
  (lineitem copy i joins orders copy i, orders copy i joins customer
  copy i), so join fan-outs scale linearly exactly as TPC-H does.
- nation/region stay fixed (dimension tables; TPC-H semantics).
- documents: copy 0 is verbatim; copy i>0 rewrites every TOKEN with a
  `_i` suffix, so shingles never collide ACROSS copies. The near-dup
  pair graph of the scaled corpus is therefore m disjoint copies of the
  original graph — pair counts, shingle document frequencies, and LSH
  bucket sizes all scale LINEARLY, which is what an organically larger
  crawl looks like. Naive replication would instead make every doc an
  exact duplicate of m-1 others and blow the dedup family up
  quadratically — an adversarial corpus, not a bigger one.
- embeddings: vec_id offset per copy, vectors verbatim (ANN timing is
  driven by corpus size and cell layout, not vector values).

Events keep their time span (more events in the same window — denser
streams, the realistic growth mode for an event table).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "embeddings": ["vec_id"],
}

#: key column -> the table that OWNS the key domain (offset must match)
DOMAIN_OWNER = {
    "c_custkey": ("customer", "c_custkey"),
    "o_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "l_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "vec_id": ("embeddings", "vec_id"),
    "doc_id": ("documents", "doc_id"),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", required=True)
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from data_engineer_interview_task_spark.sources import read_table

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("make_sf")
        .config("spark.sql.shuffle.partitions", args.cpus)
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.dst, exist_ok=True)

    # one offset base per key DOMAIN, computed once from the owner table
    bases: dict[tuple[str, str], int] = {}
    for table, col in set(DOMAIN_OWNER.values()):
        df = read_table(spark, args.src, table)
        bases[(table, col)] = int(df.agg(F.max(col)).collect()[0][0]) + 1

    for name in ("region", "nation"):
        read_table(spark, args.src, name).write.mode("overwrite").parquet(
            f"{args.dst}/{name}.parquet"
        )

    for name, key_cols in KEYED.items():
        src = read_table(spark, args.src, name)
        copies = []
        for i in range(args.mult):
            c = src
            for col in key_cols + [
                k for k in src.columns if k in DOMAIN_OWNER and k not in key_cols
            ]:
                base = bases[DOMAIN_OWNER[col]]
                c = c.withColumn(col, (F.col(col) + F.lit(i * base)).cast("long"))
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.repartition(int(args.cpus)).write.mode("overwrite").parquet(
            f"{args.dst}/{name}.parquet"
        )

    docs = read_table(spark, args.src, "documents")
    doc_base = int(docs.agg(F.max("doc_id")).collect()[0][0]) + 1
    copies = [docs]
    for i in range(1, args.mult):
        suffixed = F.array_join(
            F.transform(
                F.split(F.col("text"), " "), lambda w: F.concat(w, F.lit(f"_{i}"))
            ),
            " ",
        )
        copies.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * doc_base)).cast("long").alias("doc_id"),
                suffixed.alias("text"),
                "lang",
                "source",
                F.length(suffixed).cast("long").alias("n_chars"),
            )
        )
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    out.repartition(int(args.cpus)).write.mode("overwrite").parquet(
        f"{args.dst}/documents.parquet"
    )

    for name in sorted(KEYED) + ["documents", "nation", "region"]:
        n = spark.read.parquet(f"{args.dst}/{name}.parquet").count()
        print(f"{name}: {n} rows")
    spark.stop()


if __name__ == "__main__":
    main()
