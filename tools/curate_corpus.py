#!/usr/bin/env python
"""End-to-end corpus-curation run — the user-facing composition of the
curation operators into one job, with same-pass observability and a
JSONL export a tokenizer can consume:

  quality filter -> near-dup clustering (MinHash-LSH) -> one survivor
  per cluster -> per-source quality cap -> token-shard packing ->
  sharded JSONL export + a one-line JSON metrics report on stdout.

Usage:
  python tools/curate_corpus.py [--sf-dir /root/testdata/sf0.01]
                                [--out /tmp/curated] [--cap 15]

Everything stays one lazy lineage until the single write; the metrics
(docs in, quality-kept, dedup survivors, capped, shards) come from the
job's own counts — at 100 TB the only full-corpus passes are the ones
the semantics require (see SCALE.md per stage)."""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="/tmp/curated_corpus")
    ap.add_argument("--cap", type=int, default=15)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    ap.add_argument(
        "--recipe",
        choices=("v1", "v2"),
        default="v1",
        help="v1 = quality filter + LSH dedup + source cap + packing; "
        "v2 = quality-CANONICAL dedup (best-quality survivor) + quality "
        "floor + per-source systematic token sampling "
        "(operators.sampling.corpus_curation_v2)",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    from data_engineer_interview_task_spark.operators import dedup
    from data_engineer_interview_task_spark.plans import prep_session
    from data_engineer_interview_task_spark.sources import read_table
    from data_engineer_interview_task_spark.sources.sinks import write_jsonl

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("curate_corpus")
        .config("spark.sql.shuffle.partitions", args.cpus)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    prep_session(spark)

    docs = read_table(spark, args.sf_dir, "documents")
    n_docs = docs.count()

    if args.recipe == "v2":
        from data_engineer_interview_task_spark.operators import sampling

        picks = sampling.corpus_curation_v2(spark, args.sf_dir)
        out_df = picks.join(
            docs.select(
                F.col("doc_id").alias("survivor_id"), "lang", "text"
            ),
            "survivor_id",
        )
        n_picked = out_df.count()
        write_jsonl(out_df, args.out)
        print(
            json.dumps(
                {
                    "recipe": "v2",
                    "docs_in": n_docs,
                    "picked": n_picked,
                    "out": args.out,
                }
            )
        )
        return

    # quality + near-dup survivors, one lazy lineage (LSH pair source)
    survivors = dedup.corpus_clean_pipeline(spark, args.sf_dir).select("doc_id")
    n_survivors = survivors.count()

    # per-source quality cap over the surviving docs
    kept = docs.join(survivors, "doc_id")
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    capped = (
        kept.withColumn("quality_rank", F.row_number().over(w))
        .filter(F.col("quality_rank") <= args.cap)
        .drop("quality_rank")
    )

    # deterministic shard assignment: cumulative whitespace-token packing
    # per source (same rule as sampling.pack_token_shards)
    toks = F.size(F.split("text", " ")).cast("long")
    wp = (
        Window.partitionBy("source")
        .orderBy(F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = capped.select(
        "doc_id",
        "source",
        "lang",
        "text",
        toks.alias("n_tokens"),
    ).withColumn(
        "shard",
        ((F.sum(toks).over(wp) - toks) / F.lit(512)).cast("long"),
    )
    n_capped = packed.count()
    n_shards = packed.select("source", "shard").distinct().count()

    write_jsonl(packed, args.out)

    print(
        json.dumps(
            {
                "docs_in": n_docs,
                "dedup_quality_survivors": n_survivors,
                "after_source_cap": n_capped,
                "shards": n_shards,
                "out": args.out,
            }
        )
    )


if __name__ == "__main__":
    main()
