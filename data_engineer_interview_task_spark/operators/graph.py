"""Graph analytics over relations — PageRank on a co-occurrence graph.

The reference (pandas ETL, /root/reference/dags/google_trends_to_bigquery.py)
has no graph surface; this is part of the §2.8 extension mandate (the
LLM-data-pipeline needs link-style importance scores for source weighting,
and the connected-components clusterer in ``dedup.py`` already covers the
other half of the graph family).

Scale shape (the standard Pregel-on-DataFrames decomposition):
- the EDGE LIST is the big distributed dataset; it is built by a bounded
  self-join (lineitems of one order — order size is bounded by the data
  model, so the join fan-out per key is O(1)), deduplicated, and persisted
  once; every iteration reuses the same shuffle partitioning on ``src``;
- RANKS are one row per node — tiny next to the corpus — and each
  iteration is exactly one equi-join (edges ⋈ ranks on src) plus one
  partial-aggregated groupBy(dst): the map-side combine means the exchange
  carries one row per (partition, dst), bounded by nodes x partitions;
- iterations are statically unrolled (fixed count), so the whole algorithm
  is ONE lazy lineage — no driver-side collect anywhere.

Cross-engine determinism (what makes an ITERATIVE graph algorithm fully
oracle-checkable): all arithmetic is BIGINT fixed-point. Ranks are scaled
by 1e12; per-edge contributions use integer division ``rank DIV deg``
(floor == truncation for non-negative operands, identical in Spark's DIV
and DuckDB's ``//``); the damping step is ``15% * SCALE + (85 * incoming)
DIV 100`` — no float ever appears, so partition order and engine cannot
change a single bit. Overflow headroom: incoming <= nodes x SCALE; with
SCALE=1e12 the BIGINT bound allows ~1e5 effective hub mass, far above the
co-occurrence graph's degree at any tested SF (document the HUGEINT/
DECIMAL(38) escalation path for graphs beyond that).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import read_table

#: fixed-point scale for rank mass (1.0 == 1e12)
PR_SCALE = 1_000_000_000_000
#: statically unrolled power iterations
PR_ITERATIONS = 3
#: damping factor as an exact percent (d = 0.85)
PR_DAMPING_PCT = 85


def supplier_pagerank(
    spark: SparkSession, sf_dir: str, iterations: int = PR_ITERATIONS
) -> DataFrame:
    """PageRank over the supplier co-purchase graph: suppliers are linked
    when their parts appear in the same order (distinct undirected pairs,
    materialized as symmetric directed edges). Returns
    ``(s_suppkey, degree, pr_scaled)`` — ``pr_scaled`` is the fixed-point
    rank after ``iterations`` damped power steps.

    Every node of this graph has outdegree >= 1 by construction (edges are
    symmetric), so there is no dangling-mass redistribution step.
    """
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    a = li.alias("a")
    b = li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") != F.col("b.l_suppkey")),
        )
        .select(
            F.col("a.l_suppkey").alias("src"), F.col("b.l_suppkey").alias("dst")
        )
        .distinct()
        .persist()
    )
    nodes = (
        edges.groupBy("src")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
        .withColumnRenamed("src", "node")
    )
    ranks = nodes.withColumn("rank", F.lit(PR_SCALE).cast("long"))
    base = PR_DAMPING_PCT  # 85
    teleport = (100 - base) * PR_SCALE // 100
    for _ in range(iterations):
        contrib = ranks.select(
            F.col("node").alias("src"), F.expr("rank DIV deg").alias("contrib")
        )
        incoming = (
            edges.join(contrib, "src")
            .groupBy("dst")
            .agg(F.sum("contrib").alias("inc"))
            .withColumnRenamed("dst", "node")
        )
        ranks = nodes.join(incoming, "node", "left").select(
            "node",
            "deg",
            (
                F.lit(teleport).cast("long")
                + F.expr(f"({base} * coalesce(inc, 0L)) DIV 100")
            ).alias("rank"),
        )
    return ranks.select(
        F.col("node").alias("s_suppkey"),
        F.col("deg").alias("degree"),
        F.col("rank").alias("pr_scaled"),
    )


def pagerank_oracle_sql(iterations: int = PR_ITERATIONS) -> str:
    """The DuckDB twin: the same fixed-point power steps, statically
    unrolled as chained CTEs (``//`` == Spark's ``DIV`` on non-negative
    BIGINTs)."""
    teleport = (100 - PR_DAMPING_PCT) * PR_SCALE // 100
    parts = [
        """
WITH edges AS (
  SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
  FROM lineitem a
  JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
), nodes AS (
  SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY src
), r0 AS (
  SELECT node, deg, CAST(%d AS BIGINT) AS rank FROM nodes
)""" % PR_SCALE
    ]
    prev = "r0"
    for i in range(1, iterations + 1):
        parts.append(
            f""",
i{i} AS (
  SELECT e.dst AS node, SUM(r.rank // r.deg) AS inc
  FROM edges e JOIN {prev} r ON e.src = r.node
  GROUP BY e.dst
), r{i} AS (
  SELECT n.node, n.deg,
         CAST({teleport} + ({PR_DAMPING_PCT} * COALESCE(i.inc, 0)) // 100
              AS BIGINT) AS rank
  FROM nodes n LEFT JOIN i{i} i ON n.node = i.node
)"""
        )
        prev = f"r{i}"
    parts.append(
        f"""
SELECT node AS s_suppkey, deg AS degree, rank AS pr_scaled FROM {prev}"""
    )
    return "".join(parts)
