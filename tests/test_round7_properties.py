"""Round-7 model/property tests.

Pins the two-phase ntile decomposition (VERDICT r6 item 3): the
arithmetic bucket formula must be bit-identical to SQL NTILE at every
(n, k) shape — including the n % k != 0 remainder buckets and the
n < k degenerate case — and the rewritten queries' physical plans must
contain NO global ntile window (every row-grain row_number is
partitioned by the range-partition pid).
"""
from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from data_engineer_interview_task_spark.operators import relational
from data_engineer_interview_task_spark.operators.relational import (
    _two_phase_ntile,
)
from data_engineer_interview_task_spark.plans import explain_str


@pytest.mark.parametrize(
    "n,k",
    [(97, 5), (100, 10), (101, 10), (9, 10), (10, 10), (1, 5), (64, 7)],
)
def test_two_phase_ntile_matches_builtin(spark, n, k):
    # keys deliberately non-contiguous and shuffled so the range
    # partitioner earns its keep; 'v' makes a non-trivial payload
    rows = [((i * 37) % (3 * n), i) for i in range(n)]
    df = spark.createDataFrame(rows, "key long, v long")
    order = [F.col("key").asc(), F.col("v").asc()]
    expect = df.withColumn(
        "tile", F.ntile(k).over(Window.orderBy(*order)).cast("long")
    )
    got = _two_phase_ntile(df, k, order, "tile")
    assert sorted(expect.collect()) == sorted(got.collect())


def test_two_phase_ntile_descending_order(spark):
    df = spark.createDataFrame(
        [((i * 13) % 50, i) for i in range(83)], "key long, v long"
    )
    order = [F.col("key").desc(), F.col("v").asc()]
    expect = df.withColumn(
        "tile", F.ntile(5).over(Window.orderBy(*order)).cast("long")
    )
    got = _two_phase_ntile(df, 5, order, "tile")
    assert sorted(expect.collect()) == sorted(got.collect())


@pytest.mark.parametrize(
    "query", [relational.decile_lift_table, relational.rfm_segments]
)
def test_no_global_ntile_in_plan(spark, sf_dir, query):
    plan = explain_str(query(spark, sf_dir))
    assert "ntile(" not in plan, "global ntile window resurfaced"
    # every row-grain numbering window must be partitioned by the range
    # pid; only aggregate-sized frames (the n_parts-row offset table and
    # the 10-row decile rollup) may run unpartitioned windows
    for line in plan.splitlines():
        if "row_number()" in line:
            assert "_pid" in line, f"unpartitioned row_number: {line}"
