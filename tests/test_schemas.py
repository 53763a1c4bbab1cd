"""Schema contract: every testdata table reads with exactly the declared
schema, at every scale factor present. Guards against silent testdata
drift and reader-conf regressions (e.g. the nanos-timestamp handling)."""

from __future__ import annotations

import os

import pytest

from data_engineer_interview_task_spark.sources import read_table
from data_engineer_interview_task_spark.sources.schemas import EXPECTED_SCHEMAS

SF_DIRS = [
    d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    if os.path.isdir(d)
]


@pytest.mark.parametrize("table", sorted(EXPECTED_SCHEMAS))
def test_table_schema_contract(spark, table):
    for sf_dir in SF_DIRS:
        got = read_table(spark, sf_dir, table).schema.simpleString()
        assert got == EXPECTED_SCHEMAS[table], (sf_dir, table, got)


def test_schema_evolution_read_null_fill(spark, tmp_path):
    from pyspark.sql import functions as F

    from data_engineer_interview_task_spark.sources.ingest import (
        schema_evolution_read,
    )

    out = schema_evolution_read(spark, SF_DIRS[0], str(tmp_path)).collect()
    v1 = [r for r in out if r.doc_id < 10000000]
    v2 = [r for r in out if r.doc_id >= 10000000]
    assert v1 and v2 and len(v1) == len(v2)
    assert all(r.lang is None for r in v1)  # evolved column null-fills
    assert all(r.lang is not None for r in v2)
