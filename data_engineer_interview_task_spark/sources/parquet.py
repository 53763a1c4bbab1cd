"""Parquet sources for the driver testdata star schema.

Reference parity: the reference's only source is a Google Trends HTTP fetch
(``dags/google_trends_to_bigquery.py:36-38``); our engine's canonical source
is columnar parquet, which is what a 100 TB deployment reads. Readers return
lazy DataFrames so Catalyst can push filters/projections into the scan
(verify with ``plans.explain_str`` -> ``PushedFilters`` / ``ReadSchema``).
"""

from __future__ import annotations

import threading
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans import prep_session

#: r12 opt: per-session memo of the LAZY table plan. ``spark.read
#: .parquet`` re-lists the path and re-reads the footer schema on every
#: call, and the ntz-normalization probe (``df.dtypes``) re-runs
#: analysis — pure plan-construction overhead paid 2-5x per query, ~50ms
#: per read at sf0.1 (measured). The memo holds an UNEXECUTED DataFrame
#: (no rows, no results — Catalyst plans are immutable), keyed weakly by
#: session so a stopped session's entries are collected. r13 (ADVICE
#: r12): the key also carries a cheap DIRECTORY SIGNATURE (file count /
#: bytes / max mtime — ``plans.artifacts.input_fingerprint``, ~0.1ms on
#: a table dir), so a table regenerated or appended mid-session (the r3
#: precedent) gets a fresh plan instead of a stale file listing; and the
#: memo is lock-guarded (WeakKeyDictionary is not thread-safe under GC
#: callbacks — the repo's concurrent-session pattern).
_PLAN_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)
_PLAN_LOCK = threading.Lock()

#: Every driver-provided table (TESTDATA.md / FIXTURES.md §2).
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table as a lazy DataFrame.

    ``events.ts`` is stored as parquet ``TIMESTAMP(NANOS)`` which Spark reads
    (under ``nanosAsLong``) as epoch-nanos LongType; we convert to a proper
    microsecond timestamp with *integer* division — double division would
    lose precision above 2^53 nanos (~1970+104 days).

    Timestamp columns that arrive as ``TIMESTAMP_NTZ`` (parquet
    ``isAdjustedToUTC=false``, which newer writers emit) are normalized to
    the session-zoned ``TIMESTAMP`` type: the session timezone is pinned to
    UTC (``plans/tuning.py``), so the cast is wall-clock-identical, and the
    epoch-based functions (``unix_micros``, watermarks, window()) all
    operate on the standard type either way. Downstream operators therefore
    see ONE timestamp type regardless of writer vintage.
    """
    from ..plans.artifacts import input_fingerprint

    prep_session(spark)
    path = f"{sf_dir}/{name}.parquet"
    key = (sf_dir, name, input_fingerprint(path))
    with _PLAN_LOCK:
        per_session = _PLAN_CACHE.setdefault(spark, {})
        cached = per_session.get(key)
    if cached is not None:
        return cached
    df = spark.read.parquet(path)
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    for col, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    with _PLAN_LOCK:
        per_session[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    """Load several tables at once; also registers each as a temp view so
    ``spark.sql`` queries can reference them by name."""
    out: dict[str, DataFrame] = {}
    for name in names:
        df = read_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
