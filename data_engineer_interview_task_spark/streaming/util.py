"""Shared micro-batch harness hygiene.

Every ``run_*_once`` harness here terminates an availableNow query into a
memory sink and used to return ``spark.table(sink)`` lazily — leaving the
sink's driver-held row buffer AND its temp view alive for the life of the
session. In a shared session (the driver's correctness sweep, bench.py,
check_oracle) those buffers accumulate: a complete-mode session-window
sink holds ~1M rows at sf1, and twelve streaming queries × repeated runs
turned into GC pressure that inflated UNRELATED queries' wall time
(measured: streaming_session_window 3.6s in a fresh session vs 31s late
in a 12-run session — the same failure class bench.py's clearCache()
fixed for persisted blocks).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: State-store partition count for the availableNow harnesses (r12 opt,
#: guide §2 scale-adaptive partitioning). Every micro-batch pays a
#: snapshot/commit per state-store INSTANCE regardless of row count (a
#: stream-stream join keeps four instances per partition), so the right
#: count follows state VOLUME, not core count. Measured at sf0.1 on the
#: chained join→rollup harness (same-session A/B, 3 batches): 8
#: partitions → addBatch [1342, 1117, 964] ms; 2 partitions →
#: [825, 747, 622] ms — ~1.5-2s saved per invocation, identical rows.
#: The env override is the production dial: a deployment holding GBs of
#: state raises it to spread store size, exactly as the old in-line "8"
#: documented; the bench contract (master/core count) is untouched.
STATE_PARTITIONS = os.environ.get("SPARK_GRAFT_STREAM_STATE_PARTITIONS", "2")


def snapshot_parquet_files(src: str) -> set[str]:
    """Names of the parquet part files currently in ``src`` — take before
    an append-write, pass to :func:`bump_new_files_mtime` after."""
    return {f for f in os.listdir(src) if f.endswith(".parquet")}


def bump_new_files_mtime(src: str, before: set[str]) -> None:
    """Force every parquet file NOT in ``before`` to a modification time
    strictly later than everything already in ``src``. FileStreamSource
    orders micro-batches by mtime; back-to-back writes can land with
    equal stamps, leaving the batch order — and any order-sensitive
    state semantics — undefined. An explicit bump replaces the old
    ``time.sleep(1.1)`` spacing (2.2s of pure wall per harness run)."""
    newest = max(
        os.path.getmtime(os.path.join(src, f)) for f in before
    )
    later = newest + 10.0
    for f in os.listdir(src):
        if f.endswith(".parquet") and f not in before:
            os.utime(os.path.join(src, f), (later, later))


def drain_memory_sink(spark: SparkSession, sink: str) -> DataFrame:
    """Move a memory sink's rows out of the driver-held sink buffer and
    release the sink: eagerly materialize to a localCheckpoint (executor
    blocks, freed by the ContextCleaner when the returned frame is
    GC'd), then drop the sink's temp view so the buffer itself becomes
    collectable."""
    out = spark.table(sink).localCheckpoint(eager=True)
    spark.catalog.dropTempView(sink)
    return out
