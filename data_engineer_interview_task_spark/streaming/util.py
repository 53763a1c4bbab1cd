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

from pyspark.sql import DataFrame, SparkSession


def drain_memory_sink(spark: SparkSession, sink: str) -> DataFrame:
    """Move a memory sink's rows out of the driver-held sink buffer and
    release the sink: eagerly materialize to a localCheckpoint (executor
    blocks, freed by the ContextCleaner when the returned frame is
    GC'd), then drop the sink's temp view so the buffer itself becomes
    collectable."""
    out = spark.table(sink).localCheckpoint(eager=True)
    spark.catalog.dropTempView(sink)
    return out
