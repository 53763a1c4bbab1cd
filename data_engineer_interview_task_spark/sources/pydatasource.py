"""Python DataSource API (Spark 4): a custom batch source implemented in
pure Python — the extension point for bespoke feeds (internal HTTP APIs,
synthetic generators, message buses without a JVM connector). This is the
modern seam the live-trends ingest (`sources/ingest.py`) would plug into
for true partition-parallel fetches: each ``InputPartition`` fetches its
own slice ON THE EXECUTORS, instead of the driver pulling everything and
``createDataFrame``-ing it.

Demo source: a deterministic date spine (``format("date_spine")``) —
trivially verifiable, which is the point: the test pins the partition
protocol (N partitions, round-robin slices, exact union) rather than any
interesting data. Classes are defined INSIDE the registering function so
cloudpickle serializes them BY VALUE — python workers must not need this
repo importable (the mapInPandas closure rule, same reason).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def register_date_spine_source(spark: SparkSession) -> None:
    """Register the ``date_spine`` Python data source on this session.

    Options: ``start`` (ISO date, default 2024-01-01), ``days`` (row
    count, default 30), ``numPartitions`` (parallelism, default 4; each
    partition yields the round-robin slice ``i, i+P, i+2P, ...`` so the
    union is exactly [0, days) with no coordination between readers)."""
    import datetime as dt

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class _SpineReader(DataSourceReader):
        def __init__(self, options):
            self.start = dt.date.fromisoformat(
                options.get("start", "2024-01-01")
            )
            self.days = int(options.get("days", "30"))
            self.parts = int(options.get("numPartitions", "4"))

        def partitions(self):
            return [InputPartition(i) for i in range(self.parts)]

        def read(self, partition):
            first = partition.value
            for idx in range(first, self.days, self.parts):
                yield (self.start + dt.timedelta(days=idx), idx)

    class DateSpineDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "date_spine"

        def schema(self) -> str:
            return "day date, day_index bigint"

        def reader(self, schema):
            return _SpineReader(self.options)

    spark.dataSource.register(DateSpineDataSource)
