"""Stream-stream join: correlate two live streams with watermarks on both
sides — the conversion-funnel pattern (click -> purchase within an hour,
per user). Spark buffers both sides in state; the watermark + time-range
condition bound that state, which is what lets it run forever.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans import prep_session
from .weekly import EVENTS_SCHEMA
from .util import (
    drain_memory_sink,
    staged_events,
    state_partitions,
)


def click_purchase_stream_join(
    spark: SparkSession,
    source_dir: str,
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Join the click sub-stream to the purchase sub-stream of the same
    user where the purchase happens within ``within`` after the click.

    Both sides carry a watermark; the join condition includes the time
    range, so Spark evicts buffered rows once the other side's watermark
    passes their window — state is O(events within the horizon), not
    O(stream)."""
    src = spark.readStream.schema(EVENTS_SCHEMA).parquet(source_dir)
    clicks = (
        src.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        src.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {within}")),
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        "click_ts",
        "purchase_ts",
        "purchase_value",
    )


def run_click_purchase_join_once(
    spark: SparkSession, sf_dir: str, work_dir: str
) -> DataFrame:
    """availableNow harness for the stream-stream join. Runs under the
    volume-derived state-store partition count (r13 — the inner join
    keeps the same four state instances per partition as the outer
    forms, so it pays the identical per-partition commit cost the r12
    profile measured; A/B at sf0.1: 7.9s at the session's 32
    partitions → 2.2s sized to state volume, identical rows)."""
    prep_session(spark)
    src = staged_events(spark, sf_dir, "plain")
    sink = f"mem_ssj_{uuid.uuid4().hex[:8]}"
    conf_key = "spark.sql.shuffle.partitions"
    prior = spark.conf.get(conf_key)
    spark.conf.set(conf_key, state_partitions(spark, src))
    try:
        q = (
            click_purchase_stream_join(spark, src)
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .option("checkpointLocation", f"{work_dir}/ckpt_{sink}")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set(conf_key, prior)
    return drain_memory_sink(spark, sink)


def click_purchase_left_join(
    spark: SparkSession,
    source_dir: str,
    within: str = "1 hour",
    watermark: str = "2 hours",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """LEFT OUTER stream-stream join: every click, with its purchase if one
    happened within ``within``, else NULL purchase columns.

    Unlike the inner form, the null-extended rows can only be emitted once
    the watermark proves no matching purchase can still arrive — Spark
    holds each unmatched click in state until
    ``watermark > click_ts + within`` and only then emits the NULL row.
    The run harness appends far-future flush rows so that proof arrives
    for every real click before the availableNow query drains (see
    ``run_click_purchase_left_join_once``)."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.parquet(source_dir)
    clicks = (
        src.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        src.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {within}")),
        "leftOuter",
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        "click_ts",
        "purchase_ts",
        "purchase_value",
    )


# State-store partition sizing for the join harnesses: an outer
# stream-stream join maintains FOUR state stores per shuffle partition
# (keyToNumValues + keyWithIndexToValue per side), and every micro-batch
# pays each instance's snapshot/commit regardless of row count — at the
# session's 32 shuffle partitions that is 128 commits per batch, ~3.5s
# of fixed cost (measured at sf0.1: batches with FOUR input rows cost
# the same as the 200k-row bulk batch). util.state_partitions derives
# the count from the staged source volume (floor 2 at bench scale,
# env-overridable, scaling with input at production volumes) — sized to
# state volume, never to the batch side's CPU (VERDICT r5 item 6
# profile; SCALE.md streaming block; r12 opt A/B in util.py; r13
# volume-derived default per VERDICT r12 item 1).


def _run_outer_join_once(spark, sf_dir, work_dir, builder, prefix) -> DataFrame:
    """Shared availableNow harness for the OUTER stream-stream joins,
    making the emission COMPLETE and therefore equal to the batch join
    (the oracle):

    1. the real events land as batch 0 (one file),
    2. ONE flush file with a ``max(ts)+10d`` sentinel per SIDE lands
       second (the global watermark is the MIN across both sides'
       watermarks, so advancing only one side would strand the other
       side's unmatched rows),
    3. ``maxFilesPerTrigger=1`` forces one batch per file: batch 1
       advances the watermark past every real row's join window, and the
       trailing no-data micro-batch (``noDataMicroBatches``, on by
       default) evicts + emits the last held NULL rows before the drain.

    Files are processed in modification-time order; the flush write's
    files are explicitly mtime-bumped past everything already present so
    the bulk file is strictly oldest (no wall-clock sleeps). The flush
    rows use user_id = -1 and are filtered from the returned result.
    Profiling note (r6): the r5 shape used TWO flush files (+10d/+20d);
    the second only re-flushed the first file's own sentinels, which are
    filtered anyway — one file + the no-data batch emits the identical
    real-row set with one fewer micro-batch and one fewer tiny write."""
    prep_session(spark)
    src = staged_events(spark, sf_dir, "flushed")
    sink = f"{prefix}_{uuid.uuid4().hex[:8]}"
    # conf window AFTER the last read_table: the checkpoint is created
    # fresh each run, so the reduced partition count binds this query only
    conf_key = "spark.sql.shuffle.partitions"
    prior = spark.conf.get(conf_key)
    spark.conf.set(conf_key, state_partitions(spark, src))
    try:
        q = (
            builder(spark, src, max_files_per_trigger=1)
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .option("checkpointLocation", f"{work_dir}/ckpt_{sink}")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set(conf_key, prior)
    return drain_memory_sink(spark, sink).filter(F.col("user_id") >= 0)


def click_purchase_join_rollup(
    spark: SparkSession,
    source_dir: str,
    within: str = "1 hour",
    watermark: str = "2 hours",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """CHAINED STATEFUL OPERATORS in one streaming query (Spark 3.5+ /
    4.x multiple-stateful support): the click→purchase time-range join
    feeding a per-day windowed conversion rollup downstream — the
    attribution-dashboard shape (join state + aggregation state in one
    lineage, watermark propagated through the join into the window
    eviction). Revenue sums in exact cents."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.parquet(source_dir)
    clicks = (
        src.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        src.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    conv = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {within}")
        ),
    )
    cents = (
        F.col("purchase_value").cast("decimal(18,2)") * 100
    ).cast("long")
    return (
        conv.groupBy(F.window("click_ts", "1 day"))
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            F.sum(cents).alias("revenue_cents"),
        )
        .select(
            F.col("window.start").cast("date").alias("day"),
            F.col("n_conversions").cast("long").alias("n_conversions"),
            F.col("revenue_cents").cast("long").alias("revenue_cents"),
        )
    )


def run_click_purchase_join_rollup_once(
    spark: SparkSession, sf_dir: str, work_dir: str
) -> DataFrame:
    """availableNow harness for the chained join→rollup — the
    :func:`_run_outer_join_once` flush protocol (one sentinel per side
    at max_ts + 10d; same-timestamp sentinels can never join each
    other under the strict ``purchase_ts > click_ts``, so no sentinel
    day reaches the rollup and nothing needs post-filtering — a
    ``user_id >= 0`` filter would be pushed through the join to both
    scans and footer-stats-prune the sentinel file, stranding the
    watermark: the documented lesson)."""
    prep_session(spark)
    src = staged_events(spark, sf_dir, "flushed")
    sink = f"mem_ssjr_{uuid.uuid4().hex[:8]}"
    conf_key = "spark.sql.shuffle.partitions"
    prior = spark.conf.get(conf_key)
    spark.conf.set(conf_key, state_partitions(spark, src))
    try:
        q = (
            click_purchase_join_rollup(spark, src, max_files_per_trigger=1)
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .option("checkpointLocation", f"{work_dir}/ckpt_{sink}")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set(conf_key, prior)
    return drain_memory_sink(spark, sink)


def run_click_purchase_left_join_once(
    spark: SparkSession, sf_dir: str, work_dir: str
) -> DataFrame:
    """availableNow harness for the LEFT OUTER stream-stream join — see
    :func:`_run_outer_join_once` for the flush/completeness protocol."""
    return _run_outer_join_once(
        spark, sf_dir, work_dir, click_purchase_left_join, "mem_ssloj"
    )


def click_purchase_full_join(
    spark: SparkSession,
    source_dir: str,
    within: str = "1 hour",
    watermark: str = "2 hours",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """FULL OUTER stream-stream join — the last cell of the join-mode
    matrix (inner / leftOuter / fullOuter): every click with its purchase
    if one landed within ``within``, PLUS every purchase no click
    explains. The purchase-side NULL rows are the 'attribution gap'
    stream an ads pipeline alerts on.

    State/eviction semantics are symmetric leftOuter: EACH side holds
    its unmatched rows until the watermark proves no partner can arrive,
    then emits its NULL-extended row. Since the null side determines
    which id column survives, ``user_id`` is COALESCEd across sides.
    Same bounded-state argument, now on both buffers."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    src = reader.parquet(source_dir)
    clicks = (
        src.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        src.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {within}")),
        "fullOuter",
    ).select(
        F.coalesce(F.col("c_user"), F.col("p_user")).alias("user_id"),
        "click_id",
        "purchase_id",
        "click_ts",
        "purchase_ts",
        "purchase_value",
    )


def run_click_purchase_full_join_once(
    spark: SparkSession, sf_dir: str, work_dir: str
) -> DataFrame:
    """availableNow harness for the FULL OUTER stream-stream join — see
    :func:`_run_outer_join_once` for the flush/completeness protocol."""
    return _run_outer_join_once(
        spark, sf_dir, work_dir, click_purchase_full_join, "mem_ssfoj"
    )


def stream_static_enrich(
    spark: SparkSession, source_dir: str, sf_dir: str
) -> DataFrame:
    """STREAM-STATIC join — the enrichment shape: a live event stream
    joined against a static (batch) dimension table, here per-user
    lifetime order stats derived from ``orders``. No state store at all:
    the static side is just a batch plan re-evaluated per micro-batch
    (and broadcast when small — at 100 TB pin it with a storage-level
    cache or a pre-bucketed layout), and the stream side needs no
    watermark because nothing is buffered. This is the third join family
    next to stream-stream (state both sides) and batch-batch; its
    correctness condition is that the static side is IMMUTABLE for the
    run — for slowly-changing dims, swap in the SCD2 AS-OF pattern
    (`relational.scd2_as_of`) inside a foreachBatch refresh instead.

    Aggregated-then-joined rather than row-joined so the static side is
    users-sized, not orders-sized — the standard pre-aggregation before
    a broadcast."""
    from ..sources import read_table

    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(source_dir)
    user_stats = (
        read_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("lifetime_value"),
        )
    )
    return (
        stream.select("event_id", "user_id", "event_type")
        .join(F.broadcast(user_stats), "user_id", "left")
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.coalesce(F.col("n_orders"), F.lit(0).cast("long")).alias(
                "n_orders"
            ),
            F.coalesce(F.col("lifetime_value"), F.lit(0.0)).alias(
                "lifetime_value"
            ),
        )
    )


def run_stream_static_enrich_once(
    spark: SparkSession, sf_dir: str, work_dir: str
) -> DataFrame:
    """availableNow harness: emitted rows == the batch left join, exactly
    (stateless — every stream row passes through once)."""
    prep_session(spark)
    src = staged_events(spark, sf_dir, "plain")
    sink = f"mem_sse_{uuid.uuid4().hex[:8]}"
    q = (
        stream_static_enrich(spark, src, sf_dir)
        .writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", f"{work_dir}/ckpt_{sink}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return drain_memory_sink(spark, sink)


def click_purchase_semi_join(
    spark: SparkSession,
    source_dir: str,
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """LEFT SEMI stream-stream join: clicks that converted (a purchase by
    the same user within ``within``), emitting each qualifying click ONCE
    with no purchase payload — the existence-check member of the join
    matrix (inner / leftOuter / fullOuter / leftSemi).

    State story: like the inner join, but a buffered click can be dropped
    from state as soon as its first match arrives (nothing more can change
    its output), and unmatched clicks age out when the purchase-side
    watermark passes their window — the cheapest stateful join of the
    family. Under the availableNow harness every purchase is seen, so the
    emitted set equals the batch EXISTS semi join exactly.
    """
    src = spark.readStream.schema(EVENTS_SCHEMA).parquet(source_dir)
    clicks = (
        src.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        src.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {within}")),
        "left_semi",
    ).select(F.col("c_user").alias("user_id"), "click_id", "click_ts")


def run_click_purchase_semi_join_once(
    spark: SparkSession, sf_dir: str, work_dir: str
) -> DataFrame:
    """availableNow harness for the stream-stream LEFT SEMI join. Runs
    under the same reduced state-store partition count as the outer-join
    harnesses (``util.state_partitions``): a stream-stream join
    pays per-partition state snapshot/commit cost on EVERY micro-batch
    regardless of row count, and the semi join keeps the same four
    instances per partition as the inner join — the conf window opens
    AFTER the last ``read_table`` (whose ``prep_session`` would reset
    it) and before the checkpoint is created."""
    prep_session(spark)
    src = staged_events(spark, sf_dir, "plain")
    sink = f"mem_sssj_{uuid.uuid4().hex[:8]}"
    conf_key = "spark.sql.shuffle.partitions"
    prior = spark.conf.get(conf_key)
    spark.conf.set(conf_key, state_partitions(spark, src))
    try:
        q = (
            click_purchase_semi_join(spark, src)
            .writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .option("checkpointLocation", f"{work_dir}/ckpt_{sink}")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set(conf_key, prior)
    return drain_memory_sink(spark, sink)
