"""Watermark semantics under late data: feed a second micro-batch whose
events are older than (max event time - watermark) and assert the weekly
rollup drops them, while late-but-within-watermark events are incorporated.
This is the late-data behavior the batch reference silently lacks
(SURVEY.md §2.7: streaming absent)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from data_engineer_interview_task_spark.streaming.weekly import (
    EVENTS_SCHEMA,
    weekly_rollup_stream,
)


def _mk_events(spark, rows):
    return spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, d, h), 1, "click", 1.0, "{}")
            for i, (d, h) in enumerate(rows)
        ],
        schema=EVENTS_SCHEMA,
    )


def test_watermark_drops_too_late_rows(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    def run_once():
        # file sink (not memory): append mode + checkpoint recovery across
        # restarts is what production streaming uses
        q = (
            weekly_rollup_stream(spark, src, watermark="14 days")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # batch 1: events on Jan 1 and Jan 29 (4 weeks apart) -> watermark after
    # this batch is Jan 29 - 14 days = Jan 15
    _mk_events(spark, [(1, 10), (29, 10)]).write.mode("overwrite").parquet(src)
    run_once()

    # batch 2: one too-late event (Jan 2, before the Jan 15 watermark; its
    # window [Jan 1, Jan 8) is already finalized) and one acceptable event
    _mk_events(spark, [(2, 11), (29, 12)]).write.mode("append").parquet(src)
    run_once()

    out = spark.read.parquet(out_dir)
    emitted = {
        (r.week_start.date().isoformat(), r.n_events) for r in out.collect()
    }
    # the Jan-1 week window was emitted with ONLY the on-time event; the
    # too-late Jan-2 row must not re-emit or grow that window
    jan1_weeks = [e for e in emitted if e[0] < "2024-01-10"]
    assert jan1_weeks, f"expected an emitted early window, got {emitted}"
    assert all(n == 1 for _, n in jan1_weeks), emitted


def test_bounded_dedup_state_is_gcd_past_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark vs plain dropDuplicates: after the
    watermark passes a key's expiry, the bounded variant evicts it while
    the classic variant (no event-time in the key) holds every key
    forever — the state-bound that makes the bounded form the production
    default on unbounded streams (VERDICT r3 item 6)."""
    from data_engineer_interview_task_spark.streaming.dedup import (
        first_events_stream,
        first_events_stream_bounded,
    )

    def run_once(stream_fn, src, ckpt, sink_dir):
        q = (
            stream_fn(spark, src, watermark="2 days")
            .writeStream.format("parquet")
            .option("path", sink_dir)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return q

    def state_rows(q):
        progresses = [p for p in q.recentProgress if p.get("stateOperators")]
        return progresses[-1]["stateOperators"][0]["numRowsTotal"]

    results = {}
    for name, fn in (
        ("bounded", first_events_stream_bounded),
        ("classic", first_events_stream),
    ):
        src = str(tmp_path / f"src_{name}")
        ckpt = str(tmp_path / f"ckpt_{name}")
        sink = str(tmp_path / f"sink_{name}")
        # batch 1: 50 distinct old keys (Jan 1) + one recent key (Jan 10)
        # advancing the watermark to Jan 8
        olds = spark.createDataFrame(
            [(i, dt.datetime(2024, 1, 1, 10), i, "click", 1.0, "{}") for i in range(50)]
            + [(999, dt.datetime(2024, 1, 10, 10), 999, "click", 1.0, "{}")],
            schema=EVENTS_SCHEMA,
        )
        olds.write.mode("overwrite").parquet(src)
        run_once(fn, src, ckpt, sink)
        # batch 2: one new key — triggers eviction under the Jan-8 watermark
        spark.createDataFrame(
            [(1000, dt.datetime(2024, 1, 10, 12), 1000, "click", 1.0, "{}")],
            schema=EVENTS_SCHEMA,
        ).write.mode("append").parquet(src)
        q = run_once(fn, src, ckpt, sink)
        results[name] = state_rows(q)
        # both variants emitted every distinct key exactly once
        emitted = spark.read.parquet(sink)
        assert emitted.count() == 52
        assert emitted.distinct().count() == 52
    # the 50 expired keys are GC'd from bounded state but pinned forever
    # in classic state
    assert results["classic"] == 52, results
    assert results["bounded"] <= 2, results


def test_chained_dedup_rollup_suppresses_cross_batch_dups(spark, tmp_path):
    """Chained stateful ops: a later micro-batch re-delivering the same
    (user, type, day) must NOT inflate the downstream weekly count — the
    dedup state store does its job ACROSS batches, inside one query."""
    import time

    from data_engineer_interview_task_spark.streaming.dedup import (
        dedup_then_rollup_stream,
    )

    src = str(tmp_path / "src")
    b1 = _mk_events(spark, [(1, 0), (1, 1), (2, 0), (8, 0)])  # 3 distinct days
    b1.coalesce(1).write.mode("overwrite").parquet(src)
    time.sleep(1.1)
    # batch 2: same user/type/days again (pure duplicates) + one new day
    b2 = _mk_events(spark, [(1, 5), (2, 9), (9, 0)])
    b2.coalesce(1).write.mode("append").parquet(src)
    q = (
        dedup_then_rollup_stream(spark, src)
        .writeStream.format("memory")
        .queryName("mem_chain_dup")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .option("maxFilesPerTrigger", 1)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table("mem_chain_dup")
    # distinct (user=1, click, day) triples: Jan 1, 2, 8, 9 -> 4 user-days
    assert out.agg(F.sum("n_user_days")).first()[0] == 4


def test_chained_query_state_survives_checkpoint_restart(spark, tmp_path):
    """TWO availableNow runs of a chained dedup->window query sharing one
    checkpoint (parquet sink, append mode): the second run delivers a
    DUPLICATE (user, type, day) for a window that is still open at
    restart. If the dedup state store is restored, the window's final
    count stays 1; a lost store would count 2. Also proves watermark +
    window state restore: already-emitted windows must not re-emit."""
    import time

    from pyspark.sql import functions as F

    from data_engineer_interview_task_spark.streaming.weekly import EVENTS_SCHEMA

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        stream = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        daily = (
            stream.select(
                "user_id",
                "event_type",
                F.date_trunc("DAY", F.col("ts")).alias("day"),
            )
            .withWatermark("day", "1 day")
            .dropDuplicates(["user_id", "event_type", "day"])
        )
        q = (
            daily.groupBy(F.window("day", "1 day"), F.col("event_type"))
            .agg(F.count(F.lit(1)).alias("n_user_days"))
            .select(
                F.col("window.start").alias("day_start"),
                "event_type",
                "n_user_days",
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # run 1: days 1,2,3 and a later day 12 (watermark lands at day 11:
    # windows 1-3 emit; day-12 window stays OPEN with its dedup key in
    # state)
    _mk_events(spark, [(1, 0), (2, 0), (3, 0), (12, 0)]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    run_once()
    emitted_1 = spark.read.parquet(out)
    assert emitted_1.filter("n_user_days <> 1").count() == 0
    days_1 = {r.day_start.day for r in emitted_1.collect()}
    assert 12 not in days_1 and {1, 2, 3} <= days_1

    # run 2, same checkpoint: a DUPLICATE of day 12 (within watermark,
    # window still open), a new day 13, and a far sentinel to flush
    time.sleep(1.1)
    _mk_events(spark, [(12, 1), (13, 0)]).withColumn(
        "event_id", F.col("event_id") + 100
    ).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    _mk_events(spark, [(28, 0)]).withColumn(
        "user_id", F.lit(-1).cast("long")
    ).withColumn("event_id", F.lit(999).cast("long")).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run_once()

    final = spark.read.parquet(out).filter("day_start >= '2024-01-01'")
    rows = {
        r.day_start.day: r.n_user_days
        for r in final.collect()
        if r.day_start.day != 28
    }
    # restored dedup state: day 12 counted ONCE despite the re-delivery
    assert rows == {1: 1, 2: 1, 3: 1, 12: 1, 13: 1}, rows


def test_incremental_late_audit_restart_continuity(spark, sf_dir):
    """The r4 chained-state pattern applied to the incremental audit
    (VERDICT r7 item 5): run 1 ingests on-time + late tranche A, new
    late files (days < INC_SPLIT) are appended, run 2 restarts from the
    SAME checkpoint. Continuity shows up as arithmetic:

    - every appended day (1..9) must be dropped by the RESTORED
      watermark (a fresh checkpoint would stream them — their window
      ends are far below max_ts - 14d only if the watermark survived);
    - the run-1 surviving late days (16..19) must be emitted by run-2's
      flush — their state crossed the restart;
    - on-time days stream in full."""
    import datetime as dt
    import tempfile

    from data_engineer_interview_task_spark.streaming import (
        run_incremental_late_audit,
    )
    from data_engineer_interview_task_spark.streaming.late import (
        INC_SPLIT,
        SPLIT,
    )

    out = {
        r["day"]: (r["n_total"], r["n_streamed"], r["n_dropped_late"])
        for r in run_incremental_late_audit(
            spark, sf_dir, tempfile.mkdtemp(prefix="inc_late_")
        ).collect()
    }
    inc_day = dt.date.fromisoformat(INC_SPLIT)
    split_day = dt.date.fromisoformat(SPLIT)
    appended = {d for d in out if d < inc_day}
    survivors = {d for d in out if inc_day <= d < split_day and d.day >= 16}
    on_time = {d for d in out if d >= split_day}
    assert appended and survivors and on_time  # all three regimes hit
    for d in appended:
        n_total, n_streamed, n_dropped = out[d]
        assert (n_streamed, n_dropped) == (0, n_total), (
            f"{d}: appended tranche must drop against the RESTORED "
            f"watermark, got streamed={n_streamed}"
        )
    for d in survivors:
        n_total, n_streamed, n_dropped = out[d]
        assert (n_streamed, n_dropped) == (n_total, 0), (
            f"{d}: run-1 state must survive the restart, got "
            f"dropped={n_dropped}"
        )
    for d in on_time:
        n_total, n_streamed, n_dropped = out[d]
        assert (n_streamed, n_dropped) == (n_total, 0), d


def test_late_data_audit_drops_exactly_the_aged_days(spark, sf_dir):
    """The audit's drop set equals the arithmetic model: a late day
    survives iff its window end is newer than max(ts) - 14d in Spark's
    millisecond event-time clock; on-time days (>= the calendar split)
    stream in full; the totals always reconcile."""
    import tempfile

    from data_engineer_interview_task_spark.sources import read_table
    from data_engineer_interview_task_spark.streaming import (
        run_late_data_audit_once,
    )
    from data_engineer_interview_task_spark.streaming.late import SPLIT

    out = {
        r["day"]: (r["n_total"], r["n_streamed"], r["n_dropped_late"])
        for r in run_late_data_audit_once(
            spark, sf_dir, tempfile.mkdtemp(prefix="late_audit_")
        ).collect()
    }
    import datetime as dt

    # Session timestamps are UTC wall-clock; attach tzinfo before
    # .timestamp() (ADVICE r7 — naive .timestamp() applies the HOST
    # zone, so the expected watermark was wrong on non-UTC machines).
    events = read_table(spark, sf_dir, "events").select("ts").collect()
    max_ms = (
        max(r["ts"] for r in events)
        .replace(tzinfo=dt.timezone.utc)
        .timestamp()
        * 1000
    )
    wm_ms = int(max_ms) - 14 * 86400000

    split_day = dt.date.fromisoformat(SPLIT)
    dropped_days = {d for d, (_t, _s, dr) in out.items() if dr > 0}
    for day, (n_total, n_streamed, n_dropped) in out.items():
        assert n_total == n_streamed + n_dropped
        end_ms = (
            dt.datetime.combine(
                day + dt.timedelta(days=1), dt.time(), tzinfo=dt.timezone.utc
            ).timestamp()
            * 1000
        )
        expect_drop = day < split_day and end_ms <= wm_ms
        assert (n_dropped == n_total) == expect_drop, day
        assert n_dropped in (0, n_total)  # whole days drop, never parts
    assert dropped_days, "the replay must actually exercise the drop path"
