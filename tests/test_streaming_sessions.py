"""Stateful streaming sessionizer vs the batch window implementation: the
sessions a single availableNow pass can CLOSE (every session except each
user's final, still-open one) must match the batch operator exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_engineer_interview_task_spark.operators import relational
from data_engineer_interview_task_spark.streaming import run_sessionize_once


def test_stateful_sessions_match_batch(spark, sf_dir, tmp_path):
    streamed = run_sessionize_once(spark, sf_dir, str(tmp_path / "ss"))
    batch = relational.sessionize_events(spark, sf_dir, gap_minutes=30)

    # batch sessions minus each user's last (the stream keeps it open in state)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id")
    closed_batch = (
        batch.withColumn("max_seq", F.max("session_seq").over(w))
        .filter(F.col("session_seq") < F.col("max_seq"))
        .select("user_id", "session_start", "session_end", "n_events")
    )

    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in streamed.select(
            "user_id", "session_start", "session_end", "n_events"
        ).collect()
    }
    want = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in closed_batch.collect()
    }
    assert got == want
    assert len(got) > 0


def test_stateful_sessions_value_sums(spark, sf_dir, tmp_path):
    streamed = run_sessionize_once(spark, sf_dir, str(tmp_path / "sv"))
    # spot-check: per-user closed-session event counts sum to the batch's
    total_streamed = streamed.agg(F.sum("n_events")).first()[0]
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_users = events.select("user_id").distinct().count()
    batch = relational.sessionize_events(spark, sf_dir, gap_minutes=30)
    total_batch = batch.agg(F.sum("n_events")).first()[0]
    open_events = (
        batch.withColumn(
            "mx",
            F.max("session_seq").over(
                __import__("pyspark.sql", fromlist=["Window"]).Window.partitionBy("user_id")
            ),
        )
        .filter(F.col("session_seq") == F.col("mx"))
        .agg(F.sum("n_events"))
        .first()[0]
    )
    assert total_streamed == total_batch - open_events
    assert n_users > 0
