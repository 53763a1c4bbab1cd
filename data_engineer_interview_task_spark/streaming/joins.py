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
    """availableNow harness for the stream-stream join."""
    from ..sources import read_table

    prep_session(spark)
    src = f"{work_dir}/events_src"
    read_table(spark, sf_dir, "events").write.mode("overwrite").parquet(src)
    sink = f"mem_ssj_{uuid.uuid4().hex[:8]}"
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
    return spark.table(sink)
