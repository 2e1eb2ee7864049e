"""Structured Streaming operators over the events table.

The reference has NO streaming at all — its "non-blocking" operators
are pipelined pull over finite sources (SURVEY.md §2.5). This module is
the beyond-reference streaming surface: watermarked windowed
aggregation and stateful sessionization, written against
``readStream`` so the same code runs on an unbounded source; tests and
the driver surface execute it with ``Trigger.AvailableNow`` over the
parquet fixture, which replays the table as a bounded stream through
the full streaming engine (state store, watermarks, incremental
batches).
"""

from __future__ import annotations

import tempfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),  # raw nanos (see data.table note)
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet as a stream; nanos→µs ts conversion identical to
    the batch loader so streaming results match batch oracles."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The streaming file source requires a directory; pathGlobFilter
    # narrows it to the events table.
    raw = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))


def windowed_counts(stream: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window aggregation: events per (window,
    type) + exact decimal value sum. At scale this is a streaming
    shuffle keyed on (window, event_type) with state cleanup driven by
    the watermark."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("hour"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def user_sessions(
    stream: DataFrame, gap_minutes: int = 30, watermark: str = "4 hours"
) -> DataFrame:
    """Stateful sessionization via session windows: activity sessions
    per user closed after ``gap_minutes`` of inactivity."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(
            F.session_window("ts", f"{gap_minutes} minutes").alias("w"),
            F.col("user_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("session_value"),
        )
        .select(
            F.col("user_id"),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def run_available_now(result: DataFrame, name: str) -> DataFrame:
    """Execute a streaming DataFrame to completion with AvailableNow
    into an in-memory sink and return the final table (complete mode so
    windows closed by the watermark still surface)."""
    spark = result.sparkSession
    with tempfile.TemporaryDirectory(prefix="osk-ckpt-") as ckpt:
        q = (
            result.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)
