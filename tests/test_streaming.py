"""Streaming operators run through the real streaming engine
(AvailableNow replay of the events fixture) and must agree with batch
computation over the same rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from ontario_spark.data import table
from ontario_spark.streaming.events import (
    read_event_stream,
    run_available_now,
    user_sessions,
    windowed_counts,
)


def test_windowed_counts_match_batch(spark, sf_small):
    stream = read_event_stream(spark, sf_small)
    got = run_available_now(windowed_counts(stream), "t_windowed").collect()

    batch = (
        table(spark, sf_small, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("hour"), "event_type", "n_events", "total_value")
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, batch))


def test_sessionization_matches_batch_gaps(spark, sf_small):
    stream = read_event_stream(spark, sf_small)
    got = run_available_now(user_sessions(stream, gap_minutes=30), "t_sessions")
    # batch oracle: gaps-and-islands with a 30-minute gap
    e = table(spark, sf_small, "events")
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    batch = (
        e.withColumn("prev", F.lag("ts").over(w))
        .withColumn(
            "new_sess",
            (F.col("prev").isNull())
            | (F.col("ts").cast("long") - F.col("prev").cast("long") > 1800),
        )
        .withColumn("sess_id", F.sum(F.col("new_sess").cast("int")).over(w))
        .groupBy("user_id", "sess_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("session_value"),
        )
        .select("user_id", "n_events", "session_value")
    )
    got_simple = got.select("user_id", "n_events", "session_value")
    a = sorted(map(tuple, got_simple.collect()))
    b = sorted(map(tuple, batch.collect()))
    assert a == b
