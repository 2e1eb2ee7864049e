"""Hand fixtures for the training-feature queries whose defining
property is TEMPORAL correctness (the oracle gate proves cross-engine
agreement; these prove no leakage / correct lookback on rows where we
know the answer by hand)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F


def _mini_events(spark, rows):
    return spark.createDataFrame(
        [
            (i, datetime.datetime(2024, 1, d, h, mi), uid, et, float(v), "{}")
            for i, (d, h, mi, uid, et, v) in enumerate(rows)
        ],
        ["event_id", "ts", "user_id", "event_type", "value", "props"],
    )


def _run_pit(spark, tmp_path, rows):
    ev = _mini_events(spark, rows)
    path = str(tmp_path / "events.parquet")
    ev.coalesce(1).write.mode("overwrite").parquet(path)
    # the query reads <dir>/events.parquet via ontario_spark.data.table
    import os
    import shutil

    d = str(tmp_path / "sfdir")
    os.makedirs(d, exist_ok=True)
    part = [f for f in os.listdir(path) if f.endswith(".parquet")][0]
    shutil.copyfile(os.path.join(path, part), os.path.join(d, "events.parquet"))
    from ontario_spark.queries.pipeline_suite import train_pit_features

    return {r.event_id: r for r in train_pit_features(spark, d).collect()}


def test_pit_features_never_peek_at_or_past_label_time(spark, tmp_path):
    # user 1: click day2 09:00, purchase day2 10:00 (same hour window),
    #         click day2 10:00 (SAME instant as a later purchase),
    #         purchase day2 10:00 — the same-micros click must NOT count
    rows = [
        (2, 9, 0, 1, "click", 10),      # event 0
        (2, 10, 0, 1, "purchase", 50),  # event 1: sees click@9 only
        (2, 10, 0, 1, "click", 10),     # event 2: same instant as e1
        (2, 11, 0, 1, "purchase", 60),  # event 3: sees both clicks
    ]
    out = _run_pit(spark, tmp_path, rows)
    # purchase at 10:00 must not see the 10:00 click (strictly-before)
    assert out[1].prior_clicks_7d == 1
    assert out[1].prior_spend == 0.0
    # later purchase sees both clicks and the earlier purchase's spend
    assert out[3].prior_clicks_7d == 2
    assert out[3].prior_spend == 50.0


def test_pit_features_7day_window_expires(spark, tmp_path):
    rows = [
        (1, 0, 0, 1, "click", 1),       # day 1 — outside 7d of day 9
        (3, 0, 0, 1, "click", 1),       # day 3 — inside 7d of day 9
        (9, 0, 0, 1, "purchase", 5),    # day 9
    ]
    out = _run_pit(spark, tmp_path, rows)
    assert out[2].prior_clicks_7d == 1  # only the day-3 click
    assert out[2].signed_up == 0


def test_attribution_lookback_and_none_channel(spark, tmp_path):
    import os
    import shutil

    rows = [
        (1, 10, 0, 1, "view", 1),        # touch
        (1, 11, 0, 1, "purchase", 100),  # within 24h of view → 'view'
        (3, 12, 0, 1, "purchase", 40),   # >24h after any touch → 'none'
        (5, 9, 0, 2, "purchase", 7),     # user 2 never touched → 'none'
    ]
    ev = _mini_events(spark, rows)
    path = str(tmp_path / "ev2.parquet")
    ev.coalesce(1).write.mode("overwrite").parquet(path)
    d = str(tmp_path / "sfdir2")
    os.makedirs(d, exist_ok=True)
    part = [f for f in os.listdir(path) if f.endswith(".parquet")][0]
    shutil.copyfile(os.path.join(path, part), os.path.join(d, "events.parquet"))
    from ontario_spark.queries.events_suite import events_attribution

    out = {(r.channel, r.day): r for r in events_attribution(spark, d).collect()}
    assert out[("view", "2024-01-01")].revenue == 100.0
    assert out[("none", "2024-01-03")].revenue == 40.0
    assert out[("none", "2024-01-05")].revenue == 7.0
    assert len(out) == 3
