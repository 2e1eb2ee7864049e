"""Unit tests for the temporal join operators (operators/asof.py):
semantics that the registry-level DuckDB gate can't isolate —
direction, tolerance, chimera-row protection, bucket-boundary
coverage in the range join."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from ontario_spark.operators.asof import asof_join, range_join

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _t(sec: float) -> dt.datetime:
    return T0 + dt.timedelta(seconds=sec)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, _t(10), "l10"), (1, _t(20), "l20"), (2, _t(5), "l5")],
        "k int, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _t(8), 8.0), (1, _t(20), 20.0), (1, _t(30), 30.0), (3, _t(1), 1.0)],
        "k int, ts timestamp, v double",
    )
    return left, right


def test_backward_inclusive_and_unmatched(spark, frames):
    left, right = frames
    out = {
        (r["k"], r["tag"]): (r["r_v"], r["r_ts"])
        for r in asof_join(left, right, on="k").collect()
    }
    assert out[(1, "l10")] == (8.0, _t(8))  # latest right <= 10
    assert out[(1, "l20")] == (20.0, _t(20))  # equal ts matches (inclusive)
    assert out[(2, "l5")] == (None, None)  # key with no right rows
    assert len(out) == 3  # left row count preserved


def test_forward_direction(spark, frames):
    left, right = frames
    out = {
        (r["k"], r["tag"]): r["r_v"]
        for r in asof_join(left, right, on="k", direction="forward").collect()
    }
    assert out[(1, "l10")] == 20.0  # earliest right >= 10
    assert out[(1, "l20")] == 20.0  # inclusive
    assert out[(2, "l5")] is None


def test_tolerance_nulls_distant_matches(spark, frames):
    left, right = frames
    out = {
        (r["k"], r["tag"]): r["r_v"]
        for r in asof_join(
            left, right, on="k", tolerance=F.expr("INTERVAL 1 SECOND")
        ).collect()
    }
    assert out[(1, "l10")] is None  # match at t=8 is 2s away
    assert out[(1, "l20")] == 20.0  # exact-time match survives


def test_no_chimera_rows_from_null_right_fields(spark):
    """A later right row with a NULL field must NOT inherit the field
    of an earlier row: the payload travels as one struct."""
    left = spark.createDataFrame([(1, _t(100))], "k int, ts timestamp")
    right = spark.createDataFrame(
        [(1, _t(1), 7.0, "early"), (1, _t(50), None, "late")],
        "k int, ts timestamp, v double, tag string",
    )
    row = asof_join(left, right, on="k").collect()[0]
    assert row["r_tag"] == "late"
    assert row["r_v"] is None  # NOT 7.0 welded in from the earlier row


def test_null_event_times_never_match(spark):
    """Round-5 ADVICE fix: NULL right_ts rows are dropped (ascending
    sort puts NULLs first, so an untimed payload would otherwise be
    carried forward as 'the most recent prior' match); NULL left_ts
    rows are kept — left row count preserved — but match nothing."""
    left = spark.createDataFrame(
        [(1, _t(10), "ok"), (1, None, "untimed")],
        "k int, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, None, 99.0), (1, _t(8), 8.0)], "k int, ts timestamp, v double"
    )
    out_b = {
        r["tag"]: r["r_v"] for r in asof_join(left, right, on="k").collect()
    }
    assert len(out_b) == 2
    assert out_b["ok"] == 8.0  # NOT the untimed 99.0 payload
    assert out_b["untimed"] is None
    out_f = {
        r["tag"]: r["r_v"]
        for r in asof_join(left, right, on="k", direction="forward").collect()
    }
    assert len(out_f) == 2
    assert out_f["ok"] is None  # no timed right row >= t(10)
    assert out_f["untimed"] is None


def test_range_bucket_division_is_exact_at_epoch_magnitudes(spark):
    """Round-5 ADVICE fix: floor() over double division mis-buckets
    once 1/width falls under half an ulp of the quotient — the left
    row's candidate buckets then disagree with the right row's and a
    matching pair is silently dropped. _floordiv must agree with
    Python's exact // across magnitudes and signs."""
    from ontario_spark.operators.asof import _floordiv

    w = 17
    k = 1_700_000_000_000_000  # quotient magnitude where ulp = 0.25
    xs = [w * k - 1, w * k, w * k + 1, -5, -w, 0, 1_705_000_000_123_456]
    df = spark.createDataFrame([(x,) for x in xs], "x long")
    got = {
        r["x"]: r["q"]
        for r in df.select("x", _floordiv(F.col("x"), w).alias("q")).collect()
    }
    for x in xs:
        assert got[x] == x // w, (x, got[x], x // w)
    # the failure really exists in the double path at this magnitude
    import math

    assert math.floor((w * k - 1) / w) != (w * k - 1) // w


def test_range_join_boundaries(spark):
    """Exact window (l, l+upper]: the strict lower bound excludes the
    simultaneous row, the inclusive upper keeps the boundary row, and
    rows in the adjacent time bucket are still found."""
    left = spark.createDataFrame([(1, _t(0), "a")], "k int, ts timestamp, tag string")
    right = spark.createDataFrame(
        [(1, _t(0), "same"), (1, _t(300), "edge"), (1, _t(300.000001), "past"),
         (1, _t(299), "in"), (2, _t(10), "otherkey")],
        "k int, ts timestamp, tag string",
    )
    got = sorted(
        r["r_tag"]
        for r in range_join(
            left, right, on="k", lower_micros=0, upper_micros=300_000_000
        ).collect()
    )
    assert got == ["edge", "in"]


def test_range_join_no_duplicate_pairs(spark, sf_small):
    """The 2-bucket left expansion must never double-count a pair."""
    from ontario_spark.data import table

    ev = table(spark, sf_small, "events").select("user_id", "ts", "event_id")
    pairs = range_join(ev, ev, on="user_id", upper_micros=300_000_000)
    n = pairs.count()
    n_distinct = pairs.select("event_id", "r_event_id").distinct().count()
    assert n == n_distinct > 0


def test_asof_plan_has_no_nested_loop(spark, sf_small):
    """The scale contract: one shuffle + window, never a broadcast
    nested-loop (what a naive range-condition join would plan)."""
    from ontario_spark.queries.events_suite import events_asof_join

    plan = events_asof_join(spark, sf_small)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_range_join_rejects_prefix_collision(spark):
    left = spark.createDataFrame([(1, T0, T0)], "k int, ts timestamp, r_ts timestamp")
    right = spark.createDataFrame([(1, T0)], "k int, ts timestamp")
    with pytest.raises(ValueError, match="collide"):
        range_join(left, right, on="k")


def test_scd2_collapses_episodes_and_marks_current(spark):
    from ontario_spark.operators.asof import scd2_from_changelog

    log = spark.createDataFrame(
        [
            (1, _t(0), "a"),
            (1, _t(10), "a"),   # same state — collapses into episode 1
            (1, _t(20), "b"),
            (1, _t(30), "a"),   # back to 'a': a NEW episode, not merged
            (2, _t(5), "x"),
        ],
        "k int, ts timestamp, state string",
    )
    rows = sorted(
        map(
            tuple,
            scd2_from_changelog(log, "k", "ts", ["state"]).collect(),
        )
    )
    assert rows == [
        (1, "a", _t(0), _t(20), False),
        (1, "a", _t(30), None, True),
        (1, "b", _t(20), _t(30), False),
        (2, "x", _t(5), None, True),
    ]


def test_asof_join_matches_bruteforce_reference(spark):
    """Randomized cross-check: asof_join (union + running-last window)
    must agree with a per-row brute-force reference on mixed keys,
    duplicate timestamps across sides, and NULL event times — both
    directions. Fixed seed, three trials."""
    import random

    rnd = random.Random(12345)
    for trial in range(3):
        left = [
            (
                rnd.randint(1, 4),
                _t(rnd.randint(0, 50)) if rnd.random() > 0.1 else None,
                i,
            )
            for i in range(40)
        ]
        right_raw = [
            (
                rnd.randint(1, 4),
                _t(rnd.randint(0, 50)) if rnd.random() > 0.1 else None,
                100 + i,
            )
            for i in range(40)
        ]
        # unique (k, ts) on the right: duplicate-time tie-break is
        # documented as unspecified
        seen, right = set(), []
        for k, ts, v in right_raw:
            if (k, ts) not in seen:
                seen.add((k, ts))
                right.append((k, ts, v))
        ldf = spark.createDataFrame(left, "k int, ts timestamp, lid int")
        rdf = spark.createDataFrame(right, "k int, ts timestamp, rv int")
        for direction in ("backward", "forward"):
            out = {
                r["lid"]: r["r_rv"]
                for r in asof_join(
                    ldf, rdf, on="k", direction=direction
                ).collect()
            }
            assert len(out) == len(left)  # row count preserved
            for k, ts, lid in left:
                if ts is None:
                    exp = None
                else:
                    if direction == "backward":
                        cands = [
                            (rts, rv)
                            for rk, rts, rv in right
                            if rk == k and rts is not None and rts <= ts
                        ]
                        exp = max(cands)[1] if cands else None
                    else:
                        cands = [
                            (rts, rv)
                            for rk, rts, rv in right
                            if rk == k and rts is not None and rts >= ts
                        ]
                        exp = min(cands)[1] if cands else None
                assert out[lid] == exp, (trial, direction, lid)


def test_range_join_matches_bruteforce_reference(spark):
    """Randomized cross-check for the bucketed range join against the
    exact predicate evaluated per pair."""
    import random

    rnd = random.Random(54321)
    lower, upper = 0, 7_000_000  # 7 s window in micros
    for trial in range(3):
        left = [(rnd.randint(1, 3), _t(rnd.randint(0, 60)), i) for i in range(30)]
        right = [
            (rnd.randint(1, 3), _t(rnd.randint(0, 60) + rnd.random()), 100 + i)
            for i in range(30)
        ]
        ldf = spark.createDataFrame(left, "k int, ts timestamp, lid int")
        rdf = spark.createDataFrame(right, "k int, ts timestamp, rid int")
        got = {
            (r["lid"], r["r_rid"])
            for r in range_join(
                ldf, rdf, on="k", lower_micros=lower, upper_micros=upper
            ).collect()
        }
        exp = {
            (lid, rid)
            for lk, lts, lid in left
            for rk, rts, rid in right
            if lk == rk
            and lower
            < (rts - lts).total_seconds() * 1e6
            + (0 if rts >= lts else 0)  # timedelta handles sign
            <= upper
        }
        assert got == exp, (trial, got ^ exp)


def test_retention_cohorts_timezone_invariant(spark, sf_small):
    """The week bucketing derives epoch seconds from wall-clock parts
    of the NTZ timestamp, so a non-UTC session timezone must not move
    any cohort cell (round-6 review fix: unix_timestamp was session-
    zone-dependent while the DuckDB oracle is timezone-less)."""
    from ontario_spark.queries.events_suite import events_retention_cohorts
    from tests.oracle import assert_match, run_oracle
    from ontario_spark.queries import all_oracle_sql

    sql = all_oracle_sql()["events_retention_cohorts"]
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        assert_match(
            events_retention_cohorts(spark, sf_small),
            run_oracle(sql, sf_small),
            "retention_tz",
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
