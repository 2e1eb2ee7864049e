"""Sketch-operator invariants: estimates bounded against exact counts,
and the merge property that makes stored daily sketches reusable."""

from __future__ import annotations

from pyspark.sql import functions as F

from ontario_spark.data import table
from ontario_spark.operators.sketches import approx_event_stats, hll_rollup


def test_approx_stats_error_bounds(spark, sf_small):
    ev = table(spark, sf_small, "events")
    approx = {
        r["event_type"]: r for r in approx_event_stats(ev).collect()
    }
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("u"),
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for t, e in exact.items():
        a = approx[t]
        assert abs(a["approx_users"] - e["u"]) <= max(2, 0.05 * e["u"])
        assert abs(a["p50_value"] - e["p50"]) <= 0.2 * max(abs(e["p50"]), 1)
        assert a["n_events"] == e["n"]
        assert a["p50_value"] <= a["p95_value"]


def test_hll_rollup_merge_matches_direct(spark, sf_small):
    ev = table(spark, sf_small, "events")
    rolled = {
        r["event_type"]: r["approx_users"] for r in hll_rollup(ev).collect()
    }
    # merging daily sketches must equal sketching the whole set directly
    # (HLL registers are order-independent maxima)
    direct = {
        r["event_type"]: r["u"]
        for r in ev.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg(F.col("user_id").cast("string"), F.lit(12))
            )
            .cast("long")
            .alias("u")
        )
        .collect()
    }
    assert rolled == direct
    exact = {
        r["event_type"]: r["u"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("u"))
        .collect()
    }
    for t, u in exact.items():
        assert abs(rolled[t] - u) <= max(2, 0.05 * u)


def test_sketches_deterministic(spark, sf_small):
    ev = table(spark, sf_small, "events")
    r1 = sorted(map(tuple, hll_rollup(ev).collect()))
    r2 = sorted(map(tuple, hll_rollup(ev).collect()))
    assert r1 == r2
