"""Sketch operators: approximate distinct counts and quantiles.

Nothing like this exists in the reference (no aggregation at all,
SURVEY.md §2.5); this is beyond-reference surface for the 100 TB
regime, where exact COUNT(DISTINCT) over high-cardinality keys forces a
full shuffle of every key. Two tiers:

- ``approx_event_stats``: single-pass HLL++ (``approx_count_distinct``)
  + KLL-style quantiles (``percentile_approx``) — one partial-aggregate
  pass, no distinct shuffle.
- ``hll_rollup``: the *mergeable-sketch* pattern via the Datasketches
  HLL functions (``hll_sketch_agg`` / ``hll_union_agg``): build compact
  per-(group, day) sketches once, then re-aggregate to any coarser
  rollup by merging binary sketches instead of touching raw data. This
  is how a lake maintains daily sketch tables that answer
  month/entity-level cardinality questions from kilobytes per group.

Both are deterministic for fixed input (HLL register updates are
order-independent max operations), so results are stable across runs —
but engine-specific, hence no DuckDB oracle (pytest bounds the error
against exact counts instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_event_stats(
    events: DataFrame,
    group_col: str = "event_type",
    user_col: str = "user_id",
    value_col: str = "value",
    rsd: float = 0.02,
) -> DataFrame:
    """Per-group approximate distinct users + value quantiles in one
    partial-aggregating pass (no per-key distinct shuffle)."""
    return (
        events.groupBy(group_col)
        .agg(
            F.approx_count_distinct(user_col, rsd=rsd).alias("approx_users"),
            F.percentile_approx(value_col, [0.5, 0.95], 10000).alias("q"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            group_col,
            "approx_users",
            F.col("q")[0].alias("p50_value"),
            F.col("q")[1].alias("p95_value"),
            "n_events",
        )
    )


def hll_rollup(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    user_col: str = "user_id",
    lg_k: int = 12,
) -> DataFrame:
    """Two-level mergeable rollup: per-(group, day) HLL sketches of the
    user set, merged per group. Returns per-group estimated distinct
    users + the number of daily sketches merged. At scale, level 1 is a
    stored daily sketch table; level 2 runs over sketches only."""
    daily = (
        events.withColumn("__day", F.to_date(F.col(ts_col)))
        .groupBy(group_col, "__day")
        .agg(F.hll_sketch_agg(F.col(user_col).cast("string"), F.lit(lg_k)).alias("sk"))
    )
    return (
        daily.groupBy(group_col)
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("long").alias(
                "approx_users"
            ),
            F.count(F.lit(1)).alias("n_daily_sketches"),
        )
    )
