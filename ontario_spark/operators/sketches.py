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


def histogram_quantile_rollup(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    bin_width: float = 5.0,
    qs: tuple[float, ...] = (0.5, 0.95),
) -> DataFrame:
    """Mergeable fixed-bin histogram quantiles — the *exact-arithmetic*
    sibling of ``hll_rollup`` for the quantile problem: level 1 builds
    per-(group, day) histograms (``bin = floor(value / bin_width)``,
    integer counts), level 2 merges them per group by SUMMING bin
    counts — the stored-daily-sketch re-aggregation pattern, except the
    merge is lossless, so a DuckDB oracle can hash-match it (unlike
    KLL/t-digest, whose merge is engine-specific).

    Quantile readout: the q-quantile is the lower edge of the smallest
    bin whose cumulative count reaches rank ``floor(q·(n−1)) + 1`` —
    the same rank arithmetic as ``events_value_quantiles``, quantized
    to the bin grid. Error is bounded by ``bin_width`` by
    construction. Everything after the one ``floor`` is integer →
    engine-exact.

    Scale shape: level 1 is one partial-aggregating groupBy whose key
    space is (groups × days × occupied bins) — at 100 TB this is the
    stored histogram table and the rollup never touches raw rows
    again. Level 2 shuffles only histogram cells (thousands of rows),
    and the cumulative window partitions by group over those cells.
    Returns ``(group, n_events, n_hist_cells, q50_lo, q95_lo)``-style
    rows, one column pair per requested quantile."""
    from pyspark.sql import Window

    daily = (
        events.filter(F.col(value_col).isNotNull())
        .select(
            F.col(group_col).alias("g"),
            F.to_date(F.col(ts_col)).alias("__day"),
            F.floor(F.col(value_col).cast("double") / F.lit(bin_width))
            .cast("long")
            .alias("bin"),
        )
        .groupBy("g", "__day", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    n_cells = daily.groupBy("g").agg(F.count(F.lit(1)).alias("n_hist_cells"))
    merged = daily.groupBy("g", "bin").agg(F.sum("cnt").alias("cnt"))
    cum = merged.withColumn(
        "cum",
        F.sum("cnt").over(Window.partitionBy("g").orderBy("bin")),
    ).withColumn("total", F.sum("cnt").over(Window.partitionBy("g")))
    picks = [
        F.min(
            F.when(
                F.col("cum")
                >= F.floor(F.lit(q) * (F.col("total") - 1)).cast("long") + 1,
                F.col("bin") * F.lit(bin_width),
            )
        ).alias(f"q{int(q * 100)}_lo")
        for q in qs
    ]
    return (
        cum.groupBy("g")
        .agg(F.sum("cnt").alias("n_events"), *picks)
        .join(n_cells, "g")
        .select(
            F.col("g").alias(group_col),
            "n_events",
            "n_hist_cells",
            *[f"q{int(q * 100)}_lo" for q in qs],
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


def countmin_rollup(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    probes: DataFrame,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Mergeable Count-Min sketch with an exact-arithmetic readout:
    level 1 builds per-day d×w counter grids (``bucket_j(key) =
    md5-hash_j(key) mod w``), level 2 merges days by SUMMING cells —
    like ``histogram_quantile_rollup``, the merge is lossless integer
    addition, so the estimate ``min_j cell[j][bucket_j(key)]`` is
    engine-exact and a DuckDB oracle hash-matches it (the classic CM
    guarantee ``estimate ≥ exact`` becomes a checkable boolean rather
    than a probabilistic claim). Hashes are md5-derived (engine-
    portable, same idiom as the MinHash family).

    Scale shape: the raw stream reduces to per-(day, key) counts FIRST
    (the natural pre-aggregation), the ×depth explode happens on that
    compact frame, and the sketch itself is ≤ days × depth × width
    cells regardless of key cardinality — the whole point of CM at
    100 TB: the stored daily sketch answers frequency queries without
    a per-key shuffle. Probe keys join the merged grid on (row,
    bucket) — broadcast-sized.

    Returns ``(key, exact_count, cm_estimate, never_undercounts)`` for
    every probe key."""
    rows = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                (
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat(
                                    F.lit(f"cm{j}|"),
                                    F.col("key").cast("string"),
                                )
                            ),
                            1,
                            15,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % width
                ).alias("bucket"),
            )
            for j in range(depth)
        ]
    )
    base = df.select(
        F.col(key_col).alias("key"), F.to_date(F.col(ts_col)).alias("__day")
    ).filter(F.col("key").isNotNull())
    day_key = base.groupBy("__day", "key").agg(F.count(F.lit(1)).alias("cnt"))
    cells = (
        day_key.select("__day", "cnt", F.explode(rows).alias("rb"))
        .groupBy("__day", "rb.j", "rb.bucket")
        .agg(F.sum("cnt").alias("cell"))
        # level-2 merge: sum the daily grids cell-wise
        .groupBy("j", "bucket")
        .agg(F.sum("cell").alias("cell"))
    )
    p = probes.select(F.col(key_col).alias("key")).distinct()
    probe_rows = p.select("key", F.explode(rows).alias("rb")).select(
        "key", F.col("rb.j").alias("j"), F.col("rb.bucket").alias("bucket")
    )
    est = (
        probe_rows.join(cells, ["j", "bucket"])
        .groupBy("key")
        .agg(F.min("cell").alias("cm_estimate"))
    )
    exact = (
        base.join(F.broadcast(p), "key", "left_semi")
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("exact_count"))
    )
    return (
        exact.join(est, "key")
        .select(
            F.col("key").alias(key_col),
            "exact_count",
            "cm_estimate",
            (F.col("cm_estimate") >= F.col("exact_count")).alias(
                "never_undercounts"
            ),
        )
    )
