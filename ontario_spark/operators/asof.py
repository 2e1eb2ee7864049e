"""Temporal joins over event tables: as-of join and bucketed range join.

Beyond-reference scope (SURVEY.md §2.5): the reference mediator has no
temporal join operators; training-data and feature pipelines need both
point-in-time-correct alignment (as-of) and bounded-window pairing
(range join). Both are expressed as compositions of built-in DataFrame
ops — no Python UDFs, no driver-side loops.

Scale notes (100 TB / 1000 executors):

- ``asof_join`` uses the union + running-``last`` window formulation:
  tag both inputs, union them, sort within each key partition by the
  event time, and carry the most recent right-side payload forward onto
  left rows. That is ONE shuffle on the join key and a single in-
  partition sort — no range-condition join (which Spark would otherwise
  plan as a broadcast-nested-loop), no per-row probe, no candidate
  explosion. Skewed keys degrade to a big sort, handled by AQE.
- The right payload travels as a single nullable STRUCT so the window
  ``last(..., ignorenulls=True)`` picks whole rows; per-column ``last``
  would weld fields from different right rows whenever a later row
  carries a NULL field (chimera rows).
- ``range_join`` buckets event time into ``width``-sized bins with
  ``width >= upper - lower``, so every left row's target interval spans
  at most two bins: the left side duplicates into at most 2 bucket
  keys, the right side lands in exactly one, and the join runs on
  (key, bucket) equality with the exact range predicate re-applied
  after. Fan-out per (key, bucket) is bounded by local event density,
  never corpus size; the equality join lets Spark use a plain shuffled
  hash join instead of a nested loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _floordiv(x: Column, w: int) -> Column:
    """Exact ``floor(x / w)`` for a long column and positive int
    literal. ``floor()`` over double division mis-buckets once the
    true quotient needs more than 53 mantissa bits — for
    microsecond epochs (~1.7e15) and small widths, ``x/w`` can round
    UP across an integer boundary and a left row's candidate bucket
    then disagrees with the right row's, silently dropping a matching
    pair. Subtracting the non-negative remainder first makes the
    numerator an exact multiple of ``w``; dividing as DECIMAL keeps
    the (integral) quotient exact at any magnitude."""
    exact = (x.cast("long") - F.pmod(x.cast("long"), F.lit(w))).cast("decimal(38,0)")
    return (exact / F.lit(w)).cast("long")


def ts_micros(c: Column) -> Column:
    """Microseconds-since-epoch from either TIMESTAMP or TIMESTAMP_NTZ
    (``unix_micros`` rejects NTZ; the cast applies the session zone
    uniformly, so time DIFFERENCES and fixed-width bucket joins are
    unaffected by the shift)."""
    return F.unix_micros(c.cast("timestamp_ltz"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
    tolerance: Column | None = None,
    right_prefix: str = "r_",
) -> DataFrame:
    """Left as-of join: every ``left`` row, annotated with the payload
    of the nearest ``right`` row for the same ``on`` key — the latest
    right row with ``right_ts <= left_ts`` (``backward``, inclusive) or
    the earliest with ``right_ts >= left_ts`` (``forward``). Unmatched
    left rows keep NULL right fields (left-join semantics, row count
    preserved).

    ``tolerance`` (optional) is compared against the matched-row time
    distance (same type as a ``left_ts - right_ts`` difference, e.g.
    ``F.expr("INTERVAL 5 MINUTES")`` for timestamps); matches farther
    away are nulled out.

    Right-side columns (all but ``on``) come back prefixed with
    ``right_prefix``, including ``right_ts`` — so the matched event
    time is always available to the caller.

    Ties: at equal timestamps the right row matches the left row
    (inclusive bound). Multiple right rows with identical
    (key, right_ts) are tie-broken by the LAST one in struct order
    after the in-partition sort — supply a deduplicated right side if
    that matters (mirrors DuckDB ASOF JOIN, which is similarly
    unspecified on duplicate times).

    NULL event times: right rows with NULL ``right_ts`` are dropped
    (an untimed observation is never "the nearest" — and engines
    disagree on NULL sort order, so keeping them would make matches
    engine-dependent); left rows with NULL ``left_ts`` are kept (row
    count preserved) but match nothing — mirrors
    ``scd2_from_changelog``'s NULL handling.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    payload = [c for c in right.columns if c != on]
    renamed = {c: right_prefix + c for c in payload}
    clash = sorted(set(renamed.values()) & set(left.columns))
    if clash:
        raise ValueError(f"prefixed right columns collide with left: {clash}")

    left_payload = [c for c in left.columns if c != on]
    r_side = right.filter(F.col(right_ts).isNotNull()).select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c).alias(renamed[c]) for c in payload]).alias("__r"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_payload
        ],
    )
    null_struct = F.lit(None).cast(r_side.schema["__r"].dataType)
    l_side = left.select(
        F.col(on),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        null_struct.alias("__r"),
        *left_payload,
    )

    # Sort order puts the matchable right rows BEFORE each left row:
    # ascending time for backward, descending for forward; at equal
    # times the right row (side 0) sorts first, making the bound
    # inclusive in both directions.
    ts_order = F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    w = (
        Window.partitionBy(on)
        .orderBy(ts_order, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l_side.unionByName(r_side)
        .withColumn("__m", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
        # NULL left_ts sorts first (asc) / last (desc): either way its
        # carried-forward payload is undefined — null the match out.
        .withColumn("__m", F.when(F.col("__ts").isNotNull(), F.col("__m")))
    )
    if tolerance is not None:
        m_ts = F.col("__m").getField(renamed[right_ts])
        dist = (
            F.col("__ts") - m_ts
            if direction == "backward"
            else m_ts - F.col("__ts")
        )
        matched = matched.withColumn(
            "__m", F.when(dist <= tolerance, F.col("__m"))
        )
    return matched.select(
        F.col(on),
        *left_payload,
        *[F.col("__m").getField(renamed[c]).alias(renamed[c]) for c in payload],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_micros: int = 0,
    upper_micros: int = 300_000_000,
    strict_lower: bool = True,
) -> DataFrame:
    """Pair every ``left`` row with the ``right`` rows of the same
    ``on`` key whose time lies in
    ``(left_ts + lower, left_ts + upper]`` (``strict_lower``) or
    ``[left_ts + lower, left_ts + upper]``. Bounds are microseconds.

    Returns the join of both sides with right columns prefixed ``r_``
    (inner semantics: only matched pairs).

    Implementation: equality join on (key, time bucket) with bucket
    width ``upper - lower`` — each left row expands to the ≤2 buckets
    its target window can touch, each right row sits in exactly one, so
    no pair is produced twice and the exact predicate only filters.
    """
    if upper_micros <= lower_micros:
        raise ValueError("upper_micros must be > lower_micros")
    clash = sorted(
        {f"r_{c}" for c in right.columns if c != on} & set(left.columns)
    )
    if clash:
        raise ValueError(f"prefixed right columns collide with left: {clash}")
    width = upper_micros - lower_micros
    l_us = ts_micros(F.col(left_ts))
    r_us = ts_micros(F.col(right_ts))

    lo = l_us + F.lit(lower_micros)
    buckets = F.array_distinct(
        F.array(
            _floordiv(lo, width),
            _floordiv(l_us + F.lit(upper_micros), width),
        )
    )
    l_exp = left.select(
        F.col(on),
        *[c for c in left.columns if c != on],
        F.explode(buckets).alias("__bucket"),
    )
    r_tag = right.select(
        F.col(on).alias("__r_on"),
        _floordiv(r_us, width).alias("__bucket"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns if c != on],
    )
    delta = ts_micros(F.col(f"r_{right_ts}")) - ts_micros(F.col(left_ts))
    lower_ok = (
        delta > F.lit(lower_micros) if strict_lower else delta >= F.lit(lower_micros)
    )
    return (
        l_exp.join(
            r_tag,
            (F.col(on) == F.col("__r_on")) & (l_exp["__bucket"] == r_tag["__bucket"]),
        )
        .filter(lower_ok & (delta <= F.lit(upper_micros)))
        .drop("__bucket", "__r_on")
    )


def scd2_from_changelog(
    df: DataFrame,
    key: str,
    ts_col: str,
    attr_cols: list[str],
) -> DataFrame:
    """Build a type-2 slowly-changing-dimension history from a change
    log: one row per (key, attribute-state) EPISODE, with
    ``valid_from`` / ``valid_to`` (NULL = open) and ``is_current`` —
    the standard lakehouse dimension-versioning shape.

    Consecutive log rows with identical attributes collapse into one
    episode (change detection via a null-safe ``lag`` struct compare);
    episode end times come from ``lead`` over the surviving change
    rows. Requires unique (key, ts) pairs — simultaneous conflicting
    changes for one key have no defined order. Rows with NULL ``ts``
    are dropped (an untimed change has no place in a history; engines
    also disagree on NULL sort order, so keeping them would make the
    result engine-dependent).

    Scale: two window passes over the SAME (key)-partitioned sort —
    one shuffle total, no self-join, state bounded per key. At 100 TB
    the changelog shuffles once on the dimension key; history emission
    is map-side from there."""
    attrs = F.struct(*[F.col(c) for c in attr_cols])
    w = Window.partitionBy(key).orderBy(ts_col)
    changes = (
        df.select(key, ts_col, *attr_cols)
        .filter(F.col(ts_col).isNotNull())
        .withColumn("__prev", F.lag(attrs).over(w))
        .filter(~attrs.eqNullSafe(F.col("__prev")))
        .drop("__prev")
    )
    return changes.select(
        key,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
        F.lead(ts_col).over(w).isNull().alias("is_current"),
    )
