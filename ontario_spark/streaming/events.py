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

import os
import tempfile
import threading
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

def _event_schema(ts_type) -> StructType:
    return StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", ts_type),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )


# TimestampType (not NTZ): withWatermark rejects TIMESTAMP_NTZ event
# time. The stored naive µs values surface as the same wall-clock
# instants the batch loader's NTZ read produces (session tz applies
# uniformly on both sides).
EVENT_SCHEMA = _event_schema(TimestampType())
EVENT_SCHEMA_NANOS = _event_schema(LongType())  # raw nanos as long


def read_event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet as a stream, type-driven off the parquet footer
    (the fixture generator has shipped both TIMESTAMP(NANOS) and
    timestamp[us] encodings across rounds): native µs/ms timestamps are
    read directly; the legacy nanos encoding reads as long + truncates
    to µs, identical to the batch loader so streaming results match
    batch oracles."""
    from ontario_spark.data import events_ts_kind

    nanos = events_ts_kind(f"{sf_dir}/events.parquet") == "nanos"
    if nanos:
        # session-global and deliberately NOT reset: the flag only
        # changes how TIMESTAMP(NANOS) parquet reads (as long), and
        # both this path and data.table() detect that encoding
        # per-file and convert; resetting mid-session would break the
        # lazy frames already planned under it
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The streaming file source requires a directory; pathGlobFilter
    # narrows it to the events table.
    raw = (
        spark.readStream.schema(EVENT_SCHEMA_NANOS if nanos else EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if nanos:
        raw = raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return raw


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


def enriched_segment_counts(
    stream: DataFrame,
    dim: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream–static enrichment join + windowed aggregation: each event
    joins the static customer dimension on user key, then aggregates
    per (window, mktsegment). When the dim fits the broadcast
    threshold the planner broadcasts it and the join adds NO
    stream-side shuffle — but the hint is NOT forced (round-8: the
    customer dim scales with the corpus, and a forced broadcast of an
    unbounded relation is a hard job failure at warehouse scale; an
    over-threshold dim falls back to a per-batch shuffle join, which
    is slow-but-correct — at that size pre-bucketing the dim store is
    the real fix)."""
    d = dim.select("c_custkey", "c_mktsegment")
    return (
        stream.withWatermark("ts", watermark)
        .join(d, stream.user_id == d.c_custkey)
        .groupBy(F.window("ts", window).alias("w"), F.col("c_mktsegment"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("hour"),
            F.col("c_mktsegment").alias("segment"),
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


def interval_join(
    stream: DataFrame,
    left_type: str = "click",
    right_type: str = "purchase",
    within: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream–stream interval join: for each user, pair every
    ``left_type`` event with the ``right_type`` events that follow it
    within ``within``. Both sides carry watermarks and the join
    condition bounds the event-time range, so the state store retains
    each side only for the interval + watermark — the canonical bounded
    stream–stream join (attribution, funnel, click→purchase).

    ``how="left_outer"`` (round-10, VERDICT r9 task 8) additionally
    emits every unmatched left event with NULL right columns ONCE the
    watermark passes the end of its join interval — the shape real
    attribution pipelines need ("clicks that did NOT convert"), served
    natively by Spark's outer stream–stream join. Emission is
    watermark-driven: a left row becomes an outer result only when
    ``l_ts + within`` falls behind the global watermark (min across
    both inputs of max-event-time − delay), because until then a
    matching right event could still arrive. The state bound is the
    same as the inner form — the interval plus the watermark delay per
    side; outer emission only changes WHEN evicted-unmatched state
    surfaces, not how much state is held.
    """
    l = (
        stream.filter(F.col("event_type") == left_type)
        .select(
            F.col("user_id").alias("l_user"),
            F.col("ts").alias("l_ts"),
            F.col("event_id").alias("l_event"),
        )
        .withWatermark("l_ts", watermark)
    )
    r = (
        stream.filter(F.col("event_type") == right_type)
        .select(
            F.col("user_id").alias("r_user"),
            F.col("ts").alias("r_ts"),
            F.col("event_id").alias("r_event"),
        )
        .withWatermark("r_ts", watermark)
    )
    return l.join(
        r,
        (F.col("l_user") == F.col("r_user"))
        & (F.col("r_ts") > F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {within}")),
        how,
    ).select(
        F.col("l_user").alias("user_id"),
        "l_event",
        "r_event",
        "l_ts",
        "r_ts",
    )


def scd2_enrich(
    stream: DataFrame,
    dim: DataFrame,
    event_type: str = "purchase",
) -> DataFrame:
    """Stream-static POINT-IN-TIME enrichment against a versioned
    (SCD2) dimension (round 11): each streaming ``event_type`` event
    joins the dimension episode valid AT its event time —
    ``valid_from <= ts < valid_to`` (open current episodes have NULL
    valid_to). The dimension-correctness pattern streaming pipelines
    get wrong by joining the CURRENT version: a late-replayed event
    must attach the version that was true then. Stream-static inner
    joins need no watermark or join state — the static side is
    re-planned per micro-batch (at scale: broadcast when the dim fits,
    shuffle otherwise — the optimizer's call per batch), so this
    composes freely with downstream stateful operators."""
    p = stream.filter(F.col("event_type") == event_type).select(
        "event_id",
        F.col("user_id").alias("u"),
        "ts",
        "value",
    )
    cond = (
        (p["u"] == dim["user_id"])
        & (dim["valid_from"] <= p["ts"])
        & (dim["valid_to"].isNull() | (p["ts"] < dim["valid_to"]))
    )
    return p.join(dim, cond, "inner").select(
        "event_id",
        F.col("u").alias("user_id"),
        "ts",
        "value",
        F.col("event_type").alias("state_type"),
        "valid_from",
    )


def dedup_events(
    stream: DataFrame,
    keys: list[str] | None = None,
    within_watermark: str | None = None,
) -> DataFrame:
    """Streaming deduplication on ``keys`` through the state store.

    ``within_watermark=None`` → global ``dropDuplicates``: exact
    streaming DISTINCT whose state holds every key seen (correct, but
    state grows with key cardinality — the bounded-replay / modest-key
    regime). Passing a delay (e.g. ``"24 hours"``) switches to
    ``dropDuplicatesWithinWatermark``, the production path at 100 TB:
    state is purged once a key falls behind the watermark, bounding
    memory in exchange for only-suppress-duplicates-within-the-window
    semantics. Only the key columns are projected so the surviving row
    is deterministic regardless of arrival order."""
    keys = keys or ["user_id", "event_type"]
    proj = stream.select(*keys)
    if within_watermark is None:
        return proj.dropDuplicates(keys)
    return stream.withWatermark("ts", within_watermark).select(
        *keys, "ts"
    ).dropDuplicatesWithinWatermark(keys).select(*keys)


GAPS_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("max_gap_us", LongType()),
    ]
)

GAPS_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("last_us", LongType()),
        StructField("maxgap_us", LongType()),
        StructField("pending_us", ArrayType(LongType())),
    ]
)


def _fold_gaps(
    n: int, last_us: int | None, maxgap_us: int | None, sorted_us: list[int]
) -> tuple[int, int | None, int | None]:
    """Fold a sorted run of event times into the (count, last seen,
    max gap) aggregate."""
    for us in sorted_us:
        if last_us is not None:
            g = us - last_us
            maxgap_us = g if maxgap_us is None else max(maxgap_us, g)
        last_us = us
        n += 1
    return n, last_us, maxgap_us


def user_event_gaps(stream: DataFrame, watermark: str = "24 hours") -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    event count + maximum inter-event gap (µs). The gap spans batch
    boundaries, so it genuinely needs keyed state (last seen timestamp)
    — not expressible with built-in windowed aggregates alone.

    **Watermark-buffered (round 4)** — correct under out-of-order
    arrival, not just file replay: incoming event times join a per-key
    pending buffer; only events at or below the current watermark are
    FINALIZED into the (n, last, maxgap) aggregate, in event-time
    order. Anything older arriving later would have been dropped by the
    engine's watermark filter, so finalized gaps can never be
    contradicted by a late event. Each emission is the provisional fold
    of finalized state + the sorted pending buffer — i.e. exactly the
    answer over every event seen so far — so the update-mode sink's
    last row per key equals the sorted-replay (batch oracle) answer
    regardless of arrival order. State is bounded by the watermark
    horizon per key (the standard buffer-on-watermark cost), not by the
    stream length. Gaps stay integer microseconds end-to-end so the
    batch oracle (``epoch_us`` diffs) matches bit-for-bit."""
    from bisect import bisect_right

    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, last_us, maxgap_us, pending = state.get
            pending = list(pending or [])
        else:
            n, last_us, maxgap_us, pending = 0, None, None, []
        for pdf in pdfs:
            if not len(pdf):
                continue
            pending.extend(
                (
                    pd.to_datetime(pdf["ts"])
                    .astype("datetime64[ns]")
                    .astype("int64")
                    // 1000
                ).tolist()
            )
        pending.sort()
        wm_us = state.getCurrentWatermarkMs() * 1000
        cut = bisect_right(pending, wm_us)
        n, last_us, maxgap_us = _fold_gaps(n, last_us, maxgap_us, pending[:cut])
        pending = pending[cut:]
        state.update((n, last_us, maxgap_us, pending))
        pn, _, pmax = _fold_gaps(n, last_us, maxgap_us, pending)
        yield pd.DataFrame(
            [{"user_id": key[0], "n_events": pn, "max_gap_us": pmax}]
        )

    return stream.withWatermark("ts", watermark).groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=GAPS_OUT_SCHEMA,
        stateStructType=GAPS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


#: Executed physical plan of the most recent run_available_now query's
#: last micro-batch (None when unavailable) — read by tools/plan_audit,
#: which runs queries one at a time. ``STREAM_EXPLAINS`` keys the same
#: plans by sink name so concurrent streaming queries in one session
#: can't cross-attribute plans (round-12 ADVICE); both are written
#: under ``_EXPLAIN_LOCK``.
LAST_STREAM_EXPLAIN: str | None = None
STREAM_EXPLAINS: dict[str, str] = {}
_EXPLAIN_LOCK = threading.Lock()


def scratch_dir() -> "str | None":
    """Base directory for EPHEMERAL streaming scratch — the throwaway
    checkpoints, replay source dirs and micro-batch sinks this module
    creates with tempfile (all abandoned or deleted at the end of the
    run; none carries durability semantics). Guide §6: a streaming
    micro-batch pays offset-log + commit-log + state-delta fsyncs per
    batch, and on a disk-backed /tmp that I/O is pure overhead for
    scratch that is deleted seconds later. ``OSK_STREAM_SCRATCH``
    overrides (a production pipeline sets its real, durable checkpoint
    location explicitly and never goes through this helper); default
    prefers the RAM-backed /dev/shm when present, else the tempfile
    default. Returns a value suitable for tempfile's ``dir=``."""
    base = os.environ.get("OSK_STREAM_SCRATCH")
    if base:
        return base
    shm = "/dev/shm"
    if os.path.isdir(shm) and os.access(shm, os.W_OK):
        return shm
    return None


def run_available_now(
    result: DataFrame,
    name: str,
    output_mode: str = "complete",
    shuffle_partitions: int | None = 8,
) -> DataFrame:
    """Execute a streaming DataFrame to completion with AvailableNow
    into an in-memory sink and return the final table (complete mode so
    windows closed by the watermark still surface; stateful
    ``applyInPandasWithState`` operators require ``update``, where the
    sink accumulates one row per key per batch — last write wins).

    ``shuffle_partitions`` pins the state-store partition count for THIS
    query (AQE never coalesces streaming shuffles, and each state
    partition carries fixed checkpoint/provider overhead per batch —
    measured 5× wall-clock at 32 vs 8 partitions on the sf0.1 fixture).
    It is frozen into the checkpoint at first start, exactly how a
    production pipeline sizes state partitioning to key cardinality;
    None keeps the session default (e.g. a 1000-executor deployment
    sizing for millions of session keys)."""
    from ontario_spark.session import CONF_LOCK

    spark = result.sparkSession
    # CONF_LOCK held for the whole set-run-restore cycle: interleaved
    # cycles from concurrent threads could pin the session at the
    # streaming partition count permanently (round-5 review fix)
    with tempfile.TemporaryDirectory(
        prefix="osk-ckpt-", dir=scratch_dir()
    ) as ckpt, CONF_LOCK:
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            if shuffle_partitions is not None:
                spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
            q = (
                result.writeStream.format("memory")
                .queryName(name)
                .outputMode(output_mode)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            # Executed PHYSICAL plan of the last micro-batch, kept for
            # tools/plan_audit.py (round 11: streaming rows were
            # invisible to the audit because their plans only exist
            # inside the running StreamingQuery). Best-effort: a plan
            # string is diagnostics, never worth failing the query.
            global LAST_STREAM_EXPLAIN
            try:
                plan = q._jsq.explainInternal(False)
            except Exception:
                plan = None
            with _EXPLAIN_LOCK:
                LAST_STREAM_EXPLAIN = plan
                if plan is not None:
                    STREAM_EXPLAINS[name] = plan
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)


def chained_daily_rollup(
    stream: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """TWO chained stateful aggregations in ONE streaming query
    (round 10): a watermarked hourly tumbling window rolled up into a
    daily window — the multi-stateful-operator pipeline Spark supports
    since 3.4 (window-on-window in append mode). The shape every
    metrics pipeline wants (fine-grained pre-agg + coarse rollup
    without a second job or an intermediate table); state for BOTH
    operators is watermark-bounded, and the hourly partial sums ride
    DECIMAL so the final double is exact. Append-mode emission: a
    daily window surfaces once the propagated watermark (max event
    time − delay) passes its end — the replay oracle applies the same
    cutoff."""
    hourly = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("__sv"),
        )
    )
    return (
        hourly.groupBy(F.window(F.col("w"), "1 day").alias("d"), F.col("event_type"))
        .agg(
            F.sum("__n").cast("long").alias("n_events"),
            F.sum("__sv").cast("double").alias("total_value"),
        )
        .select(
            F.col("d.start").alias("day"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def trending_topk(hourly_counts: DataFrame, k: int = 3) -> DataFrame:
    """Top-k event types per window from the windowed-counts table.

    The streaming stage is ``windowed_counts`` (incremental, watermark-
    bounded state); ranking is a batch view over the continuously-
    maintained count table — the standard "trending now" serving
    pattern, since per-window ranks are not incrementally maintainable
    in append mode (a late row can displace an earlier rank). The rank
    window partitions by the hour bucket, so at scale each window ranks
    independently — no global sort."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("hour").orderBy(
        F.desc("n_events"), F.asc("event_type")
    )
    return (
        hourly_counts.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("hour", "event_type", "n_events", "rank")
    )


def write_stream_exactly_once(
    result: DataFrame,
    path: str,
    checkpoint: str,
    output_mode: str = "append",
    shuffle_partitions: "int | None" = 8,
):
    """Exactly-once file ingest: ``foreachBatch`` writing each
    micro-batch to a ``batch_id=<n>`` subdirectory with OVERWRITE mode.
    Structured Streaming guarantees at-least-once batch execution after
    a crash (an epoch whose sink write finished but whose checkpoint
    commit didn't is re-executed with the SAME batch id) — overwriting
    the batch's own directory makes the replay idempotent, so readers
    of ``path`` see each input row exactly once. This is the standard
    recipe for exactly-once semantics onto a non-transactional file
    sink; partition-by-batch also gives incremental readers a
    monotonic high-water mark.

    Returns the started StreamingQuery (AvailableNow trigger) — caller
    awaits termination. Scale: each batch write is a normal
    distributed parquet write; no driver materialization."""
    from ontario_spark.session import CONF_LOCK

    spark = result.sparkSession

    def _write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{path}/batch_id={batch_id}")

    with CONF_LOCK:
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            if shuffle_partitions is not None:
                spark.conf.set(
                    "spark.sql.shuffle.partitions", str(shuffle_partitions)
                )
            return (
                result.writeStream.foreachBatch(_write_batch)
                .outputMode(output_mode)
                .option("checkpointLocation", checkpoint)
                .trigger(availableNow=True)
                .start()
            )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)


def run_incremental_neardup(
    spark: SparkSession,
    new_docs_dir: str,
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 8,
    n: int = 3,
    threshold: float = 0.4,
    name: str = "stream_incremental_neardup",
) -> DataFrame:
    """Streaming ingest near-dup (round 12, VERDICT r11 task 6): the
    micro-batch twin of ``dedup.incremental_lsh_pairs`` — the shape a
    production ingest dedup actually runs. The HISTORICAL corpus's
    banded-signature index is built and persisted ONCE before the
    stream starts (in production: a maintained table on storage);
    documents then arrive as a file stream (``maxFilesPerTrigger=1``,
    AvailableNow replay) and every micro-batch probes the index inside
    ``foreachBatch`` — banding the batch, bucket-equi-joining the
    index, and appending verified pairs to the sink. Per-doc
    signatures are batch-independent, so the union over micro-batches
    equals the one-shot batch operator's output exactly (same
    md5-portable estimator → same DuckDB oracle).

    Scale: probe cost per batch is batch×bands bucket lookups against
    the persisted index — never corpus²; the index is the only state
    and lives outside the stream (no unbounded state store growth).
    The last batch's EXECUTED probe plan is recorded for
    tools/plan_audit (same contract as run_available_now)."""
    from ontario_spark.operators.dedup import (
        _bounded_persist,
        banded_signature_index,
        probe_banded_index,
    )
    from ontario_spark.session import CONF_LOCK

    index = _bounded_persist(
        banded_signature_index(corpus, id_col, text_col, num_hashes, bands, n)
    )
    index.count()  # materialize the persisted index before the stream
    base = tempfile.mkdtemp(prefix=f"{name}_", dir=scratch_dir())
    sink, ckpt = f"{base}/out", f"{base}/ckpt"
    # The stream carries the same document schema as the historical
    # corpus (the new-docs dir is the other half of the same table) —
    # deriving it from the frame skips a second listing + footer read.
    schema = corpus.schema
    # With maxFilesPerTrigger=1 the replay runs one micro-batch per
    # source file; knowing the last batch id up front lets every batch
    # but the last run as a single write action (round 12: the old
    # per-batch persist+count+explain tripled the actions per batch —
    # the executed-plan audit capture only needs the LAST batch, which
    # is the only one tools/plan_audit reads).
    n_files = sum(
        1
        for f in os.listdir(new_docs_dir)
        if f.endswith(".parquet") and not f.startswith((".", "_"))
    )

    def _probe(batch_df: DataFrame, batch_id: int) -> None:
        bn = banded_signature_index(
            batch_df, id_col, text_col, num_hashes, bands, n
        )
        out = probe_banded_index(bn, index, id_col, num_hashes, threshold)
        if batch_id < n_files - 1:
            out.write.mode("append").parquet(sink)
            return
        out = out.persist()
        try:
            out.count()  # execute so the captured plan is the FINAL one
            plan = out._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "simple"
                )
            )
            global LAST_STREAM_EXPLAIN
            with _EXPLAIN_LOCK:
                LAST_STREAM_EXPLAIN = plan
                STREAM_EXPLAINS[name] = plan
            out.write.mode("append").parquet(sink)
        finally:
            out.unpersist()

    with CONF_LOCK:
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "8")
            q = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(new_docs_dir)
                .writeStream.foreachBatch(_probe)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
    index.unpersist()
    try:
        return spark.read.parquet(sink)
    except Exception:
        # zero batches produced pairs → no sink files; empty result
        # with the operator's schema
        return spark.createDataFrame(
            [], f"id_new {dict(corpus.dtypes)[id_col]}, "
                f"id_corpus {dict(corpus.dtypes)[id_col]}, "
                "est_jaccard double",
        )


# n_seen (total events ever received for the key) is STRICTLY monotone
# across a key's emitted rows — the selector consumers need to pick the
# final state out of an update-mode sink that APPENDS one row per key
# per batch. n_kept alone is NOT monotone: a late-but-in-watermark
# expensive event sorts earlier and can shrink the provisional fold.
BUDGET_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_seen", LongType()),
        StructField("n_kept", LongType()),
        StructField("kept_cents", LongType()),
        StructField("budget_hit", BooleanType()),
    ]
)

BUDGET_STATE_SCHEMA = StructType(
    [
        StructField("n_seen", LongType()),
        StructField("n_kept", LongType()),
        StructField("kept_cents", LongType()),
        StructField("budget_hit", BooleanType()),
        StructField("pending_us", ArrayType(LongType())),
        StructField("pending_cents", ArrayType(LongType())),
    ]
)


def _fold_budget(n_kept, kept, hit, pairs, budget):
    """Keep events in (ts, cents) order while the running total stays
    within budget; the first overflow sets the flag and freezes the
    cut (later cheaper events do NOT backfill — the reproducible
    budget-cut contract)."""
    for _, c in pairs:
        if hit:
            break
        if kept + c > budget:
            hit = True
            break
        kept += c
        n_kept += 1
    return n_kept, kept, hit


def _budget_cents_col() -> Column:
    # exact integer cents: values carry 2 decimals, so round(v*100)
    # is the same integer on every engine — the fold never touches a
    # float and bit-parity with the batch oracle needs no
    # summation-order argument
    return F.round(F.col("value") * 100, 0).cast("long")


def _budget_input(stream: DataFrame) -> DataFrame:
    """Budget items are rows with a defined non-negative cost: NULL
    values have no cost semantics (and would reach pandas as NaN,
    poisoning the integer fold), and negative values would break the
    once-over-always-over monotonicity the oracle's running-sum form
    relies on — both are dropped, documented semantics mirrored by the
    oracle."""
    withc = stream.withColumn("cents", _budget_cents_col())
    return withc.filter(F.col("cents").isNotNull() & (F.col("cents") >= 0))


def user_budget_cut(
    stream: DataFrame, budget_cents: int = 150_000, watermark: str = "24 hours"
) -> DataFrame:
    """Per-user running-budget cut: events are kept in event-time
    order while the user's cumulative value stays within the budget —
    the streaming form of the batch token-budget mix
    (operators/sampling.py), and genuinely stateful (the cut point
    depends on everything seen before it).

    Same watermark-buffer discipline as ``user_event_gaps``: rows
    join a per-key pending buffer; only rows at or below the
    watermark FINALIZE into the running total, in (ts, cents) order
    (a total order), so out-of-order arrival within the watermark can
    never contradict an emitted fold. Each batch emits the
    provisional fold of finalized + pending (update sink: last write
    wins). State is bounded by the watermark horizon per key."""
    from bisect import bisect_right

    from pyspark.sql.streaming.state import GroupStateTimeout

    budget = int(budget_cents)

    def fn(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        if state.exists:
            n_seen, n_kept, kept, hit, p_us, p_cents = state.get
            buf = list(zip(p_us or [], p_cents or []))
        else:
            n_seen, n_kept, kept, hit, buf = 0, 0, 0, False, []
        for pdf in pdfs:
            if not len(pdf):
                continue
            n_seen += len(pdf)
            ts_us = (
                pd.to_datetime(pdf["ts"])
                .astype("datetime64[ns]")
                .astype("int64")
                // 1000
            )
            buf.extend(zip(ts_us.tolist(), pdf["cents"].tolist()))
        buf.sort()
        wm_us = state.getCurrentWatermarkMs() * 1000
        cut = bisect_right(buf, (wm_us, float("inf")))
        n_kept, kept, hit = _fold_budget(n_kept, kept, hit, buf[:cut], budget)
        buf = buf[cut:]
        state.update(
            (n_seen, n_kept, kept, hit, [t for t, _ in buf], [c for _, c in buf])
        )
        pn, pk, ph = _fold_budget(n_kept, kept, hit, buf, budget)
        yield pd.DataFrame(
            [
                {
                    "user_id": key[0],
                    "n_seen": n_seen,
                    "n_kept": pn,
                    "kept_cents": pk,
                    "budget_hit": ph,
                }
            ]
        )

    return (
        _budget_input(stream)
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=BUDGET_OUT_SCHEMA,
            stateStructType=BUDGET_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def tws_available() -> bool:
    """``transformWithStateInPandas``'s Python workers require the
    ``google.protobuf`` package (its state-server protocol is proto-
    encoded); this container doesn't ship it, so the TWS variant is
    environment-gated exactly like the Mongo/Neo4j live connectors —
    the semantics stay covered by the ``applyInPandasWithState``
    implementation above, which this build runs end-to-end."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def user_budget_cut_tws(
    stream: DataFrame, budget_cents: int = 150_000, watermark: str = "24 hours"
) -> DataFrame:
    """``user_budget_cut`` on Spark 4's ``transformWithStateInPandas``
    — the typed-state successor to ``applyInPandasWithState`` (named
    ValueState/ListState handles instead of one packed tuple; requires
    the RocksDB state store provider and the protobuf package, see
    ``tws_available``). Identical semantics and output schema to
    ``user_budget_cut``; a gated test asserts result equality when the
    environment supports both."""
    if not tws_available():
        raise NotImplementedError(
            "transformWithStateInPandas needs the google.protobuf package "
            "(absent in this environment); use user_budget_cut, which "
            "runs the same semantics on applyInPandasWithState"
        )
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    budget = int(budget_cents)

    class BudgetCut(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.agg = handle.getValueState(
                "agg",
                "n_seen bigint, n_kept bigint, kept_cents bigint, "
                "budget_hit boolean",
            )
            self.pending = handle.getListState(
                "pending", "ts_us bigint, cents bigint"
            )

        def handleInputRows(self, key, rows, timer_values):
            from bisect import bisect_right

            n_seen, n_kept, kept, hit = (
                tuple(self.agg.get())
                if self.agg.exists()
                else (0, 0, 0, False)
            )
            buf = (
                [(r[0], r[1]) for r in self.pending.get()]
                if self.pending.exists()
                else []
            )
            for pdf in rows:
                if not len(pdf):
                    continue
                n_seen += len(pdf)
                ts_us = (
                    pd.to_datetime(pdf["ts"])
                    .astype("datetime64[ns]")
                    .astype("int64")
                    // 1000
                )
                buf.extend(zip(ts_us.tolist(), pdf["cents"].tolist()))
            buf.sort()
            wm_us = timer_values.getCurrentWatermarkInMs() * 1000
            cut = bisect_right(buf, (wm_us, float("inf")))
            n_kept, kept, hit = _fold_budget(
                n_kept, kept, hit, buf[:cut], budget
            )
            buf = buf[cut:]
            self.agg.update((n_seen, n_kept, kept, hit))
            self.pending.clear()
            if buf:
                self.pending.put(buf)
            pn, pk, ph = _fold_budget(n_kept, kept, hit, buf, budget)
            yield pd.DataFrame(
                [
                    {
                        "user_id": key[0],
                        "n_seen": n_seen,
                        "n_kept": pn,
                        "kept_cents": pk,
                        "budget_hit": ph,
                    }
                ]
            )

        def close(self) -> None:
            pass

    return (
        _budget_input(stream)
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            BudgetCut(),
            outputStructType=BUDGET_OUT_SCHEMA,
            outputMode="Update",
            timeMode="EventTime",
        )
    )
