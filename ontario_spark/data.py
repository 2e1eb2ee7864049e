"""Test-data table loading (driver-generated parquet per TESTDATA.md)."""

from __future__ import annotations

from weakref import WeakKeyDictionary

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def events_ts_kind(path: str) -> str:
    """How ``events.parquet`` physically stores ``ts``: ``"nanos"`` when
    the footer declares TIMESTAMP(NANOS) (which Spark's vectorized
    reader rejects without the nanosAsLong escape hatch), else
    ``"native"`` (µs/ms timestamps Spark reads directly). Driven by the
    parquet footer, not an assumption — the generator has shipped both
    encodings across rounds. Falls back to ``"native"`` when the footer
    isn't locally readable (e.g. a remote URI): the common case, and the
    nanos branch exists only for the legacy local fixture."""
    try:
        import pyarrow.parquet as pq

        return (
            "nanos"
            if str(pq.read_schema(path).field("ts").type) == "timestamp[ns]"
            else "native"
        )
    except Exception:
        return "native"


# One DataFrame per (session, dir, table). spark.read.parquet re-lists
# the directory and re-reads footers for schema inference on every call
# (~0.1 s each); reusing the immutable base plan skips that. Keyed
# weakly on the session so a stopped session's plans are collectable.
_table_cache: "WeakKeyDictionary[SparkSession, dict[tuple[str, str], DataFrame]]" = (
    WeakKeyDictionary()
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    per_session = _table_cache.setdefault(spark, {})
    key = (sf_dir, name)
    df = per_session.get(key)
    if df is not None:
        return df
    if name == "events" and events_ts_kind(f"{sf_dir}/{name}.parquet") == "nanos":
        # Legacy fixture: ts is TIMESTAMP(NANOS), which Spark's vectorized
        # parquet reader rejects. Read nanos as long and truncate to
        # microseconds — byte-identical with DuckDB's ns→µs truncation.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    else:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    per_session[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql access."""
    for t in TABLES:
        table(spark, sf_dir, t).createOrReplaceTempView(t)
