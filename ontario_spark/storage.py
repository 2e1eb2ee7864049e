"""Physical-layout utilities for shuffle avoidance at scale.

The reference has no storage layer at all — every leaf re-reads raw
files per query (``ontario/wrappers/spark/sparql2spark.py:120-138``).
At 100 TB the dominant costs are join/agg shuffles, so this module
provides the two standard layout levers:

- ``write_bucketed`` / ``read_bucketed``: persist a table hash-bucketed
  (and sorted) by its join key. Two tables bucketed the same way join
  with ZERO exchange — the sort-merge join reads co-located buckets
  directly. This is how a lake would store lineitem/orders for repeated
  key joins.
- ``salted_join``: explicit skew mitigation for the cases AQE's runtime
  skew splitting can't fix (e.g. a single hot key on the build side of
  a shuffled join): the left side scatters each hot key across
  ``salt`` sub-keys, the right side replicates matching rows to all
  sub-keys, restoring balance at the cost of replicating only the
  right-side rows of hot keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    buckets: int,
    sort: bool = True,
) -> None:
    """Persist as a bucketed (+sorted) managed parquet table. Bucket
    count should match downstream ``shuffle.partitions`` scale — at
    100 TB think thousands of buckets, sized so one bucket fits an
    executor core's memory."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join on ``key``: left rows get a
    deterministic content-derived salt in [0, salt); right rows are
    replicated to every salt value. Result is row-identical to
    ``left.join(right, key, how)`` for inner/left joins.

    The salt hashes the ROW CONTENT (every left column), never a
    nondeterministic expression: a ``monotonically_increasing_id``
    salt keyed the shuffle on task-attempt-dependent values, so a lost
    executor + retried map task re-hashed rows to different reducers
    than the already-fetched shuffle files — duplicated/lost rows
    (SPARK-23207 class; round-5 review fix). Identical duplicate rows
    share a salt — the hot key still spreads by the payload variety
    that made it hot.

    Use when one key's row count dwarfs the rest; plain AQE skew-join
    only splits map-side partitions and cannot help when a single key
    exceeds one task's capacity on BOTH sides."""
    if how not in ("inner", "left", "left_outer", "leftouter",
                   "left_semi", "leftsemi", "left_anti", "leftanti"):
        # right/full outer would emit each unmatched right row once PER
        # SALT value — refuse instead of silently corrupting
        raise ValueError(f"salted_join does not support how={how!r}")
    # xxhash64 rejects MAP- (and VARIANT-) typed inputs, even nested
    # inside arrays/structs — those columns enter the salt through a
    # to_json projection instead of being dropped (round-6 review
    # fixes: a map-bearing frame failed analysis; then excluding the
    # map entirely made the salt a pure function of the key whenever
    # hot-key rows differ ONLY in the map — no skew relief at all).
    # Both forms are schema-derived and deterministic per row content,
    # so retried tasks hash identically.
    inputs = [
        F.col(f.name) if _hash_safe(f.dataType) else F.to_json(f.name)
        for f in left.schema.fields
    ]
    salt_col = F.pmod(F.xxhash64(*inputs), F.lit(salt))
    l = left.withColumn("__salt", salt_col.cast("int"))
    r = right.withColumn(
        "__salt", F.explode(F.array([F.lit(i) for i in range(salt)]))
    )
    out = l.join(r, on=[key, "__salt"], how=how)
    return out.drop("__salt")


def _hash_safe(dt) -> bool:
    """True when ``xxhash64`` accepts the type: MAP (and VARIANT) are
    prohibited at any nesting depth (DATATYPE_MISMATCH.HASH_MAP_TYPE)."""
    from pyspark.sql import types as T

    if isinstance(dt, T.MapType) or type(dt).__name__ == "VariantType":
        return False
    if isinstance(dt, T.ArrayType):
        return _hash_safe(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(_hash_safe(f.dataType) for f in dt.fields)
    return True


def key_skew_profile(
    df: DataFrame, key: str, top: int = 10
) -> DataFrame:
    """Join/shuffle-key skew diagnostic: the ``top`` heaviest keys with
    row count and share of total — what you run BEFORE sizing
    ``salted_join``'s salt or a bucketing layout, and the first
    question asked when one straggler task dominates a 1000-executor
    stage. One aggregation + a broadcast scalar total; the top-k is a
    ``TakeOrderedAndProject``, never a full sort."""
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            key,
            "cnt",
            (F.col("cnt").cast("double") / F.col("__total").cast("double")
             ).alias("share"),
        )
        .orderBy(F.desc("cnt"), F.asc(key))
        .limit(top)
    )


def profile_table(df: DataFrame, columns: "list[str] | None" = None) -> DataFrame:
    """Column-level data profile — ``(column, n_rows, n_nulls,
    n_distinct, min_value, max_value)`` with min/max rendered as
    strings so heterogeneous column types stack in one long-format
    result. The first look at any new lake table: null soup, constant
    columns, and key-cardinality candidates fall straight out.

    Scale shape: ONE pass — a single aggregation computes every
    column's counts/extremes (count/min/max are map-side combinable;
    exact distincts are one expand per column, the same cost class as
    GROUPING SETS), then a literal unpivot via stack(). No per-column
    scans, no driver loops."""
    cols = columns if columns is not None else df.columns
    # internal aliases are POSITIONAL (__nn_0, not __nn_<name>): name-
    # derived aliases break on case-colliding source columns ('k'/'K'
    # are distinct parquet columns but ambiguous to Spark's default
    # case-insensitive resolution), and the display name enters the
    # stack() literal escaped — arbitrary external lake schemas are
    # exactly this operator's input (round-6 review fix)
    all_cols = df.columns
    missing = [c for c in cols if c not in all_cols]
    if missing:
        raise ValueError(f"profile_table: unknown columns {missing}")
    # rename POSITIONALLY before touching anything by name: F.col('k')
    # is AMBIGUOUS when the table also has 'K' (Spark resolves names
    # case-insensitively by default, and df[ordinal] re-resolves by
    # name under the hood); toDF renames by position, no resolution
    safe = df.toDF(*[f"__c{i}" for i in range(len(all_cols))])
    ords = [all_cols.index(c) for c in cols]  # exact-case match
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, o in enumerate(ords):
        r = F.col(f"__c{o}")
        aggs.append(F.count(r).alias(f"__nn_{i}"))
        aggs.append(F.countDistinct(r).alias(f"__nd_{i}"))
        aggs.append(F.min(r).cast("string").alias(f"__min_{i}"))
        aggs.append(F.max(r).cast("string").alias(f"__max_{i}"))
    one = safe.agg(*aggs)
    parts = []
    for i, c in enumerate(cols):
        lit = c.replace("\\", "\\\\").replace("'", "\\'")
        parts.append(
            f"'{lit}', __n - `__nn_{i}`, `__nd_{i}`, `__min_{i}`, `__max_{i}`"
        )
    stacked = one.select(
        F.col("__n").alias("n_rows"),
        F.expr(
            f"stack({len(cols)}, {', '.join(parts)}) AS "
            "(column, n_nulls, n_distinct, min_value, max_value)"
        ),
    )
    return stacked.select(
        "column", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value"
    )


def compact_files(
    spark: SparkSession,
    path: str,
    target_mb: int = 512,
    fmt: str = "parquet",
) -> int:
    """Small-file compaction: rewrite a dataset directory into
    ``ceil(total_bytes / target_mb)`` files — the lake-maintenance task
    that keeps scan parallelism healthy (thousands of kilobyte files
    per partition destroy split planning and NameNode/listing
    latency; files ≫ HDFS-block size serialize column reads).

    Returns the output file count. All filesystem operations go
    through the Hadoop FileSystem API, so HDFS/s3a/local paths all
    work (round-6 review fix: shutil only handled local paths). The
    rewrite stages into ``<path>.__compact__``; the swap is two
    metadata renames (source → ``.__old__``, staged → source) so a
    crash at any point leaves either the original or a recoverable
    ``.__old__`` copy — never a half-deleted source. Hive-partitioned
    datasets are REFUSED (flattening them would destroy partition
    pruning and bake inferred partition values into the data) —
    compact each leaf partition directory instead. Uses coalesce (no
    shuffle); each output file concatenates inputs, row order within
    files may change, content never does."""
    import math

    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(hconf)

    src = spark.read.format(fmt).load(path)
    # Partition detection must compare NORMALIZED paths: inputFiles()
    # returns fully-qualified URIs (file:///…, hdfs://nn/…) while the
    # caller usually passes a bare path, so a naive prefix slice leaks
    # the source directory's own components into the '=' check and
    # falsely refuses leaf partition dirs like …/p=0 (round-6
    # seventh-review fix). toUri().getPath() strips scheme+authority
    # on both sides.
    norm_src = jpath.toUri().getPath().rstrip("/")
    rel = []
    for f in src.inputFiles():
        fp = jvm.org.apache.hadoop.fs.Path(f).toUri().getPath()
        rel.append(fp[len(norm_src):] if fp.startswith(norm_src) else fp)
    if any("=" in part for f in rel for part in f.split("/")[:-1]):
        raise ValueError(
            "compact_files: dataset under "
            f"{path!r} is Hive-partitioned; compact each leaf "
            "partition directory instead of flattening the layout"
        )
    # ONE metadata call for the total, not one round trip per file
    fs_total = fs.getContentSummary(jpath).getLength()
    n_out = max(1, math.ceil(fs_total / (target_mb * 1024 * 1024)))

    tmp = path.rstrip("/") + ".__compact__"
    old = path.rstrip("/") + ".__old__"
    jtmp = jvm.org.apache.hadoop.fs.Path(tmp)
    jold = jvm.org.apache.hadoop.fs.Path(old)
    src.coalesce(n_out).write.mode("overwrite").format(fmt).save(tmp)
    out_n = len(spark.read.format(fmt).load(tmp).inputFiles())
    if fs.exists(jold):
        fs.delete(jold, True)
    if not fs.rename(jpath, jold):
        raise IOError(f"compact_files: could not stage {path} aside")
    if not fs.rename(jtmp, jpath):
        # restore the original before failing
        fs.rename(jold, jpath)
        raise IOError(f"compact_files: could not swap in {tmp}")
    fs.delete(jold, True)
    return out_n


def zorder_key(cols: "list[str]", bits: int = 16) -> Column:
    """Z-order (Morton) interleave of the low ``bits`` bits of the
    given non-negative integer columns — the lakehouse layout-
    clustering key: writing a table sorted by this key gives every
    file a bounded min/max RANGE in EVERY listed dimension at once, so
    scans filtering on ANY of them prune files (a single-column sort
    clusters only that column; filters on the others read everything).

    Pure bit-shift column expressions (codegen, no UDF), identical in
    DuckDB (``zorder_key_sql``) so layouts derived on either engine
    agree. Columns are masked to ``bits`` bits — callers bucket or
    rank wider domains first (interleaving raw 64-bit keys would
    overflow one long at 2 × 33 bits)."""
    if not cols or len(cols) * bits > 63:
        raise ValueError(f"need 1+ cols with cols*bits <= 63, got {cols}/{bits}")
    n = len(cols)
    terms = []
    for j, c in enumerate(cols):
        masked = F.col(c).bitwiseAND(F.lit((1 << bits) - 1))
        for i in range(bits):
            # bit i of column j lands at interleaved position i*n + j
            terms.append(
                F.shiftleft(
                    F.shiftright(masked, i).bitwiseAND(F.lit(1)).cast("long"),
                    i * n + j,
                )
            )
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out


def zorder_key_sql(cols: "list[str]", bits: int = 16) -> str:
    """DuckDB expression replicating ``zorder_key`` bit-for-bit."""
    n = len(cols)
    terms = []
    for j, c in enumerate(cols):
        masked = f"({c} & {(1 << bits) - 1})"
        for i in range(bits):
            terms.append(f"(((({masked} >> {i}) & 1)) << {i * n + j})")
    return "(" + " | ".join(terms) + ")"
