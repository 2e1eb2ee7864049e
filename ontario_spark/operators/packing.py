"""Sequence packing: group documents into fixed token budgets.

Training-data prep packs many short documents into fixed-length
sequences (one bin ≈ one training sample). The packer here is the
deterministic streaming-fill variant: documents are ordered by a
stable key within a shard, and each document goes into the bin where
the running token total lands — ``bin = floor((cumsum - tokens) /
budget)``. Oversized documents still get a bin (they are truncated
downstream); bins can overflow by at most one document, the standard
greedy-fill behavior.

Scale design: a single global ordering would serialize into ONE
window partition, so documents are first sharded by a deterministic
md5 bucket of the key (``n_shards`` ≈ cluster parallelism) and packed
independently per shard — the window runs per shard, all shards in
parallel, and bin ids are (shard, local_bin) pairs. Reproducible:
same corpus + same key → identical packing on every engine (the
DuckDB oracle replicates it with the same window expression).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pack_sequences(
    df: DataFrame,
    key: str,
    tokens_col: str,
    budget: int,
    n_shards: int = 64,
) -> DataFrame:
    """Assign each row a (shard, bin, offset): ``shard`` is the md5
    bucket of ``key``, ``bin`` the greedy-fill bin within the shard,
    ``offset`` the token offset of this document inside its bin."""
    shard = (
        F.conv(F.substring(F.md5(F.col(key).cast("string")), 1, 6), 16, 10)
        .cast("long") % n_shards
    ).alias("shard")
    base = df.select(F.col(key), F.col(tokens_col).alias("__tok"), shard)
    w = Window.partitionBy("shard").orderBy(key)
    cum = F.sum("__tok").over(w)
    bin_id = F.floor((cum - F.col("__tok")) / F.lit(budget))
    out = base.select(
        key,
        "shard",
        bin_id.alias("bin"),
        (cum - F.col("__tok")).alias("__start"),
    )
    wb = Window.partitionBy("shard", "bin").orderBy(key)
    return out.select(
        key,
        "shard",
        "bin",
        (F.col("__start") - F.first("__start").over(wb)).alias("offset"),
    )


def pack_sql(table: str, key: str, tokens_col: str, budget: int,
             n_shards: int = 64) -> str:
    """ANSI/DuckDB oracle reproducing pack_sequences bit-for-bit."""
    return f"""
WITH base AS (
  SELECT {key},
         {tokens_col} AS tok,
         ('0x' || substr(md5(CAST({key} AS VARCHAR)), 1, 6))::BIGINT
           % {n_shards} AS shard
  FROM {table}
), cums AS (
  SELECT {key}, shard,
         CAST(SUM(tok) OVER (PARTITION BY shard ORDER BY {key}) - tok
              AS BIGINT) AS start
  FROM base
)
SELECT {key}, shard,
       CAST(FLOOR(CAST(start AS DOUBLE) / {budget}) AS BIGINT) AS bin,
       CAST(start - MIN(start) OVER (
         PARTITION BY shard,
           CAST(FLOOR(CAST(start AS DOUBLE) / {budget}) AS BIGINT)
       ) AS BIGINT) AS offset
FROM cums
"""
