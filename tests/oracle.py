"""Mirror of the driver's correctness check: run the Spark query and the
DuckDB oracle SQL over the same parquet tables, then compare row count,
column names, and order-insensitive values."""

from __future__ import annotations

import hashlib
import math
import os

import duckdb
import pandas as pd

from ontario_spark.data import TABLES

# Disk cache for oracle results, keyed on (sql, data files' mtime+size):
# the sf0.1 gate re-runs ~110 DuckDB queries (~35 s) every pytest
# session over parquet that never changes — caching them makes the
# default-on gate pay only for the Spark side it exists to check. A
# stale-cache false MATCH is impossible (the cache only feeds the
# oracle side; a corrupted entry makes the comparison fail loudly).
_CACHE_DIR = os.environ.get("ONTARIO_ORACLE_CACHE", "/tmp/ontario_oracle_cache")


def _cache_path(sql: str, sf_dir: str) -> str | None:
    try:
        sig = [sql, sf_dir]
        for t in TABLES:
            p = f"{sf_dir}/{t}.parquet"
            st = os.stat(p)
            sig.append(f"{t}:{st.st_mtime_ns}:{st.st_size}")
        key = hashlib.md5("|".join(sig).encode()).hexdigest()
        return os.path.join(_CACHE_DIR, f"{key}.parquet")
    except OSError:
        return None


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    path = _cache_path(sql, sf_dir)
    if path and os.path.exists(path):
        try:
            return pd.read_parquet(path)
        except Exception:
            pass  # unreadable entry → recompute
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        df = con.execute(sql).df()
    finally:
        con.close()
    if path:
        try:
            os.makedirs(_CACHE_DIR, exist_ok=True)
            tmp = f"{path}.tmp.{os.getpid()}"
            df.to_parquet(tmp)
            os.replace(tmp, path)  # atomic under concurrent pytest
        except Exception:
            pass  # non-parquet-able dtype etc. → just skip caching
    return df


def _canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = []
    for row in df.itertuples(index=False):
        canon_row = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                canon_row.append(None)
            elif isinstance(v, float):
                canon_row.append(repr(float(v)))
            elif isinstance(v, pd.Timestamp):
                canon_row.append(v.isoformat())
            elif hasattr(v, "isoformat"):
                canon_row.append(v.isoformat())
            elif isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
                canon_row.append(tuple(repr(float(x)) for x in v))
            else:
                canon_row.append(repr(v))
        rows.append(tuple(canon_row))
    # None sorts before any string (tuples may mix None with repr strs)
    return sorted(rows, key=lambda r: tuple((v is not None, v or "") for v in r))


def assert_match(spark_df, oracle_df: pd.DataFrame, name: str = "") -> None:
    sp = spark_df.toPandas()
    assert len(sp) == len(oracle_df), (
        f"{name}: row count {len(sp)} (spark) != {len(oracle_df)} (oracle)"
    )
    assert sorted(sp.columns) == sorted(oracle_df.columns), (
        f"{name}: columns {sorted(sp.columns)} != {sorted(oracle_df.columns)}"
    )
    a, b = _canon(sp), _canon(oracle_df)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, f"{name}: {len(mismatches)} row mismatches; first: {mismatches[:3]}"
