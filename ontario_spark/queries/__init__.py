"""Aggregated query registry — the driver correctness surface.

Every module below contributes ``QUERIES`` (name → callable(spark,
sf_dir) → DataFrame) and ``ORACLE`` (name → DuckDB-runnable ANSI SQL;
may omit entries for non-SQL-expressible operators, which the driver
then checks rows-only).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_MODULES = [
    "ontario_spark.queries.tpch",
    "ontario_spark.queries.tpch_full",
    "ontario_spark.queries.tpch_shapes",
    "ontario_spark.queries.sparql_suite",
    "ontario_spark.queries.pipeline_suite",
    "ontario_spark.queries.streaming_suite",
]


def _load():
    import importlib

    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracle: dict[str, str] = {}
    for modname in _MODULES:
        mod = importlib.import_module(modname)
        for name, fn in getattr(mod, "QUERIES", {}).items():
            assert name not in queries, f"duplicate query name {name}"
            queries[name] = fn
        oracle.update(getattr(mod, "ORACLE", {}))
    return queries, oracle


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _load()[0]


def all_oracle_sql() -> dict[str, str]:
    return _load()[1]
