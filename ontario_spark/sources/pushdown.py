"""Bound-join (dependent join) pushdown for remote sources.

Ports the semantics of the reference's ``NestedHashJoinFilter``
(ANAPSID/FedX-style bound join, ``ontario/operators/nonblocking/
NestedHashJoinFilter.py``): buffer build-side join values into batches
of ``WINDOW_SIZE`` (:20 — default 20) and rewrite the probe-side query
with the observed values (``makeInstantiation`` :166-234, which emits
``FILTER ((?v=<x1> && ...) || ...)``; we emit the equivalent SPARQL 1.1
``VALUES`` block).

For Spark-resident data this operator is pointless — a plain ``join``
with AQE/DPP subsumes it (SURVEY.md §2.1). It exists ONLY for remote
sources where shipping the full right side would dominate: collect the
distinct build keys (bounded by ``max_keys``), push them into the
remote query in batches, union the batch results, then join locally.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# executor: (query_text) -> list of solution-mapping dicts
RemoteExecutor = Callable[[str], list[dict[str, str | None]]]

WINDOW_SIZE = 20  # reference default batch size


class PushdownError(Exception):
    pass


def values_block(var: str, keys: list[str], iri: bool = True) -> str:
    terms = " ".join(f"<{k}>" if iri else f'"{k}"' for k in keys)
    return f"VALUES ?{var} {{ {terms} }}"


def instantiate_query(query: str, var: str, keys: list[str], iri: bool = True) -> str:
    """Inject a VALUES block binding ``var`` to ``keys`` into the
    query's outermost group graph pattern."""
    idx = query.find("{")
    if idx < 0:
        raise PushdownError("query has no group graph pattern")
    return query[: idx + 1] + " " + values_block(var, keys, iri) + " " + query[idx + 1 :]


def bound_join_fetch(
    spark: SparkSession,
    build: DataFrame,
    join_var: str,
    remote_query: str,
    remote_vars: list[str],
    executor: RemoteExecutor,
    window_size: int = WINDOW_SIZE,
    max_keys: int = 100_000,
    iri: bool = True,
) -> DataFrame:
    """Fetch only the remote bindings that can join: distinct build-side
    keys → VALUES-batched remote queries → unioned DataFrame.

    ``max_keys`` guards the driver: beyond it, fall back to the
    unfiltered remote query (same fallback posture as the reference's
    non-selective path)."""
    keys = [
        r[0]
        for r in build.select(join_var).distinct().limit(max_keys + 1).collect()
        if r[0] is not None
    ]
    if len(keys) > max_keys:
        queries = [remote_query]
    else:
        keys.sort()
        queries = [
            instantiate_query(remote_query, join_var, keys[i : i + window_size], iri)
            for i in range(0, len(keys), window_size)
        ]
    rows: list[tuple] = []
    for q in queries:
        for b in executor(q):
            rows.append(tuple(b.get(v) for v in remote_vars))
    schema = ", ".join(f"{v} string" for v in remote_vars)
    return spark.createDataFrame(rows, schema=schema)


def bound_join(
    spark: SparkSession,
    build: DataFrame,
    join_var: str,
    remote_query: str,
    remote_vars: list[str],
    executor: RemoteExecutor,
    how: str = "inner",
    **kw,
) -> DataFrame:
    """Full dependent join: fetch the matching remote slice, then join
    locally (Catalyst picks broadcast for the typically-small fetched
    side)."""
    fetched = bound_join_fetch(
        spark, build, join_var, remote_query, remote_vars, executor, **kw
    )
    return build.join(fetched, on=join_var, how=how)
