"""REST_SERVICE source type.

The reference declares ``DataSourceType.REST_SERVICE``
(``ontario/model/__init__.py:7-50``) and gives it a planner cost
(``mediator/Tree.py:406``), but its webapi wrapper is an empty file —
the type was never executable. Here it is: a REST API serving JSON
rows is a first-class logical source. Rows are fetched driver-side
(REST payloads are bounded API responses, not lake tables), lifted via
``spark.read.json`` so nested payloads get real struct/array schemas,
and then flow through the SAME star compilation as any local source —
including RML iterators (``records[*]``) and nested reference paths.
"""

from __future__ import annotations

import json
from urllib.parse import urlencode
from urllib.request import Request, urlopen

from pyspark.sql import DataFrame, SparkSession


def fetch_json(
    url: str,
    params: dict[str, str] | None = None,
    timeout: float = 30.0,
    headers: dict[str, str] | None = None,
):
    """GET ``url`` and return the decoded JSON payload (list of row
    objects, or any JSON value — an RML iterator can descend into
    wrapper objects like ``{"results": [...]}``)."""
    if params:
        url = f"{url}{'&' if '?' in url else '?'}{urlencode(params)}"
    req = Request(url, headers={"Accept": "application/json", **(headers or {})})
    with urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read().decode("utf-8"))


def rest_executor(base_url: str, **fetch_kw):
    """``Catalog.executors`` entry for a ``rest`` source: maps a
    logical-source path (the triple map's ``table``) to JSON rows."""

    def run(path: str):
        url = f"{base_url.rstrip('/')}/{path.lstrip('/')}" if path not in ("", "-") else base_url
        payload = fetch_json(url, **fetch_kw)
        return payload if isinstance(payload, list) else [payload]

    return run


def rows_to_df(spark: SparkSession, rows: list) -> DataFrame:
    """JSON rows → DataFrame with inferred nested schema (structs and
    arrays survive, so iterator/paths work downstream). An EMPTY
    payload produces an empty (0-row) frame — schema inference needs a
    document, so a placeholder infers the (empty) schema and limit(0)
    drops it (round-5 review fix: the placeholder used to survive as a
    phantom row, fabricating a result for all-constant maps)."""
    payload = [json.dumps(r) for r in rows]
    if not payload:
        return spark.read.json(
            spark.sparkContext.parallelize(["{}"], 1)
        ).limit(0)
    return spark.read.json(spark.sparkContext.parallelize(payload, 1))
