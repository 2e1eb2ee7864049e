"""Production JDBC fetch path for SQL-backed sources.

The translator seam (``Catalog.executors``) accepts any callable
``sql_text → rows``; for tests those are DuckDB stand-ins that collect
row dicts on the driver. This module provides the path a deployment
uses: Spark's own JDBC data source, so the translated star SQL runs on
the remote database and lands DIRECTLY in executor memory as a
DataFrame — never collected to the driver — with partitioned parallel
reads (``predicates`` / ``partitionColumn`` splits, one connection per
partition, the Spark-native equivalent of the reference's hand-rolled
parallel connections in ``wrappers/mysql/sparql2sql.py:108-166``).

At 100 TB-lake scale the remote SQL slice may itself be large; the
partitioned read keeps the fetch parallel and the result distributed,
and downstream star joins consume it like any other DataFrame leaf.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def jdbc_query_df(
    spark: SparkSession,
    url: str,
    sql: str,
    *,
    properties: dict[str, str] | None = None,
    predicates: list[str] | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetch_size: int = 1000,
) -> DataFrame:
    """Run ``sql`` on the database behind ``url`` via Spark JDBC.

    Three fetch shapes, most to least preferred at scale:
    - ``predicates``: one partition per predicate string (arbitrary
      disjoint slices — date ranges, hash buckets, shard ids);
    - ``partition_column`` + bounds: Spark generates ``numPartitions``
      range predicates on a numeric column;
    - neither: single-connection fetch (small dimension slices).
    """
    props = dict(properties or {})
    props.setdefault("fetchsize", str(fetch_size))
    if predicates:
        return spark.read.jdbc(
            url=url,
            table=f"({sql}) AS q",
            predicates=list(predicates),
            properties=props,
        )
    opts: dict[str, str] = {"url": url, **props}
    if partition_column is not None:
        # partitionColumn requires dbtable (not query)
        opts.update(
            dbtable=f"({sql}) AS q",
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions or 8),
        )
    else:
        opts["query"] = sql
    return spark.read.format("jdbc").options(**opts).load()


def jdbc_executor(
    spark: SparkSession,
    url: str,
    properties: dict[str, str] | None = None,
    predicates_for: object | None = None,
    **kw,
):
    """Build a ``Catalog.executors`` entry backed by Spark JDBC.

    Returns a callable ``sql → DataFrame`` (flagged
    ``returns_dataframe``) — the star compiler lifts the DataFrame
    into a BFrame without a driver-side collect. ``predicates_for``
    optionally maps the translated SQL to a list of partition
    predicates (e.g. hash buckets on the subject key)."""

    def run(sql: str) -> DataFrame:
        preds = predicates_for(sql) if predicates_for is not None else None
        return jdbc_query_df(
            spark, url, sql, properties=properties, predicates=preds, **kw
        )

    run.returns_dataframe = True
    return run
