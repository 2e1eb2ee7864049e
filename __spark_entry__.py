"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` /
``oracle_sql()`` expose the full correctness surface (one entry per
implemented operator; see ontario_spark/queries/).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ontario_spark.queries import all_queries, driver_oracle_sql, driver_queries
from ontario_spark.session import tune

FLAGSHIP = "q3_shipping_priority"
SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    tune(spark)
    return all_queries()[FLAGSHIP](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Full registry with the curated 50-entry correctness surface
    ordered first (one entry per operator family, each with a DuckDB
    oracle — the driver checks the first 50; the rest follow so no
    query ever leaves the exported surface)."""
    return driver_queries()


def oracle_sql() -> dict[str, str]:
    return driver_oracle_sql()
