"""SparkSession construction tuned for the engine.

The reference creates ONE SparkSession per leaf subquery and collects
every intermediate result to the driver
(``ontario/wrappers/spark/sparql2spark.py:103-110,178-180``). The single
biggest architectural win of the rebuild is one shared session with lazy
DataFrames end-to-end; these settings make that session scale-ready:

- AQE on (runtime re-plan == the reference's hand-built adaptivity in
  Xgjoin's three stages), incl. skew-join splitting.
- Arrow transfer on, for the Pandas-UDF slow paths.
- shuffle partitions sized by env (driver runs local[$SPARK_GRAFT_CPUS]).
"""

from __future__ import annotations

import os
import threading

from pyspark.sql import SparkSession

# Serializes set-execute-restore cycles on session-GLOBAL SQL confs
# (spark.sql.shuffle.partitions in streaming replays and connected
# components): two concurrent cycles interleaving reads and restores
# can permanently pin the wrong value for the whole session (round-5
# review fix). Holders keep it for the duration of their run — a
# correctness lock, not a fast path.
CONF_LOCK = threading.Lock()


def get_spark(app_name: str = "ontario-spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable tunings to an externally provided session
    (the driver hands us its own session in ``__spark_entry__``)."""
    safe = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
    }
    for k, v in safe.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static conf on this build — fine, defaults are close
    return spark
