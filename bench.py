"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from ontario_spark.queries import all_queries
    from ontario_spark.session import get_spark

    spark = get_spark("ontario-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    queries = all_queries()
    headline = os.environ.get("BENCH_QUERIES")
    names = headline.split(",") if headline else sorted(queries)

    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    # Warm the JVM, codegen, and every table's parquet footer once so
    # per-query numbers measure the query, not session startup or
    # first-file-open (otherwise the first query to touch the largest
    # table absorbs a multi-second one-off cost).
    from ontario_spark.data import TABLES, table

    for t in TABLES:
        try:
            table(spark, sf_dir, t).limit(1).collect()
        except Exception:
            pass
    queries[names[0]](spark, sf_dir).limit(1).collect()

    for name in names:
        t0 = time.perf_counter()
        out = queries[name](spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 4)
        rows[name] = len(out)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline-suite wall time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "rows": rows,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
