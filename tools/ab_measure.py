"""Interleaved solo measurement of registry queries (round 12).

The box's speed roams mid-session (MEMORY: bench-box-noise), so A/B
comparisons must interleave both sides in ONE process. Usage:

    python tools/ab_measure.py q1_pricing_summary dedup_simhash_pairs ...

Runs REPS rounds; each round times every named query once (noop sink,
guide §1.4), interleaved in the given order, clearing the cache between
queries exactly like bench.py. Prints per-query best-of and the full
per-round matrix so cross-round drift is visible. q1_pricing_summary is
worth including in every invocation as the calibration row.

Env: AB_REPS (default 3), SPARK_GRAFT_SF_DIR, BENCH_ACTION=collect to
reproduce the legacy timed action.
"""

from __future__ import annotations

import os
import sys
import time


def main() -> None:
    names = [n for n in sys.argv[1:] if n]
    if not names:
        raise SystemExit("usage: ab_measure.py <query> [<query> ...]")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("AB_REPS", "3"))
    action = os.environ.get("BENCH_ACTION", "noop")

    from ontario_spark.queries import all_queries
    from ontario_spark.session import get_spark

    queries = all_queries()
    unknown = sorted(set(names) - set(queries))
    if unknown:
        raise SystemExit(f"not in registry: {unknown}")
    spark = get_spark("ab-measure")
    spark.sparkContext.setLogLevel("ERROR")
    # same warmup as bench.py
    from ontario_spark.data import TABLES, table

    for t in TABLES:
        try:
            table(spark, sf_dir, t).limit(1).collect()
        except Exception:
            pass
    from pyspark.sql import functions as F

    queries[names[0]](spark, sf_dir).limit(1).collect()
    spark.range(10_000).agg(F.sum(F.col("id").cast("decimal(18,6)"))).collect()
    spark.range(1_000).repartition(
        int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ).mapInPandas(lambda it: it, "id long").count()

    rounds: list[dict[str, float]] = []
    for r in range(reps):
        row: dict[str, float] = {}
        for name in names:
            spark.catalog.clearCache()
            try:
                spark.sparkContext._jvm.System.gc()
            except Exception:
                pass
            spark.sparkContext.setJobDescription(f"ab:{name}")
            t0 = time.perf_counter()
            df = queries[name](spark, sf_dir)
            if action == "collect":
                df.collect()
            else:
                df.write.format("noop").mode("overwrite").save()
            row[name] = time.perf_counter() - t0
            spark.sparkContext.setJobDescription(None)
        rounds.append(row)
        print(
            f"round {r}: "
            + " ".join(f"{n}={row[n]:.3f}" for n in names),
            flush=True,
        )
    print("--- best-of ---")
    for n in names:
        print(f"{n}\t{min(r[n] for r in rounds):.4f}")
    spark.stop()


if __name__ == "__main__":
    main()
