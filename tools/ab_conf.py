"""Interleaved A/B of RUNTIME-SETTABLE session confs (round 13).

Same one-process discipline as ab_measure.py, but each round times
every named query under conf side A (session defaults) and side B
(the overrides), restoring A after each B run. Both sides share the
JVM, page cache, and host phase.

Usage:
    AB_CONF="k=v;k2=v2" python tools/ab_conf.py <query> [...]

Env: AB_REPS (default 3), SPARK_GRAFT_SF_DIR, BENCH_ACTION.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = [n for n in sys.argv[1:] if n]
    conf = dict(
        kv.split("=", 1)
        for kv in os.environ.get("AB_CONF", "").split(";")
        if "=" in kv
    )
    if not names or not conf:
        raise SystemExit("usage: AB_CONF='k=v;...' ab_conf.py <query> [...]")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("AB_REPS", "3"))
    action = os.environ.get("BENCH_ACTION", "noop")

    from ontario_spark.queries import all_queries
    from ontario_spark.session import get_spark

    queries = all_queries()
    unknown = sorted(set(names) - set(queries))
    if unknown:
        raise SystemExit(f"not in registry: {unknown}")
    spark = get_spark("ab-conf")
    spark.sparkContext.setLogLevel("ERROR")
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

    base = {k: spark.conf.get(k, None) for k in conf}

    def run(name: str) -> float:
        spark.catalog.clearCache()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        spark.sparkContext.setJobDescription(f"abconf:{name}")
        t0 = time.perf_counter()
        df = queries[name](spark, sf_dir)
        if action == "collect":
            df.collect()
        else:
            df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        return dt

    best_a: dict[str, float] = {}
    best_b: dict[str, float] = {}
    for r in range(reps):
        parts = []
        for name in names:
            got = {}
            sides = ["a", "b"] if r % 2 == 0 else ["b", "a"]
            for side in sides:
                if side == "b":
                    for k, v in conf.items():
                        spark.conf.set(k, v)
                else:
                    for k, v in base.items():
                        if v is None:
                            spark.conf.unset(k)
                        else:
                            spark.conf.set(k, v)
                got[side] = run(name)
            # restore defaults before moving on
            for k, v in base.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
            best_a[name] = min(best_a.get(name, 1e9), got["a"])
            best_b[name] = min(best_b.get(name, 1e9), got["b"])
            parts.append(f"{name} a={got['a']:.3f} b={got['b']:.3f}")
        print(f"round {r}: " + " | ".join(parts), flush=True)
    print("--- best-of ---")
    for n in names:
        ratio = best_b[n] / best_a[n] if best_a[n] else float("nan")
        print(f"{n}\ta={best_a[n]:.4f}\tb={best_b[n]:.4f}\tb/a={ratio:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
