"""Interleaved OLD-tree vs NEW-tree A/B of registry queries (round 13).

tools/ab_measure.py interleaves queries in one process but can only
load ONE source tree; old-vs-new comparisons therefore ran back to
back and had to be normalized by the q1 calibration ratio (MEMORY:
bench-box-noise). This tool loads BOTH trees' registries into one
process (import each under a scrubbed sys.modules, keep both function
dicts alive) and times old/new ALTERNATELY inside each round, so both
sides share the identical JVM, page-cache and host phase — the same
guarantee the in-process config A/Bs had.

Usage:
    python tools/ab_two_trees.py <old_tree> <new_tree> <query> [...]

Env: AB_REPS (default 4), SPARK_GRAFT_SF_DIR, BENCH_ACTION=collect.
Prints per-round old/new seconds per query and the best-of summary
with new/old ratios.
"""

from __future__ import annotations

import os
import sys
import time


def _load_registry(tree: str):
    """Import ontario_spark from ``tree`` and return its all_queries()
    dict. Previously imported ontario_spark modules are dropped from
    sys.modules first so the import really binds to ``tree``; the
    returned dict keeps the module objects alive independently."""
    for m in [k for k in list(sys.modules) if k.startswith("ontario_spark")]:
        del sys.modules[m]
    sys.path.insert(0, tree)
    try:
        from ontario_spark.queries import all_queries

        return all_queries()
    finally:
        sys.path.remove(tree)


def main() -> None:
    if len(sys.argv) < 4:
        raise SystemExit(
            "usage: ab_two_trees.py <old_tree> <new_tree> <query> [...]"
        )
    old_tree, new_tree = os.path.abspath(sys.argv[1]), os.path.abspath(sys.argv[2])
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("AB_REPS", "4"))
    action = os.environ.get("BENCH_ACTION", "noop")

    reg_old = _load_registry(old_tree)
    reg_new = _load_registry(new_tree)
    for n in names:
        missing = [t for t, r in (("old", reg_old), ("new", reg_new)) if n not in r]
        if missing:
            raise SystemExit(f"{n} not in registry of: {missing}")

    # session module identity doesn't matter for timing; use the new side
    from ontario_spark.session import get_spark

    spark = get_spark("ab-two-trees")
    spark.sparkContext.setLogLevel("ERROR")
    from ontario_spark.data import TABLES, table

    for t in TABLES:
        try:
            table(spark, sf_dir, t).limit(1).collect()
        except Exception:
            pass
    from pyspark.sql import functions as F

    reg_new[names[0]](spark, sf_dir).limit(1).collect()
    spark.range(10_000).agg(F.sum(F.col("id").cast("decimal(18,6)"))).collect()
    spark.range(1_000).repartition(
        int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ).mapInPandas(lambda it: it, "id long").count()

    def run(reg, name: str) -> float:
        spark.catalog.clearCache()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        spark.sparkContext.setJobDescription(f"ab:{name}")
        t0 = time.perf_counter()
        df = reg[name](spark, sf_dir)
        if action == "collect":
            df.collect()
        else:
            df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        return dt

    best_old: dict[str, float] = {}
    best_new: dict[str, float] = {}
    for r in range(reps):
        parts = []
        for name in names:
            # alternate which side goes first round to round so warm-
            # position bias cancels instead of always favoring side 2
            order = (
                [("old", reg_old), ("new", reg_new)]
                if r % 2 == 0
                else [("new", reg_new), ("old", reg_old)]
            )
            got = {}
            for tag, reg in order:
                got[tag] = run(reg, name)
            best_old[name] = min(best_old.get(name, 1e9), got["old"])
            best_new[name] = min(best_new.get(name, 1e9), got["new"])
            parts.append(f"{name} old={got['old']:.3f} new={got['new']:.3f}")
        print(f"round {r}: " + " | ".join(parts), flush=True)
    print("--- best-of ---")
    for n in names:
        ratio = best_new[n] / best_old[n] if best_old[n] else float("nan")
        print(f"{n}\told={best_old[n]:.4f}\tnew={best_new[n]:.4f}\tnew/old={ratio:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
