"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
compact JSON line: {"metric": ..., "value": headline_sec, "unit": "sec",
"queries": {name: centisec_int, ...}, "qunit": "cs", "action": ...,
"sf": ..., "n_queries": N, "full_value": ..., "full_n_queries": ...,
"calibration": {...}}. The stdout "queries" dict (round-13 verdict task
1 — rounds 1-12 printed it empty and the driver's per-query/scaling
analysis came back blank) carries the 50-row DRIVER_SURFACE — exactly
the rows the driver independently verifies against the oracle — as
CENTISECOND INTEGERS with compact separators: the driver captures only
a 2000-char stdout tail, and the full 70-name headline map measures
~2000 chars even at 1-centisecond precision (name bytes dominate),
while the surface map stays ≤~1600 chars at 10x-slow-box values.
Cross-run ratios (round-over-round, 32c/8c scaling) are unit-invariant,
so centiseconds compare cleanly; "qunit" marks the unit and "action"
the timed action. Full per-query float timings + row counts for ALL
registry rows are still written to BENCH.json next to this file.

Two suite numbers (round-9 verdict tasks 4+5):

- ``value`` — the FROZEN headline suite (HEADLINE_SUITE below): the
  round-4 anchor surface plus one representative per operator family
  added since. Every operator still runs and is timed, but adding a
  new registry query no longer inflates the headline number, so the
  cross-round trend (and the BASELINE comparison) reads directly.
- ``full_value`` — the whole registry, for coverage-weighted reading.
- ``calibration`` — three pinned queries whose code has been stable
  since round 4; ``tools/bench_diff.py`` uses their cross-snapshot
  ratio as the box-speed factor to report calibration-adjusted
  regressions (the VM's speed drifts round to round).
"""

from __future__ import annotations

import json
import os
import sys
import time

# FROZEN headline suite — do not grow this list when adding operators;
# new queries join the full registry (always measured, reported via
# full_value/BENCH.json) and only a NEW operator family may add its one
# representative here. Composition: the 50-query round-4 driver surface
# (the BENCH_r04 anchor the cross-round trend is pinned to) + one per
# family added r5-r9.
HEADLINE_SUITE = [
    # --- round-4 anchor surface (50) ---
    "sample_corpus_mix", "dedup_exact", "dedup_ngram_jaccard",
    "dedup_clusters", "dedup_boilerplate", "minhash_lsh_pairs",
    "simhash_fingerprints", "ann_topk_bruteforce", "ann_topk_bucketed",
    "emb_neardup_pairs", "text_metrics", "bm25_topk", "mm_decode_stats",
    "sketch_hll_check", "events_asof_join", "events_range_pairs",
    "stream_click_purchase", "stream_dedup", "stream_enriched_segments",
    "stream_events_hourly", "stream_user_sessions", "stream_user_gaps",
    "sparql_group_by_expr", "sparql_agg_distinct", "sparql_named_graph",
    "sparql_subquery", "sparql_path_closure", "sparql_values_inline",
    "sparql_minus_setop", "sparql_exists_filter", "sparql_federated_join",
    "sparql_mongo_join", "sparql_service_join", "sparql_star_filter",
    "sparql_star_join", "sparql_optional", "sparql_source_union",
    "sparql_distinct_orderby_page", "sparql_filter_functions",
    "sparql_date_filter_bind", "sparql_construct", "sparql_ask",
    "sparql_aggregate", "sparql_lineitem_star", "sparql_nested_iterator",
    "sparql_describe", "q1_pricing_summary", "q3_shipping_priority",
    "q_top_orders_per_customer", "q_rollup_flag_status",
    # --- one per post-r4 family (19) ---
    "dedup_containment_anchors",   # containment / anchors scale path
    "dedup_cdc_chunks",            # content-defined chunk dedup
    "dedup_winnow_pairs",          # winnowing fingerprint overlap
    "contamination_bloom",         # bloom-prefilter decontamination
    "semantic_dedup",              # embedding near-dup → clusters
    "emb_cluster_assign",          # seeded deterministic clustering
    "ann_topk_ivfpq",              # quantized ANN tier
    "retrieval_rrf_fusion",        # hybrid retrieval fusion
    "train_hard_negatives",        # mining composition
    "events_pagerank",             # iterative graph analytics
    "events_sessions",             # batch sessionization
    "corpus_snapshot_diff",        # dataset versioning
    "sample_weighted_topk",        # weighted sampling
    "text_perplexity",             # LM-score text filtering
    "text_regex_tokens",           # BPE-ish token counting
    "stream_budget_cut",           # custom stateful streaming
    "q_zorder_layout",             # storage layout keys
    "lslod_cq6_trisource",         # three-engine federation
    "pipeline_decontaminated_corpus",  # composed pipelines
    # --- round-10 continuation: one NEW family (offline evaluation) ---
    "eval_retrieval_ndcg",         # retrieval-quality eval
]

# Pinned box-speed calibration: stable-code queries present since
# round 4, used by tools/bench_diff.py to separate VM drift from real
# regressions. NEVER rename or re-implement these without updating the
# cross-round normalization story in SCALE.md.
CALIBRATION = ("q1_pricing_summary", "q3_shipping_priority", "events_asof_join")


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
    # Timed action (round 12, optimization guide §1.4): the default
    # times `df.write.format("noop")` — every column of every row is
    # computed and discarded, so the number measures the ENGINE's work,
    # not the driver-side row-path serialization of collect() (measured
    # ~22 s across the registry for the ≥50k-row results at sf0.1 —
    # e.g. lslod_cq4 returns 600k rows and spent most of its 2.4 s
    # pickling them into Python). BENCH_ACTION=collect reproduces the
    # r1-r11 methodology exactly; OPTIMIZATION_r12.md records the
    # same-code numbers under both actions, and the tracked
    # BENCH_COLLECT_r12.json snapshot keeps the old-methodology trend
    # line intact. Row counts still come from one untimed count() per
    # query after the repeats.
    action = os.environ.get("BENCH_ACTION", "noop")
    for name in names:
        # Clear persisted intermediates BETWEEN queries (operators like
        # LSH/Jaccard persist hot intermediates; 88 queries × repeats
        # accumulate cache entries whose LRU eviction perturbs later
        # timings) but NOT between repeats — best-of-N is a warm
        # measurement by design.
        spark.catalog.clearCache()
        # Fire the driver-side ContextCleaner between queries: with a
        # 16g heap the old gen almost never collects during a 238-query
        # run, so dereferenced broadcasts/shuffle files/accumulators
        # pile up executor-side and later queries degrade (measured:
        # ann_topk_ivfpq 1.9 s solo vs 3.3-5.0 s mid-run; the GC cuts
        # the same block's inflation roughly in half). Untimed — runs
        # between queries, never inside the measured region.
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        spark.sparkContext.setJobDescription(f"bench:{name}")
        best = float("inf")
        for _ in range(max(repeat, 1)):
            t0 = time.perf_counter()
            df = queries[name](spark, sf_dir)
            if action == "collect":
                out = df.collect()
            else:
                df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
        rows[name] = len(out) if action == "collect" else df.count()
        spark.sparkContext.setJobDescription(None)

    if not headline:  # full run must cover the frozen suite exactly
        missing = sorted(set(HEADLINE_SUITE) - set(timings))
        if missing:
            raise SystemExit(f"HEADLINE_SUITE names not in registry: {missing}")
    hl = [n for n in HEADLINE_SUITE if n in timings]
    total = round(sum(timings[n] for n in hl), 4)
    full_total = round(sum(timings.values()), 4)
    # Driver-visible per-query map (see module docstring): the 50
    # driver-verified rows as centisecond ints. On a BENCH_QUERIES
    # subset run, whatever surface rows were timed are emitted.
    from ontario_spark.queries import DRIVER_SURFACE

    stdout_queries = {
        n: int(round(timings[n] * 100)) for n in DRIVER_SURFACE if n in timings
    }
    payload = {
        "metric": "headline-suite wall time",
        "value": total,
        "unit": "sec",
        "queries": stdout_queries,
        "qunit": "cs",
        "action": action,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "n_queries": len(hl),
        "full_value": full_total,
        "full_n_queries": len(timings),
        "calibration": {n: timings[n] for n in CALIBRATION if n in timings},
    }
    # Full detail (per-query float timings + rows, all registry rows)
    # goes to disk; stdout gets ONE line that must fit ENTIRELY inside
    # the driver's 2000-char tail capture or the driver parses nothing
    # (rounds 1-3 overflowed and were unparseable). 1900 is a
    # deliberate ceiling: the surface map measures ~1550 chars at
    # 10x-slow-box values, and the defensive trim below keeps a
    # freak-stall run parseable instead of asserting the bench dead.
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH.json"), "w") as f:
        json.dump({**payload, "queries": timings, "rows": rows}, f, indent=1)
    line = json.dumps(payload, separators=(",", ":"))
    while len(line) >= 1900 and stdout_queries:
        stdout_queries.popitem()  # drop surface tail entries, never the totals
        payload["queries"] = stdout_queries
        line = json.dumps(payload, separators=(",", ":"))
    assert len(line) < 1900, f"bench stdout line too long: {len(line)}"
    print(line)
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
