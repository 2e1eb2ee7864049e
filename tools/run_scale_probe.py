"""Scale probe runner (round-5): times the skew-sensitive operator
families + TPC-H headliners at 1× and 10× (datasets from
``tools/gen_scale_probe.py``) and reports per-query wall time, output
rows, and the big/small time ratio.

Interpretation: data grows 10×, the box stays local[32] — so ~10× time
is per-core-linear scaling (perfect would need 10× the cores), < 10×
means fixed overheads still dominate at this size, and >> 10× flags a
superlinear operator (quadratic candidate generation, a hot task, a
driver bottleneck). Every row records BOTH collect() and count-only
timings (``*_count_sec`` / ``count_ratio``): when the two ratios
diverge the growth is result-set serialization to the driver, not the
distributed plan — compare ``count_ratio`` for plan health. Results
land in ``SCALE_PROBE.json``; SCALE.md carries the table.

Usage: python tools/run_scale_probe.py [probe_dir] [q1,q2,...] [scaleA,scaleB]

The third arg picks the two probe points (default ``small,big`` → 10×;
``small,huge`` probes the 100× tier into ``SCALE_PROBE_100X.json``).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ontario_scale_probe"

PROBE_QUERIES = [
    # dedup family (skew-sensitive candidate generation)
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_prefix_jaccard",
    "minhash_lsh_pairs",
    "simhash_fingerprints",
    "dedup_clusters",
    "dedup_lsh_verified",
    "dedup_paragraphs",
    "dedup_boilerplate",
    "dedup_keep_best",
    "contamination_check",
    "contamination_bloom",
    "dedup_cdc_chunks",
    "dedup_url_canonical",
    "dedup_containment_anchors",
    "fuzzy_part_names",
    "er_record_links",
    "dedup_dup_spans",
    "dedup_winnow_pairs",
    "dedup_simhash_pairs",
    "corpus_source_overlap",
    "text_winnow_profile",
    "text_regex_tokens",
    "text_tfidf_terms",
    # similarity / retrieval
    "emb_neardup_pairs",
    "ann_topk_bruteforce",
    "ann_topk_bucketed",
    "ann_topk_ivf",
    "ann_topk_pq",
    "ann_topk_ivfpq",
    "emb_cluster_assign",
    "emb_int8_quant",
    "emb_random_projection",
    "ann_topk_int8",
    "bm25_topk",
    "retrieval_rrf_fusion",
    # text
    "text_metrics",
    "frequent_terms",
    "text_pii_scan",
    "sample_temperature_mix",
    "sample_weighted_topk",
    "sample_dsir_weights",
    "text_quality_gates",
    # temporal + streaming
    "events_asof_join",
    "events_range_pairs",
    "events_scd2_history",
    "events_triangles",
    "events_kcore",
    "events_bfs_depth",
    "events_transitions",
    "events_attribution",
    "events_communities",
    "train_pit_features",
    "text_bigram_lm",
    "sample_negative_pairs",
    "eval_retrieval_ndcg",
    "eval_pr_curve",
    "eval_ab_lift",
    "eval_retrieval_mrr",
    "eval_ann_recall",
    "q_cube_flag_status",
    "q_grouping_sets_mixed",
    "q_dq_constraints",
    "events_trailing_window",
    "q_pivot_segment_priority",
    "events_daily_gapfill",
    "events_apply_changelog",
    "pipeline_training_set",
    "text_license_scan",
    "text_bpe_merges",
    "text_bpe_encode",
    "text_tokenizer_fertility",
    "train_token_packing",
    "pipeline_image_text_curation",
    "events_sessions",
    "sketch_quantile_rollup",
    "sketch_countmin_check",
    "stream_events_hourly",
    "stream_user_sessions",
    "stream_budget_cut",
    "stream_daily_rollup",
    "stream_click_purchase",
    "stream_click_purchase_outer",
    "stream_dedup",
    "stream_enriched_segments",
    "stream_user_gaps",
    "stream_trending_topk",
    "stream_scd2_enrich",
    "stream_incremental_neardup",
    # composed pipelines
    "pipeline_decontaminated_corpus",
    "pipeline_incremental_ingest",
    "pipeline_web_curation",
    "pipeline_incremental_neardup",
    # TPC-H headliners
    "q1_pricing_summary",
    "q2_min_cost_supplier",
    "q20_potential_promotion",
    "q3_shipping_priority",
    "q_top_orders_per_customer",
    "q_rollup_flag_status",
    "q_zorder_layout",
    # SPARQL engine (template-keyed joins + aggregation over the lake)
    "sparql_star_join",
    "sparql_drill_join",
    "sparql_drill_bound_join",
    "sparql_lineitem_star",
    "sparql_aggregate",
]


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    arg = sys.argv[2] if len(sys.argv) > 2 and sys.argv[2] else ""
    scales = tuple(
        sys.argv[3].split(",") if len(sys.argv) > 3 else ("small", "big")
    )
    outfile = (
        "SCALE_PROBE.json" if scales == ("small", "big") else "SCALE_PROBE_100X.json"
    )
    # round 12: the probe covers the FULL registry, not just the curated
    # skew-sensitive families. ``all`` probes every registry row;
    # ``missing`` probes only rows absent from the outfile (resumable
    # full-coverage runs — results merge, so a crash loses one row).
    if arg in ("all", "missing"):
        from ontario_spark.queries import all_queries as _aq

        names = sorted(_aq())
        if arg == "missing":
            path = os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                outfile,
            )
            done = set(json.load(open(path))) if os.path.exists(path) else set()
            names = [n for n in names if n not in done]
    else:
        names = arg.split(",") if arg else PROBE_QUERIES

    from pyspark.sql import functions as F

    from ontario_spark.data import TABLES, table
    from ontario_spark.queries import all_queries
    from ontario_spark.session import get_spark

    def fresh_session():
        s = get_spark("ontario-scale-probe")
        s.sparkContext.setLogLevel("ERROR")
        # same warmups as bench.py: JVM/codegen/Arrow pool + footers
        for scale in scales:
            for t in TABLES:
                try:
                    table(s, f"{BASE}/{scale}", t).limit(1).collect()
                except Exception:
                    pass
        s.range(10_000).agg(F.sum(F.col("id").cast("decimal(18,6)"))).collect()
        s.range(1_000).repartition(32).mapInPandas(lambda it: it, "id long").count()
        return s

    def context_dead(s) -> bool:
        try:
            return s.sparkContext._jsc.sc().isStopped()
        except Exception:
            return True

    spark = fresh_session()
    queries = all_queries()

    # Rows whose single upper-tier execution spills tens of GB of
    # shuffle. Shuffle files are only reclaimed on context stop (or an
    # eventual GC of the dependency), so the probe's 4 executions per
    # scale ACCUMULATE spill inside one session — which exhausted /tmp
    # on the 100x anchors tier (round 12, "Lost task" on the 4th run).
    # For these rows the big/huge tier runs each variant ONCE in its
    # own session: deterministic spill reclamation between runs, and on
    # a multi-minute execution warmup noise is proportionally
    # negligible. The record carries ``{scale}_runs`` so the
    # methodology difference is visible in the JSON.
    HEAVY_FRESH_SESSION = {"dedup_containment_anchors"}

    # Rows excluded from the 100× tier with the reason ON RECORD in the
    # JSON (the round-12 full-registry sweep's two adjudicated cases).
    # Exclusion is a last resort: every other registry row runs at both
    # tiers, and both of these carry measured 10× rows in
    # SCALE_PROBE.json pricing exactly the behavior described.
    SKIP_HUGE = {
        # Complete-recall exact tier of the similarity-join family: on
        # the saturating-vocabulary probe corpus every shingle is
        # frequent, so prefix collisions grow ~quadratically (measured
        # 10×: 38× count time, collision rows 107M→18M after the
        # length+positional filters). Exactness is the operator's
        # contract — a candidate budget would break complete recall.
        # The 100×-probed scale path for these semantics is the banded
        # tier (dedup_ngram_jaccard, ratio 91 at 100×).
        "dedup_prefix_jaccard": (
            "exact complete-recall tier; saturating-vocab prefix "
            "collisions are ~quadratic by construction (10x row prices "
            "it: count_ratio 38); banded tier is the probed scale path"
        ),
        # Output is Θ(SF²) by QUERY semantics, not plan pathology: the
        # literal join pairs every customer with every supplier of the
        # same-named nation, and both groups grow linearly with SF
        # (139k→13.9M rows at 10×, count_ratio 46.7 ≈ output growth —
        # per-output-row throughput is flat). At 100× the count alone
        # is ~1.4B output rows / ~40 min; an equi-join Spark executes
        # at flat per-row cost has nothing left to measure.
        "lslod_cq7_literal_join_wide": (
            "output is Theta(SF^2) by query semantics (literal join "
            "fans customers x suppliers per nation); 10x row shows "
            "flat per-output-row throughput (count_ratio 46.7 vs "
            "100x output growth)"
        ),
        # Exact containment tier (df-capped shingle self-join): on the
        # saturating-vocab corpus the candidate stream OOM-killed the
        # 16 GB JVM at 100x (measured — the first full-sweep run died
        # here, stage 195, uncaught heap OOM). Same contract argument
        # as the prefix tier: exactness IS the row's semantics. The
        # 100x containment evidence is carried by the triple-bounded
        # anchor tier (dedup_containment_anchors, ratio 37.7 at 100x,
        # recall 1.0 measured on both corpora).
        "dedup_containment": (
            "exact containment tier; saturating-vocab candidates OOM a "
            "16GB JVM at 100x (measured); dedup_containment_anchors "
            "(triple-bounded, recall 1.0 measured) is the probed "
            "scale path"
        ),
    }

    # Beyond this row count, the collect() timing measures nothing but
    # driver-side result serialization (the count_ratio already isolates
    # the distributed plan) — and at the 100× tier a linear-output row
    # like lslod_cq6 (26M rows at 10×) would collect billions of rows
    # and kill the driver. Count-only timings are recorded with an
    # explicit skip marker; a real pipeline writes such results to a
    # distributed sink, never through the driver.
    COLLECT_CAP_ROWS = 5_000_000

    def probe(name: str, scale: str, rec: dict) -> None:
        nonlocal spark
        spark.catalog.clearCache()
        heavy = name in HEAVY_FRESH_SESSION and scale != "small"
        runs = 1 if heavy else 2
        best, best_cnt, nrows = float("inf"), float("inf"), -1
        # count-only variant FIRST (round-9 VERDICT: the EXISTS probe
        # decomposed collect-vs-plan cost by hand; every row records
        # both, so a collect-dominated ratio — millions of rows
        # serialized to the driver — can't read as a plan regression).
        # Its row count also gates whether collect() is safe to time.
        for _ in range(runs):
            t0 = time.perf_counter()
            nrows = queries[name](spark, f"{BASE}/{scale}").count()
            best_cnt = min(best_cnt, time.perf_counter() - t0)
            if heavy:
                spark.stop()
                spark = fresh_session()
        if nrows <= COLLECT_CAP_ROWS:
            for _ in range(runs):  # best-of-2, like bench.py
                t0 = time.perf_counter()
                nrows = len(queries[name](spark, f"{BASE}/{scale}").collect())
                best = min(best, time.perf_counter() - t0)
                if heavy:
                    spark.stop()
                    spark = fresh_session()
            rec[f"{scale}_sec"] = round(best, 3)
        else:
            rec[f"{scale}_collect_skipped"] = nrows
        rec[f"{scale}_count_sec"] = round(best_cnt, 3)
        rec[f"{scale}_rows"] = nrows
        if heavy:
            rec[f"{scale}_runs"] = runs

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), outfile
    )

    def flush(name: str, rec: dict) -> None:
        # per-ROW incremental write (round 12): a hard JVM death used
        # to lose every completed row because the file was written only
        # at the end; now a crash loses nothing, and `missing` mode
        # resumes exactly where the previous invocation stopped.
        merged: dict[str, dict] = {}
        if os.path.exists(path):  # partial reruns update, not clobber
            with open(path) as f:
                merged = json.load(f)
        merged[name] = rec
        with open(path, "w") as f:
            json.dump(merged, f, indent=1)

    def revive(name: str, scale: str, rec: dict, ex: Exception):
        # a JVM that OOM-crashed (uncaught exception handler exits the
        # process) can leave a gateway fresh_session() cannot talk to;
        # record the row + flush BEFORE dying so an outer retry loop of
        # `missing` runs skips it and still converges.
        try:
            return fresh_session()
        except Exception:
            rec[f"{scale}_err"] = (
                f"{type(ex).__name__}: {ex}"[:200]
                + " (JVM died; session rebuild failed)"
            )
            flush(name, rec)
            print(json.dumps({name: rec}), flush=True)
            raise

    for name in names:
        rec: dict[str, float | int | str | None] = {}
        for scale in scales:
            if scale == "huge" and name in SKIP_HUGE:
                rec["huge_skipped"] = SKIP_HUGE[name]
                continue
            try:
                probe(name, scale, rec)
            except Exception as ex:
                # fail-isolated retry: one probe crashing the JVM
                # (executor OOM stops the local SparkContext) must not
                # cascade `stopped SparkContext` errors into every
                # later row (the round-9 dedup_clusters/
                # stream_user_sessions gap). Rebuild the session and
                # re-run this probe once; only a second failure counts.
                if context_dead(spark):
                    spark = revive(name, scale, rec, ex)
                    try:
                        probe(name, scale, rec)
                        continue
                    except Exception as ex2:
                        ex = ex2
                        if context_dead(spark):
                            spark = revive(name, scale, rec, ex)
                rec[f"{scale}_err"] = f"{type(ex).__name__}: {ex}"[:200]
        a, b = f"{scales[0]}_sec", f"{scales[1]}_sec"
        if a in rec and b in rec:
            rec["ratio"] = round(rec[b] / max(rec[a], 1e-9), 2)
        ca, cb = f"{scales[0]}_count_sec", f"{scales[1]}_count_sec"
        if ca in rec and cb in rec:
            rec["count_ratio"] = round(rec[cb] / max(rec[ca], 1e-9), 2)
        flush(name, rec)
        print(json.dumps({name: rec}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
