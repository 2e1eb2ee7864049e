"""Quantify the recall trade of the round-12 anchor candidate bounds.

``dedup_containment_anchors`` (queries/pipeline_suite.py) runs
``anchor_containment_pairs`` with THREE composed bounds —
``anchor_expand=8`` (only each doc's 8 rarest anchors generate
candidates), ``inv_list_budget=64`` (each anchor hash expands to at
most 64 partner docs), ``candidate_budget=64`` (per-src top-64
partners by rarest shared anchor) — so its worst case is bounded on
EVERY corpus class, including the fixed-vocabulary class where
unbudgeted single-shared-shingle candidacy is quadratic (SCALE.md).

This script measures what those bounds cost: pair recall of the
budgeted tier against the exact n-gram containment join, on both the
fixed-vocab probe corpus (the adversarial class) and the sf0.1
long-tail corpus (the operator's stated domain). It also asserts the
bounds change only WHICH pairs are emitted, never their scores (the
verify stage recomputes exact containment on every surviving pair).

Usage: python tools/anchor_recall_quant.py
Results land in SCALE.md's round-12 section.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from ontario_spark.data import table  # noqa: E402
from ontario_spark.operators import dedup  # noqa: E402
from ontario_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark("anchor-recall-quant")
    spark.sparkContext.setLogLevel("ERROR")

    def anchors(df, **kw):
        return {
            (r["id_a"], r["id_b"]): round(r["containment"], 9)
            for r in dedup.anchor_containment_pairs(
                df, "doc_id", "text", n=3, threshold=0.5, **kw
            ).collect()
        }

    shipped = dict(candidate_budget=64, inv_list_budget=64, anchor_expand=8)
    for label, sf in (
        ("probe-small(fixed-vocab)", "/tmp/ontario_scale_probe/small"),
        ("sf0.1(long-tail)", "/root/testdata/sf0.1"),
    ):
        docs = table(spark, sf, "documents")
        exact = {
            (r["id_a"], r["id_b"]): round(r["containment"], 9)
            for r in dedup.ngram_containment_pairs(
                docs, "doc_id", "text", n=3, threshold=0.5, max_doc_freq=1000
            ).collect()
        }
        free = anchors(docs)
        bud = anchors(docs, **shipped)
        r_free = len(set(free) & set(exact)) / max(len(exact), 1)
        r_bud = len(set(bud) & set(exact)) / max(len(exact), 1)
        r_vs = len(set(bud) & set(free)) / max(len(free), 1)
        print(
            f"{label}: exact={len(exact)} anchors-unbudgeted={len(free)} "
            f"(recall {r_free:.4f}) anchors-triple-bound={len(bud)} "
            f"(recall {r_bud:.4f}; vs-unbudgeted {r_vs:.4f})",
            flush=True,
        )
        # bounds prune candidates, never alter scores
        assert all(exact[p] == s for p, s in bud.items() if p in exact)
    spark.stop()


if __name__ == "__main__":
    main()
