"""The driver checks the FIRST 50 queries() entries — lock the curated
50 to the front of the exported surface, every operator family
represented, every curated entry oracle-backed, and the full registry
exported behind them (round-3 ADVICE: never shrink the checked set)."""

from __future__ import annotations

from ontario_spark.queries import (
    DRIVER_SURFACE,
    all_oracle_sql,
    all_queries,
    driver_oracle_sql,
    driver_queries,
)

FAMILIES = (
    "sample_",
    "dedup_",
    # shingle-fingerprint near-dup candidate generation: carried by
    # minhash_lsh_pairs r1-r9, since round 10 by the winnowing pair
    # join (same family: per-doc fingerprint sketch → capped
    # fingerprint-equality self-join); the MinHash estimator keeps its
    # recall-pinned pytest gate and leads the post-cap registry
    ("minhash_", "dedup_winnow_"),
    "simhash_",
    "ann_",
    # embedding near-dup family: represented by semantic_dedup (round
    # 6), whose plan strictly contains emb_neardup_pairs' pipeline
    ("emb_", "semantic_"),
    "text_",
    # lexical-retrieval family: represented by retrieval_rrf_fusion
    # (round 9), whose fusion plan strictly contains bm25_topk's
    ("bm25_", "retrieval_"),
    "mm_",
    "sketch_",
    "stream_",
    "events_",  # temporal joins (as-of / range)
    # entity resolution: q-gram fuzzy matching r6-r9, widened to
    # Fellegi-Sunter linkage (round 10 — same blocking + verify inside)
    ("fuzzy_", "er_"),
    "sparql_",
    "q",  # relational
    # offline evaluation (round-10 continuation): NDCG on the surface,
    # MRR / ANN-recall / PR-curve / calibration / confusion / A-B lift
    # behind it in the registry
    "eval_",
)


def test_surface_is_curated_50_then_full_registry():
    q = driver_queries()
    assert len(DRIVER_SURFACE) == 50
    assert list(q)[:50] == DRIVER_SURFACE  # insertion order preserved
    assert set(q) == set(all_queries())  # nothing dropped
    assert len(q) == len(all_queries())


def test_every_family_on_the_surface():
    for fam in FAMILIES:
        # a tuple lists alternative prefixes that carry the family
        assert any(n.startswith(fam) for n in DRIVER_SURFACE), fam


def test_curated_entries_all_have_oracles():
    """Round-4 goal: zero no_oracle rows in the driver's first-50
    check — the approximate ops were swapped for oracle-able forms."""
    o = all_oracle_sql()
    missing = [n for n in DRIVER_SURFACE if n not in o]
    assert missing == [], missing


def test_surface_oracles_are_the_registry_oracles():
    o = driver_oracle_sql()
    full = all_oracle_sql()
    assert set(o) <= set(driver_queries())
    for name, sql in o.items():
        assert full[name] == sql


def test_spark_entry_exposes_the_curated_surface():
    import __spark_entry__ as e

    assert list(e.queries())[:50] == DRIVER_SURFACE
    assert e.oracle_sql() == driver_oracle_sql()
