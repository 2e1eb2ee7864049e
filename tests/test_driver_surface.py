"""The driver checks the FIRST 50 queries() entries — lock the curated
surface to exactly 50 with every operator family represented."""

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
    "minhash_",
    "simhash_",
    "ann_",
    "emb_",
    "text_",
    "mm_",
    "sketch_",
    "stream_",
    "sparql_",
    "q",  # relational
)


def test_surface_is_exactly_50_known_queries():
    q = driver_queries()
    assert len(q) == 50
    assert list(q) == DRIVER_SURFACE  # insertion order preserved
    assert set(q) <= set(all_queries())


def test_every_family_on_the_surface():
    for fam in FAMILIES:
        assert any(n.startswith(fam) for n in DRIVER_SURFACE), fam


def test_surface_oracles_are_the_registry_oracles():
    o = driver_oracle_sql()
    full = all_oracle_sql()
    assert set(o) <= set(DRIVER_SURFACE)
    for name, sql in o.items():
        assert full[name] == sql
    # non-SQL-expressible ops (rows-only driver check) stay the minority
    missing = [n for n in DRIVER_SURFACE if n not in o]
    assert len(missing) <= 8, missing


def test_spark_entry_exposes_the_curated_surface():
    import __spark_entry__ as e

    assert list(e.queries()) == DRIVER_SURFACE
    assert e.oracle_sql() == driver_oracle_sql()
