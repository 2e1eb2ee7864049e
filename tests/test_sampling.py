"""Deterministic-sampling invariants: determinism across calls,
disjoint splits, rate accuracy, salt independence — plus the
engine-portability contract (Spark predicate == DuckDB predicate,
covered again by the driver oracle gate)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ontario_spark.data import table
from ontario_spark.operators.sampling import (
    hash_sample,
    mix_datasets,
    sql_hash_predicate,
    stratified_sample,
    train_test_split,
)


def docs(spark, sf):
    return table(spark, sf, "documents").select("doc_id", "lang", "source")


def test_hash_sample_deterministic_and_rate(spark, sf_small):
    d = docs(spark, sf_small)
    total = d.count()
    a = hash_sample(d, "doc_id", 0.3)
    b = hash_sample(d, "doc_id", 0.3)
    ids_a = {r.doc_id for r in a.collect()}
    ids_b = {r.doc_id for r in b.collect()}
    assert ids_a == ids_b  # same decision on every call
    assert 0.15 < len(ids_a) / total < 0.45  # ~rate (500 docs)


def test_hash_sample_monotone_in_rate(spark, sf_small):
    d = docs(spark, sf_small)
    small = {r.doc_id for r in hash_sample(d, "doc_id", 0.2).collect()}
    big = {r.doc_id for r in hash_sample(d, "doc_id", 0.6).collect()}
    assert small <= big  # nested samples: raising the rate only adds rows


def test_rate_bounds(spark, sf_small):
    d = docs(spark, sf_small)
    assert hash_sample(d, "doc_id", 1.0).count() == d.count()
    assert hash_sample(d, "doc_id", 0.0).count() == 0


def test_train_test_disjoint_total(spark, sf_small):
    d = docs(spark, sf_small)
    tagged = train_test_split(d, "doc_id", test_rate=0.2)
    counts = dict(
        (r.split, r.n) for r in tagged.groupBy("split").agg(F.count("*").alias("n")).collect()
    )
    assert counts["test"] + counts["train"] == d.count()
    assert counts["test"] > 0 and counts["train"] > 0


def test_salt_changes_selection(spark, sf_small):
    d = docs(spark, sf_small)
    a = {r.doc_id for r in hash_sample(d, "doc_id", 0.3, salt="a").collect()}
    b = {r.doc_id for r in hash_sample(d, "doc_id", 0.3, salt="b").collect()}
    assert a != b


def test_stratified_respects_rates(spark, sf_small):
    d = docs(spark, sf_small)
    out = stratified_sample(
        d, "doc_id", "lang", {"en": 1.0, "de": 0.0}, default_rate=0.5
    )
    by_lang = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    en_total = d.filter(F.col("lang") == "en").count()
    assert by_lang.get("en") == en_total
    assert "de" not in by_lang


def test_mix_sources_tagged(spark, sf_small):
    d = docs(spark, sf_small)
    out = mix_datasets([(d, "a", 0.5), (d, "b", 0.2)], key="doc_id")
    tags = {r.mix_source for r in out.select("mix_source").distinct().collect()}
    assert tags == {"a", "b"}


def test_sql_predicate_matches_spark(spark, sf_small):
    import duckdb

    d = docs(spark, sf_small)
    spark_ids = sorted(r.doc_id for r in hash_sample(d, "doc_id", 0.37, "s").collect())
    con = duckdb.connect()
    pred = sql_hash_predicate("doc_id", 0.37, "s")
    duck_ids = [
        r[0]
        for r in con.execute(
            f"SELECT doc_id FROM '{sf_small}/documents.parquet' WHERE {pred} ORDER BY doc_id"
        ).fetchall()
    ]
    assert spark_ids == duck_ids


def test_temperature_mix_flattens_distribution(spark, sf_small):
    """alpha=0.5 temperature mixing (round 5): every stratum keeps a
    subset (never upsampled), the smallest language keeps a HIGHER
    fraction of itself than the largest (the flattening property), and
    the decision is hash-deterministic across runs."""
    from ontario_spark.data import table
    from ontario_spark.operators.sampling import temperature_mix

    docs = table(spark, sf_small, "documents").select("doc_id", "lang")
    nat = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    args = dict(key="doc_id", stratum="lang", alpha=0.5, target_frac=0.4)
    got = {
        r["lang"]: r["n"]
        for r in temperature_mix(docs, **args)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for lang, n in nat.items():
        assert 0 < got.get(lang, 0) <= n
    small = min(nat, key=nat.get)
    big = max(nat, key=nat.get)
    assert got[small] / nat[small] > got[big] / nat[big]
    again = {
        r["lang"]: r["n"]
        for r in temperature_mix(docs, **args)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert again == got


def test_group_cap_sample(spark):
    """Per-group quota: cap respected per group, under-cap groups pass
    through whole, selection is deterministic and NESTED (raising the
    cap only adds rows), and the selected set matches the md5-rank
    rule the oracle replicates."""
    import hashlib

    from ontario_spark.operators.sampling import group_cap_sample

    rows = [(i, "big") for i in range(50)] + [(100 + i, "small") for i in range(3)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    got = group_cap_sample(df, "source", "doc_id", cap=10)
    by_src = {
        r["source"]: r["n"]
        for r in got.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert by_src == {"big": 10, "small": 3}
    # the chosen "big" rows are the 10 smallest md5(key||'cap') ranks
    chosen = sorted(
        r["doc_id"] for r in got.filter(F.col("source") == "big").collect()
    )
    expect = sorted(
        sorted(range(50), key=lambda i: hashlib.md5(f"{i}cap".encode()).hexdigest())[:10]
    )
    assert chosen == expect
    # nested: cap=20's selection contains cap=10's
    wider = sorted(
        r["doc_id"]
        for r in group_cap_sample(df, "source", "doc_id", cap=20)
        .filter(F.col("source") == "big")
        .collect()
    )
    assert set(chosen) <= set(wider) and len(wider) == 20
    with pytest.raises(ValueError):
        group_cap_sample(df, "source", "doc_id", cap=0)
    # NULL keys are DROPPED (no rank; several NULL-key rows would be
    # order ties each engine breaks differently) — matching
    # hash_sample's NULL-predicate behavior
    nrows = [(i, "g") for i in range(5)] + [(None, "g"), (None, "g")]
    ndf = spark.createDataFrame(nrows, "doc_id long, source string")
    kept = group_cap_sample(ndf, "source", "doc_id", cap=5).collect()
    assert sorted(r["doc_id"] for r in kept) == [0, 1, 2, 3, 4]
    kept6 = group_cap_sample(ndf, "source", "doc_id", cap=6).collect()
    assert sorted(r["doc_id"] for r in kept6) == [0, 1, 2, 3, 4]


def test_token_budget_mix(spark):
    """Budgeted mixing: running weight stays within each group's
    budget, selection is deterministic, nested across budgets, and a
    first row heavier than the budget selects nothing."""
    import hashlib

    from ontario_spark.operators.sampling import token_budget_mix

    rows = [(i, "a", 10) for i in range(20)] + [(100, "b", 50), (101, "b", 5)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_chars"])
    got = token_budget_mix(
        df, "source", "doc_id", "n_chars", budgets={"a": 55}, default_budget=5
    )
    a = sorted(r["doc_id"] for r in got.filter(F.col("source") == "a").collect())
    # 55/10 → exactly the 5 smallest md5-rank rows of group a
    order = sorted(range(20), key=lambda i: hashlib.md5(f"{i}budget".encode()).hexdigest())
    assert a == sorted(order[:5])
    # group b's budget (5) fits only doc 101 IF it ranks first; its
    # running sum includes whatever precedes it — verify against rule
    b_order = sorted([100, 101], key=lambda i: hashlib.md5(f"{i}budget".encode()).hexdigest())
    run, kept_expect = 0, []
    for i in b_order:
        run += 50 if i == 100 else 5
        if run <= 5:
            kept_expect.append(i)
    b = sorted(r["doc_id"] for r in got.filter(F.col("source") == "b").collect())
    assert b == sorted(kept_expect)
    # nested: doubling the budget only adds rows
    wider = sorted(
        r["doc_id"]
        for r in token_budget_mix(
            df, "source", "doc_id", "n_chars", budgets={"a": 110}, default_budget=5
        ).filter(F.col("source") == "a").collect()
    )
    assert set(a) <= set(wider) and len(wider) == 11


def test_fixed_size_sample(spark):
    """Exactly n rows, the n smallest md5 ranks, nested across n,
    NULL keys dropped, and a TakeOrderedAndProject plan (no global
    sort)."""
    import hashlib

    from ontario_spark.operators.sampling import fixed_size_sample

    rows = [(i,) for i in range(40)] + [(None,)]
    df = spark.createDataFrame(rows, "doc_id long")
    got = fixed_size_sample(df, "doc_id", n=7, salt="s")
    ids = [r["doc_id"] for r in got.collect()]
    order = sorted(range(40), key=lambda i: hashlib.md5(f"{i}s".encode()).hexdigest())
    assert sorted(ids) == sorted(order[:7])
    wider = [
        r["doc_id"]
        for r in fixed_size_sample(df, "doc_id", n=12, salt="s").collect()
    ]
    assert set(ids) <= set(wider) and len(wider) == 12
    # physical shape: partition-local top-n merged on the driver
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        got.explain()
    assert "TakeOrderedAndProject" in buf.getvalue()
    with pytest.raises(ValueError):
        fixed_size_sample(df, "doc_id", n=0)


def test_epoch_shuffle_order(spark):
    """The operator's PHYSICAL row order equals the md5 rule the
    sample_epoch_order oracle checks (a sorted-columns hash compare
    can't observe order, so the operator is pinned here):
    reproducible per epoch, decorrelated across epochs."""
    import hashlib

    from ontario_spark.operators.sampling import epoch_shuffle

    df = spark.createDataFrame([(i,) for i in range(97)], ["doc_id"])
    got = [r["doc_id"] for r in epoch_shuffle(df, "doc_id", 2, "s").collect()]
    expect = sorted(
        range(97),
        key=lambda i: hashlib.md5(f"{i}|e2|s".encode()).hexdigest(),
    )
    assert got == expect
    again = [r["doc_id"] for r in epoch_shuffle(df, "doc_id", 2, "s").collect()]
    assert got == again
    other = [r["doc_id"] for r in epoch_shuffle(df, "doc_id", 3, "s").collect()]
    assert got != other and sorted(other) == sorted(got)


class TestWeightedTopk:
    def test_exact_n_deterministic_and_positive_weights_only(self, spark):
        from ontario_spark.operators.sampling import weighted_topk

        rows = [(i, float(i % 7) - 1.0) for i in range(200)]  # some w <= 0
        df = spark.createDataFrame(rows, ["k", "w"])
        a = weighted_topk(df, "k", "w", n=30).collect()
        b = weighted_topk(df, "k", "w", n=30).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]
        assert len(a) == 30
        assert all(r["weight"] > 0 for r in a)
        # keys are sorted descending with id tiebreak — a total order
        ks = [(r["sort_key"], -r["k"]) for r in a]
        assert ks == sorted(ks, reverse=True)

    def test_heavier_rows_win_more_often(self, spark):
        """Inclusion tracks weight: with half the rows at weight 10 and
        half at weight 1, the heavy half must dominate the sample (the
        A-ES guarantee, checked loosely over one deterministic draw)."""
        from ontario_spark.operators.sampling import weighted_topk

        rows = [(i, 10.0 if i % 2 == 0 else 1.0) for i in range(400)]
        df = spark.createDataFrame(rows, ["k", "w"])
        got = weighted_topk(df, "k", "w", n=80).collect()
        heavy = sum(1 for r in got if r["weight"] == 10.0)
        assert heavy > 60  # expectation ~74 of 80; far above parity


def test_group_split_is_group_atomic(spark, sf_small):
    """Leakage control: splitting by the GROUP key means every group
    lands wholly on one side — no source may appear in both splits —
    and the whole corpus is covered."""
    from ontario_spark.data import table
    from ontario_spark.operators.sampling import train_test_split

    docs = table(spark, sf_small, "documents")
    tagged = train_test_split(docs, key="source", test_rate=0.25, salt="groups")
    per = (
        tagged.groupBy("source")
        .agg(F.countDistinct("split").alias("n_splits"))
        .collect()
    )
    assert per and all(r["n_splits"] == 1 for r in per)
    assert tagged.count() == docs.count()
    sides = {r["split"] for r in tagged.select("split").distinct().collect()}
    assert sides <= {"train", "test"} and "train" in sides


def test_token_packing_hand_computed(spark):
    """Pin concat-and-chunk semantics: docs (3, 2, 4 tokens) in one
    stratum at seq_len=4 — the 2-token doc spans the first pack
    boundary, the 4-token doc starts at offset 1 of pack 1."""
    from ontario_spark.operators.sampling import token_packing

    df = spark.createDataFrame(
        [(1, "a b c", "s"), (2, "d e", "s"), (3, "f g h i", "s"),
         (4, "x y", "t")],
        ["doc_id", "text", "source"],
    )
    out = {
        r.doc_id: (r.n_tokens, r.pack_first, r.pack_last, r.pack_offset)
        for r in token_packing(df, "doc_id", "text", "source", seq_len=4).collect()
    }
    assert out[1] == (3, 0, 0, 0)
    assert out[2] == (2, 0, 1, 3)   # tokens 3..4 cross the pack edge
    assert out[3] == (4, 1, 2, 1)
    assert out[4] == (2, 0, 0, 0)   # stratum 't' packs independently
