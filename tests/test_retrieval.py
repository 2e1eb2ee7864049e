"""BM25 lexical retrieval: validated against an independent pure-Python
reimplementation with numeric tolerance (ln is transcendental — engines'
libm may differ in the last ulp, so no hash-exact oracle)."""

from __future__ import annotations

import math

from ontario_spark.operators.retrieval import bm25_scores, term_stats

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "quick quick quick fox"),
    (3, "lazy afternoons and lazy rivers"),
    (4, "completely unrelated text about spark engines"),
]


def _py_bm25(docs, terms, k1=1.2, b=0.75):
    toks = {i: t.lower().split() for i, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    dfreq = {
        t: sum(1 for v in toks.values() if t in v) for t in terms
    }
    out = {}
    for i, v in toks.items():
        s = 0.0
        for t in terms:
            tf = v.count(t)
            if tf == 0 or dfreq[t] == 0:
                continue
            idf = math.log((n - dfreq[t] + 0.5) / (dfreq[t] + 0.5) + 1.0)
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(v) / avgdl))
        if s > 0:
            out[i] = s
    return out


def test_bm25_matches_reference_implementation(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: r["bm25"]
        for r in bm25_scores(df, "doc_id", "text", ["quick", "lazy"]).collect()
    }
    exp = _py_bm25(DOCS, ["quick", "lazy"])
    assert got.keys() == exp.keys()
    for k in exp:
        assert abs(got[k] - exp[k]) < 1e-9, (k, got[k], exp[k])
    # ranking: doc 2 (3x quick, short) beats doc 1 (1 quick + 1 lazy)?
    ranked = sorted(got, key=got.get, reverse=True)
    assert ranked[0] in (1, 2) and 4 not in got


def test_term_stats_shapes(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    ts = term_stats(df, "doc_id", "text")
    row = ts.filter("doc_id = 2 AND term = 'quick'").collect()[0]
    assert row["tf"] == 3 and row["dl"] == 4


def test_bm25_no_python_eval_in_plan(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = bm25_scores(df, "doc_id", "text", ["quick"])._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


def test_unigram_logprob_ranks_rare_tokens(spark):
    """Docs of corpus-rare tokens score higher (more surprising) than
    docs of corpus-common tokens; counts are exact."""
    from ontario_spark.operators.textops import unigram_logprob

    rows = [(i, "common words here") for i in range(1, 10)]
    rows.append((10, "zyx qwv unique"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in unigram_logprob(df, "doc_id", "text").collect()}
    assert len(out) == 10 and all(r["n_tokens"] == 3 for r in out.values())
    common = out[1]["avg_neg_logprob"]
    rare = out[10]["avg_neg_logprob"]
    assert rare > common > 0
    # identical docs score identically (model is corpus-global)
    assert out[2]["avg_neg_logprob"] == common


class TestRRFFusion:
    def test_hand_computed_fusion(self, spark):
        from ontario_spark.operators.retrieval import rrf_fuse

        lex = spark.createDataFrame([(10, 1), (20, 2)], ["doc_id", "rank"])
        sem = spark.createDataFrame([(20, 1), (30, 2)], ["doc_id", "rank"])
        rows = {
            r["doc_id"]: r
            for r in rrf_fuse([("lex", lex), ("sem", sem)], "doc_id").collect()
        }
        assert rows[20]["rrf_score"] == 1.0 / 62 + 1.0 / 61
        assert rows[10]["rrf_score"] == 1.0 / 61
        assert rows[30]["rrf_score"] == 1.0 / 62
        assert rows[10]["sem_rank"] is None and rows[30]["lex_rank"] is None
        # doc 20 appears in both lists -> fused first
        assert rows[20]["fused_rank"] == 1
        assert rows[10]["fused_rank"] == 2  # 1/61 > 1/62
        assert rows[30]["fused_rank"] == 3

    def test_three_lists_fuse(self, spark):
        from ontario_spark.operators.retrieval import rrf_fuse

        l1 = spark.createDataFrame([(1, 1)], ["doc_id", "rank"])
        l2 = spark.createDataFrame([(1, 2), (2, 1)], ["doc_id", "rank"])
        l3 = spark.createDataFrame([(2, 3)], ["doc_id", "rank"])
        rows = {
            r["doc_id"]: r
            for r in rrf_fuse(
                [("a", l1), ("b", l2), ("c", l3)], "doc_id"
            ).collect()
        }
        assert rows[1]["rrf_score"] == 1.0 / 61 + 1.0 / 62
        assert rows[2]["rrf_score"] == 1.0 / 61 + 1.0 / 63
        assert rows[1]["c_rank"] is None and rows[2]["a_rank"] is None
        assert rows[1]["fused_rank"] == 1

    def test_requires_two_lists(self, spark):
        import pytest

        from ontario_spark.operators.retrieval import rrf_fuse

        lex = spark.createDataFrame([(1, 1)], ["doc_id", "rank"])
        with pytest.raises(ValueError):
            rrf_fuse([("lex", lex)], "doc_id")
        with pytest.raises(ValueError, match="unique"):
            rrf_fuse([("lex", lex), ("lex", lex)], "doc_id")

    def test_rejects_non_identifier_labels(self, spark):
        import pytest

        from ontario_spark.operators.retrieval import rrf_fuse

        lex = spark.createDataFrame([(1, 1)], ["doc_id", "rank"])
        for bad in ("a.b", "a b", "a`b", "1a", ""):
            with pytest.raises(ValueError, match="identifiers"):
                rrf_fuse([(bad, lex), ("sem", lex)], "doc_id")


def test_tfidf_rare_term_outranks_ubiquitous(spark):
    from ontario_spark.operators.retrieval import tfidf_top_terms

    rows = [
        (1, "common common common rare"),
        (2, "common filler words here"),
        (3, "common other text entirely"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = tfidf_top_terms(df, "doc_id", "text", k=4).collect()
    d1 = {r.term: r for r in out if r.doc_id == 1}
    # hand-checked: common scores 3*(ln(4/4)+1)=3.0, rare scores
    # 1*(ln(4/2)+1)≈1.69 — tf dominates at this df spread
    assert d1["common"].tfidf > d1["rare"].tfidf
    assert d1["common"].term_rank == 1
    # within equal tf, lower df scores strictly higher
    only = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha gamma"), (3, "alpha delta")],
        ["doc_id", "text"],
    )
    o2 = {(r.doc_id, r.term): r.tfidf for r in
          tfidf_top_terms(only, "doc_id", "text", k=2).collect()}
    assert o2[(1, "beta")] > o2[(1, "alpha")]


def test_tfidf_k_bound_and_rank_contiguity(spark, sf_small):
    from ontario_spark.data import table
    from ontario_spark.operators.retrieval import tfidf_top_terms

    out = tfidf_top_terms(
        table(spark, sf_small, "documents"), "doc_id", "text", k=3
    ).collect()
    per_doc = {}
    for r in out:
        per_doc.setdefault(r.doc_id, []).append(r.term_rank)
    for ranks in per_doc.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 3


def test_rm3_expansion_recalls_feedback_vocabulary(spark):
    """Docs sharing vocabulary with the feedback set but containing NO
    original query term enter the expanded results — the point of PRF."""
    from ontario_spark.operators.retrieval import bm25_topk, rm3_topk

    rows = [
        (1, "anchor zebra quagga okapi"),
        (2, "anchor zebra gnu"),
        (3, "zebra quagga wildebeest"),   # no 'anchor'
        (4, "quagga okapi zebra"),        # no 'anchor'
        (5, "totally unrelated text here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    plain = {r.doc_id for r in bm25_topk(df, "doc_id", "text", ["anchor"], k=5).collect()}
    assert plain == {1, 2}  # bm25 only sees literal matches
    rm3 = {r.doc_id for r in rm3_topk(
        df, "doc_id", "text", ["anchor"], fb_docs=2, fb_terms=3, k=5
    ).collect()}
    assert {1, 2, 3, 4} <= rm3 and 5 not in rm3


def test_rm3_rank_contiguous_and_bounded(spark, sf_small):
    from ontario_spark.data import table
    from ontario_spark.operators.retrieval import rm3_topk

    out = rm3_topk(
        table(spark, sf_small, "documents"), "doc_id", "text",
        ["spark", "vector", "merge"], k=20,
    ).collect()
    assert [r.rank for r in sorted(out, key=lambda r: r.rank)] == list(
        range(1, len(out) + 1)
    )
    assert len(out) <= 20
    scores = [r.rm3_r for r in sorted(out, key=lambda r: r.rank)]
    assert scores == sorted(scores, reverse=True)
