"""Hand-computed fixtures for the evaluation-metrics operators —
the oracle gate proves cross-engine agreement; these prove the
numbers are the METRICS they claim to be."""

from __future__ import annotations

import math

import pytest

from ontario_spark.operators import evalmetrics as em


def test_discount_literals_are_the_scaled_log2_table():
    for r in range(1, 11):
        assert em.DISCOUNTS[r] == int(10**15 / math.log2(r + 1))
    assert em.CUM_DISCOUNTS[3] == sum(em.DISCOUNTS[r] for r in (1, 2, 3))


def test_ndcg_perfect_and_inverted_ranking(spark):
    # corpus: query 0 (label 1) + three relevant (label 1) + three not
    labels = spark.createDataFrame(
        [(0, 1), (1, 1), (2, 1), (3, 1), (4, 2), (5, 2), (6, 2)],
        ["vec_id", "label"],
    )
    perfect = spark.createDataFrame(
        [(0, n, r) for r, n in enumerate([1, 2, 3, 4, 5, 6], start=1)],
        ["query_id", "neighbor_id", "rank"],
    )
    row = em.ndcg_at_k(perfect, labels, k=10).collect()[0]
    assert row.n_relevant == 3
    assert row.n_retrieved_relevant == 3
    assert row.ndcg == 1.0
    inverted = spark.createDataFrame(
        [(0, n, r) for r, n in enumerate([4, 5, 6, 1, 2, 3], start=1)],
        ["query_id", "neighbor_id", "rank"],
    )
    row = em.ndcg_at_k(inverted, labels, k=10).collect()[0]
    # relevant docs at ranks 4,5,6 instead of 1,2,3
    exp = (em.DISCOUNTS[4] + em.DISCOUNTS[5] + em.DISCOUNTS[6]) / em.CUM_DISCOUNTS[3]
    assert row.ndcg == pytest.approx(exp, abs=1e-9)
    assert 0 < row.ndcg < 1


def test_ndcg_no_relevant_is_zero(spark):
    labels = spark.createDataFrame([(0, 1), (1, 2)], ["vec_id", "label"])
    ranking = spark.createDataFrame([(0, 1, 1)], ["query_id", "neighbor_id", "rank"])
    row = em.ndcg_at_k(ranking, labels, k=10).collect()[0]
    assert row.n_relevant == 0 and row.ndcg == 0.0


def test_pr_curve_hand_counts(spark):
    # scores: positives at .9/.6, negatives at .8/.1
    df = spark.createDataFrame(
        [(0.9, True), (0.6, True), (0.8, False), (0.1, False)],
        ["score", "gold"],
    )
    pts = {
        r.threshold: r for r in em.pr_curve(df, "score", "gold", [0.5, 0.85]).collect()
    }
    p = pts[0.5]
    assert (p.tp, p.fp, p.fn) == (2, 1, 0)
    assert p.precision == pytest.approx(2 / 3, abs=1e-9)
    assert p.recall == 1.0
    p = pts[0.85]
    assert (p.tp, p.fp, p.fn) == (1, 0, 1)
    assert p.precision == 1.0 and p.recall == 0.5
    assert p.f1 == pytest.approx(2 / 3, abs=1e-9)


def test_calibration_bins_top_bin_folds_ones(spark):
    df = spark.createDataFrame(
        [(1.0, True), (0.95, False), (0.05, False), (0.5, True)],
        ["score", "gold"],
    )
    bins = {r.bin: r for r in em.calibration_bins(df, "score", "gold").collect()}
    assert bins[9].n == 2  # 1.0 folds into bin 9 with 0.95
    assert bins[9].frac_positive == 0.5
    assert bins[0].n == 1 and bins[5].n == 1


def test_confusion_matrix_row_shares(spark):
    df = spark.createDataFrame(
        [("en", "en"), ("en", "en"), ("en", "de"), ("de", "de")],
        ["gold", "pred"],
    )
    cells = {(r.gold, r.pred): r for r in em.confusion_matrix(df, "gold", "pred").collect()}
    assert cells[("en", "en")].n == 2
    assert cells[("en", "en")].row_share == pytest.approx(2 / 3, abs=1e-9)
    assert cells[("de", "de")].row_share == 1.0
