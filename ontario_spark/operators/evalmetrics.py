"""Model / pipeline evaluation metrics over DataFrames.

A training-data platform does not stop at producing corpora — it
grades them: retrieval quality of the ANN/BM25 index it serves
(NDCG@k), classifier operating points for its quality/language
filters (precision-recall curves, confusion matrices), and score
calibration before thresholds get tuned (reliability bins). These are
the standard offline-eval queries every ML data pipeline runs after a
build; the reference engine has no equivalent (it stops at query
execution), so this module is part of the pipeline superset.

Determinism across engines is handled the same way the sketch/graph
operators do it: anything irrational (the 1/log2(rank+1) NDCG
discounts) is pre-scaled in PYTHON to exact BIGINT literals baked
into both the Spark plan and the DuckDB oracle, so the distributed
aggregation is pure integer arithmetic and only ONE final division
produces a double (rounded to 9, the house rule). Counts divide as
exact integers; score sums ride DECIMAL.

Scale shape: every metric here is one hash aggregate over an
already-scored relation (the scorer's cost dominates); nothing
shuffles more than (group key, counters) rows, and the NDCG join
broadcasts the tiny query-label side.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 1/log2(rank+1) scaled by 1e15 and truncated to exact integers —
# the ONLY source of irrationality in NDCG, fixed here so both
# engines aggregate identical BIGINTs (see module docstring).
_SCALE = 10**15
DISCOUNTS = {r: int(_SCALE / math.log2(r + 1)) for r in range(1, 11)}
CUM_DISCOUNTS = {
    k: sum(DISCOUNTS[r] for r in range(1, k + 1)) for k in range(1, 11)
}


def _discount_col(rank: Column) -> Column:
    expr = F.lit(0).cast("long")
    for r, d in sorted(DISCOUNTS.items()):
        expr = F.when(rank == r, F.lit(d).cast("long")).otherwise(expr)
    return expr


def _cum_discount_col(k_eff: Column) -> Column:
    expr = F.lit(0).cast("long")
    for k, d in sorted(CUM_DISCOUNTS.items()):
        expr = F.when(k_eff == k, F.lit(d).cast("long")).otherwise(expr)
    return expr


def ndcg_at_k(
    ranking: DataFrame,
    labels: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """NDCG@k of a ``(query_id, neighbor_id, rank)`` ranking against
    same-label relevance: a neighbor is relevant iff it carries the
    query's label. The ideal DCG uses the CORPUS count of the query's
    label (minus the query itself), capped at k — the standard "ideal
    ranking puts every relevant doc first" definition, so a perfect
    retriever scores exactly 1.0.

    Output: (query_id, n_relevant, n_retrieved_relevant, ndcg).
    Queries whose label appears nowhere else score 0.0 by convention.
    """
    if k > max(DISCOUNTS):
        raise ValueError(f"k <= {max(DISCOUNTS)} supported, got {k}")
    lab = labels.select(
        F.col(id_col).alias("__id"), F.col(label_col).alias("__lab")
    )
    label_counts = lab.groupBy("__lab").agg(F.count(F.lit(1)).alias("__n_lab"))
    r = (
        ranking.filter(F.col("rank") <= k)
        .join(
            F.broadcast(lab.withColumnRenamed("__id", "query_id")).withColumnRenamed(
                "__lab", "__qlab"
            ),
            "query_id",
        )
        .join(
            lab.withColumnRenamed("__id", "neighbor_id").withColumnRenamed(
                "__lab", "__nlab"
            ),
            "neighbor_id",
        )
    )
    rel = (F.col("__nlab") == F.col("__qlab")).cast("long")
    per_q = r.groupBy("query_id", "__qlab").agg(
        F.sum(rel * _discount_col(F.col("rank"))).alias("__dcg_scaled"),
        F.sum(rel).alias("n_retrieved_relevant"),
    )
    out = per_q.join(
        F.broadcast(label_counts), per_q["__qlab"] == label_counts["__lab"]
    ).select(
        "query_id",
        (F.col("__n_lab") - 1).alias("n_relevant"),
        "n_retrieved_relevant",
        F.when(F.col("__n_lab") - 1 <= 0, F.lit(0.0))
        .otherwise(
            F.round(
                F.col("__dcg_scaled").cast("double")
                / _cum_discount_col(
                    F.least(F.col("__n_lab") - 1, F.lit(k))
                ).cast("double"),
                9,
            )
        )
        .alias("ndcg"),
    )
    return out


def ndcg_sql_fragments(k: int = 10) -> tuple[str, str]:
    """The (discount CASE, cumulative-discount CASE) SQL fragments with
    the SAME integer literals the Spark plan uses, for oracle SQL."""
    disc = " ".join(
        f"WHEN {r} THEN CAST({d} AS BIGINT)" for r, d in sorted(DISCOUNTS.items())
    )
    cum = " ".join(
        f"WHEN {kk} THEN CAST({d} AS BIGINT)"
        for kk, d in sorted(CUM_DISCOUNTS.items())
        if kk <= k
    )
    return (
        f"CASE rank {disc} ELSE CAST(0 AS BIGINT) END",
        f"CASE k_eff {cum} ELSE CAST(0 AS BIGINT) END",
    )


def pr_curve(
    scored: DataFrame,
    score_col: str,
    positive_col: str,
    thresholds: list[float],
) -> DataFrame:
    """Precision/recall/F1 operating points for a thresholded scorer:
    one row per threshold with exact TP/FP/FN counts and
    single-division ratios. ONE pass builds every point (a conditional
    aggregate per threshold — no per-threshold scan), which is how the
    curve stays one job at corpus scale."""
    pos = F.col(positive_col).cast("boolean")
    rows = []
    for t in thresholds:
        pred = F.col(score_col) >= F.lit(t)
        rows.append(
            F.struct(
                F.lit(t).alias("threshold"),
                F.sum((pred & pos).cast("long")).alias("tp"),
                F.sum((pred & ~pos).cast("long")).alias("fp"),
                F.sum((~pred & pos).cast("long")).alias("fn"),
            )
        )
    wide = scored.agg(F.array(*rows).alias("__pts"))
    pt = wide.select(F.explode("__pts").alias("p")).select("p.*")
    prec = F.when(
        F.col("tp") + F.col("fp") > 0,
        F.round(F.col("tp").cast("double") / (F.col("tp") + F.col("fp")), 9),
    ).otherwise(F.lit(0.0))
    rec = F.when(
        F.col("tp") + F.col("fn") > 0,
        F.round(F.col("tp").cast("double") / (F.col("tp") + F.col("fn")), 9),
    ).otherwise(F.lit(0.0))
    f1 = F.when(
        2 * F.col("tp") + F.col("fp") + F.col("fn") > 0,
        F.round(
            (2 * F.col("tp")).cast("double")
            / (2 * F.col("tp") + F.col("fp") + F.col("fn")),
            9,
        ),
    ).otherwise(F.lit(0.0))
    return pt.select(
        "threshold",
        "tp",
        "fp",
        "fn",
        prec.alias("precision"),
        rec.alias("recall"),
        f1.alias("f1"),
    )


def calibration_bins(
    scored: DataFrame,
    score_col: str,
    positive_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability-diagram bins for a [0,1] score: equal-width bins
    with exact counts, DECIMAL-summed mean score, and the empirical
    positive rate — the input to a calibration check (a well-
    calibrated scorer has mean_score ≈ frac_positive per bin). Scores
    exactly 1.0 fold into the top bin."""
    s = F.col(score_col)
    b = F.least(F.floor(s * n_bins).cast("int"), F.lit(n_bins - 1))
    agg = (
        scored.filter(s.isNotNull() & (s >= 0) & (s <= 1))
        .groupBy(b.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(s.cast("decimal(28,12)")).alias("__ss"),
            F.sum(F.col(positive_col).cast("long")).alias("__np"),
        )
    )
    return agg.select(
        "bin",
        "n",
        F.round(F.col("__ss").cast("double") / F.col("n").cast("double"), 9).alias(
            "mean_score"
        ),
        F.round(F.col("__np").cast("double") / F.col("n").cast("double"), 9).alias(
            "frac_positive"
        ),
    )


def confusion_matrix(
    df: DataFrame, gold_col: str, pred_col: str
) -> DataFrame:
    """Exact confusion counts (gold × predicted) plus each cell's share
    of its gold row — the per-class recall surface a filter-tuning
    loop reads. One hash aggregate; the row totals ride a bounded
    |classes|-sized window."""
    from pyspark.sql.window import Window

    counts = df.groupBy(
        F.col(gold_col).alias("gold"), F.col(pred_col).alias("pred")
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = Window.partitionBy("gold")
    return counts.select(
        "gold",
        "pred",
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(tot).cast("double"), 9
        ).alias("row_share"),
    )
