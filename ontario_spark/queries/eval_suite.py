"""Offline-evaluation queries: the grading half of a training-data
pipeline (operators/evalmetrics.py). Retrieval NDCG over the served
embedding index, operating points + calibration for the quality /
language filters, and the language-ID confusion matrix — each with a
DuckDB oracle carrying the IDENTICAL integer/decimal literals, so the
scores (not just the counts) hash-match across engines."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ontario_spark.data import table
from ontario_spark.operators import evalmetrics, similarity, textops

# thresholds rendered with repr() into BOTH engines so the literal
# doubles are bit-identical
PR_THRESHOLDS = [round(0.05 * i, 2) for i in range(10)]


def eval_retrieval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 of exact cosine retrieval against same-label relevance
    — the retrieval-quality readout for the embedding index. Scaled-
    integer discounts (evalmetrics.DISCOUNTS) keep the aggregation
    exact; one final division makes the double."""
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    ranking = similarity.brute_force_topk(emb, queries, k=10)
    return evalmetrics.ndcg_at_k(ranking, emb, k=10)


def _ndcg_sql() -> str:
    disc_case, cum_case = evalmetrics.ndcg_sql_fragments(k=10)
    return f"""
WITH c AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v, label
  FROM embeddings
), q AS (
  SELECT vec_id AS query_id, v AS qv, label AS qlab FROM c WHERE vec_id < 5
), scored AS (
  SELECT q.query_id, q.qlab, c.vec_id AS neighbor_id, c.label AS nlab,
         list_dot_product(q.qv, c.v)
           / (sqrt(list_dot_product(q.qv, q.qv))
              * sqrt(list_dot_product(c.v, c.v))) AS score
  FROM c, q WHERE c.vec_id != q.query_id
), r AS (
  SELECT query_id, qlab, nlab,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score DESC, neighbor_id ASC) AS rank
  FROM scored
), lc AS (
  SELECT label, COUNT(*) AS n_lab FROM c GROUP BY label
), per AS (
  SELECT query_id, qlab,
         SUM(CASE WHEN nlab = qlab THEN {disc_case}
                  ELSE CAST(0 AS BIGINT) END) AS dcg_scaled,
         SUM(CASE WHEN nlab = qlab THEN 1 ELSE 0 END) AS n_retrieved_relevant
  FROM r WHERE rank <= 10 GROUP BY query_id, qlab
), fin AS (
  SELECT p.query_id, lc.n_lab - 1 AS n_relevant,
         CAST(p.n_retrieved_relevant AS BIGINT) AS n_retrieved_relevant,
         p.dcg_scaled, LEAST(lc.n_lab - 1, 10) AS k_eff
  FROM per p JOIN lc ON lc.label = p.qlab
)
SELECT query_id, n_relevant, n_retrieved_relevant,
       CASE WHEN n_relevant <= 0 THEN 0.0
            ELSE ROUND(CAST(dcg_scaled AS DOUBLE)
                       / CAST({cum_case} AS DOUBLE), 9) END AS ndcg
FROM fin
"""


EVAL_NDCG_SQL = _ndcg_sql()


def eval_retrieval_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-reciprocal-rank inputs per query: the rank of the FIRST
    same-label neighbor in the exact cosine top-10 and its reciprocal
    (exact 1/rank, one division). Queries with no relevant retrieved
    get rr = 0.0 — the standard convention, kept as explicit rows so
    the macro-MRR is a plain AVG over this table."""
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    ranking = similarity.brute_force_topk(emb, queries, k=10)
    lab = emb.select("vec_id", "label")
    r = (
        ranking.join(
            F.broadcast(
                lab.withColumnRenamed("vec_id", "query_id").withColumnRenamed(
                    "label", "__qlab"
                )
            ),
            "query_id",
        )
        .join(
            lab.withColumnRenamed("vec_id", "neighbor_id").withColumnRenamed(
                "label", "__nlab"
            ),
            "neighbor_id",
        )
    )
    first_rel = r.groupBy("query_id").agg(
        F.min(
            F.when(F.col("__nlab") == F.col("__qlab"), F.col("rank"))
        ).alias("first_rel_rank")
    )
    return first_rel.select(
        "query_id",
        "first_rel_rank",
        F.when(
            F.col("first_rel_rank").isNotNull(),
            F.round(F.lit(1.0) / F.col("first_rel_rank").cast("double"), 9),
        )
        .otherwise(F.lit(0.0))
        .alias("rr"),
    )


EVAL_MRR_SQL = """
WITH c AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v, label
  FROM embeddings
), q AS (
  SELECT vec_id AS query_id, v AS qv, label AS qlab FROM c WHERE vec_id < 5
), scored AS (
  SELECT q.query_id, q.qlab, c.vec_id AS neighbor_id, c.label AS nlab,
         list_dot_product(q.qv, c.v)
           / (sqrt(list_dot_product(q.qv, q.qv))
              * sqrt(list_dot_product(c.v, c.v))) AS score
  FROM c, q WHERE c.vec_id != q.query_id
), r AS (
  SELECT query_id, qlab, nlab,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score DESC, neighbor_id ASC) AS rank
  FROM scored
), fr AS (
  SELECT query_id,
         MIN(CASE WHEN nlab = qlab THEN rank END) AS first_rel_rank
  FROM r WHERE rank <= 10 GROUP BY query_id
)
SELECT query_id, first_rel_rank,
       CASE WHEN first_rel_rank IS NOT NULL
            THEN ROUND(1.0 / CAST(first_rel_rank AS DOUBLE), 9)
            ELSE 0.0 END AS rr
FROM fr
"""


def eval_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@3 of the LSH-bucketed ANN tier measured against the
    exact brute-force top-3, per query — BOTH sides are deterministic
    compositions of the same cosine/tiebreak rules, so the recall of
    the approximate index is itself an oracle-checkable number (the
    pytest floor pins it; this row lets the external gate hash it)."""
    emb = table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 5)
    exact = similarity.brute_force_topk(emb, qs, k=3).select(
        "query_id", "neighbor_id"
    )
    approx = similarity.bucketed_topk(emb, qs, k=3, bits=4, dim=64).select(
        "query_id", F.col("neighbor_id").alias("__approx_n")
    )
    hit = exact.join(
        approx,
        (exact["query_id"] == approx["query_id"])
        & (exact["neighbor_id"] == approx["__approx_n"]),
        "left_semi",
    )
    n_hits = hit.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_hits"))
    base = exact.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_exact"))
    return base.join(n_hits, "query_id", "left_outer").select(
        "query_id",
        "n_exact",
        F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
        F.round(
            F.coalesce("n_hits", F.lit(0)).cast("double")
            / F.col("n_exact").cast("double"),
            9,
        ).alias("recall_at_3"),
    )


def _ann_recall_sql() -> str:
    bucket = similarity.hyperplane_bucket_sql("v", dim=64, bits=4)
    return f"""
WITH c AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), cb AS (
  SELECT vec_id, v, {bucket} AS bucket FROM c
), q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM cb WHERE vec_id < 5),
exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, c.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
             list_dot_product(q.qv, c.v)
               / (sqrt(list_dot_product(q.qv, q.qv))
                  * sqrt(list_dot_product(c.v, c.v))) DESC,
             c.vec_id ASC) AS rank
    FROM c, q WHERE c.vec_id != q.query_id) t
  WHERE rank <= 3
), approx AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, cb.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
             list_dot_product(q.qv, cb.v)
               / (sqrt(list_dot_product(q.qv, q.qv))
                  * sqrt(list_dot_product(cb.v, cb.v))) DESC,
             cb.vec_id ASC) AS rank
    FROM cb JOIN q ON cb.bucket = q.bucket AND cb.vec_id != q.query_id) t
  WHERE rank <= 3
), hits AS (
  SELECT e.query_id, COUNT(*) AS n_hits
  FROM exact e JOIN approx a
    ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
  GROUP BY e.query_id
), base AS (
  SELECT query_id, COUNT(*) AS n_exact FROM exact GROUP BY query_id
)
SELECT b.query_id, b.n_exact,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       ROUND(CAST(COALESCE(h.n_hits, 0) AS DOUBLE)
             / CAST(b.n_exact AS DOUBLE), 9) AS recall_at_3
FROM base b LEFT JOIN hits h ON h.query_id = b.query_id
"""


EVAL_ANN_RECALL_SQL = _ann_recall_sql()


def _doc_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    scores = textops.quality_score(docs, "doc_id", "text")
    return scores.join(docs.select("doc_id", "lang"), "doc_id").select(
        "doc_id",
        "stopword_ratio",
        "alpha_ratio",
        (F.col("lang") == "en").alias("is_en"),
    )


_DOC_SCORES_CTE = """
WITH t AS (
  SELECT doc_id, lang, text,
         regexp_split_to_array(trim(text), '\\s+') AS toks
  FROM documents
), s AS (
  SELECT doc_id,
         CAST(len(list_filter(toks,
                w -> w IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
           / array_length(toks) AS stopword_ratio,
         CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
           / length(text) AS alpha_ratio,
         (lang = 'en') AS is_en
  FROM t
)
"""


def eval_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall/F1 of the stopword-ratio scorer as an
    English-detector, at 10 thresholds in ONE aggregate pass — the
    operating-point sweep that picks a filter threshold."""
    return evalmetrics.pr_curve(
        _doc_scores(spark, sf_dir), "stopword_ratio", "is_en", PR_THRESHOLDS
    )


def _pr_curve_sql() -> str:
    points = []
    for t in PR_THRESHOLDS:
        points.append(f"""
  SELECT CAST({t!r} AS DOUBLE) AS threshold,
         SUM(CASE WHEN stopword_ratio >= {t!r} AND is_en THEN 1 ELSE 0 END) AS tp,
         SUM(CASE WHEN stopword_ratio >= {t!r} AND NOT is_en THEN 1 ELSE 0 END) AS fp,
         SUM(CASE WHEN stopword_ratio < {t!r} AND is_en THEN 1 ELSE 0 END) AS fn
  FROM s""")
    union = "\n  UNION ALL".join(points)
    return (
        _DOC_SCORES_CTE
        + f""", pt AS ({union})
SELECT threshold, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       CAST(fn AS BIGINT) AS fn,
  CASE WHEN tp + fp > 0
       THEN ROUND(CAST(tp AS DOUBLE) / (tp + fp), 9) ELSE 0.0 END AS precision,
  CASE WHEN tp + fn > 0
       THEN ROUND(CAST(tp AS DOUBLE) / (tp + fn), 9) ELSE 0.0 END AS recall,
  CASE WHEN 2 * tp + fp + fn > 0
       THEN ROUND(CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn), 9)
       ELSE 0.0 END AS f1
FROM pt
"""
    )


EVAL_PR_CURVE_SQL = _pr_curve_sql()


def eval_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability bins for the alpha-ratio score against the
    English gold label: exact counts, DECIMAL-summed mean score,
    empirical positive rate per equal-width bin."""
    return evalmetrics.calibration_bins(
        _doc_scores(spark, sf_dir), "alpha_ratio", "is_en", n_bins=10
    )


EVAL_CALIBRATION_SQL = (
    _DOC_SCORES_CTE
    + """
SELECT bin, n,
       ROUND(CAST(ss AS DOUBLE) / n, 9) AS mean_score,
       ROUND(CAST(np AS DOUBLE) / n, 9) AS frac_positive
FROM (
  SELECT LEAST(CAST(FLOOR(alpha_ratio * 10) AS INT), 9) AS bin,
         COUNT(*) AS n,
         SUM(CAST(alpha_ratio AS DECIMAL(28,12))) AS ss,
         SUM(CASE WHEN is_en THEN 1 ELSE 0 END) AS np
  FROM s
  WHERE alpha_ratio IS NOT NULL AND alpha_ratio >= 0 AND alpha_ratio <= 1
  GROUP BY 1
) b
"""
)


def eval_confusion_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gold-language × predicted-language confusion counts for the
    marker-word language identifier, with each cell's share of its
    gold row (per-class recall surface)."""
    docs = table(spark, sf_dir, "documents")
    pred = textops.lang_id(docs, "doc_id", "text")
    joined = docs.select("doc_id", "lang").join(pred, "doc_id")
    return evalmetrics.confusion_matrix(joined, "lang", "pred_lang")


EVAL_CONFUSION_SQL = """
WITH t AS (
  SELECT doc_id, lang,
         regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents
), s AS (
  SELECT doc_id, lang,
    len(list_filter(toks, w -> lower(w) IN ('the','a','of','and','to'))) AS s_en,
    len(list_filter(toks, w -> lower(w) IN ('der','die','das','und','ein'))) AS s_de,
    len(list_filter(toks, w -> lower(w) IN ('le','la','les','et','un'))) AS s_fr,
    len(list_filter(toks, w -> lower(w) IN ('el','los','las','y','una'))) AS s_es
  FROM t
), p AS (
  SELECT lang AS gold,
    CASE WHEN GREATEST(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
         WHEN s_de = GREATEST(s_en, s_de, s_fr, s_es) THEN 'de'
         WHEN s_en = GREATEST(s_en, s_de, s_fr, s_es) THEN 'en'
         WHEN s_es = GREATEST(s_en, s_de, s_fr, s_es) THEN 'es'
         ELSE 'fr' END AS pred
  FROM s
), c AS (
  SELECT gold, pred, COUNT(*) AS n FROM p GROUP BY gold, pred
)
SELECT gold, pred, n,
       ROUND(CAST(n AS DOUBLE)
             / CAST(SUM(n) OVER (PARTITION BY gold) AS DOUBLE), 9) AS row_share
FROM c
"""


def eval_ab_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout (round 10): users hash-split 50/50 by
    md5 parity (the same deterministic assignment a real experiment
    framework derives from user_id + experiment salt), then per-variant
    conversion rate (purchased at least once), lift vs control, and
    the two-proportion z-statistic. All counts are exact integers;
    rate/lift/z are a fixed sequence of double ops on those integers
    (division, sqrt), identical in both engines, rounded to 9."""
    ev = table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    # exposure unit = active (user, day): per-user conversion saturates
    # at 1.0 on month-long fixtures (se = 0); day-grain keeps the rate
    # in the open interval at every scale factor
    per_user = ev.groupBy(
        "user_id", F.date_format("ts", "yyyy-MM-dd").alias("__day")
    ).agg(
        F.max((F.col("event_type") == "purchase").cast("int")).alias("converted")
    )
    variant = F.when(
        F.substring(F.md5(F.concat_ws(":", F.lit("exp1"), F.col("user_id").cast("string"))), 1, 1)
        .isin("0", "1", "2", "3", "4", "5", "6", "7"),
        F.lit("treatment"),
    ).otherwise(F.lit("control"))
    counts = per_user.select(variant.alias("variant"), "converted").groupBy().agg(
        F.sum(F.when(F.col("variant") == "control", 1).otherwise(0)).alias("n_c"),
        F.sum(F.when(F.col("variant") == "control", F.col("converted")).otherwise(0)).alias("x_c"),
        F.sum(F.when(F.col("variant") == "treatment", 1).otherwise(0)).alias("n_t"),
        F.sum(F.when(F.col("variant") == "treatment", F.col("converted")).otherwise(0)).alias("x_t"),
    )
    # degenerate-split guard (round-11 ADVICE): an empty variant on a
    # tiny/skewed fixture must yield 0.0 rates in BOTH engines, not an
    # engine-specific NULL/NaN from x/0 — same convention as z_stat's
    # se > 0 guard
    p_c = F.when(
        F.col("n_c") > 0, F.col("x_c").cast("double") / F.col("n_c").cast("double")
    ).otherwise(F.lit(0.0))
    p_t = F.when(
        F.col("n_t") > 0, F.col("x_t").cast("double") / F.col("n_t").cast("double")
    ).otherwise(F.lit(0.0))
    p_pool = (F.col("x_c") + F.col("x_t")).cast("double") / (
        F.col("n_c") + F.col("n_t")
    ).cast("double")
    se = F.sqrt(
        p_pool
        * (F.lit(1.0) - p_pool)
        * (
            F.lit(1.0) / F.col("n_c").cast("double")
            + F.lit(1.0) / F.col("n_t").cast("double")
        )
    )
    return counts.select(
        F.col("n_c").cast("long").alias("n_control"),
        F.col("x_c").cast("long").alias("conv_control"),
        F.col("n_t").cast("long").alias("n_treatment"),
        F.col("x_t").cast("long").alias("conv_treatment"),
        F.round(p_c, 9).alias("rate_control"),
        F.round(p_t, 9).alias("rate_treatment"),
        F.round(p_t - p_c, 9).alias("abs_lift"),
        F.when(se > 0, F.round((p_t - p_c) / se, 9))
        .otherwise(F.lit(0.0))
        .alias("z_stat"),
    )


EVAL_AB_LIFT_SQL = """
WITH pu AS (
  SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
  FROM events WHERE user_id IS NOT NULL GROUP BY user_id, strftime(ts, '%Y-%m-%d')
), v AS (
  SELECT CASE WHEN substr(md5('exp1' || ':' || user_id::VARCHAR), 1, 1)
                   IN ('0','1','2','3','4','5','6','7')
              THEN 'treatment' ELSE 'control' END AS variant, converted
  FROM pu
), c AS (
  SELECT
    CAST(SUM(CASE WHEN variant = 'control' THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
    CAST(SUM(CASE WHEN variant = 'control' THEN converted ELSE 0 END) AS BIGINT) AS x_c,
    CAST(SUM(CASE WHEN variant = 'treatment' THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
    CAST(SUM(CASE WHEN variant = 'treatment' THEN converted ELSE 0 END) AS BIGINT) AS x_t
  FROM v
)
, r AS (
  SELECT n_c, x_c, n_t, x_t,
    CASE WHEN n_c > 0 THEN CAST(x_c AS DOUBLE) / CAST(n_c AS DOUBLE)
         ELSE 0.0 END AS p_c,
    CASE WHEN n_t > 0 THEN CAST(x_t AS DOUBLE) / CAST(n_t AS DOUBLE)
         ELSE 0.0 END AS p_t,
    CASE WHEN n_c > 0 AND n_t > 0 THEN
      sqrt((CAST(x_c + x_t AS DOUBLE) / CAST(n_c + n_t AS DOUBLE))
           * (1.0 - CAST(x_c + x_t AS DOUBLE) / CAST(n_c + n_t AS DOUBLE))
           * (1.0 / CAST(n_c AS DOUBLE) + 1.0 / CAST(n_t AS DOUBLE)))
      ELSE 0.0 END AS se
  FROM c
)
SELECT n_c AS n_control, x_c AS conv_control,
       n_t AS n_treatment, x_t AS conv_treatment,
       ROUND(p_c, 9) AS rate_control,
       ROUND(p_t, 9) AS rate_treatment,
       ROUND(p_t - p_c, 9) AS abs_lift,
       CASE WHEN se > 0 THEN ROUND((p_t - p_c) / se, 9)
            ELSE 0.0 END AS z_stat
FROM r
"""


QUERIES = {
    "eval_retrieval_ndcg": eval_retrieval_ndcg,
    "eval_retrieval_mrr": eval_retrieval_mrr,
    "eval_ann_recall": eval_ann_recall,
    "eval_ab_lift": eval_ab_lift,
    "eval_pr_curve": eval_pr_curve,
    "eval_calibration_bins": eval_calibration_bins,
    "eval_confusion_langid": eval_confusion_langid,
}

ORACLE = {
    "eval_retrieval_ndcg": EVAL_NDCG_SQL,
    "eval_retrieval_mrr": EVAL_MRR_SQL,
    "eval_ann_recall": EVAL_ANN_RECALL_SQL,
    "eval_ab_lift": EVAL_AB_LIFT_SQL,
    "eval_pr_curve": EVAL_PR_CURVE_SQL,
    "eval_calibration_bins": EVAL_CALIBRATION_SQL,
    "eval_confusion_langid": EVAL_CONFUSION_SQL,
}
