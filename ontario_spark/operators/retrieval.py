"""Lexical retrieval scoring: TF-IDF / BM25 over a document corpus.

The lexical complement to ``operators.similarity``'s embedding ANN —
corpus curation uses both (near-dup detection wants embeddings;
keyword-targeted subset mining wants BM25). All relational: one token
explode, term/document frequencies as aggregations, the score as a
join + weighted sum. No Python UDFs.

Scale notes: df (document frequency) is one small per-term aggregate —
broadcast to the tf side, so scoring any query is a scan + broadcast
join, never a shuffle of the corpus. avgdl is a scalar aggregate
(broadcast cross join). At 100 TB the tf table is the big side and
stays put; everything joined onto it is tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ontario_spark.operators.textops import spread, tokens


def term_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term, tf, dl): term frequency per document + document
    length — the inverted-index building block."""
    tok = spread(df).select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    ).select(id_col, F.lower(F.col("term")).alias("term"))
    return (
        tok.groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("dl", F.sum("tf").over(Window.partitionBy(id_col)))
    )


def bm25_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 score of every document against ``query_terms``
    (documents containing none score 0 and are omitted). idf uses the
    standard Robertson-Sparck-Jones form with +1 smoothing."""
    terms = [t.lower() for t in query_terms]
    stats = term_stats(df, id_col, text_col)
    n_docs = df.count()
    avgdl = (
        stats.select(id_col, "dl").distinct().agg(F.avg("dl")).collect()[0][0]
    ) or 1.0
    rel = stats.filter(F.col("term").isin(*terms))
    dfreq = F.broadcast(
        rel.groupBy("term").agg(F.countDistinct(id_col).alias("df"))
    )
    scored = rel.join(dfreq, "term")
    idf = F.log(
        (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    tf = F.col("tf").cast("double")
    denom = tf + k1 * (1.0 - b + b * F.col("dl") / F.lit(float(avgdl)))
    contrib = idf * tf * (k1 + 1.0) / denom
    return (
        scored.groupBy(id_col)
        .agg(F.sum(contrib).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc(id_col))
    )
