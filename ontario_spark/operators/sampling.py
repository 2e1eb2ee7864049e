"""Deterministic sampling operators for training-data pipelines.

Beyond the reference (SDM-TIB/Ontario has no sampling of any kind);
this is part of the BASELINE.json training-pipeline surface alongside
dedup/similarity/text ops.

All sampling here is HASH-deterministic, not RNG-based: a row's fate
depends only on its key, so (a) re-runs and retried tasks pick the same
rows (exactly-once semantics without coordination), (b) train/test
splits stay disjoint across pipeline versions, (c) results are
reproducible across engines — the selector is a lexicographic
comparison on an md5-hex prefix, which any engine with md5() evaluates
identically (the DuckDB oracles share the exact predicate). This is the
standard "salted hash bucketing" used in large-scale corpus work; the
16^6-bucket granularity (~6e-8) is finer than any practical mixing
weight.

Scale: the filter is a pure per-row predicate — no shuffle, no state,
fully pushed into the scan stage; mixing N sources is a unionByName of
filtered scans, which Spark schedules as independent stages.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 6 hex chars = 16,777,216 buckets
_HEXW = 6
_SPACE = 16 ** _HEXW


def _threshold(rate: float) -> str:
    """rate in [0,1] → hex threshold string; row kept iff prefix < it."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    if rate >= 1.0:
        return "g"  # sorts after every hex digit → keeps all rows
    return format(int(rate * _SPACE), f"0{_HEXW}x")


def _prefix(key: Column, salt: str) -> Column:
    return F.substring(F.md5(F.concat(key.cast("string"), F.lit(salt))), 1, _HEXW)


def hash_sample(df: DataFrame, key: str, rate: float, salt: str = "") -> DataFrame:
    """Keep a deterministic ``rate`` fraction of rows, keyed on ``key``.
    Same key+salt → same decision everywhere, forever."""
    return df.filter(_prefix(F.col(key), salt) < F.lit(_threshold(rate)))


def stratified_sample(
    df: DataFrame, key: str, stratum: str, rates: dict[str, float],
    default_rate: float = 0.0, salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling — the corpus-mixing primitive
    (e.g. keep 100% of 'books', 10% of 'web'). ``rates`` maps stratum
    value → keep fraction; unlisted strata fall back to
    ``default_rate``."""
    thr = F.lit(_threshold(default_rate))
    for value, rate in sorted(rates.items()):
        thr = F.when(F.col(stratum) == value, F.lit(_threshold(rate))).otherwise(thr)
    return df.filter(_prefix(F.col(key), salt) < thr)


def train_test_split(
    df: DataFrame, key: str, test_rate: float = 0.1, salt: str = "split"
) -> DataFrame:
    """Tag each row 'test' / 'train' disjointly + deterministically.
    Downstream filters prune to one side at scan time (the split column
    is a pure function of the key, so no materialization is needed)."""
    return df.withColumn(
        "split",
        F.when(
            _prefix(F.col(key), salt) < F.lit(_threshold(test_rate)), "test"
        ).otherwise("train"),
    )


def mix_datasets(
    parts: list[tuple[DataFrame, str, float]], key: str, salt: str = "mix"
) -> DataFrame:
    """Weighted corpus mix: each (df, tag, rate) contributes a
    deterministic ``rate`` sample tagged with ``tag``. Output column
    set = shared columns + ``mix_source``."""
    outs = [
        hash_sample(df, key, rate, salt).withColumn("mix_source", F.lit(tag))
        for df, tag, rate in parts
    ]
    u = outs[0]
    for o in outs[1:]:
        u = u.unionByName(o)
    return u


def group_cap_sample(
    df: DataFrame,
    group: str,
    key: str,
    cap: int,
    salt: str = "cap",
) -> DataFrame:
    """Per-group quota sampling — keep at most ``cap`` rows per
    ``group`` value (the crawl-curation primitive: "at most N pages
    per domain/source", bounding any single origin's share of the
    corpus). Selection is the ``cap`` smallest salted-md5 ranks of
    ``key`` within the group, so it is a uniform, DETERMINISTIC
    within-group sample: re-runs, retries, and other engines pick the
    same rows, and raising ``cap`` only ADDS rows (nested samples —
    the same property as ``hash_sample``'s threshold).

    Scale: one hash-partitioned window sort by group. Groups under the
    cap pass through; a pathologically hot group sorts ``cap``-bounded
    output but its FULL row set on one partition first — at crawl
    scale, pre-filter obvious giants with an aggregated count +
    ``hash_sample`` stage before the exact window if one origin holds
    >~1 partition of rows (same skew rule as the dedup bucket caps).
    No reference counterpart (Ontario has no sampling)."""
    from pyspark.sql.window import Window

    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    # NULL keys are DROPPED, matching hash_sample (whose NULL-valued
    # md5 predicate already drops them): a NULL key has no rank, and
    # several NULL-key rows would be mutual order ties — each engine
    # would break them differently, so which rows fill the cap would
    # diverge cross-engine (round-8 review fix; the first fix ranked
    # NULLs last, which still left the tie inside the NULL run).
    order = F.md5(F.concat(F.col(key).cast("string"), F.lit(salt)))
    w = Window.partitionBy(group).orderBy(order, F.col(key))
    return (
        df.filter(F.col(key).isNotNull())
        .withColumn("__gc_rn", F.row_number().over(w))
        .filter(F.col("__gc_rn") <= cap)
        .drop("__gc_rn")
    )


def token_budget_mix(
    df: DataFrame,
    group: str,
    key: str,
    weight: str,
    budgets: dict[str, int],
    default_budget: int = 0,
    salt: str = "budget",
) -> DataFrame:
    """Budgeted corpus mixing by WEIGHT, not row count — "take ~N
    tokens from each source", the absolute-budget complement of
    ``temperature_mix``'s proportional weights. Rows are ranked by
    salted md5 of ``key`` within each group and kept while the
    RUNNING SUM of ``weight`` (token/char count, inclusive of the
    current row) stays ≤ the group's budget; unlisted groups fall
    back to ``default_budget`` (0 = drop). Deterministic and NESTED
    like the other samplers: a bigger budget strictly extends the
    selection; the md5 rank order makes the kept set a uniform sample
    of the group. A single row heavier than the whole budget selects
    nothing from its group (documented; pre-chunk such rows).

    Scale: one keyed window sort per group — identical shape to
    ``group_cap_sample`` (the running sum rides the same sort), same
    hot-group boundary. The (md5, key) order is total, so Spark's and
    DuckDB's default RANGE window frames agree row-for-row and the
    oracle replicates the exact selection."""
    from pyspark.sql.window import Window

    # NULL keys dropped (no rank — same rule and rationale as
    # group_cap_sample); NULL weights dropped too, since SUM would
    # skip them and an unknown-cost row would ride along free inside
    # any budget (round-8 review fix).
    order = F.md5(F.concat(F.col(key).cast("string"), F.lit(salt)))
    w = Window.partitionBy(group).orderBy(order, F.col(key))
    budget = F.lit(int(default_budget))
    for value, b in sorted(budgets.items()):
        budget = F.when(F.col(group) == value, F.lit(int(b))).otherwise(budget)
    run = F.sum(F.col(weight).cast("long")).over(w)
    return (
        df.filter(F.col(key).isNotNull() & F.col(weight).isNotNull())
        .withColumn("__tb_run", run)
        # budget > 0 so a zero-budget group is dropped WHOLE — without
        # it, zero-weight rows (empty docs) pass `0 <= 0` and leak
        # through a group the contract says is dropped
        .filter((F.col("__tb_run") <= budget) & (budget > F.lit(0)))
        .drop("__tb_run")
    )


def fixed_size_sample(
    df: DataFrame, key: str, n: int, salt: str = "fix"
) -> DataFrame:
    """EXACTLY-n deterministic uniform sample of the whole dataset —
    the eval-holdout primitive ("pick exactly 10k docs"), which
    rate-based ``hash_sample`` can only approximate. Selection is the
    n smallest salted-md5 ranks of ``key``: uniform over the corpus,
    reproducible cross-engine/re-run, and NESTED (n+1 extends n).
    NULL keys are dropped (no rank — same rule as the other
    samplers).

    Scale: ``orderBy(rank).limit(n)`` plans as
    ``TakeOrderedAndProject`` — each partition keeps its local top-n
    and the driver merges n-sized heaps, so there is NO global sort
    and no shuffle of the corpus; driver memory is O(n). Size n
    accordingly (an n in the millions belongs in ``hash_sample`` +
    exact trim territory)."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    order = F.md5(F.concat(F.col(key).cast("string"), F.lit(salt)))
    return (
        df.filter(F.col(key).isNotNull()).orderBy(order, F.col(key)).limit(n)
    )


def sql_hash_predicate(key_expr: str, rate: float, salt: str = "") -> str:
    """The DuckDB-equivalent predicate (oracle side of the contract)."""
    return (
        f"substr(md5(CAST({key_expr} AS VARCHAR) || '{salt}'), 1, {_HEXW})"
        f" < '{_threshold(rate)}'"
    )


def temperature_mix(
    df: DataFrame,
    key: str,
    stratum: str,
    alpha: float = 0.5,
    target_frac: float = 0.3,
    salt: str = "temp",
) -> DataFrame:
    """Temperature-based corpus mixing (the multilingual/data-mixture
    resampling recipe): target share of stratum s ∝ n_s^alpha, so
    alpha=1 keeps natural proportions, alpha→0 flattens toward uniform
    — small sources are UP-weighted relative to their natural share.
    ``target_frac`` sets the overall kept fraction; per-stratum keep
    rates are capped at 1 (no upsampling — a row appears at most once).
    Rows whose stratum is NULL are dropped (documented semantics; see
    the in-code note).

    Fully distributed AND engine-deterministic: per-stratum counts are
    one tiny aggregate broadcast back onto the scan; the per-row
    decision is the same md5-prefix predicate as ``hash_sample``
    compared against ``rate × 16^6``. Cross-engine float identity is
    preserved by (a) using IEEE-correctly-rounded ops only (sqrt for
    the default alpha=0.5 — ``pow`` is NOT correctly rounded and may
    differ between JVM and C runtimes in the last ulp; other alphas are
    supported but the oracle contract is documented for 0.5), and
    (b) summing the per-stratum weights in a WINDOW ordered by stratum
    (fixed left-to-right order on both engines, not shuffle-arrival
    order)."""
    from pyspark.sql.window import Window

    # Rows with a NULL stratum are dropped UP FRONT (an unclassified
    # row has no defined mixing weight; leaving the NULL group in the
    # weight sum while the equi-join silently drops its rows would both
    # lose rows invisibly AND break cross-engine bit-parity — Spark
    # orders NULLs first in the weight window, DuckDB last).
    # NB: Spark resolves column names case-insensitively by default, so
    # the weight/total pairs use distinct lowercase names (__w vs __W
    # would silently collide)
    df = df.filter(F.col(stratum).isNotNull())
    stats = df.groupBy(stratum).agg(F.count(F.lit(1)).alias("__n"))
    w = (
        F.sqrt(F.col("__n").cast("double"))
        if alpha == 0.5
        else F.pow(F.col("__n").cast("double"), F.lit(float(alpha)))
    )
    full = Window.orderBy(stratum).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    rates = (
        stats.withColumn("__wt", w)
        .withColumn("__wsum", F.sum("__wt").over(full))
        .withColumn("__nsum", F.sum("__n").over(full))
        .select(
            stratum,
            F.least(
                F.lit(1.0),
                F.col("__wt")
                / F.col("__wsum")
                * F.lit(float(target_frac))
                * F.col("__nsum").cast("double")
                / F.col("__n").cast("double"),
            ).alias("__rate"),
        )
    )
    pref = F.conv(_prefix(F.col(key), salt), 16, 10).cast("double")
    return (
        df.join(F.broadcast(rates), stratum)
        .filter(pref < F.col("__rate") * F.lit(float(_SPACE)))
        .drop("__rate")
    )


def temperature_mix_sql(
    table: str, key_expr: str, stratum: str, target_frac: float, salt: str = "temp"
) -> str:
    """DuckDB oracle for ``temperature_mix`` at alpha=0.5 — identical
    expression shape and operation order, so every double is
    bit-identical and the selected row set matches exactly."""
    return f"""
WITH stats AS (
  SELECT {stratum}, COUNT(*) AS n FROM {table}
  WHERE {stratum} IS NOT NULL GROUP BY {stratum}
), rates AS (
  SELECT {stratum},
         LEAST(1.0,
               sqrt(CAST(n AS DOUBLE))
               / (SUM(sqrt(CAST(n AS DOUBLE)))
                    OVER (ORDER BY {stratum}
                          ROWS BETWEEN UNBOUNDED PRECEDING
                               AND UNBOUNDED FOLLOWING))
               * {float(target_frac)!r}
               * CAST((SUM(n) OVER (ORDER BY {stratum}
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND UNBOUNDED FOLLOWING)) AS DOUBLE)
               / CAST(n AS DOUBLE)) AS rate
  FROM stats
)
SELECT t.* FROM {table} t JOIN rates r USING ({stratum})
WHERE CAST(('0x' || substr(md5(CAST({key_expr} AS VARCHAR) || '{salt}'),
                           1, {_HEXW})) AS BIGINT)
      < r.rate * {float(_SPACE)!r}
"""


def epoch_shuffle(
    df: DataFrame, key: str, epoch: int, salt: str = ""
) -> DataFrame:
    """Deterministic per-epoch training order: rows sorted by
    ``md5(key || epoch || salt)`` — a different but REPRODUCIBLE
    permutation every epoch, identical across engines, re-runs, and
    cluster sizes (no RNG state, no zipWithIndex). The ``shuffle``
    step of a training-data loader: downstream sequential readers see
    epoch-decorrelated order while lineage stays replayable.

    Scale: one range-partitioned sort on a 16-byte key — the same
    cost class as any global orderBy; at lake scale you'd write the
    result partitioned and let readers stream partitions in name
    order."""
    okey = F.md5(
        F.concat(
            F.col(key).cast("string"),
            F.lit(f"|e{int(epoch)}|{salt}"),
        )
    )
    return df.withColumn("__shuffle_key", okey).orderBy(
        "__shuffle_key"
    ).drop("__shuffle_key")


def weighted_topk(
    df: DataFrame,
    key: str,
    weight_col: str,
    n: int,
    salt: str = "aes",
    round_to: int = 6,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement via exponential sort keys
    (Efraimidis–Spirakis A-ES): every row gets ``sk = ln(u) / w`` for a
    deterministic md5-derived uniform ``u`` in (0, 1] and weight
    ``w > 0``, and the n LARGEST keys win — inclusion probability is
    proportional to weight, jointly correct for the whole sample, and
    reproducible forever (same key+salt → same sample on any engine or
    cluster size; reference behavior: weighted corpus mixing that a
    resumable pipeline can replay).

    Rows with NULL or non-positive weight have no defined inclusion
    probability and are dropped (documented semantics, mirrored by the
    oracle).

    Scale: the selection is ``orderBy().limit(n)`` — Spark's
    distributed TakeOrderedAndProject (per-partition top-n heaps merged
    on the driver), NOT a global sort or a single-partition window; the
    scan streams once with no shuffle. ``sk`` is emitted ROUNDed so the
    cross-engine contract doesn't hinge on libm's last ulp; ties on the
    rounded key break by ``key`` ascending, a total order."""
    w = F.col(weight_col).cast("double")
    u = (F.conv(_prefix(F.col(key), salt), 16, 10).cast("double") + F.lit(1.0)) / F.lit(
        float(_SPACE)
    )
    sk = F.round(F.log(u) / w, round_to)
    return (
        df.filter(w > 0)
        .select(F.col(key), w.alias("weight"), sk.alias("sort_key"))
        .orderBy(F.desc("sort_key"), F.asc(key))
        .limit(n)
    )


def weighted_topk_sql(
    table: str,
    key: str,
    weight_expr: str,
    n: int,
    salt: str = "aes",
    round_to: int = 6,
) -> str:
    """DuckDB oracle replicating ``weighted_topk`` bit-for-bit: same
    md5-prefix uniform, same ln(u)/w expression shape, same rounded
    tiebreak."""
    return f"""
SELECT {key}, CAST({weight_expr} AS DOUBLE) AS weight,
       ROUND(ln((CAST(('0x' || substr(md5(CAST({key} AS VARCHAR) || '{salt}'),
                                1, {_HEXW})) AS BIGINT) + 1.0)
                / {float(_SPACE)!r})
             / CAST({weight_expr} AS DOUBLE), {round_to}) AS sort_key
FROM {table}
WHERE CAST({weight_expr} AS DOUBLE) > 0
ORDER BY sort_key DESC, {key} ASC
LIMIT {n}
"""


def token_packing(
    df: DataFrame,
    id_col: str,
    text_col: str,
    stratum: str,
    seq_len: int = 2048,
) -> DataFrame:
    """Concat-and-chunk sequence packing (round 11) — the GPT-style
    pretraining data layout: documents are concatenated in a
    deterministic order and the token stream is cut into fixed
    ``seq_len`` sequences; each document reports which packs it lands
    in. The split-allowed complement of ``packing.pack_doc_sequences``
    (whole-doc bin packing: a doc never crosses a bin) — here docs DO
    span pack boundaries, the way causal-LM pretraining consumes them.
    Packing runs independently PER ``stratum`` (source/shard), the
    way real pipelines pack per input shard — the running token sum is
    a window partitioned by the stratum, so no global single-task sort
    exists and strata pack in parallel at any scale.

    Returns ``(id, stratum, n_tokens, pack_first, pack_last, pack_offset)``
    per document: the first/last ``seq_len``-token pack the document's
    tokens occupy and its byte-free integer offset inside the first.
    Whitespace token counts (1 for an empty document — the ``[""]``
    tokenization edge both engines share) keep every column exact
    integer arithmetic for the oracle."""
    from pyspark.sql.window import Window

    from ontario_spark.operators.textops import tokens

    n_tok = F.size(tokens(F.col(text_col)))
    w = (
        Window.partitionBy(stratum)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(n_tok).over(w)
    first_tok = cum - n_tok
    return df.select(
        F.col(id_col),
        F.col(stratum),
        n_tok.cast("long").alias("n_tokens"),
        F.floor(first_tok / seq_len).cast("long").alias("pack_first"),
        F.floor((cum - 1) / seq_len).cast("long").alias("pack_last"),
        (first_tok % seq_len).cast("long").alias("pack_offset"),
    )


def token_packing_sql(
    table: str, id_col: str, text_col: str, stratum: str, seq_len: int = 2048
) -> str:
    """DuckDB replay of ``token_packing`` — identical tokenization,
    per-stratum running sum, and integer pack arithmetic."""
    return f"""
WITH t AS (
  SELECT {id_col}, {stratum},
         array_length(regexp_split_to_array(trim({text_col}), '\\s+'))
           AS n_tokens
  FROM {table}
), c AS (
  SELECT {id_col}, {stratum}, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY {stratum} ORDER BY {id_col}
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM t
)
SELECT {id_col}, {stratum}, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(FLOOR((cum - n_tokens) / {seq_len}) AS BIGINT) AS pack_first,
       CAST(FLOOR((cum - 1) / {seq_len}) AS BIGINT) AS pack_last,
       CAST((cum - n_tokens) % {seq_len} AS BIGINT) AS pack_offset
FROM c
"""
