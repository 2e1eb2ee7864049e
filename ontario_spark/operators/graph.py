"""Iterative graph operators: transitive closure for SPARQL property
paths ``p+`` / ``p*``.

The reference has no property paths at all (SURVEY.md §2.5); this is
beyond-reference surface. Spark has no native fixpoint operator, so the
closure is the standard semi-naive Datalog iteration expressed as
DataFrame joins:

    delta_0 = edges
    delta_i = project(delta_{i-1} ⋈ edges) − acc      (only NEW pairs)
    acc     = acc ∪ delta_i                            until delta = ∅

Scale design (100 TB): each iteration is a shuffled equi-join on the
frontier only — the delta, not the accumulated closure, drives the join,
so per-iteration cost tracks the number of *new* pairs (semi-naive, not
naive). ``localCheckpoint`` truncates lineage every iteration; without
it the plan doubles per step and Catalyst analysis time explodes after
~15 iterations. Persisted deltas are unpersisted as soon as the next
delta is materialized. Diameter of real hierarchies (org charts,
geo containment, categories) is small — ``max_iter`` is a cycle guard,
not an expected bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ClosureError(Exception):
    pass


def _pin(df: DataFrame) -> DataFrame:
    """Truncate lineage. localCheckpoint when the plan allows it;
    Spark's checkpoint attribute-rewrite throws NoSuchElementException
    on plans that reference the same checkpointed relation twice
    ("key not found: src#N"), so fall back to persist+materialize —
    same effect on iteration cost, lineage just grows linearly."""
    try:
        return df.localCheckpoint(eager=True)
    except Exception:
        df = df.persist()
        df.count()
        return df


def transitive_closure(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
    include_identity: bool = False,
) -> DataFrame:
    """Distinct reachability pairs of ``edges`` under 1-or-more steps
    (SPARQL ``p+``). With ``include_identity``, zero-step pairs
    ``(n, n)`` for every node appearing in the edge relation are added
    (SPARQL ``p*`` restricted to the path's node domain).

    Cycles terminate naturally: a cycle only re-derives already-seen
    pairs, so the anti-join empties the delta.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).filter(
        F.col("src").isNotNull() & F.col("dst").isNotNull()
    )
    e = _pin(e.dropDuplicates(["src", "dst"]))

    acc = e
    delta = e
    for _ in range(max_iter):
        # pin step BEFORE the anti-join so no checkpointed plan holds
        # two copies of the same relation (e in the join + e inside acc)
        step = _pin(
            delta.alias("d")
            .join(e.alias("e"), F.col("d.dst") == F.col("e.src"))
            .select(F.col("d.src").alias("src"), F.col("e.dst").alias("dst"))
            .dropDuplicates(["src", "dst"])
        )
        new = _pin(step.join(acc, on=["src", "dst"], how="left_anti"))
        if new.isEmpty():
            break
        acc = acc.unionByName(new)
        delta = new
    else:
        raise ClosureError(f"closure did not converge in {max_iter} iterations")

    if include_identity:
        nodes = (
            e.select(F.col("src").alias("n"))
            .unionByName(e.select(F.col("dst").alias("n")))
            .dropDuplicates(["n"])
        )
        acc = acc.unionByName(
            nodes.select(F.col("n").alias("src"), F.col("n").alias("dst"))
        ).dropDuplicates(["src", "dst"])
    return acc
