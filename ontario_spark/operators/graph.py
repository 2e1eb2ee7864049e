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


def _pin(df: DataFrame, eager: bool = True) -> DataFrame:
    """Truncate lineage. localCheckpoint when the plan allows it;
    Spark's checkpoint attribute-rewrite throws NoSuchElementException
    on plans that reference the same checkpointed relation twice
    ("key not found: src#N"), so fall back to persist+materialize —
    same effect on iteration cost, lineage just grows linearly.

    ``eager=False`` truncates the logical plan the same way (the
    returned frame is a LogicalRDD) but defers materialization to the
    first consuming action — the right shape for FIXED-round loops
    whose rounds are data-dependent only through broadcasts (e.g. the
    BPE trainer): no per-round driver action, one job end-to-end,
    while the plan still cannot double per round."""
    try:
        return df.localCheckpoint(eager=eager)
    except Exception:
        df = df.persist()
        if eager:
            df.count()
        return df


def _pin_cached(df: DataFrame) -> DataFrame:
    """Pin a loop frame by PERSIST + materialize instead of
    ``localCheckpoint``: under AQE the checkpointed LogicalRDD reports
    ``UnknownPartitioning(0)`` (measured on Spark 4.1 — a same-key join
    above it re-Exchanges the pinned side every round), while an
    ``InMemoryTableScan`` preserves the cached plan's hashpartitioning,
    so downstream same-key joins/aggregates plan with NO exchange on
    this side. Lineage is NOT truncated — callers keep reference chains
    bounded (fixed small iteration counts) and unpersist superseded
    frames, exactly as the loops below already do."""
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
        # step fed only `new` (now materialized): release it so the
        # persist-fallback path doesn't accumulate a cached frame per
        # iteration (no-op for checkpointed frames). Deltas folded into
        # acc stay pinned — acc's plan references them until the caller
        # consumes the closure.
        step.unpersist()
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


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
) -> DataFrame:
    """Undirected connected components: ``(node, component)`` where
    ``component`` is the MINIMUM node id in the node's component —
    deterministic, engine-independent labels.

    The duplicate-clustering step of a dedup pipeline: near-dup PAIRS
    (from LSH/Jaccard) become CLUSTERS so one canonical doc per cluster
    survives. Standard min-label propagation: each round every node
    takes the min of its own label and its neighbors' labels; a round
    is one shuffle join + groupBy on the edge relation. Converges in
    O(component diameter) rounds — duplicate clusters are near-cliques
    (diameter ≤ ~2-3), so this beats the O(log n) large-star/small-star
    variant's constant factor in practice; for adversarially long path
    graphs at lake scale, swap in large-star/small-star behind the same
    signature. Lineage is truncated per round (``_pin``) exactly like
    ``transitive_closure``; convergence is detected by the label-sum
    fingerprint (min-propagation only ever DECREASES labels, so the sum
    strictly decreases until fixpoint and is stable exactly there) —
    ONE tiny aggregate action per round, no pairwise diff join.
    """
    # Symmetrize by exploding each directed pair into both directions
    # INSIDE one projection: the upstream pair-generation DAG (often an
    # expensive similarity join) is evaluated once and pinned once — a
    # union of the frame with its flip would reference that DAG twice.
    directed = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
        F.col("a").isNotNull() & F.col("b").isNotNull() & (F.col("a") != F.col("b"))
    )
    both = F.explode(
        F.array(
            F.struct(F.col("a"), F.col("b")),
            F.struct(F.col("b").alias("a"), F.col("a").alias("b")),
        )
    )
    spark = edges.sparkSession
    from pyspark.sql.types import NumericType

    width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # Round 13 (VERDICT item 7): the loop no longer narrows session-
    # global spark.sql.shuffle.partitions (CONF_LOCK only serialized
    # writers — a concurrent planner could read the narrowed value).
    # Instead the loop-INVARIANT edge set is pinned CO-PARTITIONED on
    # its join key via ``_pin_cached`` (persist keeps hashpartitioning
    # where localCheckpoint reports UnknownPartitioning), so the
    # e-side of every round's e⋈labels never re-shuffles — the edge
    # relation is the loop's dominant bytes. The label frames keep the
    # truncating ``_pin``: small per-round exchanges in exchange for a
    # plan that cannot double per round (see the note below).
    e = _pin_cached(
        directed.select(both.alias("e"))
        .select("e.a", "e.b")
        .dropDuplicates(["a", "b"])
        .repartition(width, "a")
    )
    numeric_ids = isinstance(e.schema["a"].dataType, NumericType)
    # labels stay _pin (localCheckpoint): each round references its
    # predecessor TWICE (neighbor-min + left join), so a persist-only
    # pin would DOUBLE the logical plan per round — exponential by the
    # 30-round guard. Truncation wins over partitioning reuse for the
    # small label frames; only the loop-invariant edge set keeps its
    # layout via _pin_cached.
    labels = _pin(
        e.select(F.col("a").alias("n"))
        .dropDuplicates(["n"])
        .select("n", F.col("n").alias("label"))
    )
    prev_sum = None
    for _ in range(max_iter):
        nbr_min = (
            e.join(labels, e["a"] == labels["n"])
            .groupBy(F.col("b").alias("n2"))
            .agg(F.min("label").alias("nbr"))
        )
        new_labels = _pin(
            labels.join(nbr_min, labels["n"] == nbr_min["n2"], "left").select(
                "n",
                F.least(
                    F.col("label"), F.coalesce("nbr", "label")
                ).alias("label"),
            )
        )
        if numeric_ids:
            # label-sum fingerprint: min propagation only DECREASES
            # numeric labels, so the sum strictly decreases until
            # fixpoint and is stable exactly there — one tiny agg.
            cur = new_labels.agg(F.sum("label").alias("s")).collect()[0]["s"]
            converged = cur == prev_sum
            prev_sum = cur
        else:
            # non-numeric ids (content hashes, URIs): sum is not
            # defined, so diff the two PINNED label frames — a
            # small sized-partition join per round, exact.
            # fresh attribute ids on one side: when _pin fell back
            # to persist (no checkpoint), new_labels' lineage still
            # contains labels and a direct self-join is ambiguous
            nl = new_labels.select(
                F.col("n").alias("__n2"), F.col("label").alias("__l2")
            )
            converged = (
                nl.join(labels, nl["__n2"] == labels["n"])
                .filter(F.col("__l2") != F.col("label"))
                .isEmpty()
            )
        labels.unpersist()  # superseded; new_labels is materialized
        labels = new_labels
        if converged:
            e.unpersist()
            return labels.select("n", F.col("label").alias("component"))
    raise ClosureError(f"components did not converge in {max_iter} iterations")


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 5,
    damping: float = 0.85,
    round_to: int = 10,
) -> DataFrame:
    """Fixed-iteration PageRank → ``(node, rank)`` — the link-graph
    importance score a curation pipeline uses to rank domains/sources
    (simplified: dangling mass is not redistributed, the standard
    "leaked" variant — both engines implement the identical recurrence
    so the simplification cancels in the oracle comparison).

    Determinism discipline (same as ``unigram_logprob``): every
    per-edge contribution r(src)/deg(src) is rounded to
    ``round_to + 4`` decimals and summed as DECIMAL; each updated rank
    is rounded to ``round_to``. The GRIDS DIFFER BY DESIGN: with one
    shared grid the damped product of already-quantized sums lands
    EXACTLY on rounding half-boundaries, where Spark (HALF_UP on the
    shortest decimal repr) and DuckDB (binary-double rounding) break
    ties differently — observed as 1-ulp rank drift at sf0.01. Four
    orders of separation make a rank-grid half-tie require a binary
    coincidence (~1e-9 per value) instead of a certainty.

    Scale shape: ranks live keyed by node; one iteration = edges⋈ranks
    (shuffle on src) + groupBy dst — the same two-shuffle round as
    every distributed PageRank; lineage pinned per round (``_pin``)
    like the closure/CC loops. ``iters`` is fixed (not convergence-
    probed) so the oracle can unroll the exact same number of steps."""
    cdec = f"decimal(28,{round_to + 4})"
    dec = f"decimal(28,{round_to})"
    # 1.0 - 0.85 is the double 0.15000000000000002 — one ulp above the
    # 0.15 literal an unrolled SQL oracle writes; re-round so both
    # engines feed the identical teleport constant into the rank grid
    # (round-6 review fix)
    teleport = round(1.0 - damping, 12)
    spark = edges.sparkSession
    width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # Round 13 (VERDICT items 4+7): the edge set is pinned PRE-
    # PARTITIONED on the contribution join key via ``_pin_cached`` —
    # persist preserves the cached plan's hashpartitioning where
    # localCheckpoint reports UnknownPartitioning — so every
    # iteration's e⋈ranks and the one-off deg aggregate reuse the
    # edge-side exchange instead of re-shuffling the EDGE set (the
    # operator's dominant bytes) once per round. ``nodes`` keeps its
    # distinct's hashpartitioning(node, width) the same way, so the
    # per-round assembly join is exchange-free on the nodes side too.
    # This also retires the round-12 ``_loop_shuffle_width``
    # session-conf mutation for this loop (its sub-width sizing
    # measured NEUTRAL here at sf0.1 — the pinned rank frames are one
    # row per node; a concurrent planner could read the mutated conf).
    e = _pin_cached(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .repartition(width, "a")
    )
    nodes = _pin_cached(
        e.select(F.col("a").alias("node"))
        .union(e.select(F.col("b").alias("node")))
        .distinct()
    )
    # deg is consumed once per iteration — persist (lazily) so the
    # aggregate over the pinned edge set runs once, not ``iters``
    # times.
    from ontario_spark.operators.dedup import _bounded_persist

    deg = _bounded_persist(
        e.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    )
    n_row = F.broadcast(nodes.agg(F.count(F.lit(1)).alias("__n")))
    ranks = nodes.crossJoin(n_row).select(
        "node",
        F.round(F.lit(1.0) / F.col("__n").cast("double"), round_to)
        .cast(dec)
        .alias("r"),
    )
    # Round 12: a fully lazy 5-iteration chain was ALSO tried here
    # (no per-round checkpoint, one job) and measured ~5% SLOWER at
    # sf0.1 — the rank frames being pinned are small (one row per
    # node), so the per-round action costs little, while the 5-deep
    # adaptive plan re-optimizes more; eager pins stay. (Contrast
    # kcore/label-prop, whose per-round pins materialized the full
    # EDGE set — converting those to lazy persists measured −50%+.)
    prev_ranks = None
    for _ in range(iters):
        contrib = (
            e.join(ranks.withColumnRenamed("node", "a"), "a")
            .join(deg, "a")
            .select(
                F.col("b").alias("node"),
                F.round(
                    F.col("r").cast("double")
                    / F.col("deg").cast("double"),
                    round_to + 4,
                )
                .cast(cdec)
                .alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        # new_ranks keeps the TRUNCATING _pin: a persist pin would
        # nest every prior round's plan inside this one (linear logical
        # growth, exponential AQE explain text), while the win it would
        # buy — skipping the rank-side exchange — is bounded by the
        # rank frame's size (one row per node). The frames worth
        # keeping partitioned are the loop-invariant ones above.
        new_ranks = _pin(
            nodes.join(contrib, "node", "left")
            .crossJoin(n_row)
            .select(
                "node",
                F.round(
                    F.lit(teleport) / F.col("__n").cast("double")
                    + F.lit(damping)
                    * F.coalesce(
                        F.col("inflow"), F.lit(0).cast(cdec)
                    ).cast("double"),
                    round_to,
                )
                .cast(dec)
                .alias("r"),
            )
        )
        if prev_ranks is not None:
            # the pinned frame this round consumed is superseded
            # and new_ranks is materialized — release the cached
            # copy
            prev_ranks.unpersist()
        prev_ranks = new_ranks
        ranks = new_ranks
    return ranks.select("node", F.col("r").cast("double").alias("rank"))


def triangle_counts(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle participation counts over an undirected graph
    (the classic cohesion / community-structure statistic; beyond-
    reference surface like the other graph operators here).

    Input edges may be directed, duplicated, or contain self-loops —
    they are canonicalized to a distinct undirected edge set first.

    Scale design (100 TB of edges): the naive ``a<b<c`` three-way
    self-join is quadratic in the max degree (a hub with d neighbors
    drives d² wedge rows through the shuffle). Instead each undirected
    edge is ORIENTED from its lower-(degree, id) endpoint to the
    higher one; every node's oriented out-degree is then O(sqrt(m)),
    wedges are enumerated only from oriented adjacency (Σ out_deg² ≤
    m^1.5 rows total — the optimal bound for triangle listing), and a
    wedge closes iff its (y, z) pair is itself an oriented edge: one
    more equi-join. Each triangle is found exactly once. All joins are
    plain shuffles on node keys; nothing collects.
    """
    from ontario_spark.operators.dedup import _bounded_persist

    # und feeds the degree count (twice, via the endpoint union), the
    # orientation join, and the closing-edge semi-join; oriented feeds
    # both wedge legs and the closing set — unpersisted, the whole
    # upstream edge-construction lineage re-evaluates ~5x per run
    # (measured 2.6 s -> the persist cuts the event-scan fan-out)
    und = _bounded_persist(
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
    )
    # degree of every endpoint, then orient low → high on (deg, id)
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b"))
    lower_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oriented = _bounded_persist(
        und.join(da, "a")
        .join(db, "b")
        .select(
            F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("x"),
            F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("y"),
        )
    )
    # wedges x→y, x→z with y < z (each unordered wedge once), closed by
    # an oriented edge between y and z in EITHER orientation
    e1 = oriented.select(F.col("x"), F.col("y"))
    e2 = oriented.select(F.col("x"), F.col("y").alias("z"))
    wedges = e1.join(e2, "x").filter(F.col("y") < F.col("z"))
    closing = oriented.select(
        F.least("x", "y").alias("y"), F.greatest("x", "y").alias("z")
    )
    tris = wedges.join(closing, ["y", "z"], "left_semi")
    return (
        tris.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def kcore(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    k: int = 3,
    rounds: int = 3,
) -> DataFrame:
    """Fixed-round k-core peel → ``(node, deg)`` for the nodes that
    still carry edges after ``rounds`` iterations of "drop every node
    with degree < k, then drop its edges". The k-core is the standard
    density filter over interaction graphs (spam rings, dense
    communities, robust co-occurrence sets); the peel is the textbook
    distributed algorithm — no per-node ordering, just degree counts.

    Like ``pagerank``, the round count is FIXED (not convergence-
    probed) so a DuckDB oracle can unroll exactly the same number of
    peels and hash-match the survivors; convergence at fixture scale
    is pytest-checked by peeling once more and asserting a fixpoint
    (tests/test_graph_extra.py).

    Scale shape: input is canonicalized to a distinct undirected edge
    set once (same as ``triangle_counts``); each round is one degree
    aggregate (shuffle on node) + two semi-joins filtering the
    symmetric edge list (shuffles on each endpoint) — per-round cost
    is O(|edges alive|), lineage pinned per round like the closure/CC
    loops, superseded iterates unpersisted."""
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(
            F.col("a").isNotNull()
            & F.col("b").isNotNull()
            & (F.col("a") != F.col("b"))
        )
        .dropDuplicates(["a", "b"])
    )
    from ontario_spark.operators.dedup import _bounded_persist

    # Fixed-round peel as ONE lazy job (round 12): every round's edge
    # set is persisted LAZILY — each round references its predecessor
    # three times (degree aggregate + two semi-joins), so the cache is
    # what keeps the recomputation tree linear, but materializing it
    # eagerly per round (the old localCheckpoint) paid ``rounds`` extra
    # actions and blocked AQE across the peel. The final action
    # populates each round's cache on first use; the bounded pool
    # (rounds+1 ≤ 8 entries) evicts leftovers across queries.
    sym = _bounded_persist(
        und.unionAll(
            und.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
    )
    for _ in range(rounds):
        alive = (
            sym.groupBy("a")
            .agg(F.count(F.lit(1)).alias("__d"))
            .filter(F.col("__d") >= k)
            .select("a")
        )
        sym = _bounded_persist(
            sym.join(alive, "a", "left_semi").join(
                alive.withColumnRenamed("a", "b"), "b", "left_semi"
            )
        )
    return sym.groupBy("a").agg(F.count(F.lit(1)).alias("deg")).select(
        F.col("a").alias("node"), "deg"
    )


def bfs_depths(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_depth: int = 6,
    node_col: str = "node",
) -> DataFrame:
    """Multi-source BFS: ``(node, depth)`` with the MINIMUM hop count
    from any seed node, frontier-at-a-time, depth capped at
    ``max_depth``. The distance-labeling primitive behind "within k
    hops of a flagged account" expansion, influence radii, and seed-
    set crawl scheduling.

    Scale shape (100 TB of edges): unlike ``transitive_closure`` the
    state is one row per VISITED NODE, never reachability pairs. Each
    level costs one equi-join of the current frontier against the edge
    relation (shuffle keyed on the join node) plus one anti-join
    against the visited set; frontier-at-a-time means a node reached
    at level d is never re-expanded at d' > d. Lineage is pinned per
    level (same discipline as the closure/CC loops) and superseded
    frontiers are unpersisted. Early-exits when the frontier empties.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).filter(
        F.col("src").isNotNull() & F.col("dst").isNotNull()
    )
    width = int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    # Edge set pinned pre-partitioned on the expansion join key — the
    # round-13 ``pagerank`` shape: each level's frontier⋈e reuses this
    # one exchange instead of re-shuffling the EDGE set per level, and
    # the session-conf width mutation is retired (VERDICT items 4+7).
    e = _pin(e.dropDuplicates(["src", "dst"]).repartition(width, "src"))
    visited = _pin(
        seeds.select(F.col(node_col).alias("node"))
        .dropDuplicates(["node"])
        .withColumn("depth", F.lit(0))
    )
    frontier = visited
    for d in range(1, max_depth + 1):
        reached = (
            frontier.join(e, frontier["node"] == e["src"])
            .select(F.col("dst").alias("node"))
            .dropDuplicates(["node"])
        )
        new = _pin(
            reached.join(visited, "node", "left_anti").withColumn(
                "depth", F.lit(d)
            )
        )
        if frontier is not visited:
            frontier.unpersist()
        if new.isEmpty():
            new.unpersist()
            break
        # visited stays a LAZY union of the pinned per-level
        # deltas: scanning it touches d cached frames (cheap),
        # while pinning it eagerly cost one extra materializing
        # action per level (round 12).
        visited = visited.unionByName(new)
        frontier = new
    return visited


def bipartite_cooccurrence(
    df: DataFrame,
    user_col: str,
    item_col: str,
    min_common: int = 2,
    max_items_per_user: int | None = None,
) -> DataFrame:
    """Item-item co-occurrence projection of a user↔item bipartite
    graph: for every item pair sharing ≥ ``min_common`` users, the
    co-user count and its cosine normalization
    ``n_common / sqrt(deg_a · deg_b)`` — the classic item-similarity
    prep for co-view/co-purchase features and retrieval negatives.

    Scale shape (100 TB of interactions): the projection self-joins
    the DISTINCT (user, item) relation on the user key, so a power
    user with d items emits d² pairs — ``max_items_per_user`` drops
    those users via an anti-join against the (few, by definition)
    heavy keys before the join, bounding any key's fan-out at cap²
    (the max_doc_freq discipline of the shingle joins). Degrees are
    computed from the UNCAPPED relation, so cosine denominators stay
    exact; the join payload is two item ids, never attributes.
    Determinism: cosine = exact-integer count / sqrt(exact-integer
    product) — two correctly-rounded IEEE ops, engine-identical."""
    ui = (
        df.select(F.col(user_col).alias("u"), F.col(item_col).alias("i"))
        .filter(F.col("u").isNotNull() & F.col("i").isNotNull())
        .dropDuplicates(["u", "i"])
    )
    # Eager pin kept (round 12): the lazy-persist variant was A/B'd —
    # 1.88 s vs 1.45 s at sf0.1 — the pinned LogicalRDD lets AQE plan
    # both consumers (deg, per-user stage) against known sizes, which
    # beats saving the pin's materializing action here.
    ui = _pin(ui)
    deg = ui.groupBy("i").agg(F.count(F.lit(1)).alias("deg"))
    # One u-keyed exchange serves the whole per-user stage (round 12):
    # the power-user cap is a whole-partition window count (no lists
    # materialized for the users it drops, so a monster key costs O(d)
    # state, never O(d) payload), the survivors' item lists are
    # collected by a groupBy("u") that REUSES the window's
    # hashpartitioning(u) (ClusteredDistribution(u) is already
    # satisfied — no second exchange), and the i<j pairs are generated
    # map-side by a double explode over the ≤cap-item array. The old
    # shape paid three u-exchanges of the full relation (heavy-user
    # aggregate, anti-join, self-join legs) plus the join's hash-table
    # build to emit the same pair multiset; per-pair rows now exist
    # only in the generator feeding the partial aggregate.
    joinable = ui
    if max_items_per_user is not None:
        from pyspark.sql.window import Window

        wd = Window.partitionBy("u")
        joinable = (
            ui.withColumn("__d", F.count(F.lit(1)).over(wd))
            .filter(F.col("__d") <= max_items_per_user)
            .drop("__d")
        )
    lists = joinable.groupBy("u").agg(F.collect_list("i").alias("__items"))
    pairs = (
        lists.select(F.explode("__items").alias("item_a"), "__items")
        .select("item_a", F.explode("__items").alias("item_b"))
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )
    out = (
        pairs.join(
            deg.select(F.col("i").alias("item_a"), F.col("deg").alias("deg_a")),
            "item_a",
        )
        .join(
            deg.select(F.col("i").alias("item_b"), F.col("deg").alias("deg_b")),
            "item_b",
        )
    )
    cos = F.col("n_common").cast("double") / F.sqrt(
        (F.col("deg_a") * F.col("deg_b")).cast("double")
    )
    return out.select(
        "item_a", "item_b", "n_common", "deg_a", "deg_b", cos.alias("cosine")
    )


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 5,
    damping: float = 0.85,
    round_to: int = 10,
    node_col: str = "node",
) -> DataFrame:
    """Fixed-iteration PERSONALIZED PageRank: the teleport mass lands
    only on the ``seeds`` set (uniformly), so ranks measure proximity
    to the seeds rather than global importance — the standard
    seed-expansion scorer (related-item discovery, trust propagation,
    "accounts near these flagged ones"). Dangling mass is not
    redistributed, matching ``pagerank``'s leaked variant.

    Same determinism discipline as ``pagerank`` (per-edge
    contributions rounded to ``round_to + 4`` and summed as DECIMAL,
    ranks re-rounded to ``round_to``; separated grids), and the seed
    teleport is ONE double division ``(1-d)/|S|`` written identically
    in the oracle, so the unrolled DuckDB SQL hash-matches. Same
    two-shuffle iteration and lineage pinning; the per-node seed flag
    is computed once and pinned, not re-derived per round."""
    cdec = f"decimal(28,{round_to + 4})"
    dec = f"decimal(28,{round_to})"
    teleport = round(1.0 - damping, 12)
    spark = edges.sparkSession
    width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # Edge set pinned pre-partitioned on the contribution join key —
    # same round-13 shape as ``pagerank`` (see the note there): the
    # per-round e⋈ranks and the deg aggregate reuse this one exchange,
    # and the session-conf width mutation is retired.
    e = _pin(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .repartition(width, "a")
    )
    s = seeds.select(F.col(node_col).alias("node")).dropDuplicates(["node"])
    nodes = _pin(
        e.select(F.col("a").alias("node"))
        .union(e.select(F.col("b").alias("node")))
        .union(s.select("node"))
        .distinct()
    )
    deg = e.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    ns_row = F.broadcast(s.agg(F.count(F.lit(1)).alias("__ns")))
    flagged = _pin_cached(
        nodes.join(
            s.select("node", F.lit(1).alias("__sflag")), "node", "left"
        )
        .crossJoin(ns_row)
        .select(
            "node",
            F.col("__sflag").isNotNull().alias("__seed"),
            F.col("__ns"),
        )
    )
    seed_unit = F.when(
        F.col("__seed"), F.lit(1.0) / F.col("__ns").cast("double")
    ).otherwise(F.lit(0.0))
    seed_tele = F.when(
        F.col("__seed"), F.lit(teleport) / F.col("__ns").cast("double")
    ).otherwise(F.lit(0.0))
    ranks = flagged.select(
        "node", F.round(seed_unit, round_to).cast(dec).alias("r")
    )
    # deg persists lazily (one aggregate, ``iters`` consumers);
    # eager per-round pins retained — see the measurement note in
    # ``pagerank`` above.
    from ontario_spark.operators.dedup import _bounded_persist

    deg = _bounded_persist(deg)
    prev_ranks = None
    for _ in range(iters):
        # Sparse-frontier contribution join (round 12): PPR mass
        # starts on the seeds only, so most nodes carry rank 0 for
        # the first hops — a zero-rank source contributes
        # round(0/deg) = 0 to the DECIMAL inflow sum, and a node
        # whose only in-edges come from zero-rank sources gets
        # sum = 0.0000, identical to the left-join miss's
        # coalesce(NULL, 0). Filtering r != 0 before the edge join
        # is therefore bit-exact (no float re-ordering — the sum
        # grid is decimal) while pruning the join to the reachable
        # frontier: the standard sparse PPR evaluation. At sf0.1
        # the fixture graph saturates within ~2 hops so the bench
        # number is NEUTRAL (measured flat); the win case is seeds
        # ≪ nodes with bounded expansion — the 100 TB "accounts
        # near these flagged ones" shape this operator exists for.
        # Cost when dense: one extra predicate on a cached scan.
        contrib = (
            e.join(
                ranks.filter(F.col("r") != 0).withColumnRenamed(
                    "node", "a"
                ),
                "a",
            )
            .join(deg, "a")
            .select(
                F.col("b").alias("node"),
                F.round(
                    F.col("r").cast("double")
                    / F.col("deg").cast("double"),
                    round_to + 4,
                )
                .cast(cdec)
                .alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        # truncating _pin — same growth argument as ``pagerank``.
        new_ranks = _pin(
            flagged.join(contrib, "node", "left")
            .select(
                "node",
                F.round(
                    seed_tele
                    + F.lit(damping)
                    * F.coalesce(
                        F.col("inflow"), F.lit(0).cast(cdec)
                    ).cast("double"),
                    round_to,
                )
                .cast(dec)
                .alias("r"),
            )
        )
        if prev_ranks is not None:
            prev_ranks.unpersist()
        prev_ranks = new_ranks
        ranks = new_ranks
    return ranks.select("node", F.col("r").cast("double").alias("rank"))


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 3,
) -> DataFrame:
    """Fixed-round synchronous label propagation → ``(node, label)``
    community assignments: every node starts as its own label; each
    round it adopts the label held by the PLURALITY of its neighbors,
    ties broken by minimum label — fully deterministic, so the same
    rounds unroll in a DuckDB oracle and hash-match. Communities are
    the classic unsupervised grouping over interaction graphs
    (near-dup families, user cliques, topic clusters) when components
    are too coarse (one giant blob) and modularity solvers are too
    order-sensitive to reproduce across engines.

    Scale shape: same canonical distinct undirected edge set as
    ``kcore``/``triangle_counts``, symmetrized once and pinned; each
    round is one join (neighbor labels, shuffle on node id), one
    (node, label) count aggregate, and one per-node argmax window —
    O(|edges|) per round, no per-node adjacency list materialization,
    lineage pinned per round so the plan does not grow."""
    from pyspark.sql.window import Window

    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(
            F.col("a").isNotNull()
            & F.col("b").isNotNull()
            & (F.col("a") != F.col("b"))
        )
        .dropDuplicates(["a", "b"])
    )
    from ontario_spark.operators.dedup import _bounded_persist

    # Fixed-round recurrence as ONE lazy job (round 12) — same
    # rationale as ``pagerank``/``kcore``: each round's label frame is
    # consumed exactly once by the next round, so no pinning is needed
    # at all; the symmetrized edge set (one consumer per round)
    # persists lazily. No per-round eager checkpoint actions.
    sym = _bounded_persist(
        und.unionAll(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    )
    labels = sym.select(F.col("a").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    w = Window.partitionBy("a").orderBy(F.col("__c").desc(), F.col("label"))
    for _ in range(rounds):
        nb = sym.join(labels, sym["b"] == labels["node"]).select(
            sym["a"], labels["label"]
        )
        cnt = nb.groupBy("a", "label").agg(F.count(F.lit(1)).alias("__c"))
        labels = (
            cnt.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(F.col("a").alias("node"), "label")
        )
    return labels
