"""BFrame §10.2 compatibility joins (maybe_null tracking).

A shared variable that CAN be unbound (OPTIONAL-only vars, UNION
padding, VALUES UNDEF...) must join with SPARQL compatibility
semantics — unbound matches anything and the merge takes the bound
side — not plain equi-join NULL semantics. These tests drive
BFrame.join / BFrame.restrict directly against a literal Python model
of §10.2 / §8.3.3, and pin that the equi-join fast path (no
maybe_null flags) keeps its old plan shape.
"""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ontario_spark.compiler.frame import LEXICAL, BFrame, TermMeta

VARS_L = ("a", "b", "l")  # a, b shared; l left-only
VARS_R = ("a", "b", "r")  # r right-only


def _bf(spark, rows, vars_, nullable=None):
    schema = ", ".join(f"{v} string" for v in vars_)
    df = (
        spark.createDataFrame(rows, schema)
        if rows
        else spark.createDataFrame([], schema)
    )
    flags = frozenset(
        nullable
        if nullable is not None
        else {v for i, v in enumerate(vars_) if any(r[i] is None for r in rows)}
    )
    return BFrame(df, {v: TermMeta(LEXICAL) for v in vars_}, flags)


def _model_join(lrows, rrows, how):
    out = []
    for m1 in lrows:
        hit = False
        for m2 in rrows:
            shared = set(m1) & set(m2)
            if all(
                m1[v] is None or m2[v] is None or m1[v] == m2[v]
                for v in shared
            ):
                hit = True
                merged = {}
                for v in set(m1) | set(m2):
                    x = m1.get(v)
                    merged[v] = x if x is not None else m2.get(v)
                out.append(merged)
        if how == "left_outer" and not hit:
            out.append({**{v: None for v in VARS_R}, **m1})
    return Counter(tuple(m[v] for v in sorted(m)) for m in out)


def _model_restrict(lrows, rrows, how, minus):
    out = []
    for m1 in lrows:
        def compat(m2):
            both = [
                v
                for v in set(m1) & set(m2)
                if m1[v] is not None and m2[v] is not None
            ]
            ok = all(m1[v] == m2[v] for v in both)
            return ok and (both or not minus)

        hit = any(compat(m2) for m2 in rrows)
        if (how == "left_semi") == bool(hit):
            out.append(m1)
    return Counter(tuple(m[v] for v in sorted(m)) for m in out)


def _dicts(rows, vars_):
    return [dict(zip(vars_, r)) for r in rows]


_v = st.one_of(st.none(), st.sampled_from(["x", "y", "z"]))
_lrows = st.lists(st.tuples(_v, _v, _v), min_size=0, max_size=5)
_rrows = st.lists(st.tuples(_v, _v, _v), min_size=0, max_size=4)


@settings(max_examples=12, deadline=None)
@given(_lrows, _rrows, st.sampled_from(["inner", "left_outer"]))
def test_compat_join_matches_model(spark, lrows, rrows, how):
    got = (
        _bf(spark, lrows, VARS_L)
        .join(_bf(spark, rrows, VARS_R), how)
        .df.collect()
    )
    want = _model_join(_dicts(lrows, VARS_L), _dicts(rrows, VARS_R), how)
    assert Counter(tuple(r[v] for v in sorted(set(VARS_L + VARS_R))) for r in got) == want


@settings(max_examples=12, deadline=None)
@given(
    _lrows,
    _rrows,
    st.sampled_from(
        [("left_semi", False), ("left_anti", False), ("left_anti", True)]
    ),
)
def test_compat_restrict_matches_model(spark, lrows, rrows, mode):
    how, minus = mode
    got = (
        _bf(spark, lrows, VARS_L)
        .restrict(_bf(spark, rrows, ("a", "b", "r")), how, minus=minus)
        .df.collect()
    )
    want = _model_restrict(
        _dicts(lrows, VARS_L), _dicts(rrows, ("a", "b", "r")), how, minus
    )
    assert Counter(tuple(r[v] for v in VARS_L) for r in got) == want


def test_unbound_merge_takes_bound_side(spark):
    """The §10.2 hallmark: a left row with ?a unbound joins EVERY
    right row and the merge takes the right binding."""
    left = _bf(spark, [(None, "b1", "l1"), ("x", "b1", "l2")], VARS_L)
    right = _bf(spark, [("x", "b1", "r1"), ("y", "b1", "r2")], VARS_R)
    got = {
        (r["a"], r["l"], r["r"])
        for r in left.join(right, "inner").df.collect()
    }
    assert got == {("x", "l1", "r1"), ("y", "l1", "r2"), ("x", "l2", "r1")}


def test_minus_vs_not_exists_on_disjoint_domains(spark):
    """§8.3.3: a MINUS pair with no var bound on both sides has
    disjoint domains and removes nothing; NOT EXISTS (substitution
    semantics) removes on any compatible match."""
    left = _bf(spark, [(None, None, "keep")], VARS_L)
    right = _bf(spark, [("x", "b", "r")], VARS_R)
    assert [
        r["l"] for r in left.restrict(right, "left_anti", minus=True).df.collect()
    ] == ["keep"]
    assert (
        left.restrict(right, "left_anti", minus=False).df.count() == 0
    )


def test_minus_partial_overlap_removes(spark):
    """?a bound+matching, ?b unbound: dom overlap via ?a → MINUS
    removes (the exact case the old equi-join anti got wrong)."""
    left = _bf(spark, [("x", None, "gone"), ("q", None, "keep")], VARS_L)
    right = _bf(spark, [("x", "anything", "r")], VARS_R)
    got = [
        r["l"]
        for r in left.restrict(right, "left_anti", minus=True).df.collect()
    ]
    assert got == ["keep"]


def test_conservative_flags_change_nothing(spark):
    """Over-flagging (maybe_null without actual NULLs) must not change
    the answer — the decomposition's all-bound group IS the equi-join."""
    lrows = [("x", "b1", "l1"), ("y", "b2", "l2")]
    rrows = [("x", "b1", "r1"), ("x", "b2", "r2")]
    plain = (
        _bf(spark, lrows, VARS_L, nullable=())
        .join(_bf(spark, rrows, VARS_R, nullable=()), "inner")
        .df.collect()
    )
    flagged = (
        _bf(spark, lrows, VARS_L, nullable=("a", "b"))
        .join(_bf(spark, rrows, VARS_R, nullable=("a",)), "inner")
        .df.collect()
    )
    key = lambda rs: Counter(tuple(r[c] for c in sorted(rs[0].asDict())) for r in rs)  # noqa: E731
    assert key(plain) == key(flagged)


def test_fast_path_plan_unchanged(spark):
    """No maybe_null flags → the old single equi-join plan: no Union,
    no BroadcastNestedLoop in the optimized plan."""
    left = _bf(spark, [("x", "b", "l")], VARS_L, nullable=())
    right = _bf(spark, [("x", "b", "r")], VARS_R, nullable=())
    plan = left.join(right, "inner").df._jdf.queryExecution().optimizedPlan().toString()
    assert "Union" not in plan and "Nested" not in plan


def test_flag_propagation(spark):
    """left_outer flags right-only vars; project intersects; inner
    join keeps a var flagged only when both sides could be null."""
    left = _bf(spark, [("x", "b", "l")], VARS_L, nullable=())
    right = _bf(spark, [("x", "b", "r")], VARS_R, nullable=())
    opt = left.join(right, "left_outer")
    assert opt.maybe_null == {"r"}
    assert opt.project(["a", "r"]).maybe_null == {"r"}
    assert opt.project(["a", "b"]).maybe_null == frozenset()
    ev = left.ensure_var("z")
    assert ev.maybe_null == {"z"}
