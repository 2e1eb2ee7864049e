"""Round-6 review regressions: molecule (per-class) source selection.

Covers the three executable findings from the round-6 review of the
round-5 planner changes:

1. A star answerable only by a CROSS-class (or classless+classed)
   subject self-join must not raise SourceSelectionError after the
   per-class union split.
2. Two same-shape maps of different classes asserting the SAME triple
   (same subject row in both tables) bind a solution ONCE — RDF graphs
   are triple sets (compile_star dedups within a shape group).
3. prune_connected's reverse pass still runs when the forward pass is
   skipped because some branch's assigned object map is non-template.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ontario_spark.catalog.model import (
    Catalog,
    DataSource,
    LogicalSource,
    TripleMap,
    ref,
    tpl,
)
from ontario_spark.compiler.star import compile_star
from ontario_spark.planner.decomposer import (
    bgp_stars,
    prune_connected,
    select_sources,
)
from ontario_spark.sparql.parser import parse

EX = "http://ex.org/mol/"
PFX = f"PREFIX ex: <{EX}>\n"


def stars_of(sparql: str):
    q = parse(PFX + sparql)
    triples = [t for t in q.where.elements if type(t).__name__ == "Triple"]
    return bgp_stars(triples)


def star_of(sparql: str):
    (star,) = stars_of(sparql)
    return star


def _lake(tmp_path, tables: dict[str, dict]) -> DataSource:
    for name, cols in tables.items():
        pq.write_table(pa.table(cols), str(tmp_path / f"{name}.parquet"))
    return DataSource(name="mol_lake", dstype="parquet", base_path=str(tmp_path))


def _cross_class_catalog(tmp_path) -> Catalog:
    """Person and Employee maps share the subject template; neither
    class alone covers {name, employer}."""
    cat = Catalog()
    lake = _lake(
        tmp_path,
        {
            "people": {"id": [1, 2, 3], "name": ["ann", "bo", "cy"]},
            "employees": {"id": [1, 3, 4], "employer": ["acme", "bolt", "dyn"]},
        },
    )
    cat.add(
        lake,
        TripleMap(
            name="PersonMap",
            source=LogicalSource(table="people"),
            subject=tpl(EX + "res/{id}"),
            subject_class=EX + "Person",
            predicates=((EX + "name", ref("name")),),
        ),
        TripleMap(
            name="EmployeeMap",
            source=LogicalSource(table="employees"),
            subject=tpl(EX + "res/{id}"),
            subject_class=EX + "Employee",
            predicates=((EX + "employer", ref("employer")),),
        ),
    )
    return cat


def test_cross_class_cover_answers(tmp_path, spark):
    cat = _cross_class_catalog(tmp_path)
    star = star_of("SELECT * WHERE { ?s ex:name ?n . ?s ex:employer ?e }")
    plan = select_sources(cat, star)
    # no single class covers both predicates → the shape group covers
    # jointly via a subject self-join
    assert len(plan.alternatives) == 1
    assert {tm.name for tm in plan.alternatives[0]} == {
        "PersonMap",
        "EmployeeMap",
    }
    rows = {
        (r["n"], r["e"])
        for r in compile_star(spark, cat, plan).df.collect()
    }
    assert rows == {("ann", "acme"), ("cy", "bolt")}


def test_classless_plus_classed_cover_answers(tmp_path, spark):
    cat = Catalog()
    lake = _lake(
        tmp_path,
        {
            "people": {"id": [1, 2], "name": ["ann", "bo"]},
            "extra": {"id": [1, 2], "age": [30, 40]},
        },
    )
    cat.add(
        lake,
        TripleMap(
            name="PersonMap",
            source=LogicalSource(table="people"),
            subject=tpl(EX + "res/{id}"),
            subject_class=EX + "Person",
            predicates=((EX + "name", ref("name")),),
        ),
        TripleMap(
            name="ExtraMap",  # no rr:class
            source=LogicalSource(table="extra"),
            subject=tpl(EX + "res/{id}"),
            subject_class=None,
            predicates=((EX + "age", ref("age")),),
        ),
    )
    star = star_of("SELECT * WHERE { ?s ex:name ?n . ?s ex:age ?a }")
    plan = select_sources(cat, star)
    assert len(plan.alternatives) == 1
    got = {
        (r["n"], r["a"])
        for r in compile_star(spark, cat, plan).df.collect()
    }
    assert got == {("ann", 30), ("bo", 40)}


def test_same_triple_from_two_classes_binds_once(tmp_path, spark):
    """people and companies both map :name over the same subject
    template; id=1 exists in BOTH with the same name — the virtual RDF
    graph asserts that triple once, so the solution appears once."""
    cat = Catalog()
    lake = _lake(
        tmp_path,
        {
            "people": {"id": [1, 2], "name": ["x", "p2"]},
            "companies": {"id": [1, 3], "name": ["x", "c3"]},
        },
    )
    cat.add(
        lake,
        TripleMap(
            name="PersonMap",
            source=LogicalSource(table="people"),
            subject=tpl(EX + "res/{id}"),
            subject_class=EX + "Person",
            predicates=((EX + "name", ref("name")),),
        ),
        TripleMap(
            name="CompanyMap",
            source=LogicalSource(table="companies"),
            subject=tpl(EX + "res/{id}"),
            subject_class=EX + "Company",
            predicates=((EX + "name", ref("name")),),
        ),
    )
    star = star_of("SELECT * WHERE { ?s ex:name ?n }")
    plan = select_sources(cat, star)
    # one branch per class, same shape group
    assert len(plan.alternatives) == 2
    assert plan.alt_groups == [0, 0]
    bf = compile_star(spark, cat, plan).materialize("s")
    rows = [(r["s"], r["n"]) for r in bf.df.select("s", "n").collect()]
    assert len(rows) == len(set(rows)) == 3  # res/1 'x' once, p2, c3
    assert (EX + "res/1", "x") in set(rows)


def _mixed_link_plans(tmp_path):
    """Star ?x→?y where AMap's link is a template of the WRONG shape
    and A2Map's link is a lexical column (unknowable)."""
    cat = Catalog()
    lake = _lake(
        tmp_path,
        {
            "a": {"id": [1], "bid": [1]},
            "a2": {"id": [1], "burl": [EX + "c/1"]},
            "c": {"id": [1], "nm": ["n1"]},
        },
    )
    cat.add(
        lake,
        TripleMap(
            name="AMap",
            source=LogicalSource(table="a"),
            subject=tpl(EX + "a/{id}"),
            subject_class=EX + "A",
            predicates=((EX + "to", tpl(EX + "b/{bid}")),),
        ),
        TripleMap(
            name="A2Map",
            source=LogicalSource(table="a2"),
            subject=tpl(EX + "a2/{id}"),
            subject_class=EX + "A2",
            predicates=((EX + "to", ref("burl")),),
        ),
        TripleMap(
            name="CMap",
            source=LogicalSource(table="c"),
            subject=tpl(EX + "c/{id}"),
            subject_class=EX + "C",
            predicates=((EX + "name", ref("nm")),),
        ),
    )
    s1, s2 = stars_of("SELECT * WHERE { ?x ex:to ?y . ?y ex:name ?n }")
    return [select_sources(cat, s1), select_sources(cat, s2)]


def test_reverse_prune_runs_despite_lexical_branch(tmp_path):
    plans = _mixed_link_plans(tmp_path)
    xplan = next(p for p in plans if p.star.subject.value == "x")
    assert {tm.name for alt in xplan.alternatives for tm in alt} == {
        "AMap",
        "A2Map",
    }
    prune_connected(plans)
    # forward pass is skipped (mixed template/lexical assigned maps),
    # but the reverse pass still drops AMap: its emitted shape b/{..}
    # cannot reach CMap's subject shape c/{..}
    assert [
        {tm.name for tm in alt} for alt in xplan.alternatives
    ] == [{"A2Map"}]
    # parallel group bookkeeping stayed in sync
    assert xplan.alt_groups is not None
    assert len(xplan.alt_groups) == len(xplan.alternatives)


def test_salted_join_tolerates_map_columns(spark):
    l = spark.createDataFrame(
        [(1, {"a": 1}), (2, {"b": 2}), (2, {"c": 3})],
        "k int, m map<string,int>",
    )
    r = spark.createDataFrame([(1, "x"), (2, "y")], "k int, v string")
    from ontario_spark.storage import salted_join

    got = salted_join(l, r, "k", salt=4)
    assert got.count() == 3
    assert {row["v"] for row in got.collect()} == {"x", "y"}


def test_keep_allowed_syncs_alt_groups(tmp_path):
    """Round-6 review fix: GRAPH/FROM source filtering must keep the
    parallel alt_groups list aligned or compile_star dedups the wrong
    branches."""
    from ontario_spark.compiler.query import _keep_allowed

    cat = Catalog()
    lake1 = _lake(
        tmp_path, {"people": {"id": [1], "name": ["x"]}}
    )
    # second source, same repo dir but distinct DataSource identity
    lake2 = DataSource(
        name="mol_lake2", dstype="parquet", base_path=str(tmp_path)
    )
    pq.write_table(
        pa.table({"id": [1], "name": ["x"]}),
        str(tmp_path / "companies.parquet"),
    )
    pq.write_table(
        pa.table({"id": [9], "title": ["t"]}),
        str(tmp_path / "books.parquet"),
    )
    cat.add(
        lake1,
        TripleMap(
            name="PersonMap",
            source=LogicalSource(table="people"),
            subject=tpl(EX + "res/{id}"),
            subject_class=EX + "Person",
            predicates=((EX + "name", ref("name")),),
        ),
        TripleMap(
            name="BookMap",
            source=LogicalSource(table="books"),
            subject=tpl(EX + "book/{id}"),
            subject_class=EX + "Book",
            predicates=((EX + "name", ref("title")),),
        ),
    )
    cat.add(
        lake2,
        TripleMap(
            name="CompanyMap",
            source=LogicalSource(table="companies"),
            subject=tpl(EX + "res/{id}"),
            subject_class=EX + "Company",
            predicates=((EX + "name", ref("name")),),
        ),
    )
    star = star_of("SELECT * WHERE { ?s ex:name ?n }")
    plan = select_sources(cat, star)
    assert len(plan.alternatives) == 3 and len(set(plan.alt_groups)) == 2
    _keep_allowed(plan, {"mol_lake"}, cat)
    names = [{tm.name for tm in alt} for alt in plan.alternatives]
    assert names == [{"PersonMap"}] or {"PersonMap"} in names
    assert len(plan.alt_groups) == len(plan.alternatives)
    # the surviving res/{id} branch keeps its ORIGINAL group id,
    # distinct from the book/{id} group's id
    kept = dict(zip([frozenset(n) for n in names], plan.alt_groups))
    if frozenset({"PersonMap"}) in kept and frozenset({"BookMap"}) in kept:
        assert kept[frozenset({"PersonMap"})] != kept[frozenset({"BookMap"})]


def test_hint_pruning_keeps_overlapping_template_shapes(tmp_path, spark):
    """Round-9 ADVICE: different template skeletons can format EQUAL
    URIs (res/{id} with id='12' == res/1{id} with id='2'), and the
    join path finds those matches lexically — so hint-template pruning
    inside an OPTIONAL must keep alternatives whose skeleton prefix
    may overlap the outer template's, pruning only provably-disjoint
    ones."""
    from ontario_spark.compiler.query import SparqlEngine

    cat = Catalog()
    lake = _lake(
        tmp_path,
        {
            "main": {"id": ["12", "3"], "name": ["a", "b"]},
            "scores_same": {"id": ["3"], "score": [7]},
            "scores_alt": {"id": ["2"], "score": [99]},
        },
    )
    cat.add(
        lake,
        TripleMap(
            name="MainMap",
            source=LogicalSource(table="main"),
            subject=tpl(EX + "res/{id}"),
            subject_class=EX + "Main",
            predicates=((EX + "name", ref("name")),),
        ),
        TripleMap(
            name="SameScoreMap",
            source=LogicalSource(table="scores_same"),
            subject=tpl(EX + "res/{id}"),
            subject_class=None,
            predicates=((EX + "score", ref("score")),),
        ),
        TripleMap(
            name="AltScoreMap",
            source=LogicalSource(table="scores_alt"),
            # OVERLAPPING skeleton: res/1{id} formats res/12 for id=2
            subject=tpl(EX + "res/1{id}"),
            subject_class=None,
            predicates=((EX + "score", ref("score")),),
        ),
    )
    df = SparqlEngine(spark, cat).query(
        PFX
        + """SELECT ?x ?name ?sc WHERE {
              ?x a ex:Main ; ex:name ?name .
              OPTIONAL { ?x ex:score ?sc } }"""
    )
    rows = {(r["x"], r["name"], r["sc"]) for r in df.collect()}
    assert rows == {
        (EX + "res/12", "a", 99),  # cross-shape lexical match survives
        (EX + "res/3", "b", 7),
    }


def test_hint_pruning_still_prunes_disjoint_templates(tmp_path, spark):
    """The disjoint-prefix case (customer/{k} vs supplier/{k}) must
    still prune — results identical either way; this guards the
    optimization's soundness, the plan effect is covered by the
    trisource suite."""
    from ontario_spark.compiler.query import SparqlEngine

    cat = Catalog()
    lake = _lake(
        tmp_path,
        {
            "main": {"id": ["1"], "name": ["a"]},
            "sc_c": {"id": ["1"], "score": [5]},
            "sc_s": {"id": ["1"], "score": [6]},
        },
    )
    cat.add(
        lake,
        TripleMap(
            name="MainMap",
            source=LogicalSource(table="main"),
            subject=tpl(EX + "customer/{id}"),
            subject_class=EX + "Main",
            predicates=((EX + "name", ref("name")),),
        ),
        TripleMap(
            name="CScore",
            source=LogicalSource(table="sc_c"),
            subject=tpl(EX + "customer/{id}"),
            subject_class=None,
            predicates=((EX + "score", ref("score")),),
        ),
        TripleMap(
            name="SScore",
            source=LogicalSource(table="sc_s"),
            subject=tpl(EX + "supplier/{id}"),
            subject_class=None,
            predicates=((EX + "score", ref("score")),),
        ),
    )
    df = SparqlEngine(spark, cat).query(
        PFX
        + """SELECT ?x ?sc WHERE {
              ?x a ex:Main ; ex:name ?name .
              OPTIONAL { ?x ex:score ?sc } }"""
    )
    rows = {(r["x"], r["sc"]) for r in df.collect()}
    assert rows == {(EX + "customer/1", 5)}
