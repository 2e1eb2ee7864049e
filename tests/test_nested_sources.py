"""Nested-document sources: reference paths, iterators, parent refs.

Covers the reference's XML/nested-JSON wrapper semantics
(``ontario/wrappers/spark/sparql2sparksql.py`` rowTag iterator;
``spark/utils.py:460-583`` lateral-view explode + dotted access) on the
Spark-first PathResolver + catalog integration.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from ontario_spark.sources.nested import PathResolver, is_nested


@pytest.fixture(scope="module")
def nested_df(spark):
    rows = [
        Row(
            nid=1,
            meta=Row(country="DE", pop=83),
            tags=["a", "b"],
            customers=[
                Row(cid=10, name="c10", orders=[Row(oid=100), Row(oid=101)]),
                Row(cid=11, name="c11", orders=[]),
            ],
        ),
        Row(
            nid=2,
            meta=Row(country="FR", pop=68),
            tags=[],
            customers=[Row(cid=20, name="c20", orders=[Row(oid=200)])],
        ),
    ]
    return spark.createDataFrame(rows)


def test_is_nested():
    assert is_nested("a/b")
    assert is_nested("a[*]")
    assert not is_nested("plain")


def test_struct_path(nested_df):
    pr = PathResolver(nested_df)
    df = pr.prepare(["meta/country", "nid"])
    out = {r["nid"]: r["c"] for r in df.select("nid", pr.col("meta/country").alias("c")).collect()}
    assert out == {1: "DE", 2: "FR"}


def test_scalar_array_path(nested_df):
    pr = PathResolver(nested_df)
    df = pr.prepare(["tags[*]"])
    vals = sorted(r["t"] for r in df.select(pr.col("tags[*]").alias("t")).collect())
    # empty array → no rows (RML iteration semantics)
    assert vals == ["a", "b"]


def test_double_nested_explode_once(nested_df):
    pr = PathResolver(nested_df)
    df = pr.prepare(["customers[*]/orders[*]/oid", "customers[*]/cid"])
    got = sorted(
        (r["cid"], r["oid"])
        for r in df.select(
            pr.col("customers[*]/cid").alias("cid"),
            pr.col("customers[*]/orders[*]/oid").alias("oid"),
        ).collect()
    )
    # c11 has no orders → dropped; each (cid, oid) exactly once
    assert got == [(10, 100), (10, 101), (20, 200)]


def test_iterator_and_parent(nested_df):
    pr = PathResolver(nested_df, iterator="customers[*]")
    df = pr.prepare(["name", "../meta/country"])
    got = sorted(
        (r["n"], r["c"])
        for r in df.select(
            pr.col("name").alias("n"), pr.col("../meta/country").alias("c")
        ).collect()
    )
    assert got == [("c10", "DE"), ("c11", "DE"), ("c20", "FR")]


def test_nested_catalog_end_to_end(spark, sf_small):
    from ontario_spark.catalog.tpch_rdf import EX, tpch_nested_catalog
    from ontario_spark.compiler.query import SparqlEngine
    from ontario_spark.data import table

    cat = tpch_nested_catalog(spark, sf_small)
    eng = SparqlEngine(spark, cat)
    df = eng.query(
        f"PREFIX ex: <{EX}>\n"
        "SELECT ?name ?nname WHERE { ?c a ex:Customer ; ex:name ?name ; "
        "ex:nationname ?nname }"
    )
    got = {(r["name"], r["nname"]) for r in df.collect()}
    exp = {
        (r["c_name"], r["n_name"])
        for r in table(spark, sf_small, "customer")
        .join(
            table(spark, sf_small, "nation"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .collect()
    }
    assert got == exp and len(got) > 0


def test_nested_keyed_template_join(spark, sf_small):
    """Parent-ref template (nation/{../n_nationkey}) joins the root-doc
    star on raw keys — no URI string materialization."""
    from ontario_spark.catalog.tpch_rdf import EX, tpch_nested_catalog
    from ontario_spark.compiler.query import SparqlEngine

    cat = tpch_nested_catalog(spark, sf_small)
    eng = SparqlEngine(spark, cat)
    df = eng.query(
        f"PREFIX ex: <{EX}>\n"
        "SELECT ?cname ?nname WHERE { ?c a ex:Customer ; ex:name ?cname ; "
        "ex:nation ?n . ?n a ex:Nation ; ex:name ?nname }"
    )
    assert df.count() > 0
    # the join must run on key columns, not formatted URI strings
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "concat" not in plan.lower().split("project")[0]


def test_xml_source_end_to_end(spark, tmp_path):
    """XML logical source: iterator → rowTag (reference:
    sparql2sparksql.py rowTag from RML iterator), nested element access
    through the same reference-path machinery."""
    from ontario_spark.catalog.model import (
        Catalog,
        DataSource,
        LogicalSource,
        TripleMap,
        ref,
        tpl,
    )
    from ontario_spark.compiler.query import SparqlEngine

    xml = (
        "<lake>"
        "<cust><cid>1</cid><name>alice</name><addr><city>bonn</city></addr></cust>"
        "<cust><cid>2</cid><name>bob</name><addr><city>lyon</city></addr></cust>"
        "<cust><cid>3</cid><name>eve</name></cust>"
        "</lake>"
    )
    d = tmp_path / "xmlsrc"
    d.mkdir()
    (d / "cust.xml").write_text(xml)

    cat = Catalog()
    cat.add(
        DataSource(name="xml_lake", dstype="xml", base_path=str(d)),
        TripleMap(
            name="XmlCustomer",
            source=LogicalSource(table="cust.xml", fmt="xml", iterator="cust[*]"),
            subject=tpl("http://x.ex/c/{cid}"),
            subject_class="http://x.ex/Customer",
            predicates=(
                ("http://x.ex/name", ref("name")),
                ("http://x.ex/city", ref("addr/city")),
            ),
        ),
    )
    eng = SparqlEngine(spark, cat)
    df = eng.query(
        "PREFIX x: <http://x.ex/>\n"
        "SELECT ?name ?city WHERE { ?c a x:Customer ; x:name ?name ; x:city ?city }"
    )
    got = sorted((r["name"], r["city"]) for r in df.collect())
    # eve has no addr → city unbound → excluded by NOT NULL guard
    assert got == [("alice", "bonn"), ("bob", "lyon")]
