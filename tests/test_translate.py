"""Star → native-query translators, validated without any DB server:

- SQL: generated ANSI statement runs on DuckDB over the same parquet
  tables and must return exactly what the Spark star compiler returns.
- MongoDB: pipeline runs on a ~60-line interpreter of the emitted
  stage subset ($match/$unwind/$project/$skip/$limit) over dicts.
- Cypher: golden-string shape assertions.
- rows_to_bframe: fetched remote rows join a Spark-resident star.
"""

from __future__ import annotations

import duckdb
import pytest

from ontario_spark.catalog.model import (
    Catalog,
    DataSource,
    LogicalSource,
    TripleMap,
    const,
    ref,
    tpl,
)
from ontario_spark.catalog.tpch_rdf import EX, tpch_catalog, tpch_split_catalog
from ontario_spark.compiler.query import SparqlEngine
from ontario_spark.compiler.star import compile_star
from ontario_spark.planner.decomposer import bgp_stars, select_sources
from ontario_spark.sources.translate import (
    ANSI,
    MYSQL,
    rows_to_bframe,
    star_cypher,
    star_mongo,
    star_sql,
)
from ontario_spark.sparql.parser import parse

PFX = f"PREFIX ex: <{EX}>\n"


def star_of(sparql: str):
    q = parse(PFX + sparql)
    triples = [t for t in q.where.elements if type(t).__name__ == "Triple"]
    (star,) = bgp_stars(triples)
    return star


def duck_tables(sf_dir: str, con):
    for t in ("customer", "nation", "orders"):
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )


# --- SQL -----------------------------------------------------------------


def _sql_vs_spark(spark, sf_dir, cat, sparql):
    star = star_of(sparql)
    plan = select_sources(cat, star)
    maps = plan.alternatives[0]
    sql, specs = star_sql(maps, star, ANSI)
    con = duckdb.connect()
    duck_tables(sf_dir, con)
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    duck_rows = {tuple(str(v) for v in row) for row in cur.fetchall()}

    bf = compile_star(spark, cat, plan)
    spark_rows = {
        tuple(str(v) for v in row)
        for row in bf.df.select(*cols).collect()
    }
    assert duck_rows == spark_rows and len(duck_rows) > 0
    return sql


def test_sql_single_map(spark, sf_small):
    sql = _sql_vs_spark(
        spark,
        sf_small,
        tpch_catalog(sf_small),
        'SELECT * WHERE { ?c a ex:Customer ; ex:name ?name ; '
        'ex:mktsegment "BUILDING" ; ex:nation ?n }',
    )
    assert "IS NOT NULL" in sql and "= 'BUILDING'" in sql


def test_sql_multimap_selfjoin(spark, sf_small):
    """Predicates split across two maps sharing the subject template →
    one SQL with a self-join on the key (join_condition semantics)."""
    sql = _sql_vs_spark(
        spark,
        sf_small,
        tpch_split_catalog(sf_small),
        "SELECT * WHERE { ?c a ex:Customer ; ex:name ?name ; ex:acctbal ?b }",
    )
    assert 't0."c_custkey" = t1."c_custkey"' in sql


def test_sql_constant_subject_inversion(spark, sf_small):
    cat = tpch_catalog(sf_small)
    star = star_of("SELECT * WHERE { <http://ex.org/tpch/customer/7> ex:name ?name }")
    plan = select_sources(cat, star)
    sql, _ = star_sql(plan.alternatives[0], star, ANSI)
    assert "CAST" in sql and "= '7'" in sql
    con = duckdb.connect()
    duck_tables(sf_small, con)
    rows = con.execute(sql).fetchall()
    assert len(rows) == 1


def test_sql_mysql_dialect_quoting():
    cat = tpch_catalog("/nonexistent")
    star = star_of("SELECT * WHERE { ?c a ex:Customer ; ex:name ?name }")
    plan = select_sources(cat, star)
    sql, _ = star_sql(plan.alternatives[0], star, MYSQL)
    assert "`c_name`" in sql and '"' not in sql


# --- MongoDB -------------------------------------------------------------


def run_pipeline(docs: list[dict], pipeline: list[dict]) -> list[dict]:
    """Interpreter for the emitted stage subset."""

    def get(doc, dotted):
        cur = doc
        for part in dotted.split("."):
            if not isinstance(cur, dict) or part not in cur:
                return None
            cur = cur[part]
        return cur

    def set_(doc, dotted, value):
        parts = dotted.split(".")
        cur = doc
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = value

    def matches(doc, spec):
        for field, cond in spec.items():
            v = get(doc, field)
            if isinstance(cond, dict):
                for op, arg in cond.items():
                    if op == "$exists":
                        if (v is not None) != arg:
                            return False
                    elif op == "$ne":
                        if v == arg:
                            return False
                    elif op == "$eq":
                        if v != arg:
                            return False
                    else:
                        raise AssertionError(f"op {op}")
            elif v != cond:
                return False
        return True

    out = [dict(d) for d in docs]
    for stage in pipeline:
        (op, arg), = stage.items()
        if op == "$match":
            out = [d for d in out if matches(d, arg)]
        elif op == "$unwind":
            field = arg[1:]
            nxt = []
            for d in out:
                for item in get(d, field) or []:
                    nd = dict(d)
                    set_(nd, field, item)
                    nxt.append(nd)
            out = nxt
        elif op == "$project":
            nxt = []
            for d in out:
                nd = {}
                for out_name, src in arg.items():
                    if out_name == "_id":
                        continue
                    nd[out_name] = get(d, src[1:]) if isinstance(src, str) else None
                nxt.append(nd)
            out = nxt
        elif op == "$skip":
            out = out[arg:]
        elif op == "$limit":
            out = out[:arg]
        else:
            raise AssertionError(f"stage {op}")
    return out


MONGO_DOCS = [
    {"cid": 1, "name": "alice", "seg": "BUILDING", "orders": [{"oid": 10}, {"oid": 11}]},
    {"cid": 2, "name": "bob", "seg": "AUTO", "orders": [{"oid": 20}]},
    {"cid": 3, "seg": "BUILDING", "orders": []},
]

MONGO_MAP = TripleMap(
    name="MCust",
    source=LogicalSource(table="customers"),
    subject=tpl(EX + "customer/{cid}"),
    subject_class=EX + "Customer",
    predicates=(
        (EX + "name", ref("name")),
        (EX + "mktsegment", ref("seg")),
        (EX + "order", tpl(EX + "order/{orders[*]/oid}")),
    ),
)


def test_mongo_match_project():
    star = star_of('SELECT * WHERE { ?c a ex:Customer ; ex:name ?n ; ex:mktsegment "BUILDING" }')
    pipeline, specs = star_mongo(MONGO_MAP, star)
    rows = run_pipeline(MONGO_DOCS, pipeline)
    # doc 3 has no name → excluded; doc 2 wrong segment
    assert rows == [{"c__k0": 1, "n": "alice"}]
    assert {s.var for s in specs} == {"c", "n"}


def test_mongo_unwind_array():
    star = star_of("SELECT * WHERE { ?c a ex:Customer ; ex:order ?o }")
    pipeline, _ = star_mongo(MONGO_MAP, star)
    assert {"$unwind": "$orders"} in pipeline
    rows = run_pipeline(MONGO_DOCS, pipeline)
    got = sorted((r["c__k0"], r["o__k0"]) for r in rows)
    assert got == [(1, 10), (1, 11), (2, 20)]


def test_mongo_constant_subject():
    star = star_of(f"SELECT * WHERE {{ <{EX}customer/2> ex:name ?n }}")
    pipeline, _ = star_mongo(MONGO_MAP, star)
    rows = run_pipeline(MONGO_DOCS, pipeline)
    assert rows == [{"n": "bob"}]


def test_mongo_limit_skip():
    star = star_of("SELECT * WHERE { ?c a ex:Customer ; ex:mktsegment ?s }")
    pipeline, _ = star_mongo(MONGO_MAP, star, limit=1, offset=1)
    assert pipeline[-2:] == [{"$skip": 1}, {"$limit": 1}]
    assert len(run_pipeline(MONGO_DOCS, pipeline)) == 1


# --- Cypher --------------------------------------------------------------


def test_cypher_shape():
    star = star_of('SELECT * WHERE { ?c a ex:Customer ; ex:name ?n ; ex:mktsegment "AUTO" }')
    q, specs = star_cypher(MONGO_MAP, star)
    assert q.startswith("MATCH (n:Customer)")
    assert "n.seg = 'AUTO'" in q
    assert "n.name AS n" in q and "n.cid AS c__k0" in q
    assert "n.cid IS NOT NULL" in q


def test_cypher_limit():
    star = star_of("SELECT * WHERE { ?c a ex:Customer ; ex:name ?n }")
    q, _ = star_cypher(MONGO_MAP, star, limit=5, offset=2)
    assert q.endswith("SKIP 2 LIMIT 5")


# --- remote rows → BFrame → federated join -------------------------------


def test_rows_to_bframe_joins_spark_star(spark, sf_small):
    """Simulated federation: a remote SQL source (DuckDB standing in
    for MySQL) provides the customer star; the nation star is Spark-
    resident parquet; they join on the template keys."""
    cat = tpch_catalog(sf_small)
    cstar = star_of("SELECT * WHERE { ?c a ex:Customer ; ex:name ?name ; ex:nation ?n }")
    plan = select_sources(cat, cstar)
    sql, specs = star_sql(plan.alternatives[0], cstar, ANSI)
    con = duckdb.connect()
    duck_tables(sf_small, con)
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = [dict(zip(cols, r)) for r in cur.fetchall()]
    remote_bf = rows_to_bframe(spark, rows, specs)

    nstar = star_of("SELECT * WHERE { ?n a ex:Nation ; ex:name ?nname }")
    local_bf = compile_star(spark, cat, select_sources(cat, nstar))
    joined = remote_bf.join(local_bf, "inner")
    out = joined.project(["name", "nname"]).df
    from ontario_spark.data import table

    cust = table(spark, sf_small, "customer")
    nat = table(spark, sf_small, "nation")
    exp = cust.join(nat, cust.c_nationkey == nat.n_nationkey).count()
    assert out.count() == exp > 0


def test_cypher_literal_escaping():
    """Quote-bearing constants emit well-formed backslash-escaped Cypher
    strings (previously interpolated raw into single quotes)."""
    star = star_of(
        "SELECT * WHERE { ?c a ex:Customer ; "
        "ex:mktsegment \"O'Brien \\\\ 'x\" }"
    )
    q, _ = star_cypher(MONGO_MAP, star)
    assert "n.seg = 'O\\'Brien \\\\ \\'x'" in q
