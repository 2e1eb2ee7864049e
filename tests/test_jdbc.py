"""Production JDBC path, integration-tested against embedded Derby
(the JDBC database Spark ships in its own jars — no server needed)."""

from __future__ import annotations

import pytest

from ontario_spark.catalog.model import (
    Catalog,
    DataSource,
    LogicalSource,
    TripleMap,
    ref,
    tpl,
)
from ontario_spark.sources.jdbc import jdbc_executor, jdbc_query_df

DERBY_PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    """Create an embedded Derby database with a customer table via the
    driver JVM (same classpath Spark's JDBC reader uses)."""
    db = str(tmp_path_factory.mktemp("derby") / "db")
    url = f"jdbc:derby:{db}"
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url + ";create=true")
    st = conn.createStatement()
    # quoted lowercase name: the ANSI translator emits "customer", and
    # Derby case-folds unquoted identifiers to uppercase
    st.execute(
        'CREATE TABLE "customer" ("c_custkey" INT, "c_name" VARCHAR(64), '
        '"c_acctbal" DOUBLE)'
    )
    for k, name, bal in [
        (1, "Customer#1", 100.5),
        (2, "Customer#2", 9500.0),
        (3, "Other#3", 9999.0),
        (4, "Customer#4", 50.0),
    ]:
        st.execute(
            f'INSERT INTO "customer" VALUES ({k}, \'{name}\', {bal})'
        )
    st.close()
    conn.close()
    return url


def test_jdbc_query_df_plain(spark, derby_url):
    df = jdbc_query_df(
        spark, derby_url, 'SELECT "c_custkey", "c_name" FROM "customer"',
        properties=DERBY_PROPS,
    )
    assert df.count() == 4
    assert set(df.columns) == {"c_custkey", "c_name"}


def test_jdbc_predicates_partition_the_fetch(spark, derby_url):
    df = jdbc_query_df(
        spark, derby_url, 'SELECT "c_custkey", "c_acctbal" FROM "customer"',
        properties=DERBY_PROPS,
        predicates=['"c_custkey" <= 2', '"c_custkey" > 2'],
    )
    assert df.rdd.getNumPartitions() == 2  # one connection per slice
    assert sorted(r["c_custkey"] for r in df.collect()) == [1, 2, 3, 4]


def _derby_catalog(spark, derby_url) -> Catalog:
    cat = Catalog()
    src = DataSource(name="derbydb", dstype="ansi", base_path=derby_url)
    tm = TripleMap(
        name="JCust",
        source=LogicalSource(table="customer"),
        subject=tpl("http://ex.org/customer/{c_custkey}"),
        subject_class="http://ex.org/Customer",
        predicates=(
            ("http://ex.org/name", ref("c_name")),
            ("http://ex.org/acctbal", ref("c_acctbal")),
        ),
    )
    cat.add(src, tm)
    cat.executors["derbydb"] = jdbc_executor(
        spark, derby_url, properties=DERBY_PROPS
    )
    return cat


def test_sparql_star_over_jdbc_end_to_end(spark, derby_url):
    """Full engine path: star decomposition → ANSI SQL translation →
    Spark-JDBC distributed fetch (no driver collect) → SPARQL answer,
    with the FILTER pushed into the remote WHERE clause."""
    from ontario_spark.compiler.query import SparqlEngine

    cat = _derby_catalog(spark, derby_url)
    df = SparqlEngine(spark, cat).query(
        """PREFIX ex: <http://ex.org/>
           SELECT ?c ?name ?bal WHERE {
             ?c a ex:Customer ; ex:name ?name ; ex:acctbal ?bal .
             FILTER (?bal > 1000.0 && STRSTARTS(?name, "Customer")) }"""
    )
    rows = {(r["c"], r["name"]) for r in df.collect()}
    assert rows == {("http://ex.org/customer/2", "Customer#2")}


def test_jdbc_executor_returns_dataframe(spark, derby_url):
    ex = jdbc_executor(spark, derby_url, properties=DERBY_PROPS)
    assert ex.returns_dataframe
    out = ex('SELECT "c_custkey" FROM "customer"')
    from pyspark.sql import DataFrame

    assert isinstance(out, DataFrame)


def test_derby_dialect_in_list_rendering():
    """Derby has no implicit cross-type coercion: canonical-integer
    key lexemes must render as numeric literals so a BIGINT column
    IN-list works; non-canonical / mixed lists stay quoted strings."""
    from ontario_spark.sources.translate import ANSI, DERBY

    assert DERBY.in_list('"k"', ["7", "10"]) == '"k" IN (7, 10)'
    assert DERBY.in_list('"k"', ["007", "10"]) == "\"k\" IN ('007', '10')"
    assert DERBY.in_list('"k"', ["a", "b"]) == "\"k\" IN ('a', 'b')"
    assert DERBY.in_list('"k"', [7, 10]) == '"k" IN (7, 10)'  # native ints
    # ANSI engines coerce, so string lexemes stay strings there
    assert ANSI.in_list('"k"', ["7"]) == "\"k\" IN ('7')"


def test_trisource_jdbc_catalog_end_to_end(spark, sf_small):
    """The bench registry's trisource topology: Customer star over the
    PRODUCTION Spark-JDBC path (embedded Derby seeded from the lake's
    parquet), Supplier over the docstore seam, Nation from the lake —
    verified against the same DuckDB oracle the driver gate uses."""
    from ontario_spark.queries.lslod_shapes import ORACLE, QUERIES
    from tests.oracle import assert_match, run_oracle

    assert_match(
        QUERIES["lslod_cq6_trisource"](spark, sf_small),
        run_oracle(ORACLE["lslod_cq6_trisource"], sf_small),
        "lslod_cq6_trisource_jdbc",
    )
