"""End-to-end SPARQL engine tests: each query runs through parse →
decompose → compile → DataFrame and must match a handwritten DuckDB SQL
oracle on the same tables (the reference's correctness story, SURVEY.md
§5, but automated)."""

from __future__ import annotations

import pytest

from ontario_spark.catalog.tpch_rdf import EX, tpch_catalog, tpch_split_catalog
from ontario_spark.compiler.query import SparqlEngine
from tests.oracle import assert_match, run_oracle

PFX = f"PREFIX ex: <{EX}>\n"

URI_C = "'http://ex.org/tpch/customer/' || CAST(c_custkey AS VARCHAR)"
URI_N = "'http://ex.org/tpch/nation/' || CAST(n_nationkey AS VARCHAR)"
URI_O = "'http://ex.org/tpch/order/' || CAST(o_orderkey AS VARCHAR)"


@pytest.fixture(scope="module")
def engine(spark, sf_small):
    return SparqlEngine(spark, tpch_catalog(sf_small))


def check(engine, sf, sparql, sql, name):
    assert_match(engine.query(PFX + sparql), run_oracle(sql, sf), name)


def test_single_star_filter(engine, sf_small):
    check(
        engine,
        sf_small,
        """SELECT ?c ?name ?acctbal WHERE {
             ?c a ex:Customer ; ex:name ?name ; ex:acctbal ?acctbal .
             FILTER (?acctbal > 5000.0) }""",
        f"""SELECT {URI_C} AS c, c_name AS name, c_acctbal AS acctbal
            FROM customer WHERE c_name IS NOT NULL AND c_acctbal IS NOT NULL
              AND c_acctbal > 5000.0""",
        "single_star_filter",
    )


def test_two_star_template_join(engine, sf_small):
    check(
        engine,
        sf_small,
        """SELECT ?cname ?nname WHERE {
             ?c a ex:Customer ; ex:name ?cname ; ex:nation ?n .
             ?n a ex:Nation ; ex:name ?nname . }""",
        """SELECT c_name AS cname, n_name AS nname
           FROM customer JOIN nation ON c_nationkey = n_nationkey
           WHERE c_name IS NOT NULL AND n_name IS NOT NULL""",
        "two_star_template_join",
    )


def test_predicate_index_source_selection(engine, sf_small):
    # no rdf:type — ex:mktsegment exists only on CustomerMap
    check(
        engine,
        sf_small,
        "SELECT DISTINCT ?seg WHERE { ?c ex:mktsegment ?seg }",
        "SELECT DISTINCT c_mktsegment AS seg FROM customer WHERE c_mktsegment IS NOT NULL",
        "predicate_index",
    )


def test_union_over_classes(engine, sf_small):
    # ex:name is ambiguous between Customer/Nation/Region/Supplier/Part
    # molecules → the engine must UNION all five (reference: make_union)
    check(
        engine,
        sf_small,
        "SELECT ?name WHERE { ?s ex:name ?name }",
        """SELECT c_name AS name FROM customer WHERE c_name IS NOT NULL
           UNION ALL SELECT n_name FROM nation WHERE n_name IS NOT NULL
           UNION ALL SELECT p_name FROM part WHERE p_name IS NOT NULL
           UNION ALL SELECT r_name FROM region WHERE r_name IS NOT NULL
           UNION ALL SELECT s_name FROM supplier WHERE s_name IS NOT NULL""",
        "union_over_classes",
    )


def test_explicit_union(engine, sf_small):
    check(
        engine,
        sf_small,
        """SELECT ?name WHERE {
             { ?c a ex:Customer ; ex:name ?name }
             UNION { ?s a ex:Supplier ; ex:name ?name } }""",
        """SELECT c_name AS name FROM customer WHERE c_name IS NOT NULL
           UNION ALL
           SELECT s_name AS name FROM supplier WHERE s_name IS NOT NULL""",
        "explicit_union",
    )


def test_optional(engine, sf_small):
    check(
        engine,
        sf_small,
        """SELECT ?c ?name ?ostatus WHERE {
             ?c a ex:Customer ; ex:name ?name .
             OPTIONAL { ?o a ex:Order ; ex:customer ?c ; ex:orderstatus ?ostatus } }""",
        f"""SELECT {URI_C} AS c, c_name AS name, o_orderstatus AS ostatus
            FROM customer LEFT OUTER JOIN orders
              ON o_custkey = c_custkey AND o_orderstatus IS NOT NULL
            WHERE c_name IS NOT NULL""",
        "optional",
    )


def test_sibling_hoisted_optionals_under_union(engine, sf_small):
    # Regression (round-9 ADVICE): joining two sibling groups that each
    # hoist an OPTIONAL (FILTER references an outer var) used to leave
    # BOTH frames carrying the __lj pin column; the later UNION then
    # failed with AMBIGUOUS_REFERENCE `__lj`. union now excludes
    # engine-internal pin columns from its surviving extras.
    check(
        engine,
        sf_small,
        """SELECT ?c ?n1 ?n2 WHERE {
             {
               { ?c a ex:Customer ; ex:acctbal ?b .
                 OPTIONAL { ?c ex:name ?n1 . FILTER(?b > 1000.0) } }
               { ?c a ex:Customer ; ex:mktsegment ?m .
                 OPTIONAL { ?c ex:name ?n2 . FILTER(?m = "BUILDING") } }
             } UNION {
               ?c a ex:Nation .
             } }""",
        f"""SELECT {URI_C} AS c,
                   CASE WHEN c_acctbal > 1000.0 THEN c_name END AS n1,
                   CASE WHEN c_mktsegment = 'BUILDING' THEN c_name END AS n2
            FROM customer
            WHERE c_acctbal IS NOT NULL AND c_mktsegment IS NOT NULL
            UNION ALL
            SELECT {URI_N} AS c, NULL AS n1, NULL AS n2 FROM nation""",
        "sibling_hoisted_optionals_under_union",
    )


def test_three_star_chain_order_limit(engine, sf_small):
    check(
        engine,
        sf_small,
        """SELECT ?cname ?nname ?rname WHERE {
             ?c a ex:Customer ; ex:name ?cname ; ex:nation ?n .
             ?n ex:name ?nname ; ex:region ?r .
             ?r ex:name ?rname .
             FILTER (?rname = "ASIA") }
           ORDER BY ?cname LIMIT 20""",
        """SELECT c_name AS cname, n_name AS nname, r_name AS rname
           FROM customer
           JOIN nation ON c_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
           WHERE c_name IS NOT NULL AND n_name IS NOT NULL
             AND r_name IS NOT NULL AND r_name = 'ASIA'
           ORDER BY cname LIMIT 20""",
        "three_star_chain",
    )


def test_constant_object_and_uri_subject(engine, sf_small):
    check(
        engine,
        sf_small,
        """SELECT ?name WHERE {
             ?c a ex:Customer ; ex:name ?name ; ex:mktsegment "BUILDING" . }""",
        """SELECT c_name AS name FROM customer
           WHERE c_name IS NOT NULL AND c_mktsegment = 'BUILDING'""",
        "constant_object",
    )
    # constant SUBJECT: template inversion → key equality
    check(
        engine,
        sf_small,
        f"SELECT ?name WHERE {{ <{EX}customer/7> ex:name ?name }}",
        """SELECT c_name AS name FROM customer
           WHERE c_name IS NOT NULL AND CAST(c_custkey AS VARCHAR) = '7'""",
        "constant_subject",
    )


def test_constant_object_uri_inversion(engine, sf_small):
    # object URI constant hits a TEMPLATE object map → key equality
    check(
        engine,
        sf_small,
        f"""SELECT ?o WHERE {{ ?o a ex:Order ; ex:customer <{EX}customer/3> }}""",
        f"""SELECT {URI_O} AS o FROM orders
            WHERE CAST(o_custkey AS VARCHAR) = '3'""",
        "object_uri_inversion",
    )


def test_filter_functions(engine, sf_small):
    check(
        engine,
        sf_small,
        """SELECT ?name ?type WHERE {
             ?p a ex:Part ; ex:name ?name ; ex:type ?type .
             FILTER (CONTAINS(?type, "BRASS") || REGEX(?name, "a.*e")) }""",
        """SELECT p_name AS name, p_type AS type FROM part
           WHERE p_name IS NOT NULL AND p_type IS NOT NULL
             AND (p_type LIKE '%BRASS%' OR regexp_matches(p_name, 'a.*e'))""",
        "filter_functions",
    )


def test_repeated_object_var_same_star(engine, sf_small):
    # ?x ex:name ?v twice through different predicates → equality
    check(
        engine,
        sf_small,
        """SELECT ?n ?v WHERE {
             ?n a ex:Nation ; ex:name ?v .
             ?r a ex:Region ; ex:name ?v . }""",
        f"""SELECT {URI_N} AS n, n_name AS v
            FROM nation JOIN region ON n_name = r_name
            WHERE n_name IS NOT NULL AND r_name IS NOT NULL""",
        "repeated_object_var",
    )


def test_bind_and_select_expr(engine, sf_small):
    check(
        engine,
        sf_small,
        """SELECT ?name ?doubled WHERE {
             ?c a ex:Customer ; ex:name ?name ; ex:acctbal ?b .
             BIND (?b * 2 AS ?doubled) }""",
        """SELECT c_name AS name, c_acctbal * 2 AS doubled FROM customer
           WHERE c_name IS NOT NULL AND c_acctbal IS NOT NULL""",
        "bind",
    )


def test_ask(engine, sf_small):
    df = engine.query(PFX + "ASK { ?c a ex:Customer ; ex:acctbal ?b . FILTER(?b > 1000.0) }")
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["ask"] is True
    df2 = engine.query(PFX + 'ASK { ?c a ex:Customer ; ex:name "no_such_name_xyz" }')
    assert df2.collect()[0]["ask"] is False


def test_construct(engine, sf_small):
    check(
        engine,
        sf_small,
        """CONSTRUCT { ?c ex:label ?name } WHERE { ?c a ex:Customer ; ex:name ?name }""",
        f"""SELECT DISTINCT {URI_C} AS s, 'http://ex.org/tpch/label' AS p, c_name AS o
            FROM customer WHERE c_name IS NOT NULL""",
        "construct",
    )


def test_aggregates_group_by(engine, sf_small):
    check(
        engine,
        sf_small,
        """SELECT ?seg (COUNT(?c) AS ?n) (SUM(?bal) AS ?total) WHERE {
             ?c a ex:Customer ; ex:mktsegment ?seg ; ex:acctbal ?bal }
           GROUP BY ?seg""",
        """SELECT c_mktsegment AS seg, COUNT(*) AS n,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total
           FROM customer
           WHERE c_mktsegment IS NOT NULL AND c_acctbal IS NOT NULL
           GROUP BY c_mktsegment""",
        "aggregates",
    )


def test_multimap_selfjoin(spark, sf_small):
    # split catalog: Customer predicates spread over two triple maps →
    # self-join on subject keys (ChEBI-style narrow tables)
    eng = SparqlEngine(spark, tpch_split_catalog(sf_small))
    check(
        eng,
        sf_small,
        """SELECT ?name ?seg WHERE {
             ?c a ex:Customer ; ex:name ?name ; ex:mktsegment ?seg . }""",
        """SELECT t1.c_name AS name, t2.c_mktsegment AS seg
           FROM customer t1 JOIN customer t2 ON t1.c_custkey = t2.c_custkey
           WHERE t1.c_name IS NOT NULL AND t2.c_mktsegment IS NOT NULL""",
        "multimap_selfjoin",
    )


def test_offset_pagination(engine, sf_small):
    check(
        engine,
        sf_small,
        """SELECT ?o ?price WHERE { ?o a ex:Order ; ex:totalprice ?price }
           ORDER BY DESC(?price) ?o LIMIT 5 OFFSET 5""",
        f"""SELECT {URI_O} AS o, o_totalprice AS price FROM orders
            WHERE o_totalprice IS NOT NULL
            ORDER BY price DESC, o ASC LIMIT 5 OFFSET 5""",
        "offset_pagination",
    )


def test_date_filter(engine, sf_small):
    check(
        engine,
        sf_small,
        """SELECT ?o ?d WHERE {
             ?o a ex:Order ; ex:orderdate ?d .
             FILTER (?d >= "1999-01-01"^^<http://www.w3.org/2001/XMLSchema#date>) }""",
        f"""SELECT {URI_O} AS o, o_orderdate AS d FROM orders
            WHERE o_orderdate IS NOT NULL AND o_orderdate >= TIMESTAMP '1999-01-01'""",
        "date_filter",
    )


# --- SPARQL 1.1 set ops & inline data (beyond the reference) ------------


def test_values_single_var(spark, sf_small):
    from ontario_spark.catalog.tpch_rdf import EX, tpch_catalog
    from ontario_spark.compiler.query import SparqlEngine

    eng = SparqlEngine(spark, tpch_catalog(sf_small))
    df = eng.query(
        f"PREFIX ex: <{EX}>\n"
        'SELECT ?name WHERE { ?r a ex:Region ; ex:name ?name . '
        'VALUES ?name { "AMERICA" "ASIA" } }'
    )
    assert sorted(r["name"] for r in df.collect()) == ["AMERICA", "ASIA"]


def test_values_multi_var_undef(spark, sf_small):
    from ontario_spark.catalog.tpch_rdf import EX, tpch_catalog
    from ontario_spark.compiler.query import SparqlEngine

    eng = SparqlEngine(spark, tpch_catalog(sf_small))
    df = eng.query(
        f"PREFIX ex: <{EX}>\n"
        "SELECT ?name ?tag WHERE { ?r a ex:Region ; ex:name ?name . "
        'VALUES (?name ?tag) { ("ASIA" "east") (UNDEF "any") } }'
    )
    got = sorted((r["name"], r["tag"]) for r in df.collect())
    # UNDEF wildcards ?name (§10.2): the (UNDEF "any") row tags EVERY
    # region, the ("ASIA" "east") row just Asia (round-8 fix: the old
    # NULL-key equi-join silently dropped the UNDEF row)
    assert got == sorted(
        [("ASIA", "east")]
        + [(n, "any") for n in ("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")]
    )


def test_minus(spark, sf_small):
    from ontario_spark.catalog.tpch_rdf import EX, tpch_catalog
    from ontario_spark.compiler.query import SparqlEngine
    from ontario_spark.data import table

    eng = SparqlEngine(spark, tpch_catalog(sf_small))
    df = eng.query(
        f"PREFIX ex: <{EX}>\n"
        "SELECT ?c WHERE { ?c a ex:Customer . "
        "MINUS { ?o a ex:Order ; ex:customer ?c } }"
    )
    cust = table(spark, sf_small, "customer")
    orders = table(spark, sf_small, "orders")
    exp = cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).count()
    assert df.count() == exp


def test_not_exists_equals_minus_here(spark, sf_small):
    from ontario_spark.catalog.tpch_rdf import EX, tpch_catalog
    from ontario_spark.compiler.query import SparqlEngine

    eng = SparqlEngine(spark, tpch_catalog(sf_small))
    minus = eng.query(
        f"PREFIX ex: <{EX}>\nSELECT ?c WHERE {{ ?c a ex:Customer . "
        "MINUS { ?o a ex:Order ; ex:customer ?c } }"
    ).count()
    ne = eng.query(
        f"PREFIX ex: <{EX}>\nSELECT ?c WHERE {{ ?c a ex:Customer . "
        "FILTER NOT EXISTS { ?o a ex:Order ; ex:customer ?c } }"
    ).count()
    assert minus == ne


def test_exists(spark, sf_small):
    from ontario_spark.catalog.tpch_rdf import EX, tpch_catalog
    from ontario_spark.compiler.query import SparqlEngine
    from ontario_spark.data import table

    eng = SparqlEngine(spark, tpch_catalog(sf_small))
    df = eng.query(
        f"PREFIX ex: <{EX}>\n"
        "SELECT ?c WHERE { ?c a ex:Customer . "
        "FILTER EXISTS { ?o a ex:Order ; ex:customer ?c } }"
    )
    cust = table(spark, sf_small, "customer")
    orders = table(spark, sf_small, "orders")
    exp = cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).count()
    assert df.count() == exp > 0


# --- property paths (SPARQL 1.1; beyond the reference) -------------------


def test_path_sequence(spark, sf_small):
    """?c ex:nation/ex:region/ex:name ?rname ≡ 3-hop join chain."""
    from ontario_spark.catalog.tpch_rdf import EX, tpch_catalog
    from ontario_spark.compiler.query import SparqlEngine
    from ontario_spark.data import table

    eng = SparqlEngine(spark, tpch_catalog(sf_small))
    df = eng.query(
        f"PREFIX ex: <{EX}>\n"
        "SELECT ?name ?rname WHERE { ?c a ex:Customer ; ex:name ?name ; "
        "ex:nation/ex:region/ex:name ?rname }"
    )
    cust = table(spark, sf_small, "customer")
    nat = table(spark, sf_small, "nation")
    reg = table(spark, sf_small, "region")
    exp = {
        (r["c_name"], r["r_name"])
        for r in cust.join(nat, cust.c_nationkey == nat.n_nationkey)
        .join(reg, nat.n_regionkey == reg.r_regionkey)
        .collect()
    }
    got = {(r["name"], r["rname"]) for r in df.collect()}
    assert got == exp and len(got) > 0


def test_path_alternation(spark, sf_small):
    from ontario_spark.catalog.tpch_rdf import EX, tpch_catalog
    from ontario_spark.compiler.query import SparqlEngine
    from ontario_spark.data import table

    eng = SparqlEngine(spark, tpch_catalog(sf_small))
    df = eng.query(
        f"PREFIX ex: <{EX}>\n"
        "SELECT ?x WHERE { ?s (ex:mktsegment|ex:brand) ?x }"
    )
    cust = table(spark, sf_small, "customer")
    part = table(spark, sf_small, "part")
    exp = cust.where("c_mktsegment is not null").count() + part.where(
        "p_brand is not null"
    ).count()
    assert df.count() == exp


def test_path_inverse(spark, sf_small):
    """?n ^ex:nation ?c ≡ ?c ex:nation ?n."""
    from ontario_spark.catalog.tpch_rdf import EX, tpch_catalog
    from ontario_spark.compiler.query import SparqlEngine

    eng = SparqlEngine(spark, tpch_catalog(sf_small))
    a = eng.query(
        f"PREFIX ex: <{EX}>\nSELECT ?c WHERE {{ ?n a ex:Nation . "
        "?n ^ex:nation ?c . ?c a ex:Customer }"
    ).count()
    b = eng.query(
        f"PREFIX ex: <{EX}>\nSELECT ?c WHERE {{ ?c a ex:Customer ; ex:nation ?n . "
        "?n a ex:Nation }"
    ).count()
    assert a == b > 0


def test_path_star_select_hides_internal_vars(spark, sf_small):
    from ontario_spark.catalog.tpch_rdf import EX, tpch_catalog
    from ontario_spark.compiler.query import SparqlEngine

    eng = SparqlEngine(spark, tpch_catalog(sf_small))
    df = eng.query(
        f"PREFIX ex: <{EX}>\n"
        "SELECT * WHERE { ?c a ex:Customer ; ex:nation/ex:name ?nname }"
    )
    assert all(not c.startswith("__") for c in df.columns)
    assert df.count() > 0


def test_string_hash_datetime_functions(engine, sf_small):
    # SPARQL 1.1 function library additions (beyond the reference's
    # closed Xfilter set): STRBEFORE/STRAFTER/MD5/SHA256/ISNUMERIC
    check(
        engine,
        sf_small,
        """SELECT ?name ?tag ?digest WHERE {
             ?c a ex:Customer ; ex:name ?name .
             BIND (STRAFTER(?name, "#") AS ?tag)
             BIND (MD5(?name) AS ?digest)
             FILTER (STRBEFORE(?name, "#") = "Customer" && ISNUMERIC(?tag)) }""",
        """SELECT c_name AS name,
             substr(c_name, strpos(c_name, '#') + 1) AS tag,
             md5(c_name) AS digest
           FROM customer
           WHERE c_name IS NOT NULL AND strpos(c_name, '#') > 0
             AND substr(c_name, 1, strpos(c_name, '#') - 1) = 'Customer'
             AND TRY_CAST(substr(c_name, strpos(c_name, '#') + 1) AS DOUBLE)
                 IS NOT NULL""",
        "string_hash_functions",
    )


def test_strbefore_strafter_edges(engine, sf_small):
    # SPARQL §17.4.3: no match -> "", empty pattern -> ""/whole string
    df = engine.query(
        PFX
        + """SELECT ?b ?a ?be ?ae WHERE {
              ?c a ex:Customer ; ex:name ?name .
              BIND (STRBEFORE(?name, "zzz") AS ?b)
              BIND (STRAFTER(?name, "zzz") AS ?a)
              BIND (STRBEFORE(?name, "") AS ?be)
              BIND (STRAFTER(?name, "") AS ?ae) } LIMIT 1"""
    )
    row = df.collect()[0]
    assert row["b"] == "" and row["a"] == ""
    assert row["be"] == "" and row["ae"].startswith("Customer#")


def test_encode_for_uri(engine, sf_small):
    df = engine.query(
        PFX
        + """SELECT ?e WHERE {
              ?c a ex:Customer ; ex:name ?name .
              BIND (ENCODE_FOR_URI(CONCAT(?name, " &~x")) AS ?e) } LIMIT 1"""
    )
    val = df.collect()[0]["e"]
    # space -> %20 (not +), '&' percent-encoded, '~' kept (RFC 3986)
    assert val.endswith("%20%26~x"), val


def test_hours_minutes_seconds_now(engine, sf_small):
    df = engine.query(
        PFX
        + """SELECT ?h ?mi ?s WHERE {
              ?o a ex:Order ; ex:orderdate ?d .
              BIND (HOURS(?d) AS ?h) BIND (MINUTES(?d) AS ?mi)
              BIND (SECONDS(?d) AS ?s) } LIMIT 1"""
    )
    row = df.collect()[0]
    assert (row["h"], row["mi"], row["s"]) == (0, 0, 0)
    now_df = engine.query(
        PFX
        + """SELECT ?ok WHERE { ?c a ex:Customer ; ex:name ?name .
              BIND (IF(NOW() > "2020-01-01"^^<http://www.w3.org/2001/XMLSchema#dateTime>,
                       "y", "n") AS ?ok) } LIMIT 1"""
    )
    assert now_df.collect()[0]["ok"] == "y"


URI_R = "'http://ex.org/tpch/region/' || CAST(r_regionkey AS VARCHAR)"


def test_path_zero_or_one(engine, sf_small):
    # ?n ex:region? ?x = identity pairs over the edge node domain + edges
    check(
        engine,
        sf_small,
        """SELECT ?n ?x WHERE { ?n ex:region? ?x }""",
        f"""SELECT {URI_N} AS n,
              'http://ex.org/tpch/region/' || CAST(n_regionkey AS VARCHAR) AS x
            FROM nation
            UNION ALL SELECT {URI_N} AS n, {URI_N} AS x FROM nation
            UNION ALL SELECT DISTINCT
              'http://ex.org/tpch/region/' || CAST(n_regionkey AS VARCHAR) AS n,
              'http://ex.org/tpch/region/' || CAST(n_regionkey AS VARCHAR) AS x
            FROM nation""",
        "path_zero_or_one",
    )


def test_negated_property_set(engine, sf_small):
    # everything about a customer except name/acctbal/nation → mktsegment
    check(
        engine,
        sf_small,
        """SELECT ?c ?v WHERE {
             ?c a ex:Customer .
             ?c !(ex:name|ex:acctbal|ex:nation) ?v }""",
        f"""SELECT {URI_C} AS c, c_mktsegment AS v FROM customer
            WHERE c_mktsegment IS NOT NULL""",
        "negated_property_set",
    )


def test_negated_property_set_inverse(engine, sf_small):
    # ?n !(^ex:region) ?x — inverse-only set: edges x→n via any predicate
    # except ex:region; with ?n restricted to nations, only ex:nation
    # edges (from customers and suppliers) remain
    check(
        engine,
        sf_small,
        """SELECT ?n ?x WHERE {
             ?n a ex:Nation .
             ?n !(^ex:region) ?x }""",
        f"""SELECT {URI_N} AS n, {URI_C} AS x
            FROM nation JOIN customer ON c_nationkey = n_nationkey
            UNION ALL
            SELECT {URI_N} AS n,
              'http://ex.org/tpch/supplier/' || CAST(s_suppkey AS VARCHAR) AS x
            FROM nation JOIN supplier ON s_nationkey = n_nationkey""",
        "negated_property_set_inverse",
    )


def test_describe_constant_uri(engine, sf_small):
    check(
        engine,
        sf_small,
        f"""DESCRIBE <{EX}customer/7>""",
        """SELECT 'http://ex.org/tpch/customer/7' AS s,
              'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS p,
              'http://ex.org/tpch/Customer' AS o
            FROM customer WHERE c_custkey = 7
            UNION ALL SELECT 'http://ex.org/tpch/customer/7',
              'http://ex.org/tpch/name', c_name FROM customer WHERE c_custkey = 7
            UNION ALL SELECT 'http://ex.org/tpch/customer/7',
              'http://ex.org/tpch/acctbal', CAST(c_acctbal AS VARCHAR)
            FROM customer WHERE c_custkey = 7
            UNION ALL SELECT 'http://ex.org/tpch/customer/7',
              'http://ex.org/tpch/mktsegment', c_mktsegment
            FROM customer WHERE c_custkey = 7
            UNION ALL SELECT 'http://ex.org/tpch/customer/7',
              'http://ex.org/tpch/nation',
              'http://ex.org/tpch/nation/' || CAST(c_nationkey AS VARCHAR)
            FROM customer WHERE c_custkey = 7""",
        "describe_constant",
    )


def test_describe_var(engine, sf_small):
    check(
        engine,
        sf_small,
        """DESCRIBE ?n WHERE { ?n a ex:Nation ; ex:name ?nm .
             FILTER (?nm = "NATION_3") }""",
        """SELECT 'http://ex.org/tpch/nation/' || CAST(n_nationkey AS VARCHAR) AS s,
              'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS p,
              'http://ex.org/tpch/Nation' AS o
            FROM nation WHERE n_name = 'NATION_3'
            UNION ALL
            SELECT 'http://ex.org/tpch/nation/' || CAST(n_nationkey AS VARCHAR),
              'http://ex.org/tpch/name', n_name FROM nation WHERE n_name = 'NATION_3'
            UNION ALL
            SELECT 'http://ex.org/tpch/nation/' || CAST(n_nationkey AS VARCHAR),
              'http://ex.org/tpch/region',
              'http://ex.org/tpch/region/' || CAST(n_regionkey AS VARCHAR)
            FROM nation WHERE n_name = 'NATION_3'""",
        "describe_var",
    )


def test_blank_node_property_list(engine, sf_small):
    # [ ... ] is an anonymous variable; inner triples join as usual
    check(
        engine,
        sf_small,
        """SELECT ?cname ?rname WHERE {
             ?c a ex:Customer ; ex:name ?cname ;
                ex:nation [ ex:region [ ex:name ?rname ] ] . }""",
        """SELECT c_name AS cname, r_name AS rname
           FROM customer
           JOIN nation ON c_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
           WHERE c_name IS NOT NULL AND r_name IS NOT NULL""",
        "blank_node_property_list",
    )


def test_labeled_blank_node(engine, sf_small):
    check(
        engine,
        sf_small,
        """SELECT ?rname WHERE {
             _:n a ex:Nation ; ex:name "NATION_3" ; ex:region _:r .
             _:r ex:name ?rname . }""",
        """SELECT r_name AS rname FROM nation JOIN region
           ON n_regionkey = r_regionkey
           WHERE n_name = 'NATION_3' AND r_name IS NOT NULL""",
        "labeled_blank_node",
    )


def test_not_in(engine, sf_small):
    check(
        engine,
        sf_small,
        """SELECT ?name ?seg WHERE {
             ?c a ex:Customer ; ex:name ?name ; ex:mktsegment ?seg .
             FILTER (?seg NOT IN ("BUILDING", "MACHINERY")) }""",
        """SELECT c_name AS name, c_mktsegment AS seg FROM customer
           WHERE c_name IS NOT NULL AND c_mktsegment IS NOT NULL
             AND c_mktsegment NOT IN ('BUILDING', 'MACHINERY')""",
        "not_in",
    )


def test_construct_where_shorthand(engine, sf_small):
    check(
        engine,
        sf_small,
        """CONSTRUCT WHERE { ?r a ex:Region ; ex:name ?name }""",
        """SELECT * FROM (
             SELECT 'http://ex.org/tpch/region/' || CAST(r_regionkey AS VARCHAR) AS s,
               'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS p,
               'http://ex.org/tpch/Region' AS o
             FROM region
             UNION
             SELECT 'http://ex.org/tpch/region/' || CAST(r_regionkey AS VARCHAR),
               'http://ex.org/tpch/name', r_name
             FROM region WHERE r_name IS NOT NULL) t""",
        "construct_where",
    )


def test_group_by_expression(engine, sf_small):
    # GROUP BY (expr AS ?v): computed grouping key (order year)
    check(
        engine,
        sf_small,
        """SELECT ?y (COUNT(?o) AS ?n) (SUM(?p) AS ?total) WHERE {
             ?o a ex:Order ; ex:orderdate ?d ; ex:totalprice ?p }
           GROUP BY (YEAR(?d) AS ?y)""",
        """SELECT EXTRACT(year FROM o_orderdate) AS y, COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total
           FROM orders
           WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
           GROUP BY EXTRACT(year FROM o_orderdate)""",
        "group_by_expression",
    )


def test_having_filters_groups(engine, sf_small):
    check(
        engine,
        sf_small,
        """SELECT ?seg (COUNT(?c) AS ?n) WHERE {
             ?c a ex:Customer ; ex:mktsegment ?seg }
           GROUP BY ?seg HAVING (COUNT(?c) > 290)""",
        """SELECT c_mktsegment AS seg, COUNT(*) AS n FROM customer
           WHERE c_mktsegment IS NOT NULL
           GROUP BY c_mktsegment HAVING COUNT(*) > 290""",
        "having_filters_groups",
    )


def test_order_by_aggregate_alias(engine, sf_small):
    check(
        engine,
        sf_small,
        """SELECT ?seg (COUNT(?c) AS ?n) WHERE {
             ?c a ex:Customer ; ex:mktsegment ?seg }
           GROUP BY ?seg ORDER BY DESC(?n) ?seg LIMIT 3""",
        """SELECT c_mktsegment AS seg, COUNT(*) AS n FROM customer
           WHERE c_mktsegment IS NOT NULL
           GROUP BY c_mktsegment ORDER BY n DESC, seg LIMIT 3""",
        "order_by_aggregate_alias",
    )


def test_datatype_function(engine, sf_small):
    check(
        engine,
        sf_small,
        """SELECT ?name ?dt ?ddt WHERE {
             ?c a ex:Customer ; ex:name ?name ; ex:acctbal ?bal .
             BIND (DATATYPE(?bal) AS ?dt)
             BIND (DATATYPE(?name) AS ?ddt)
             FILTER (DATATYPE(?bal) = <http://www.w3.org/2001/XMLSchema#double>) }""",
        """SELECT c_name AS name,
                  'http://www.w3.org/2001/XMLSchema#double' AS dt,
                  'http://www.w3.org/2001/XMLSchema#string' AS ddt
           FROM customer
           WHERE c_name IS NOT NULL AND c_acctbal IS NOT NULL""",
        "datatype_function",
    )


def test_variable_predicate_browsing(engine, sf_small):
    """?s ?p ?o with a constant subject: all forward predicates of the
    resource's molecule + rdf:type (browsing parity the reference's SQL
    wrappers cannot answer at all)."""
    import re

    from ontario_spark.data import table as load

    spark_, cat = engine.spark, engine.catalog
    df = engine.query(
        "SELECT ?p ?o WHERE { <http://ex.org/tpch/customer/1> ?p ?o }"
    )
    rows = {(r["p"], str(r["o"])) for r in df.collect()}
    c = load(spark_, "/root/testdata/sf0.001", "customer").filter(
        "c_custkey = 1"
    ).collect()[0]
    preds = {p for p, _ in rows}
    assert preds == {
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
        "http://ex.org/tpch/name",
        "http://ex.org/tpch/acctbal",
        "http://ex.org/tpch/mktsegment",
        "http://ex.org/tpch/nation",
    }
    assert ("http://ex.org/tpch/name", c["c_name"]) in rows
    assert (
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
        "http://ex.org/tpch/Customer",
    ) in rows


def test_variable_predicate_joined_star(engine, sf_small):
    """Variable-predicate triple joined against a constant-pred star:
    the join restricts the expansion to the star's resources."""
    df = engine.query(
        """PREFIX ex: <http://ex.org/tpch/>
           SELECT ?c ?p ?o WHERE {
             ?c a ex:Region . ?c ?p ?o }"""
    )
    rows = df.collect()
    # 5 regions x (type + name) = 10 rows
    assert len(rows) == 10
    assert all(r["c"].startswith("http://ex.org/tpch/region/") for r in rows)


def test_variable_predicate_repeated_variable(engine, sf_small):
    """?s ?p ?s — a repeated variable must compile via the per-
    predicate branches with the implied s==o equality, not the unpivot
    fast path (which would alias two columns to one name). The TPC-H
    lake has no self-referential values, so the result is EMPTY — the
    regression was an AMBIGUOUS_REFERENCE analysis error."""
    df = engine.query("SELECT ?x WHERE { ?x ?p ?x }")
    assert df.collect() == []


def test_variable_predicate_shared_with_object(engine, sf_small):
    """?s ?p ?p — predicate var shared with the object var: rows only
    where the object EQUALS the predicate IRI (none in this lake)."""
    df = engine.query("SELECT ?p WHERE { ?s ?p ?p }")
    assert df.collect() == []


# --- round-4 engine review fixes ---------------------------------------


def test_order_by_non_projected_variable(engine, sf_small):
    """ORDER BY may reference in-scope vars outside the SELECT list
    (legal without DISTINCT, SPARQL 1.1 §15.1); previously the sort
    column was projected away first → UNRESOLVED_COLUMN."""
    df = engine.query(
        PFX
        + """SELECT ?name WHERE { ?c a ex:Customer ; ex:name ?name ;
             ex:acctbal ?bal } ORDER BY DESC(?bal) ?name LIMIT 3"""
    )
    got = [r["name"] for r in df.collect()]
    import duckdb  # independent expectation

    exp = [
        r[0]
        for r in duckdb.sql(
            f"""SELECT c_name FROM '{sf_small}/customer.parquet'
                WHERE c_name IS NOT NULL AND c_acctbal IS NOT NULL
                ORDER BY c_acctbal DESC, c_name LIMIT 3"""
        ).fetchall()
    ]
    assert got == exp
    assert list(df.columns) == ["name"]


def test_optional_filter_on_outer_variable(engine, sf_small):
    """FILTER inside OPTIONAL referencing an outer var is the LeftJoin
    condition: rows failing it keep the outer binding with the
    optional side UNBOUND — they never disappear."""
    df = engine.query(
        PFX
        + """SELECT ?n ?r WHERE { ?n a ex:Nation ; ex:name ?nm .
             OPTIONAL { ?n ex:region ?r FILTER (STRLEN(?nm) > 6) } }"""
    )
    rows = df.collect()
    assert len(rows) == 25  # every nation survives exactly once
    import duckdb

    long_names = {
        r[0]
        for r in duckdb.sql(
            f"SELECT n_nationkey FROM '{sf_small}/nation.parquet' WHERE length(n_name) > 6"
        ).fetchall()
    }
    bound = {
        int(r["n"].rsplit("/", 1)[1]) for r in rows if r["r"] is not None
    }
    assert bound == long_names


def test_describe_unknown_iri_empty(engine, sf_small):
    """DESCRIBE of a resource no mapping can produce: empty graph
    (SPARQL §16.4), not an IndexError."""
    df = engine.query("DESCRIBE <http://nowhere.example/x>")
    assert df.collect() == []


def test_two_type_constraints_same_shape(spark, sf_small):
    """A star with TWO rdf:type constraints satisfiable via two maps
    over the same subject shape: the maps self-join on the subject
    (previously: hard SourceSelectionError)."""
    from ontario_spark.catalog.model import (
        Catalog,
        DataSource,
        LogicalSource,
        TripleMap,
        ref,
        tpl,
    )
    from ontario_spark.compiler.query import SparqlEngine

    EX2 = "http://ex.org/tpch/"
    cat = Catalog()
    cat.add(
        DataSource(name="lake", dstype="parquet", base_path=sf_small),
        TripleMap(
            name="CustA",
            source=LogicalSource(table="customer"),
            subject=tpl(EX2 + "customer/{c_custkey}"),
            subject_class=EX2 + "Customer",
            predicates=((EX2 + "name", ref("c_name")),),
        ),
        TripleMap(
            name="CustB",
            source=LogicalSource(table="customer"),
            subject=tpl(EX2 + "customer/{c_custkey}"),
            subject_class=EX2 + "Party",
            predicates=((EX2 + "acctbal", ref("c_acctbal")),),
        ),
    )
    eng = SparqlEngine(spark, cat)
    df = eng.query(
        PFX
        + """SELECT ?c ?name WHERE {
             ?c a ex:Customer ; a ex:Party ; ex:name ?name }"""
    )
    import duckdb

    n = duckdb.sql(
        f"SELECT COUNT(*) FROM '{sf_small}/customer.parquet' WHERE c_name IS NOT NULL"
    ).fetchall()[0][0]
    assert df.count() == n


def test_values_all_undef_column(engine, sf_small):
    """A VALUES column that is UNDEF in every row must not break
    DataFrame schema inference."""
    df = engine.query(
        PFX
        + """SELECT ?name ?x WHERE {
             ?r a ex:Region ; ex:name ?name .
             VALUES (?name ?x) { ("EUROPE" UNDEF) ("ASIA" UNDEF) } }"""
    )
    rows = df.collect()
    assert sorted(r["name"] for r in rows) == ["ASIA", "EUROPE"]
    assert all(r["x"] is None for r in rows)


def test_langmatches_dynamic_range(engine, sf_small):
    """LANGMATCHES with a computed (non-constant) range argument."""
    df = engine.query(
        PFX
        + """SELECT ?name WHERE {
             ?r a ex:Region ; ex:name ?name .
             FILTER (LANGMATCHES("en-US", UCASE("en"))) }"""
    )
    assert df.count() == 5  # every region: "en-US" matches range "EN"


def test_optional_containing_only_outer_filter(engine, sf_small):
    """OPTIONAL { FILTER(outer-var expr) }: LeftJoin against the empty
    pattern — rows passing keep themselves, failing rows also survive
    (nothing optional to bind). Degenerate but spec-legal."""
    df = engine.query(
        PFX
        + """SELECT ?name WHERE { ?r a ex:Region ; ex:name ?name .
             OPTIONAL { FILTER (STRLEN(?name) > 4) } }"""
    )
    assert df.count() == 5  # all regions survive


def test_values_mixed_kinds_widen_to_lexical(engine):
    """Heterogeneous VALUES columns are legal SPARQL (round-5 review
    fix — previously a hard error; before round 4, order-dependent
    corruption): mixed kinds fall back to lexical string forms,
    identically in either order."""
    for vals in ("1 true", "true 1"):
        rows = engine.query(
            "SELECT ?x WHERE { VALUES ?x { %s } }" % vals
        ).collect()
        assert sorted(r["x"] for r in rows) == ["1", "true"], vals
    rows = engine.query(
        'SELECT ?x WHERE { VALUES ?x { 1 "a" UNDEF } }'
    ).collect()
    assert sorted(r["x"] or "" for r in rows) == ["", "1", "a"]


def test_values_mixed_numerics_keep_lexical_forms(engine):
    """Mixed int/decimal VALUES columns keep each literal's OWN
    lexical form (round-8: the old double-widening turned integer 1
    into "1.0", which then failed sameTerm joins against "1")."""
    rows = engine.query(
        "SELECT ?x WHERE { VALUES ?x { 1 2.5 } }"
    ).collect()
    assert sorted(r["x"] for r in rows) == ["1", "2.5"]


# --- GRAPH (named graphs = federation members, round 4) -----------------


def test_graph_iri_scopes_to_source(engine, sf_small):
    check(
        engine,
        sf_small,
        """SELECT ?name WHERE {
             GRAPH <urn:graph:tpch_lake> { ?n a ex:Nation ; ex:name ?name } }""",
        "SELECT n_name AS name FROM nation WHERE n_name IS NOT NULL",
        "graph_iri",
    )


def test_graph_unknown_iri_is_empty(engine):
    df = engine.query(
        PFX
        + """SELECT ?name WHERE {
              GRAPH <urn:graph:nowhere> { ?n a ex:Nation ; ex:name ?name } }"""
    )
    assert df.count() == 0
    assert df.columns == ["name"]


def test_graph_variable_binds_source(engine, sf_small):
    check(
        engine,
        sf_small,
        """SELECT ?g ?name WHERE {
             GRAPH ?g { ?n a ex:Nation ; ex:name ?name } }""",
        """SELECT 'urn:graph:tpch_lake' AS g, n_name AS name
           FROM nation WHERE n_name IS NOT NULL""",
        "graph_var",
    )


def test_graph_variable_reuse_constrains_inner_term(engine):
    """SPARQL 1.1: reusing the graph variable inside the block is a
    conforming query (round-5 ADVICE fix — previously rejected); the
    inner occurrence is constrained to the active graph's IRI."""
    # bound-and-different: nation names never equal the graph IRI → ∅
    df = engine.query(
        PFX
        + "SELECT ?g WHERE { GRAPH ?g { ?n a ex:Nation ; ex:name ?g } }"
    )
    assert df.count() == 0
    # bound-and-equal (VALUES pins the inner ?g to the lake IRI) →
    # every nation row survives with ?g = the graph IRI
    df = engine.query(
        PFX
        + """SELECT ?g ?name WHERE {
              GRAPH ?g { ?n a ex:Nation ; ex:name ?name .
                         VALUES ?g { <urn:graph:tpch_lake> } } }"""
    )
    rows = df.collect()
    assert len(rows) == 25
    assert {r["g"] for r in rows} == {"urn:graph:tpch_lake"}


def test_graph_variable_reuse_optional_inner_takes_iri(engine):
    """An inner ?g left unbound (OPTIONAL never matches) is compatible
    with the graph binding — ?g comes back as the graph IRI."""
    df = engine.query(
        PFX
        + """SELECT ?g ?name WHERE {
              GRAPH ?g { ?n a ex:Nation ; ex:name ?name .
                         OPTIONAL { ?n ex:no_such_pred ?g } } }"""
    )
    rows = df.collect()
    assert len(rows) == 25
    assert {r["g"] for r in rows} == {"urn:graph:tpch_lake"}


def test_graph_scopes_nested_optional(spark, sf_small):
    """The restriction must reach patterns nested inside the GRAPH
    block: Customer lives only on the remote source, so an OPTIONAL
    Customer pattern inside GRAPH <lake> stays unbound."""
    from ontario_spark.catalog.tpch_rdf import tpch_federated_catalog

    eng = SparqlEngine(spark, tpch_federated_catalog(sf_small))
    rows = eng.query(
        PFX
        + """SELECT ?name ?cname WHERE {
              GRAPH <urn:graph:tpch_lake> {
                ?n a ex:Nation ; ex:name ?name .
                OPTIONAL { ?c a ex:Customer ; ex:name ?cname ; ex:nation ?n }
              } }"""
    ).collect()
    assert len(rows) == 25
    assert all(r["cname"] is None for r in rows)


def test_from_merges_default_graph(spark, sf_small):
    """FROM <g> restricts the default graph to that member; FROM of
    both members merges them (§13.2)."""
    from ontario_spark.catalog.tpch_rdf import tpch_federated_catalog

    eng = SparqlEngine(spark, tpch_federated_catalog(sf_small))
    lake_only = eng.query(
        PFX
        + """SELECT ?name FROM <urn:graph:tpch_lake> WHERE {
              ?c a ex:Customer ; ex:name ?name }"""
    )
    assert lake_only.count() == 0  # Customer lives on the remote member
    both = eng.query(
        PFX
        + """SELECT ?name FROM <urn:graph:tpch_lake>
             FROM <urn:graph:remote_sql> WHERE {
              ?c a ex:Customer ; ex:name ?name }"""
    )
    assert both.count() == 150


def test_from_without_named_disables_graph(engine):
    df = engine.query(
        PFX
        + """SELECT ?g ?name FROM <urn:graph:tpch_lake> WHERE {
              GRAPH ?g { ?n a ex:Nation ; ex:name ?name } }"""
    )
    assert df.count() == 0


def test_from_named_limits_graph_range(spark, sf_small):
    from ontario_spark.catalog.tpch_rdf import tpch_federated_catalog

    eng = SparqlEngine(spark, tpch_federated_catalog(sf_small))
    rows = eng.query(
        PFX
        + """SELECT ?g ?name FROM NAMED <urn:graph:remote_sql> WHERE {
              GRAPH ?g { ?c a ex:Customer ; ex:name ?name } }"""
    ).collect()
    assert len(rows) == 150
    assert {r["g"] for r in rows} == {"urn:graph:remote_sql"}
    assert (
        eng.query(
            PFX
            + """SELECT ?g FROM NAMED <urn:graph:tpch_lake> WHERE {
                  GRAPH ?g { ?c a ex:Customer } }"""
        ).count()
        == 0
    )


def test_dataset_state_resets_between_queries(engine, sf_small):
    """A FROM-restricted query must not leak its dataset into the next
    query on the same engine."""
    engine.query(
        PFX
        + "SELECT ?name FROM <urn:graph:nowhere> WHERE { ?n ex:name ?name }"
    )
    check(
        engine,
        sf_small,
        "SELECT ?name WHERE { ?n a ex:Nation ; ex:name ?name }",
        "SELECT n_name AS name FROM nation WHERE n_name IS NOT NULL",
        "dataset_reset",
    )


def test_graph_after_triples_parses(engine, sf_small):
    """GRAPH following plain triples in the same group (round-4 review:
    'graph' was missing from the triples-block stop keywords)."""
    check(
        engine,
        sf_small,
        """SELECT ?name ?g WHERE {
             ?n a ex:Nation ; ex:name ?name .
             GRAPH ?g { ?n ex:region ?r } }""",
        """SELECT n_name AS name, 'urn:graph:tpch_lake' AS g
           FROM nation WHERE n_name IS NOT NULL""",
        "graph_after_triples",
    )


def test_from_named_only_empties_default_graph(spark, sf_small):
    """FROM NAMED without FROM: the default graph is EMPTY (§13.2) —
    non-GRAPH patterns match nothing, GRAPH patterns still work."""
    from ontario_spark.catalog.tpch_rdf import tpch_federated_catalog

    eng = SparqlEngine(spark, tpch_federated_catalog(sf_small))
    plain = eng.query(
        PFX
        + """SELECT ?name FROM NAMED <urn:graph:remote_sql> WHERE {
              ?c a ex:Customer ; ex:name ?name }"""
    )
    assert plain.count() == 0
    scoped = eng.query(
        PFX
        + """SELECT ?name FROM NAMED <urn:graph:remote_sql> WHERE {
              GRAPH <urn:graph:remote_sql> { ?c a ex:Customer ; ex:name ?name } }"""
    )
    assert scoped.count() == 150


def test_negated_path_scoped_by_graph(spark, sf_small):
    """!(...) inside GRAPH must not leak triples from other members
    (round-4 review: branches compiled unrestricted)."""
    from ontario_spark.catalog.tpch_rdf import tpch_federated_catalog

    eng = SparqlEngine(spark, tpch_federated_catalog(sf_small))
    # Customer lives only on remote_sql: inside GRAPH <lake> a negated
    # path from a Customer subject must bind nothing
    rows = eng.query(
        PFX
        + """SELECT ?o WHERE {
              GRAPH <urn:graph:tpch_lake> { ?c !ex:nothing ?o .
                ?c a ex:Customer } }"""
    )
    assert rows.count() == 0


def test_subquery_inside_graph_is_scoped(spark, sf_small):
    from ontario_spark.catalog.tpch_rdf import tpch_federated_catalog

    eng = SparqlEngine(spark, tpch_federated_catalog(sf_small))
    # subquery over Customer inside GRAPH <lake>: empty (Customer is
    # remote); inside GRAPH <remote_sql>: full
    empty = eng.query(
        PFX
        + """SELECT ?name WHERE { GRAPH <urn:graph:tpch_lake> {
              { SELECT ?name WHERE { ?c a ex:Customer ; ex:name ?name } } } }"""
    )
    assert empty.count() == 0
    full = eng.query(
        PFX
        + """SELECT ?name WHERE { GRAPH <urn:graph:remote_sql> {
              { SELECT ?name WHERE { ?c a ex:Customer ; ex:name ?name } } } }"""
    )
    assert full.count() == 150


def test_path_closure_under_from(engine, sf_small):
    """FROM no longer breaks property-path closures (the guard used to
    raise 'inside GRAPH' even for FROM)."""
    check(
        engine,
        sf_small,
        """SELECT ?name FROM <urn:graph:tpch_lake> WHERE {
             ?n a ex:Nation ; ex:name ?name ; ex:region+ ?r . }""",
        "SELECT n_name AS name FROM nation WHERE n_name IS NOT NULL",
        "closure_under_from",
    )


def test_describe_honors_from(spark, sf_small):
    from ontario_spark.catalog.tpch_rdf import tpch_federated_catalog

    eng = SparqlEngine(spark, tpch_federated_catalog(sf_small))
    uri = "http://ex.org/tpch/customer/1"
    unrestricted = eng.query(f"DESCRIBE <{uri}>")
    assert unrestricted.count() > 0
    excluded = eng.query(f"DESCRIBE <{uri}> FROM <urn:graph:tpch_lake>")
    assert excluded.count() == 0


def test_var_pred_inside_graph_scoped(spark, sf_small):
    from ontario_spark.catalog.tpch_rdf import tpch_federated_catalog

    eng = SparqlEngine(spark, tpch_federated_catalog(sf_small))
    lake = eng.query(
        PFX
        + """SELECT ?p WHERE { GRAPH <urn:graph:tpch_lake> {
              <http://ex.org/tpch/nation/1> ?p ?o } }"""
    ).collect()
    assert len(lake) > 0
    remote = eng.query(
        PFX
        + """SELECT ?p WHERE { GRAPH <urn:graph:remote_sql> {
              <http://ex.org/tpch/nation/1> ?p ?o } }"""
    )
    assert remote.count() == 0  # Nation is not on the remote member


def test_concurrent_compiles_isolate_dataset_state(spark, sf_small):
    """The dataset scope is thread-local (the HTTP server compiles from
    one thread per request): a FROM-restricted query compiling in one
    thread must never leak its restriction into another thread's
    unrestricted query."""
    import threading

    from ontario_spark.catalog.tpch_rdf import tpch_federated_catalog

    eng = SparqlEngine(spark, tpch_federated_catalog(sf_small))
    restricted = PFX + (
        "SELECT ?name FROM <urn:graph:tpch_lake> WHERE "
        "{ ?c a ex:Customer ; ex:name ?name }"
    )
    unrestricted = PFX + "SELECT ?name WHERE { ?c a ex:Customer ; ex:name ?name }"
    results: dict[str, int] = {}
    errors: list[Exception] = []

    expected = {"restricted": 0, "unrestricted": 150}

    def run(tag, q, n_iter):
        try:
            for _ in range(n_iter):
                # assert EVERY iteration: a transient cross-thread leak
                # must not be masked by a later clean run
                n = eng.query(q).count()
                assert n == expected[tag], (tag, n)
                results[tag] = n
        except Exception as ex:  # surface on the main thread
            errors.append(ex)

    threads = [
        threading.Thread(target=run, args=("restricted", restricted, 5)),
        threading.Thread(target=run, args=("unrestricted", unrestricted, 5)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    assert results["restricted"] == 0  # Customer lives on the remote member
    assert results["unrestricted"] == 150


# --- SPARQL 1.1 function tail (round 5) ---------------------------------


def test_nondeterministic_term_functions(engine):
    """UUID/STRUUID/BNODE/RAND (§17.4 tail): fresh per solution, right
    shapes — no oracle possible, checked structurally."""
    rows = engine.query(
        PFX
        + """SELECT ?u ?su ?b ?b2 ?r WHERE {
              ?n a ex:Nation ; ex:name ?name .
              BIND (UUID() AS ?u)
              BIND (STRUUID() AS ?su)
              BIND (BNODE() AS ?b)
              BIND (BNODE(?name) AS ?b2)
              BIND (RAND() AS ?r) }"""
    ).collect()
    assert len(rows) == 25
    us = [r["u"] for r in rows]
    assert all(u.startswith("urn:uuid:") for u in us)
    assert len(set(us)) == 25  # fresh per solution
    sus = [r["su"] for r in rows]
    assert len(set(sus)) == 25
    assert not sus[0].startswith("urn:")
    for col in ("b", "b2"):
        bs = [r[col] for r in rows]
        assert all(b.startswith("_:b") for b in bs)
        assert len(set(bs)) == 25
    assert all(0.0 <= r["r"] < 1.0 for r in rows)


def test_tz_timezone_on_lexical_datetime(engine):
    """TZ/TIMEZONE over plain-string lexical dateTimes exercise the
    offset-parsing path (native timestamp columns go through the
    UTC branch, covered by the sparql_term_functions oracle)."""
    rows = engine.query(
        PFX
        + """SELECT ?z ?d ?z0 ?d0 ?zn ?dn WHERE {
              ?n a ex:Nation ; ex:name ?name .
              FILTER (?name = "NATION_7")
              BIND (TZ("2024-05-01T10:00:00-05:30") AS ?z)
              BIND (TIMEZONE("2024-05-01T10:00:00-05:30") AS ?d)
              BIND (TZ("2024-05-01T10:00:00+00:00") AS ?z0)
              BIND (TIMEZONE("2024-05-01T10:00:00+00:00") AS ?d0)
              BIND (TZ("2024-05-01T10:00:00") AS ?zn)
              BIND (TIMEZONE("2024-05-01T10:00:00") AS ?dn) }"""
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["z"] == "-05:30" and r["d"] == "-PT5H30M"
    assert r["z0"] == "+00:00" and r["d0"] == "PT0S"
    assert r["zn"] == "" and r["dn"] is None  # zoneless: TZ="" / TIMEZONE=error


def test_strdt_strlang_feed_lang_and_datatype(engine):
    """STRDT/STRLANG constructed terms answer LANG()/DATATYPE() via the
    __lang/__dt side columns, and STRDT casts known xsd types native."""
    rows = engine.query(
        PFX
        + """SELECT ?name ?n2 ?lang ?dt ?num WHERE {
              ?n a ex:Nation ; ex:name ?name .
              FILTER (?name = "NATION_7")
              BIND (STRLANG(?name, "en-US") AS ?tagged)
              BIND (LANG(?tagged) AS ?lang)
              BIND (STR(?tagged) AS ?n2)
              BIND (STRDT("42", <http://www.w3.org/2001/XMLSchema#integer>) AS ?num)
              BIND (DATATYPE(?num) AS ?dt) }"""
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n2"] == "NATION_7"
    assert r["lang"] == "en-us"
    assert r["dt"] == "http://www.w3.org/2001/XMLSchema#integer"
    assert r["num"] == 42  # native integer, not the lexical string


def test_bnode_same_label_same_node_within_solution(engine):
    """§17.4.2.9 (review fix): two BNODE(?x) calls in one solution must
    return the SAME blank node; different solutions differ."""
    rows = engine.query(
        PFX
        + """SELECT ?name ?a ?b WHERE {
              ?n a ex:Nation ; ex:name ?name .
              BIND (BNODE(?name) AS ?a)
              BIND (BNODE(?name) AS ?b) }"""
    ).collect()
    assert len(rows) == 25
    assert all(r["a"] == r["b"] for r in rows)
    assert len({r["a"] for r in rows}) == 25  # distinct across solutions


def test_tz_on_typed_datetime_literal(engine):
    """Review fix: a ^^xsd:dateTime literal's zone must come from its
    ORIGINAL lexical form (the native timestamp cast drops it)."""
    rows = engine.query(
        PFX
        + """SELECT ?z ?d WHERE {
              ?n a ex:Nation ; ex:name ?name .
              FILTER (?name = "NATION_7")
              BIND (TZ("2024-05-01T10:00:00-05:30"^^<http://www.w3.org/2001/XMLSchema#dateTime>) AS ?z)
              BIND (TIMEZONE("2024-05-01T10:00:00-05:30"^^<http://www.w3.org/2001/XMLSchema#dateTime>) AS ?d) }"""
    ).collect()
    assert len(rows) == 1
    assert rows[0]["z"] == "-05:30" and rows[0]["d"] == "-PT5H30M"


# --- round-5 compiler review fixes ---------------------------------------


def test_group_by_expression_projections(engine, sf_small):
    """GROUP BY projections beyond bare aggregates (review fix):
    expressions CONTAINING aggregates, pure key functions, and
    aggregates in ORDER BY all compile and match the oracle."""
    check(
        engine,
        sf_small,
        """SELECT ?seg (UCASE(?seg) AS ?u) ((COUNT(?c) + 1) AS ?n1)
           WHERE { ?c a ex:Customer ; ex:mktsegment ?seg }
           GROUP BY ?seg ORDER BY DESC(COUNT(?c)) ?seg""",
        """SELECT c_mktsegment AS seg, upper(c_mktsegment) AS u,
                  COUNT(*) + 1 AS n1
           FROM customer WHERE c_mktsegment IS NOT NULL
           GROUP BY c_mktsegment ORDER BY COUNT(*) DESC, seg""",
        "group_by_expr_projections",
    )


def test_count_distinct_star(engine, sf_small):
    """COUNT(DISTINCT *) counts distinct SOLUTIONS (review fix:
    DISTINCT was silently ignored)."""
    rows = engine.query(
        PFX
        + """SELECT (COUNT(DISTINCT *) AS ?n) WHERE {
              ?c a ex:Customer ; ex:mktsegment ?seg }
            GROUP BY ?seg"""
    ).collect()
    import duckdb

    exp = duckdb.sql(
        f"""SELECT COUNT(*) FROM (SELECT DISTINCT c_custkey, c_mktsegment
            FROM read_parquet('{"/root/testdata/sf0.001"}/customer.parquet')
            WHERE c_mktsegment IS NOT NULL)"""
    ).fetchone()[0]
    assert sum(r["n"] for r in rows) == exp


def test_bind_scopes_into_following_optional(engine, sf_small):
    """A BIND preceding an OPTIONAL is in scope for it (review fix:
    OPTIONALs previously all ran before any BIND, so the OPTIONAL's
    FILTER hit 'unbound variable ?t')."""
    rows = engine.query(
        PFX
        + """SELECT ?name ?r WHERE {
              ?n a ex:Nation ; ex:name ?name .
              BIND (8 AS ?t)
              OPTIONAL { ?n ex:region ?r . FILTER (STRLEN(?name) > ?t) }
            }"""
    ).collect()
    assert len(rows) == 25  # all nations survive (left join)
    bound = {r["name"] for r in rows if r["r"] is not None}
    # NATION_0..9 have strlen 8 (not > 8) → unbound; NATION_10.. bound
    assert bound == {f"NATION_{i}" for i in range(10, 25)}


def test_filter_exists_applies_to_whole_group(engine, sf_small):
    """FILTER EXISTS correlates against the FINISHED group regardless
    of textual position (§18.2.2.2; review fix)."""
    q_first = PFX + """SELECT ?name WHERE {
          FILTER EXISTS { ?n ex:region ?r }
          ?n a ex:Nation ; ex:name ?name .
          OPTIONAL { ?n ex:region ?r } }"""
    q_last = PFX + """SELECT ?name WHERE {
          ?n a ex:Nation ; ex:name ?name .
          OPTIONAL { ?n ex:region ?r }
          FILTER EXISTS { ?n ex:region ?r } }"""
    a = sorted(r["name"] for r in engine.query(q_first).collect())
    b = sorted(r["name"] for r in engine.query(q_last).collect())
    assert a == b and len(a) == 25


def test_dynamic_regex_and_string_functions(engine, sf_small):
    """REGEX/REPLACE/STRBEFORE with VARIABLE arguments evaluate per
    row (review fix: the variable's NAME was used as the constant)."""
    rows = engine.query(
        PFX
        + """SELECT ?name ?hit ?rep ?before WHERE {
              ?n a ex:Nation ; ex:name ?name .
              BIND ("NATION_1[0-9]" AS ?pat)
              BIND (REGEX(?name, ?pat) AS ?hit)
              BIND ("_" AS ?needle)
              BIND (REPLACE(?name, ?needle, "-") AS ?rep)
              BIND (STRBEFORE(?name, ?needle) AS ?before) }"""
    ).collect()
    assert len(rows) == 25
    for r in rows:
        n = r["name"]  # NATION_0..NATION_24
        assert r["hit"] == (n.startswith("NATION_1") and len(n) == 9)
        assert r["rep"] == n.replace("_", "-")
        assert r["before"] == "NATION"


def test_isnumeric_and_string_ebv_ansi_safe(engine, sf_small):
    """ISNUMERIC over genuinely non-numeric strings and a
    string-valued function in boolean position must not crash under
    Spark 4's default ANSI mode (review fix)."""
    rows = engine.query(
        PFX
        + """SELECT ?name WHERE {
              ?r a ex:Region ; ex:name ?name .
              FILTER (!ISNUMERIC(?name) && CONCAT(?name, "x")) }"""
    ).collect()
    assert len(rows) == 5  # non-numeric names pass; non-empty string EBV true


def test_engine_explain_reports_both_levels(spark, sf_small):
    from ontario_spark.catalog.tpch_rdf import EX, tpch_catalog
    from ontario_spark.compiler.query import SparqlEngine

    eng = SparqlEngine(spark, tpch_catalog(sf_small))
    out = eng.explain(
        f"PREFIX ex: <{EX}>\n"
        "SELECT ?name WHERE { ?c a ex:Customer ; ex:name ?name "
        "OPTIONAL { ?c ex:acctbal ?b } }"
    )
    assert "== Federation plan" in out
    assert "star ?c" in out and "CustomerMap[parquet]" in out
    assert "OptionalBlock:" in out
    assert "== Spark physical plan ==" in out
    assert "FileScan parquet" in out


def test_trailing_values_restricts_solutions(spark, sf_small):
    from ontario_spark.catalog.tpch_rdf import EX, tpch_catalog
    from ontario_spark.compiler.query import SparqlEngine

    eng = SparqlEngine(spark, tpch_catalog(sf_small))
    df = eng.query(
        f"PREFIX ex: <{EX}>\n"
        "SELECT ?name WHERE { ?n a ex:Nation ; ex:name ?name }\n"
        'VALUES ?name { "NATION_3" "NATION_7" }'
    )
    assert sorted(r["name"] for r in df.collect()) == ["NATION_3", "NATION_7"]


def test_protocol_dataset_params_override_from(spark, sf_small):
    """SPARQL Protocol §2.1.4: default-graph-uri request params
    override the query's own FROM clause."""
    from ontario_spark.catalog.tpch_rdf import tpch_federated_catalog

    eng = SparqlEngine(spark, tpch_federated_catalog(sf_small))
    text = (
        PFX
        + """SELECT ?name FROM <urn:graph:remote_sql> WHERE {
              ?c a ex:Customer ; ex:name ?name }"""
    )
    # query's own FROM finds the remote member's customers
    assert eng.query(text).count() > 0
    # the protocol param overrides it to the lake member → none
    assert (
        eng.query(
            text, default_graph_uris=["urn:graph:tpch_lake"]
        ).count()
        == 0
    )


def test_trailing_values_joins_after_aggregation(spark, sf_small):
    """§18.2.4.3: the ValuesClause joins AFTER grouping/HAVING — the
    aggregate must not double-count the pattern rows (round-6 review
    fix: an in-pattern join returned c=50 for a 2-row VALUES)."""
    from ontario_spark.catalog.tpch_rdf import EX, tpch_catalog
    from ontario_spark.compiler.query import SparqlEngine

    eng = SparqlEngine(spark, tpch_catalog(sf_small))
    base = eng.query(
        f"PREFIX ex: <{EX}>\n"
        "SELECT (COUNT(*) AS ?c) WHERE { ?n a ex:Nation }"
    ).collect()[0]["c"]
    rows = eng.query(
        f"PREFIX ex: <{EX}>\n"
        "SELECT (COUNT(*) AS ?c) WHERE { ?n a ex:Nation }\n"
        "VALUES ?z { 1 2 }"
    ).collect()
    # post-aggregation cross product: two bindings, SAME count each
    assert [r["c"] for r in rows] == [base, base]


def test_subselect_trailing_values(spark, sf_small):
    from ontario_spark.catalog.tpch_rdf import EX, tpch_catalog
    from ontario_spark.compiler.query import SparqlEngine

    eng = SparqlEngine(spark, tpch_catalog(sf_small))
    rows = eng.query(
        f"PREFIX ex: <{EX}>\n"
        "SELECT ?name WHERE { { SELECT ?name WHERE "
        "{ ?n a ex:Nation ; ex:name ?name } "
        'VALUES ?name { "NATION_1" "NATION_4" } } }'
    ).collect()
    assert sorted(r["name"] for r in rows) == ["NATION_1", "NATION_4"]


def test_ask_trailing_values_joins_after_optional(spark, sf_small):
    """Round-8 ADVICE fix (§18.2.4.3 for non-SELECT forms): a trailing
    VALUES on an ASK joins the FINISHED pattern. With every nation
    region-bound, VALUES pinning ?r to a nonexistent region must make
    the ASK answer false — the old in-group append force-bound ?r
    before the OPTIONAL, leaving a surviving (and wrong) solution."""
    from ontario_spark.catalog.tpch_rdf import EX, tpch_catalog
    from ontario_spark.compiler.query import SparqlEngine

    eng = SparqlEngine(spark, tpch_catalog(sf_small))
    base = (
        f"PREFIX ex: <{EX}>\n"
        "ASK { ?n a ex:Nation ; ex:name ?nm "
        "OPTIONAL { ?n ex:region ?r } }\n"
    )
    # positive control: a real region keeps the ASK true
    assert eng.query(
        base + f"VALUES ?r {{ <{EX}region/0> }}"
    ).collect()[0]["ask"] is True
    # nonexistent region: no finished solution is compatible → false
    assert eng.query(
        base + f"VALUES ?r {{ <{EX}region/999> }}"
    ).collect()[0]["ask"] is False


def test_construct_trailing_values_joins_after_optional(spark, sf_small):
    """Same deferred-VALUES rule for CONSTRUCT: the template only
    instantiates over solutions of the finished pattern joined with
    the VALUES multiset."""
    from ontario_spark.catalog.tpch_rdf import EX, tpch_catalog
    from ontario_spark.compiler.query import SparqlEngine

    eng = SparqlEngine(spark, tpch_catalog(sf_small))
    rows = eng.query(
        f"PREFIX ex: <{EX}>\n"
        "CONSTRUCT { ?n ex:inRegion ?r } WHERE "
        "{ ?n a ex:Nation ; ex:name ?nm OPTIONAL { ?n ex:region ?r } }\n"
        f"VALUES ?r {{ <{EX}region/0> }}"
    ).collect()
    assert 0 < len(rows) < 25
    assert all(r["o"] == f"{EX}region/0" for r in rows)


def test_values_undef_is_a_join_wildcard(spark, sf_small):
    """§10.2 join compatibility: an UNDEF cell constrains NOTHING —
    the row joins on its bound columns only (round-8 review fix: the
    NULL-encoded frame equi-joined UNDEF to nothing, silently
    filtering instead of wildcarding)."""
    from ontario_spark.catalog.tpch_rdf import EX, tpch_catalog
    from ontario_spark.compiler.query import SparqlEngine

    eng = SparqlEngine(spark, tpch_catalog(sf_small))
    base = (
        f"PREFIX ex: <{EX}>\n"
        "SELECT ?nm ?r WHERE { ?n a ex:Nation ; ex:name ?nm "
        "OPTIONAL { ?n ex:region ?r } }\n"
    )
    # an all-UNDEF row keeps every solution
    rows = eng.query(base + "VALUES ?r { UNDEF }").collect()
    assert len(rows) == 25
    # multiset union: UNDEF row contributes all 25, the bound row its
    # 5 region-0 matches
    rows = eng.query(
        base + f"VALUES ?r {{ UNDEF <{EX}region/0> }}"
    ).collect()
    assert len(rows) == 30
    # ASK with VALUES ?r { UNDEF } is true (was false)
    ask = eng.query(
        f"PREFIX ex: <{EX}>\n"
        "ASK { ?n a ex:Nation ; ex:name ?nm "
        "OPTIONAL { ?n ex:region ?r } }\n"
        "VALUES ?r { UNDEF }"
    ).collect()[0]["ask"]
    assert ask is True
    # multi-column rows with DIFFERENT masks: (name bound, r UNDEF)
    # wildcards r; (name UNDEF, r bound) wildcards name
    rows = eng.query(
        base
        + f'VALUES (?nm ?r) {{ ("NATION_7" UNDEF) (UNDEF <{EX}region/0>) }}'
    ).collect()
    assert len(rows) == 6  # 1 (NATION_7, any r) + 5 (any name, region 0)
    # inline (in-group) UNDEF takes the same wildcard semantics
    rows = eng.query(
        f"PREFIX ex: <{EX}>\n"
        "SELECT ?nm WHERE { ?n a ex:Nation ; ex:name ?nm "
        'VALUES ?nm { UNDEF "NATION_3" } }'
    ).collect()
    assert len(rows) == 26  # 25 via UNDEF + 1 via the bound row


def test_values_merges_pattern_side_unbound(spark, sf_small):
    """§10.2 the other direction (round-8): a solution whose shared
    variable is UNBOUND (here via a UNION branch that never binds ?r)
    is compatible with a bound VALUES row and the merge TAKES the
    VALUES binding — the old equi-join filtered such rows out."""
    from ontario_spark.catalog.tpch_rdf import EX, tpch_catalog
    from ontario_spark.compiler.query import SparqlEngine

    eng = SparqlEngine(spark, tpch_catalog(sf_small))
    rows = eng.query(
        f"PREFIX ex: <{EX}>\n"
        "SELECT ?nm ?r WHERE { "
        "{ ?n a ex:Nation ; ex:name ?nm ; ex:region ?r } UNION "
        '{ ?n a ex:Nation ; ex:name ?nm FILTER(?nm = "NATION_3") } }\n'
        f"VALUES ?r {{ <{EX}region/0> }}"
    ).collect()
    got = sorted((r["nm"], r["r"]) for r in rows)
    # 5 region-0 nations from the bound branch + NATION_3 from the
    # unbound branch, merged to region/0
    assert len(got) == 6
    assert ("NATION_3", f"{EX}region/0") in got
    assert all(r == f"{EX}region/0" for _, r in got)


def test_values_empty_data_block(spark, sf_small):
    """``VALUES ?x { }`` is legal SPARQL: joining with the empty
    multiset yields zero solutions (round-8 second review: this
    crashed with IndexError), and a typed literal against a string
    pattern column must FILTER, not throw, under ANSI."""
    from ontario_spark.catalog.tpch_rdf import EX, tpch_catalog
    from ontario_spark.compiler.query import SparqlEngine

    eng = SparqlEngine(spark, tpch_catalog(sf_small))
    rows = eng.query(
        f"PREFIX ex: <{EX}>\n"
        "SELECT ?nm WHERE { ?n a ex:Nation ; ex:name ?nm }\n"
        "VALUES ?nm { }"
    ).collect()
    assert rows == []
    # numeric literal vs string-lexical pattern column: lexical forms
    # never match → empty, NOT a CAST_INVALID_INPUT crash
    rows = eng.query(
        f"PREFIX ex: <{EX}>\n"
        "SELECT ?nm WHERE { ?n a ex:Nation ; ex:name ?nm }\n"
        "VALUES ?nm { 7 }"
    ).collect()
    assert rows == []


def test_inline_values_typed_literal_vs_string_column(spark, sf_small):
    """Round-8 third review: an INLINE (in-group) VALUES with a typed
    literal against a string-lexical pattern column must filter (no
    lexical form matches), not throw CAST_INVALID_INPUT under ANSI —
    BFrame.join now compares dtype-mismatched LEXICAL vars on string
    forms. Mixed int/decimal columns keep integer lexical forms
    ("5", not the widened "5.0"): compatibility is sameTerm."""
    from ontario_spark.catalog.tpch_rdf import EX, tpch_catalog
    from ontario_spark.compiler.query import SparqlEngine

    eng = SparqlEngine(spark, tpch_catalog(sf_small))
    rows = eng.query(
        f"PREFIX ex: <{EX}>\n"
        "SELECT ?nm WHERE { ?n a ex:Nation ; ex:name ?nm . "
        "VALUES ?nm { 7 } }"
    ).collect()
    assert rows == []
    # mixed numeric VALUES keeps each literal's own lexical form
    from ontario_spark.compiler.frame import LEXICAL, BFrame, TermMeta
    from ontario_spark.sparql.ast import Term, ValuesBlock

    bf = BFrame(
        spark.createDataFrame([("5",)], "a string"),
        {"a": TermMeta(LEXICAL)},
    )
    vb = ValuesBlock(
        variables=["a"],
        rows=[(Term("literal", "5", py=5),), (Term("literal", "2.5", py=2.5),)],
    )
    got = eng._join_values(bf, vb).df.collect()
    assert [r["a"] for r in got] == ["5"]


def test_values_undef_with_orderby_aggregate(spark, sf_small):
    """Round-8 review fix: a multi-mask trailing VALUES unions the
    grouped frame — the union must preserve the hoisted ``__sN``
    ORDER BY-aggregate column (its loss crashed the post-union sort
    select with UNRESOLVED_COLUMN)."""
    from ontario_spark.catalog.tpch_rdf import EX, tpch_catalog
    from ontario_spark.compiler.query import SparqlEngine

    eng = SparqlEngine(spark, tpch_catalog(sf_small))
    rows = eng.query(
        f"PREFIX ex: <{EX}>\n"
        "SELECT ?nm (COUNT(*) AS ?c) WHERE "
        "{ ?n a ex:Nation ; ex:name ?nm } GROUP BY ?nm "
        "ORDER BY DESC(COUNT(*)) ?nm\n"
        'VALUES ?nm { UNDEF "NATION_3" }'
    ).collect()
    # 25 groups via the UNDEF row + 1 via the bound row
    assert len(rows) == 26
    assert sum(1 for r in rows if r["nm"] == "NATION_3") == 2


def test_values_undef_wildcards_federated_star(spark, sf_small):
    """Round-8 review fix: an UNDEF-bearing inline VALUES over a
    REMOTE star must not equi-join the wildcard away nor push only
    the bound values as the remote IN-list — the deferred join now
    runs after the remote fetch."""
    from ontario_spark.catalog.tpch_rdf import tpch_federated_catalog
    from ontario_spark.compiler.query import SparqlEngine

    eng = SparqlEngine(spark, tpch_federated_catalog(sf_small))
    names = eng.query(
        PFX + "SELECT ?name WHERE { ?c a ex:Customer ; ex:name ?name }"
    ).collect()
    assert len(names) > 0
    one = sorted(r["name"] for r in names)[0]
    rows = eng.query(
        PFX + "SELECT ?name WHERE { ?c a ex:Customer ; ex:name ?name "
        f'VALUES ?name {{ UNDEF "{one}" }} }}'
    ).collect()
    # every customer via the UNDEF wildcard + 1 via the bound row
    assert len(rows) == len(names) + 1


def test_protocol_named_graph_only_empties_default_graph(spark, sf_small):
    """Pinning test for the round-7 adjudication of ADVICE-2: a
    request carrying ONLY named-graph-uri has an EMPTY default graph
    (Protocol §2.1.4 + §13.2) — non-GRAPH patterns match nothing, so
    the answer is 0 rows, not the whole federation and not an error."""
    from ontario_spark.catalog.tpch_rdf import tpch_federated_catalog
    from ontario_spark.compiler.query import SparqlEngine

    eng = SparqlEngine(spark, tpch_federated_catalog(sf_small))
    text = PFX + "SELECT ?name WHERE { ?c a ex:Customer ; ex:name ?name }"
    assert eng.query(text).count() > 0
    assert (
        eng.query(text, named_graph_uris=["urn:graph:remote_sql"]).count()
        == 0
    )


def test_trailing_values_joins_after_optional(spark, sf_small):
    """Seventh-review regression lock: the trailing VALUES applies to
    the FINISHED pattern (§18.2.4.3) — rows whose OPTIONAL bound ?r to
    a DIFFERENT region are dropped (bound-bound compatibility), and
    since every nation here is region-bound, the result is exactly the
    region-0 nations. (A row whose ?r stayed UNBOUND would merge and
    take the VALUES binding — §10.2; that direction is covered by
    test_values_merges_pattern_side_unbound.)"""
    from ontario_spark.catalog.tpch_rdf import EX, tpch_catalog
    from ontario_spark.compiler.query import SparqlEngine

    eng = SparqlEngine(spark, tpch_catalog(sf_small))
    rows = eng.query(
        f"PREFIX ex: <{EX}>\n"
        "SELECT ?nm ?r WHERE { ?n a ex:Nation ; ex:name ?nm "
        "OPTIONAL { ?n ex:region ?r } }\n"
        f"VALUES ?r {{ <{EX}region/0> }}"
    ).collect()
    # exactly the nations of region 0 — all with ?r bound to it
    assert 0 < len(rows) < 25
    assert all(r["r"] == f"{EX}region/0" for r in rows)


# --- §10.2 compatibility joins (maybe_null tracking, round 8) ---------


def test_optional_unbound_var_rejoined_in_second_optional(engine, sf_small):
    """The classic double-OPTIONAL case: ?x is bound by the first
    OPTIONAL only for AMERICA nations; the second OPTIONAL shares ?x,
    so rows with ?x UNBOUND are compatible with its solutions and the
    merge takes the inner binding (§10.2) — a plain equi-LeftJoin
    would leave them NULL."""
    check(
        engine,
        sf_small,
        """SELECT ?nname ?x WHERE {
             ?n a ex:Nation ; ex:name ?nname .
             OPTIONAL { ?n ex:region ?r . ?r ex:name ?x .
                        FILTER (STRSTARTS(?x, 'AM')) }
             OPTIONAL { ?r3 a ex:Region ; ex:name ?x .
                        FILTER (STRENDS(?x, 'PE')) } }""",
        """WITH l AS (
             SELECT n_name AS nname,
                    CASE WHEN r_name LIKE 'AM%' THEN r_name END AS x
             FROM nation JOIN region ON n_regionkey = r_regionkey
             WHERE n_name IS NOT NULL),
           r AS (SELECT r_name AS x FROM region WHERE r_name LIKE '%PE')
           SELECT l.nname AS nname, COALESCE(l.x, r.x) AS x
           FROM l LEFT JOIN r ON l.x IS NULL OR l.x = r.x""",
        "optional_compat_left_join",
    )


def test_union_padded_var_joins_as_wildcard(engine, sf_small):
    """A UNION branch that does not bind ?rname pads it with unbound;
    joining the padded frame with the Region star must treat those
    rows as wildcards (every region), not drop them."""
    check(
        engine,
        sf_small,
        """SELECT ?nname ?rname WHERE {
             { ?n a ex:Nation ; ex:name ?nname ; ex:region ?r .
               ?r ex:name ?rname . FILTER (STRSTARTS(?rname, 'A')) }
             UNION
             { ?n a ex:Nation ; ex:name ?nname ; ex:region ?r .
               ?r ex:name ?rn2 . FILTER (!STRSTARTS(?rn2, 'A')) }
             ?r2 a ex:Region ; ex:name ?rname . }""",
        """WITH u AS (
             SELECT n_name AS nname, r_name AS rname
             FROM nation JOIN region ON n_regionkey = r_regionkey
             WHERE n_name IS NOT NULL AND r_name LIKE 'A%'
             UNION ALL
             SELECT n_name, NULL
             FROM nation JOIN region ON n_regionkey = r_regionkey
             WHERE n_name IS NOT NULL AND r_name NOT LIKE 'A%')
           SELECT u.nname AS nname, r2.r_name AS rname
           FROM u JOIN region r2
             ON u.rname IS NULL OR u.rname = r2.r_name
           WHERE r2.r_name IS NOT NULL""",
        "union_pad_compat_join",
    )


def test_minus_partial_domain_overlap(engine, sf_small):
    """MINUS §8.3.3 with ?r unbound on the left but ?n bound and
    matching: dom overlap via ?n makes the pair compatible → the five
    EUROPE nations drop even though their left ?r is unbound (the old
    equi-anti kept them); A-region nations keep (their bound ?r is not
    the EUROPE region); MIDDLE EAST nations keep (no EUROPE μ2 shares
    their ?n)."""
    check(
        engine,
        sf_small,
        """SELECT ?nname WHERE {
             ?n a ex:Nation ; ex:name ?nname .
             OPTIONAL { ?n ex:region ?r . ?r ex:name ?rname .
                        FILTER (STRSTARTS(?rname, 'A')) }
             MINUS { ?n ex:region ?r . ?r ex:name 'EUROPE' } }""",
        """WITH l AS (
             SELECT n_name AS nname, n_nationkey AS nk,
                    CASE WHEN r_name LIKE 'A%' THEN n_regionkey END AS rk
             FROM nation JOIN region ON n_regionkey = r_regionkey
             WHERE n_name IS NOT NULL)
           SELECT nname FROM l
           WHERE NOT EXISTS (
             SELECT 1 FROM nation n2
             JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
             WHERE r2.r_name = 'EUROPE' AND n2.n_nationkey = l.nk
               AND (l.rk IS NULL OR l.rk = n2.n_regionkey))""",
        "minus_partial_overlap",
    )


def test_not_exists_unbound_var_is_wildcard(engine, sf_small):
    """FILTER NOT EXISTS substitutes only the BOUND vars of each row
    (§8.1.1 errata): a row with ?rname unbound leaves it a free
    variable, the pattern matches the ASIA region, and the row drops —
    unlike MINUS, where the same pair would be dom-disjoint."""
    check(
        engine,
        sf_small,
        """SELECT ?nname WHERE {
             ?n a ex:Nation ; ex:name ?nname .
             OPTIONAL { ?n ex:region ?r . ?r ex:name ?rname .
                        FILTER (STRSTARTS(?rname, 'A')) }
             FILTER NOT EXISTS { ?r4 a ex:Region ; ex:name ?rname .
                                 FILTER (?rname = 'ASIA') } }""",
        """WITH l AS (
             SELECT n_name AS nname,
                    CASE WHEN r_name LIKE 'A%' THEN r_name END AS rn
             FROM nation JOIN region ON n_regionkey = r_regionkey
             WHERE n_name IS NOT NULL)
           SELECT nname FROM l
           WHERE NOT EXISTS (
             SELECT 1 FROM region r4 WHERE r4.r_name = 'ASIA'
               AND (l.rn IS NULL OR l.rn = r4.r_name))""",
        "not_exists_wildcard",
    )


def test_subquery_head_flags_propagate(engine, sf_small):
    """A subquery projecting an OPTIONAL-bound var keeps its
    maybe-unbound status across the compile() seam: the outer join on
    ?x treats the unbound rows as wildcards."""
    check(
        engine,
        sf_small,
        """SELECT ?nname ?x WHERE {
             { SELECT ?n ?x WHERE {
                 ?n a ex:Nation .
                 OPTIONAL { ?n ex:region ?r . ?r ex:name ?x .
                            FILTER (STRSTARTS(?x, 'AM')) } } }
             ?n ex:name ?nname .
             ?r2 a ex:Region ; ex:name ?x . }""",
        """WITH sub AS (
             SELECT n_nationkey AS nk,
                    CASE WHEN r_name LIKE 'AM%' THEN r_name END AS x
             FROM nation JOIN region ON n_regionkey = r_regionkey)
           SELECT n.n_name AS nname, r2.r_name AS x
           FROM sub JOIN nation n ON sub.nk = n.n_nationkey
           JOIN region r2 ON (sub.x IS NULL OR sub.x = r2.r_name)
           WHERE n.n_name IS NOT NULL AND r2.r_name IS NOT NULL""",
        "subquery_flags_compat",
    )


# --- [NOT] EXISTS in expression position (§17.4.1.4, round 8) ---------


def test_exists_in_filter_disjunction(engine, sf_small):
    """EXISTS as one branch of a FILTER || — the whole-filter
    ExistsFilter fast path cannot express this; the mark-column path
    evaluates the correlated pattern per row."""
    check(
        engine,
        sf_small,
        """SELECT ?nname WHERE {
             ?n a ex:Nation ; ex:name ?nname .
             FILTER (STRSTARTS(?nname, 'NATION_1')
                     || EXISTS { ?n ex:region ?r . ?r ex:name 'ASIA' }) }""",
        """SELECT n_name AS nname FROM nation
           WHERE n_name IS NOT NULL AND (
             n_name LIKE 'NATION_1%'
             OR EXISTS (SELECT 1 FROM region
                        WHERE r_regionkey = n_regionkey
                          AND r_name = 'ASIA'))""",
        "exists_in_disjunction",
    )


def test_not_exists_in_conjunction_with_comparison(engine, sf_small):
    """NOT EXISTS composed with a comparison in one FILTER."""
    check(
        engine,
        sf_small,
        """SELECT ?nname WHERE {
             ?n a ex:Nation ; ex:name ?nname .
             FILTER (STRLEN(?nname) >= 8
                     && NOT EXISTS { ?n ex:region ?r .
                                     ?r ex:name 'EUROPE' }) }""",
        """SELECT n_name AS nname FROM nation
           WHERE n_name IS NOT NULL AND length(n_name) >= 8
             AND NOT EXISTS (SELECT 1 FROM region
                             WHERE r_regionkey = n_regionkey
                               AND r_name = 'EUROPE')""",
        "not_exists_in_conjunction",
    )


def test_bind_exists_flag(engine, sf_small):
    """BIND(EXISTS { ... } AS ?flag): the boolean lands as a column,
    usable downstream (here stringified through IF for a stable
    cross-engine representation)."""
    check(
        engine,
        sf_small,
        """SELECT ?nname ?tag WHERE {
             ?n a ex:Nation ; ex:name ?nname .
             BIND (IF(EXISTS { ?n ex:region ?r . ?r ex:name 'ASIA' },
                      'asia', 'other') AS ?tag) }""",
        """SELECT n_name AS nname,
                  CASE WHEN EXISTS (SELECT 1 FROM region
                                    WHERE r_regionkey = n_regionkey
                                      AND r_name = 'ASIA')
                       THEN 'asia' ELSE 'other' END AS tag
           FROM nation WHERE n_name IS NOT NULL""",
        "bind_exists_flag",
    )


def test_exists_disjoint_domain_global_probe(engine, sf_small):
    """An EXISTS sharing no variables with the outer pattern is a
    global emptiness probe: non-empty inner → the branch is TRUE for
    every row."""
    check(
        engine,
        sf_small,
        """SELECT ?nname WHERE {
             ?n a ex:Nation ; ex:name ?nname .
             FILTER (STRSTARTS(?nname, 'NATION_2')
                     || EXISTS { ?r2 a ex:Region ; ex:name 'ASIA' }) }""",
        """SELECT n_name AS nname FROM nation
           WHERE n_name IS NOT NULL AND (
             n_name LIKE 'NATION_2%'
             OR EXISTS (SELECT 1 FROM region WHERE r_name = 'ASIA'))""",
        "exists_global_probe",
    )


def test_exists_in_optional_condition(engine, sf_small):
    """A hoisted OPTIONAL condition (references outer vars) containing
    EXISTS — the LeftJoin condition evaluates under μ1 ∪ μ2: customers
    keep their order only when the order is urgent AND the customer's
    nation is in ASIA; every customer survives."""
    check(
        engine,
        sf_small,
        """SELECT ?cname ?ostat WHERE {
             ?c a ex:Customer ; ex:name ?cname ; ex:nation ?n .
             OPTIONAL { ?o a ex:Order ; ex:customer ?c ;
                           ex:orderstatus ?ostat ;
                           ex:orderpriority '1-URGENT' .
                        FILTER (BOUND(?cname)
                                && EXISTS { ?n ex:region ?r .
                                            ?r ex:name 'ASIA' }) } }""",
        """WITH m AS (
             SELECT c.c_custkey AS ck, o.o_orderstatus AS ostat
             FROM customer c
             JOIN orders o ON o.o_custkey = c.c_custkey
             JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
             JOIN region r ON r.r_regionkey = n2.n_regionkey
             WHERE o.o_orderpriority = '1-URGENT'
               AND o.o_orderstatus IS NOT NULL AND r.r_name = 'ASIA')
           SELECT c.c_name AS cname, m.ostat AS ostat
           FROM customer c LEFT JOIN m ON m.ck = c.c_custkey
           WHERE c.c_name IS NOT NULL""",
        "exists_in_optional_condition",
    )


def test_exists_only_optional_condition_is_hoisted(engine, sf_small):
    """Review fix: a FILTER whose ONLY outer-variable references live
    inside its EXISTS block must still hoist as the LeftJoin condition
    (the block's ?n correlates with the outer frame) — evaluated
    inside the block it degraded to a global emptiness probe."""
    check(
        engine,
        sf_small,
        """SELECT ?cname ?ostat WHERE {
             ?c a ex:Customer ; ex:name ?cname ; ex:nation ?n .
             OPTIONAL { ?o a ex:Order ; ex:customer ?c ;
                           ex:orderstatus ?ostat ;
                           ex:orderpriority '1-URGENT' .
                        FILTER (EXISTS { ?n ex:region ?r .
                                         ?r ex:name 'ASIA' }) } }""",
        """WITH m AS (
             SELECT c.c_custkey AS ck, o.o_orderstatus AS ostat
             FROM customer c
             JOIN orders o ON o.o_custkey = c.c_custkey
             JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
             JOIN region r ON r.r_regionkey = n2.n_regionkey
             WHERE o.o_orderpriority = '1-URGENT'
               AND o.o_orderstatus IS NOT NULL AND r.r_name = 'ASIA')
           SELECT c.c_name AS cname, m.ostat AS ostat
           FROM customer c LEFT JOIN m ON m.ck = c.c_custkey
           WHERE c.c_name IS NOT NULL""",
        "exists_only_optional_condition",
    )


def test_exists_in_having(engine, sf_small):
    """[NOT] EXISTS inside a HAVING constraint (§17.4.1.4 allows
    EXISTS in any constraint position; round-9 ADVICE — this used to
    fail with a generic 'not supported in this expression position').
    The mark computes over the GROUPED solutions, correlated on the
    group-key variable."""
    check(
        engine,
        sf_small,
        """SELECT ?seg (COUNT(?c) AS ?n) WHERE {
             ?c a ex:Customer ; ex:mktsegment ?seg .
           } GROUP BY ?seg
           HAVING (EXISTS { ?x ex:mktsegment ?seg ; ex:acctbal ?b .
                            FILTER (?b > 9500.0) }
                   && COUNT(?c) > 1)""",
        """SELECT c_mktsegment AS seg, COUNT(*) AS n FROM customer
           WHERE c_mktsegment IN (SELECT c_mktsegment FROM customer
                                  WHERE c_acctbal > 9500.0)
           GROUP BY c_mktsegment HAVING COUNT(*) > 1""",
        "exists_in_having",
    )
    # NOT EXISTS polarity
    check(
        engine,
        sf_small,
        """SELECT ?seg (COUNT(?c) AS ?n) WHERE {
             ?c a ex:Customer ; ex:mktsegment ?seg .
           } GROUP BY ?seg
           HAVING (NOT EXISTS { ?x ex:mktsegment ?seg ; ex:acctbal ?b .
                                FILTER (?b > 9500.0) })""",
        """SELECT c_mktsegment AS seg, COUNT(*) AS n FROM customer
           WHERE c_mktsegment NOT IN (SELECT c_mktsegment FROM customer
                                      WHERE c_acctbal > 9500.0)
           GROUP BY c_mktsegment""",
        "not_exists_in_having",
    )


def test_group_by_key_only_projection(engine, sf_small):
    """SELECT ?k ... GROUP BY ?k with no aggregate is legal SPARQL
    (§18.2.4; round-9 — previously refused): one row per key, and
    HAVING with only an EXISTS mark still applies. A projected var
    that is neither key nor aggregate stays a compile error."""
    check(
        engine,
        sf_small,
        """SELECT ?seg WHERE {
             ?c a ex:Customer ; ex:mktsegment ?seg .
           } GROUP BY ?seg ORDER BY ?seg""",
        """SELECT c_mktsegment AS seg FROM customer
           WHERE c_mktsegment IS NOT NULL
           GROUP BY c_mktsegment ORDER BY seg""",
        "group_by_key_only",
    )
    check(
        engine,
        sf_small,
        """SELECT ?seg WHERE {
             ?c a ex:Customer ; ex:mktsegment ?seg .
           } GROUP BY ?seg
           HAVING (NOT EXISTS { ?x ex:mktsegment ?seg ; ex:acctbal ?b .
                                FILTER (?b > 9500.0) })""",
        """SELECT c_mktsegment AS seg FROM customer
           WHERE c_mktsegment NOT IN (SELECT c_mktsegment FROM customer
                                      WHERE c_acctbal > 9500.0)
           GROUP BY c_mktsegment""",
        "group_by_key_only_having_exists",
    )
    from ontario_spark.compiler.query import QueryCompileError

    with pytest.raises(QueryCompileError, match="not group keys"):
        engine.query(
            PFX
            + """SELECT ?name WHERE {
                  ?c a ex:Customer ; ex:name ?name ; ex:mktsegment ?seg .
                } GROUP BY ?seg"""
        )


def test_exists_in_service_filter_refuses(spark, sf_small):
    """EXISTS inside a SERVICE block's FILTER would evaluate its
    pattern against the local catalog (the wrong dataset) — the
    compiler must refuse with a clear error, not silently mis-answer."""
    import pytest

    from ontario_spark.catalog.tpch_rdf import tpch_catalog
    from ontario_spark.compiler.query import QueryCompileError, SparqlEngine

    eng = SparqlEngine(
        spark,
        tpch_catalog(sf_small),
        service_executors={"http://remote.example/sparql": lambda q: []},
    )
    with pytest.raises(QueryCompileError, match="SERVICE"):
        eng.query(
            PFX
            + """SELECT ?r ?rn WHERE {
                  SERVICE <http://remote.example/sparql> {
                    ?r ex:name ?rn .
                    FILTER (STRLEN(?rn) > 2
                            || EXISTS { ?r a ex:Region }) } }"""
        )


def test_hint_pruning_guard_keeps_wildcard_molecules(engine, sf_small):
    """Hint-template pruning must NOT fire when the hinted var can be
    UNBOUND: a wildcard row joins acctbal solutions of EVERY molecule
    (customers AND suppliers), so pruning to the customer template
    would silently drop the supplier halves (§10.2)."""
    check(
        engine,
        sf_small,
        """SELECT ?name ?bal WHERE {
             { ?c a ex:Customer ; ex:name ?name .
               FILTER (STRENDS(?name, '#000000001')) }
             UNION
             { ?r a ex:Region ; ex:name ?name . FILTER (?name = 'ASIA') }
             OPTIONAL { ?c ex:acctbal ?bal } }""",
        """WITH l AS (
             SELECT c_name AS name,
                    'http://ex.org/tpch/customer/'
                      || CAST(c_custkey AS VARCHAR) AS cu
             FROM customer WHERE c_name LIKE '%#000000001'
             UNION ALL
             SELECT r_name, NULL FROM region WHERE r_name = 'ASIA'),
           a AS (
             SELECT 'http://ex.org/tpch/customer/'
                      || CAST(c_custkey AS VARCHAR) AS cu,
                    c_acctbal AS bal
             FROM customer WHERE c_acctbal IS NOT NULL
             UNION ALL
             SELECT 'http://ex.org/tpch/supplier/'
                      || CAST(s_suppkey AS VARCHAR), s_acctbal
             FROM supplier WHERE s_acctbal IS NOT NULL)
           SELECT l.name AS name, a.bal AS bal
           FROM l LEFT JOIN a ON l.cu IS NULL OR l.cu = a.cu""",
        "hint_prune_wildcard_guard",
    )
