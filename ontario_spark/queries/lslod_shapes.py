"""LSLOD workload-shape parity suite.

The reference ships its evaluation workload as twenty SPARQL queries
over the Life Science Linked Open Data cloud — ``SQ1–SQ10``
(``/root/reference/queries/simpleQueries/``) and ``CQ1–CQ10``
(``/root/reference/queries/complexqueries/``): 2–8 triple patterns,
cross-source star chains, literal-valued joins, DISTINCT, wide
``SELECT *`` heads, OPTIONAL blocks with FILTER conditions, and one
join expressed as a ``FILTER(str(?a)=str(?b))`` over otherwise
disjoint chains (CQ9). This module re-expresses each DISTINCTIVE
shape from that workload on the TPC-H RDF catalog (the shapes are the
reference's; the data, vocabulary, and SQL oracles are this repo's),
so a reference user can see every query structure they run today
verified end-to-end against DuckDB — including the demo's three-engine
topology (remote SQL + document store + lake) in ``lslod_cq6``.

Shape → source mapping (reference file cited per entry below). Round 9
completes the set: every one of the reference's 20 SQ/CQ workload
shapes now has an oracle-backed mirror (SQ10's 8-triple DISTINCT *
two-star chain is structurally SQ9's shape and is carried by
``lslod_sq9_wide_star``; SQ8 is SQ6's shape and is carried by
``lslod_sq6_unprojected_attr``):

- SQ1  → union of two same-projection stars from different molecules
- SQ2  → constant-anchored three-star chain
- SQ3  → two stars joined on a shared LITERAL value (not a URI key)
- SQ4  → constant-category anchor + literal xRef join, DISTINCT head
- SQ5  → constant filter + single-triple OPTIONAL tail
- SQ6/SQ8 → bound-but-unprojected attribute + hop; UNTYPED subject
         star unions every molecule carrying its predicates
- SQ7  → constant-LITERAL-anchored star bridged into a labeled star
- SQ9/SQ10 → wide ``SELECT DISTINCT *`` star + hop to a second star
- CQ1  → chain + OPTIONAL with a FILTER on the OPTIONAL-local var
- CQ2  → OPTIONAL whose block BRIDGES both outer stars
- CQ3  → wide star + case-insensitive REGEX filter, DISTINCT *
- CQ4  → four stars chained by three URI bridges, narrow head
- CQ5  → multi-triple OPTIONAL cascade on the outer star's subject
- CQ7  → wide DISTINCT * chain with a LITERAL join mid-hop
- CQ8  → constant URI OBJECT anchor on an untyped star + typed chain
- CQ10 → sameAs-bridged star + three-triple OPTIONAL cascade
- CQ6  → three-source chain (SQL wrapper + Mongo wrapper + lake);
         the SQL star runs the PRODUCTION Spark-JDBC executor against
         embedded Derby (round-9) so the bench line measures the
         partitioned executor-side fetch, not a driver stand-in
- CQ9  → var-disjoint chains joined only by FILTER(STR(?a)=STR(?b))
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ontario_spark.catalog.tpch_rdf import (
    tpch_catalog,
    tpch_trisource_jdbc_catalog,
)
from ontario_spark.compiler.query import SparqlEngine

# shared namespace/URI constants live in sparql_suite — two copies
# would silently diverge the oracles from the engine's URIs if the
# template ever changed (review fix)
from ontario_spark.queries.sparql_suite import PFX, URI_O

URI_C2 = "'http://ex.org/tpch/customer/' || CAST(o_custkey AS VARCHAR)"
URI_C = "'http://ex.org/tpch/customer/' || CAST(c_custkey AS VARCHAR)"
URI_S = "'http://ex.org/tpch/supplier/' || CAST(s_suppkey AS VARCHAR)"
URI_N = "'http://ex.org/tpch/nation/' || CAST(n_nationkey AS VARCHAR)"

# catalog factories take (spark, sf_dir): the trisource topology's SQL
# star is served by the PRODUCTION Spark-JDBC executor over embedded
# Derby (round-9: the bench line for lslod_cq6_trisource measures the
# executor-side partitioned fetch, not a driver-side stand-in)
_CATALOGS = {
    "base": lambda spark, sf_dir: tpch_catalog(sf_dir),
    "trisource": tpch_trisource_jdbc_catalog,
}


def _runner(sparql: str, catalog: str = "base"):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return SparqlEngine(spark, _CATALOGS[catalog](spark, sf_dir)).query(
            PFX + sparql
        )

    return run


_DEFS: dict[str, tuple[str, str, str]] = {
    # SQ1 (simpleQueries/SQ1): UNION of two 2-triple stars binding the
    # same projection from different molecules
    "lslod_sq1_union_stars": (
        """SELECT ?name ?bal WHERE {
             { ?c a ex:Customer ; ex:name ?name ; ex:acctbal ?bal }
             UNION
             { ?s a ex:Supplier ; ex:name ?name ; ex:acctbal ?bal } }""",
        """SELECT c_name AS name, c_acctbal AS bal FROM customer
           WHERE c_name IS NOT NULL AND c_acctbal IS NOT NULL
           UNION ALL
           SELECT s_name, s_acctbal FROM supplier
           WHERE s_name IS NOT NULL AND s_acctbal IS NOT NULL""",
        "base",
    ),
    # SQ2 (simpleQueries/SQ2): constant-object anchor star feeding a
    # three-star chain (drugCategory→kegg enzyme→reaction posture)
    "lslod_sq2_chain": (
        """SELECT ?prio ?qty WHERE {
             ?c a ex:Customer ; ex:mktsegment "BUILDING" .
             ?o a ex:Order ; ex:customer ?c ; ex:orderpriority ?prio .
             ?l a ex:Lineitem ; ex:order ?o ; ex:quantity ?qty . }""",
        """SELECT o_orderpriority AS prio, l_quantity AS qty
           FROM customer
           JOIN orders ON o_custkey = c_custkey
           JOIN lineitem ON l_orderkey = o_orderkey
           WHERE c_mktsegment = 'BUILDING'
             AND o_orderpriority IS NOT NULL AND l_quantity IS NOT NULL""",
        "base",
    ),
    # SQ3 (simpleQueries/SQ3): two molecules joined on a shared
    # LITERAL value (purl:title = drugbank:genericName posture) — the
    # join key is a lexical string, not a URI template
    "lslod_sq3_literal_join": (
        """SELECT ?n1 ?n2 WHERE {
             ?p1 a ex:Part ; ex:name ?n1 ; ex:brand ?b ; ex:size ?sz .
             ?p2 a ex:Part ; ex:name ?n2 ; ex:brand ?b .
             FILTER (?sz = 1) }""",
        """SELECT p1.p_name AS n1, p2.p_name AS n2
           FROM part p1 JOIN part p2 ON p1.p_brand = p2.p_brand
           WHERE p1.p_size = 1 AND p1.p_name IS NOT NULL
             AND p2.p_name IS NOT NULL""",
        "base",
    ),
    # SQ5 (simpleQueries/SQ5): constant-filtered star + single-triple
    # OPTIONAL tail (biotransformation posture)
    "lslod_sq5_optional_tail": (
        """SELECT ?name ?seg WHERE {
             ?c a ex:Customer ; ex:name ?name ; ex:acctbal ?bal .
             FILTER (?bal > 9000.0)
             OPTIONAL { ?c ex:mktsegment ?seg } }""",
        """SELECT c_name AS name, c_mktsegment AS seg FROM customer
           WHERE c_name IS NOT NULL AND c_acctbal IS NOT NULL
             AND c_acctbal > 9000.0""",
        "base",
    ),
    # SQ9/SQ10 (simpleQueries/SQ9): wide SELECT DISTINCT * star plus a
    # seeAlso-style hop into a second molecule's star
    "lslod_sq9_wide_star": (
        """SELECT DISTINCT * WHERE {
             ?o a ex:Order ; ex:customer ?c ; ex:orderstatus ?st ;
                ex:totalprice ?tp ; ex:orderpriority ?prio .
             ?c ex:name ?cname ; ex:mktsegment ?seg . }""",
        f"""SELECT DISTINCT {URI_C2} AS c, c_name AS cname,
                   {URI_O} AS o, o_orderpriority AS prio,
                   c_mktsegment AS seg, o_orderstatus AS st,
                   o_totalprice AS tp
            FROM orders JOIN customer ON o_custkey = c_custkey
            WHERE o_orderstatus IS NOT NULL AND o_totalprice IS NOT NULL
              AND o_orderpriority IS NOT NULL AND c_name IS NOT NULL
              AND c_mktsegment IS NOT NULL""",
        "base",
    ),
    # CQ2 (complexqueries/CQ2): OPTIONAL whose block references BOTH
    # outer stars (the inchi bridge posture) — the LeftJoin condition
    # correlates two molecules at once
    "lslod_cq2_bridge_optional": (
        """SELECT ?name ?nname ?seg ?r WHERE {
             ?c a ex:Customer ; ex:name ?name ; ex:nation ?n .
             ?n a ex:Nation ; ex:name ?nname .
             OPTIONAL { ?c ex:mktsegment ?seg . ?n ex:region ?r .
                        FILTER (STRSTARTS(?seg, 'B')) } }""",
        """WITH m AS (
             SELECT c.c_custkey AS ck, n.n_nationkey AS nk,
                    c.c_mktsegment AS seg,
                    'http://ex.org/tpch/region/'
                      || CAST(n.n_regionkey AS VARCHAR) AS r
             FROM customer c JOIN nation n
               ON c.c_nationkey = n.n_nationkey
             WHERE c.c_mktsegment LIKE 'B%' AND n.n_regionkey IS NOT NULL)
           SELECT c.c_name AS name, n.n_name AS nname, m.seg AS seg,
                  m.r AS r
           FROM customer c
           JOIN nation n ON c.c_nationkey = n.n_nationkey
           LEFT JOIN m ON m.ck = c.c_custkey AND m.nk = n.n_nationkey
           WHERE c.c_name IS NOT NULL AND n.n_name IS NOT NULL""",
        "base",
    ),
    # CQ3 (complexqueries/CQ3): wide DISTINCT * star + case-insensitive
    # REGEX over a label
    "lslod_cq3_star_regex": (
        """SELECT DISTINCT * WHERE {
             ?p a ex:Part ; ex:name ?name ; ex:brand ?brand ;
                ex:type ?type ; ex:size ?size ; ex:retailprice ?price .
             FILTER (REGEX(?name, 'GEAR', 'i')) }""",
        """SELECT DISTINCT p_brand AS brand, p_name AS name,
                  'http://ex.org/tpch/part/' || CAST(p_partkey AS VARCHAR) AS p,
                  p_retailprice AS price, p_size AS size, p_type AS type
           FROM part
           WHERE p_name IS NOT NULL AND p_brand IS NOT NULL
             AND p_type IS NOT NULL AND p_size IS NOT NULL
             AND p_retailprice IS NOT NULL
             AND regexp_matches(p_name, 'GEAR', 'i')""",
        "base",
    ),
    # CQ6 (complexqueries/CQ6 + demo/docker-compose.yml topology): a
    # chain touching THREE engines — Customer star answered by the SQL
    # wrapper, Supplier star by the Mongo aggregation-pipeline wrapper,
    # Nation star by the parquet lake — plus an OPTIONAL tail
    "lslod_cq6_trisource": (
        """SELECT ?name ?sname ?nname ?bal WHERE {
             ?c a ex:Customer ; ex:name ?name ; ex:nation ?n .
             ?s a ex:Supplier ; ex:name ?sname ; ex:nation ?n .
             ?n a ex:Nation ; ex:name ?nname .
             FILTER (STRSTARTS(?nname, "NATION_1"))
             OPTIONAL { ?c ex:acctbal ?bal } }""",
        """SELECT c_name AS name, s_name AS sname, n_name AS nname,
                  CAST(c_acctbal AS DOUBLE) AS bal
           FROM customer
           JOIN nation ON c_nationkey = n_nationkey
           JOIN supplier ON s_nationkey = n_nationkey
           WHERE c_name IS NOT NULL AND s_name IS NOT NULL
             AND n_name IS NOT NULL AND starts_with(n_name, 'NATION_1')""",
        "trisource",
    ),
    # CQ9 (complexqueries/CQ9): two variable-disjoint chains joined
    # ONLY by FILTER(str(?a) = str(?b)), with the reference's LIMIT
    # (made deterministic by an ORDER BY tiebreak)
    "lslod_cq9_filter_join": (
        """SELECT ?sn ?nn WHERE {
             ?n a ex:Nation ; ex:name ?nn ; ex:region ?r .
             ?s a ex:Supplier ; ex:name ?sn ; ex:nation ?n2 .
             ?n2 ex:name ?nn2 .
             FILTER (STR(?nn) = STR(?nn2)) }
           ORDER BY ?sn ?nn LIMIT 50""",
        """SELECT s_name AS sn, n1.n_name AS nn
           FROM nation n1
           JOIN (SELECT s_name, n_name FROM supplier
                 JOIN nation ON s_nationkey = n_nationkey
                 WHERE s_name IS NOT NULL AND n_name IS NOT NULL) s
             ON s.n_name = n1.n_name
           WHERE n1.n_name IS NOT NULL AND n1.n_regionkey IS NOT NULL
           ORDER BY sn, nn LIMIT 50""",
        "base",
    ),
    # SQ4 (simpleQueries/SQ4): constant-category anchor star + literal
    # xRef join into a second molecule + purl:title head, DISTINCT
    "lslod_sq4_const_xref_distinct": (
        """SELECT DISTINCT ?c ?title WHERE {
             ?c a ex:Customer ; ex:mktsegment "BUILDING" ; ex:nation ?n .
             ?n ex:name ?id .
             ?n2 a ex:Nation ; ex:name ?id .
             ?s a ex:Supplier ; ex:nation ?n2 ; ex:name ?title . }""",
        f"""SELECT DISTINCT {URI_C} AS c, s_name AS title
            FROM customer
            JOIN nation n1 ON c_nationkey = n1.n_nationkey
            JOIN nation n2 ON n2.n_name = n1.n_name
            JOIN supplier ON s_nationkey = n2.n_nationkey
            WHERE c_mktsegment = 'BUILDING' AND n1.n_name IS NOT NULL
              AND s_name IS NOT NULL""",
        "base",
    ),
    # SQ6/SQ8 (simpleQueries/SQ6, SQ8): a bound-but-UNPROJECTED
    # attribute (?w) + hop into a named star — and the subject star is
    # deliberately UNTYPED, so predicate-index source selection must
    # union every molecule carrying {acctbal, nation} (Customer AND
    # Supplier), the reference's multi-source star posture
    "lslod_sq6_unprojected_attr": (
        """SELECT ?d ?n ?nname WHERE {
             ?d ex:acctbal ?w ; ex:nation ?n .
             ?n ex:name ?nname . }""",
        f"""SELECT {URI_C} AS d, {URI_N} AS n, n_name AS nname
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            WHERE c_acctbal IS NOT NULL AND n_name IS NOT NULL
            UNION ALL
            SELECT {URI_S}, {URI_N}, n_name
            FROM supplier JOIN nation ON s_nationkey = n_nationkey
            WHERE s_acctbal IS NOT NULL AND n_name IS NOT NULL""",
        "base",
    ),
    # SQ7 (simpleQueries/SQ7): constant-LITERAL-anchored star bridged
    # (owl:sameAs posture) into a side-effect star + its label
    "lslod_sq7_const_literal_anchor": (
        """SELECT ?c ?sname ?label WHERE {
             ?s a ex:Supplier ; ex:nation ?n ; ex:name ?sname .
             ?n ex:name ?label .
             ?c ex:name "Customer#000000042" ; ex:nation ?n . }""",
        f"""SELECT {URI_C} AS c, s_name AS sname, n_name AS label
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            JOIN supplier ON s_nationkey = n_nationkey
            WHERE c_name = 'Customer#000000042' AND s_name IS NOT NULL
              AND n_name IS NOT NULL""",
        "base",
    ),
    # CQ1 (complexqueries/CQ1): chain + OPTIONAL single-triple star
    # whose FILTER constrains the OPTIONAL-LOCAL numeric var (the
    # molecularWeightAverage > 114 posture), DISTINCT head
    "lslod_cq1_optional_filter": (
        """SELECT DISTINCT ?name ?prio ?bal WHERE {
             ?o a ex:Order ; ex:customer ?c ; ex:orderpriority ?prio .
             ?c ex:name ?name .
             OPTIONAL { ?c ex:acctbal ?bal . FILTER (?bal > 5000.0) } }""",
        """SELECT DISTINCT c_name AS name, o_orderpriority AS prio,
                  CASE WHEN c_acctbal > 5000.0 THEN c_acctbal END AS bal
           FROM orders JOIN customer ON o_custkey = c_custkey
           WHERE c_name IS NOT NULL AND o_orderpriority IS NOT NULL""",
        "base",
    ),
    # CQ4 (complexqueries/CQ4): four stars chained by THREE URI
    # bridges (dg→sameAs→se, dg→genericDrug→gdg posture), narrow
    # two-var head over a 6-triple pattern
    "lslod_cq4_three_bridge_chain": (
        """SELECT ?qty ?nname WHERE {
             ?l a ex:Lineitem ; ex:order ?o ; ex:quantity ?qty .
             ?o ex:customer ?c .
             ?c ex:nation ?n .
             ?n ex:name ?nname . }""",
        """SELECT l_quantity AS qty, n_name AS nname
           FROM lineitem
           JOIN orders ON o_orderkey = l_orderkey
           JOIN customer ON c_custkey = o_custkey
           JOIN nation ON n_nationkey = c_nationkey
           WHERE l_quantity IS NOT NULL AND n_name IS NOT NULL""",
        "base",
    ),
    # CQ5 (complexqueries/CQ5): star chain + a MULTI-TRIPLE OPTIONAL
    # whose triples all share the outer star's subject (the
    # foodInteraction/biotransformation/drugCategory/dosageForm
    # cascade), SELECT * head
    "lslod_cq5_optional_star": (
        """SELECT * WHERE {
             ?c a ex:Customer ; ex:name ?cname ; ex:nation ?n .
             ?n ex:name ?nname .
             OPTIONAL { ?c ex:acctbal ?bal ; ex:mktsegment ?seg . } }""",
        f"""SELECT c_acctbal AS bal, {URI_C} AS c, c_name AS cname,
                   {URI_N} AS n, n_name AS nname, c_mktsegment AS seg
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            WHERE c_name IS NOT NULL AND n_name IS NOT NULL""",
        "base",
    ),
    # CQ7 (complexqueries/CQ7): wide DISTINCT * chain whose middle hop
    # is a LITERAL join (drug_name = genericName posture) between
    # otherwise-independent star groups
    "lslod_cq7_literal_join_wide": (
        """SELECT DISTINCT * WHERE {
             ?c a ex:Customer ; ex:nation ?n1 ; ex:mktsegment ?seg .
             ?n1 ex:name ?nm .
             ?n2 a ex:Nation ; ex:name ?nm ; ex:region ?r .
             ?s a ex:Supplier ; ex:nation ?n2 ; ex:name ?sname .
             FILTER (STRSTARTS(?nm, "NATION_2")) }""",
        f"""SELECT DISTINCT {URI_C} AS c,
                   'http://ex.org/tpch/nation/'
                     || CAST(n1.n_nationkey AS VARCHAR) AS n1,
                   c_mktsegment AS seg, n1.n_name AS nm,
                   'http://ex.org/tpch/nation/'
                     || CAST(n2.n_nationkey AS VARCHAR) AS n2,
                   'http://ex.org/tpch/region/'
                     || CAST(n2.n_regionkey AS VARCHAR) AS r,
                   {URI_S} AS s, s_name AS sname
            FROM customer
            JOIN nation n1 ON c_nationkey = n1.n_nationkey
            JOIN nation n2 ON n2.n_name = n1.n_name
            JOIN supplier ON s_nationkey = n2.n_nationkey
            WHERE starts_with(n1.n_name, 'NATION_2')
              AND c_mktsegment IS NOT NULL AND s_name IS NOT NULL
              AND n2.n_regionkey IS NOT NULL""",
        "base",
    ),
    # CQ8 (complexqueries/CQ8): constant URI OBJECT anchors the first
    # star (x-symbol <symbol:CNTNAP2>), then a chain into a typed
    # lookup star; SELECT * head. The anchor star is UNTYPED — source
    # selection resolves it from the predicate index and the constant
    # object inverts the nation template into a key filter
    "lslod_cq8_const_object_anchor": (
        """SELECT * WHERE {
             ?c ex:nation <http://ex.org/tpch/nation/7> ; ex:acctbal ?bal .
             ?o a ex:Order ; ex:customer ?c ; ex:orderstatus ?st ;
                ex:totalprice ?tp . }""",
        f"""SELECT c_acctbal AS bal, {URI_C} AS c,
                   {URI_O} AS o, o_orderstatus AS st, o_totalprice AS tp
            FROM customer JOIN orders ON o_custkey = c_custkey
            WHERE c_nationkey = 7 AND c_acctbal IS NOT NULL
              AND o_orderstatus IS NOT NULL AND o_totalprice IS NOT NULL""",
        "base",
    ),
    # CQ10 (complexqueries/CQ10): sameAs-bridged star + a THREE-triple
    # OPTIONAL cascade on the bridged subject (representedOrganization/
    # routeOfAdministration/genericMedicine posture), SELECT * head
    "lslod_cq10_bridged_optional_cascade": (
        """SELECT * WHERE {
             ?o a ex:Order ; ex:orderpriority ?prio ; ex:customer ?c .
             ?c ex:name ?cname ; ex:mktsegment ?seg .
             OPTIONAL { ?c ex:acctbal ?bal ; ex:nation ?n .
                        ?n ex:name ?nname . } }""",
        f"""SELECT c_acctbal AS bal, {URI_C2} AS c, c_name AS cname,
                   'http://ex.org/tpch/nation/'
                     || CAST(c_nationkey AS VARCHAR) AS n, n_name AS nname,
                   {URI_O} AS o, o_orderpriority AS prio,
                   c_mktsegment AS seg
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            LEFT JOIN nation ON n_nationkey = c_nationkey
            WHERE o_orderpriority IS NOT NULL AND c_name IS NOT NULL
              AND c_mktsegment IS NOT NULL""",
        "base",
    ),
}


QUERIES = {name: _runner(q, cat) for name, (q, _, cat) in _DEFS.items()}
ORACLE = {name: sql for name, (_, sql, _) in _DEFS.items()}
