from __future__ import annotations

import pytest

from ontario_spark.sparql.ast import Filter, OptionalBlock, Term, Triple, UnionBlock
from ontario_spark.sparql.parser import RDF_TYPE, SparqlSyntaxError, parse

EX = "http://ex.org/tpch/"
PFX = f"PREFIX ex: <{EX}>\n"


def test_basic_select():
    q = parse(PFX + "SELECT ?c ?name WHERE { ?c ex:name ?name . }")
    assert q.query_type == "select"
    assert [s.var for s in q.select] == ["c", "name"]
    (t,) = q.where.elements
    assert t == Triple(Term("var", "c"), Term("iri", EX + "name"), Term("var", "name"))


def test_predicate_object_list_and_type():
    q = parse(PFX + "SELECT * WHERE { ?c a ex:Customer ; ex:name ?n, ?n2 . }")
    trips = q.where.elements
    assert len(trips) == 3
    assert trips[0].p.value == RDF_TYPE
    assert trips[0].o.value == EX + "Customer"
    assert trips[1].o.value == "n" and trips[2].o.value == "n2"
    assert q.select is None  # SELECT *


def test_filter_expression_precedence():
    q = parse(PFX + 'SELECT ?x WHERE { ?x ex:v ?v . FILTER (?v > 5 && ?v < 10 || ?v = 42) }')
    (_, f) = q.where.elements
    assert isinstance(f, Filter)
    assert f.expr.op == "||"
    assert f.expr.args[0].op == "&&"
    assert f.expr.variables() == {"v"}


def test_typed_literals():
    q = parse(PFX + 'SELECT ?x WHERE { ?x ex:p "hi"@en . ?x ex:q "3.5"^^<http://www.w3.org/2001/XMLSchema#double> . ?x ex:r 7 . ?x ex:s true . }')
    os = [t.o for t in q.where.elements]
    assert os[0].lang == "en"
    assert os[1].py == 3.5
    assert os[2].py == 7
    assert os[3].py is True


def test_optional_union():
    q = parse(
        PFX
        + "SELECT ?a WHERE { { ?a ex:p ?b } UNION { ?a ex:q ?b } OPTIONAL { ?a ex:r ?c } }"
    )
    u, o = q.where.elements
    assert isinstance(u, UnionBlock) and len(u.branches) == 2
    assert isinstance(o, OptionalBlock)


def test_modifiers():
    q = parse(
        PFX
        + "SELECT DISTINCT ?x WHERE { ?x ex:p ?v } ORDER BY DESC(?v) ?x LIMIT 5 OFFSET 10"
    )
    assert q.distinct and q.limit == 5 and q.offset == 10
    assert len(q.order_by) == 2
    assert q.order_by[0][1] is False and q.order_by[1][1] is True


def test_aggregates_group_by():
    q = parse(
        PFX
        + "SELECT ?seg (COUNT(?c) AS ?n) (SUM(?bal) AS ?total) WHERE "
        + "{ ?c ex:mktsegment ?seg ; ex:acctbal ?bal } GROUP BY ?seg"
    )
    assert q.group_by == ["seg"]
    assert q.select[1].expr.op == "agg_count"
    assert q.select[2].expr.op == "agg_sum"


def test_ask_and_construct():
    a = parse(PFX + "ASK { ?c a ex:Customer }")
    assert a.query_type == "ask"
    c = parse(PFX + "CONSTRUCT { ?c ex:label ?n } WHERE { ?c ex:name ?n }")
    assert c.query_type == "construct"
    assert len(c.construct_template) == 1


def test_builtin_functions():
    q = parse(PFX + 'SELECT ?x WHERE { ?x ex:name ?n FILTER (CONTAINS(?n, "abc") || REGEX(?n, "^z", "i")) }')
    f = [e for e in q.where.elements if isinstance(e, Filter)][0]
    assert f.expr.op == "||"
    assert f.expr.args[0].op == "contains"
    assert f.expr.args[1].op == "regex"


def test_bind():
    q = parse(PFX + "SELECT ?y WHERE { ?x ex:v ?v BIND(?v * 2 AS ?y) }")
    from ontario_spark.sparql.ast import Bind

    b = [e for e in q.where.elements if isinstance(e, Bind)][0]
    assert b.var == "y" and b.expr.op == "*"


def test_syntax_errors():
    with pytest.raises(SparqlSyntaxError):
        parse("SELECT ?x WHERE { ?x unknown:p ?y }")
    with pytest.raises(SparqlSyntaxError):
        parse("SELECT WHERE { }")
    with pytest.raises(SparqlSyntaxError):
        parse(PFX + "SELECT ?x WHERE { ?x ex:p ?y } garbage")


def test_subselect_parses():
    from ontario_spark.sparql.ast import SubSelect
    from ontario_spark.sparql.parser import parse

    q = parse(
        """SELECT ?s ?mx WHERE {
             ?s <http://x/p> ?v .
             { SELECT ?s (MAX(?w) AS ?mx) WHERE { ?s <http://x/q> ?w }
               GROUP BY ?s } }"""
    )
    subs = [e for e in q.where.elements if isinstance(e, SubSelect)]
    assert len(subs) == 1
    inner = subs[0].query
    assert inner.group_by == ["s"]
    assert {s.var for s in inner.select} == {"s", "mx"}


def test_braced_group_still_parses():
    # plain nested group (no SELECT) must not be mistaken for a subquery
    from ontario_spark.sparql.parser import parse

    q = parse("SELECT ?s WHERE { { ?s <http://x/p> ?v } }")
    assert q.where.elements


def test_pname_does_not_swallow_statement_dot():
    """PN_LOCAL may not end with '.': 'ex:alice.' is IRI ex:alice
    followed by the triple terminator, not IRI '…alice.'."""
    from ontario_spark.sparql.parser import parse

    q = parse(
        "PREFIX ex: <http://ex.org/> "
        "SELECT ?s WHERE { ?s ex:knows ex:alice. }"
    )
    t = q.where.elements[0]
    assert t.o.value == "http://ex.org/alice"


def test_signed_number_flush_against_operand():
    """'?year-1' is the additive expression (?year - 1), not a bare
    variable followed by stray tokens."""
    from ontario_spark.sparql.parser import parse

    q = parse(
        "SELECT ?y WHERE { ?s <http://ex.org/y> ?year . "
        "FILTER(?year-1 > 2000) BIND(?year+2 AS ?y) }"
    )
    f = [e for e in q.where.elements if type(e).__name__ == "Filter"][0]
    cmp_ = f.expr
    assert cmp_.op == ">"
    sub = cmp_.args[0]
    assert sub.op == "-" and sub.args[1].py == 1
    b = [e for e in q.where.elements if type(e).__name__ == "Bind"][0]
    assert b.expr.op == "+" and b.expr.args[1].py == 2


def test_unescape_escaped_backslash_then_letter():
    from ontario_spark.sparql.parser import parse

    q = parse(r'SELECT ?s WHERE { ?s <http://ex.org/p> "a\\nb" }')
    # escaped backslash + literal n, NOT a newline
    assert q.where.elements[0].o.value == "a\\nb"
    q2 = parse(r'SELECT ?s WHERE { ?s <http://ex.org/p> "ABC" }')
    assert q2.where.elements[0].o.value == "ABC"
    q3 = parse(r'SELECT ?s WHERE { ?s <http://ex.org/p> "tab\there" }')
    assert q3.where.elements[0].o.value == "tab\there"


def test_unescape_unicode_escapes():
    from ontario_spark.sparql.parser import parse

    q = parse(r'SELECT ?s WHERE { ?s <http://ex.org/p> "\u0041\U00000042c" }')
    assert q.where.elements[0].o.value == "ABc"


def test_unescape_property_roundtrip():
    """Escaping then parsing any string round-trips (hypothesis)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ontario_spark.sparql.parser import parse

    printable = st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), max_size=30
    )

    def escape(s: str) -> str:
        out = s.replace("\\", "\\\\").replace('"', '\\"')
        return out.replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")

    @settings(max_examples=150)
    @given(printable)
    def check(s):
        q = parse(f'SELECT ?s WHERE {{ ?s <http://ex.org/p> "{escape(s)}" }}')
        assert q.where.elements[0].o.value == s

    check()


# --- round-5 parser review fixes -----------------------------------------


def test_where_keyword_optional():
    from ontario_spark.sparql.parser import parse

    q = parse("SELECT * { ?s <http://x/p> ?o }")
    assert len(q.where.elements) == 1
    q2 = parse(
        "SELECT ?a WHERE { { SELECT ?a { ?a <http://x/p> ?b } } }"
    )
    assert q2.where is not None


def test_base_resolves_relative_iris():
    from ontario_spark.sparql.parser import parse

    q = parse("BASE <http://e/> SELECT * WHERE { ?s <p> ?o }")
    t = q.where.elements[0]
    assert t.p.value == "http://e/p"
    # absolute IRIs are untouched
    q2 = parse("BASE <http://e/> SELECT * WHERE { ?s <http://x/p> ?o }")
    assert q2.where.elements[0].p.value == "http://x/p"


def test_bind_as_requires_variable():
    import pytest

    from ontario_spark.sparql.parser import SparqlSyntaxError, parse

    with pytest.raises(SparqlSyntaxError, match="variable after AS"):
        parse("SELECT * WHERE { ?s <http://x/p> ?o . BIND(?o AS o2) }")


def test_subselect_union_branch():
    from ontario_spark.sparql.ast import SubSelect, UnionBlock
    from ontario_spark.sparql.parser import parse

    q = parse(
        """SELECT * WHERE {
             { SELECT ?a WHERE { ?a <http://x/p> ?b } }
             UNION { ?a <http://x/q> ?c } }"""
    )
    (u,) = [e for e in q.where.elements if isinstance(e, UnionBlock)]
    assert len(u.branches) == 2
    assert any(
        isinstance(el, SubSelect) for el in u.branches[0].elements
    )


def test_trailing_dot_is_terminator_not_decimal():
    from ontario_spark.sparql.parser import parse

    q = parse(
        "SELECT * WHERE { ?s <http://x/p> 5. ?s <http://x/q> ?o }"
    )
    assert len(q.where.elements) == 2  # two triples, '.' terminated
    o = q.where.elements[0].o
    assert o.py == 5 and isinstance(o.py, int)  # INTEGER, not double '5.'


def test_from_accepts_prefixed_name():
    from ontario_spark.sparql.parser import parse

    q = parse(
        "PREFIX ex: <http://e/> SELECT * FROM ex:g WHERE { ?s ?p ?o }"
    )
    assert q.from_graphs == ["http://e/g"]


def test_order_by_bare_builtin_and_aggregate():
    from ontario_spark.sparql.parser import parse

    q = parse("SELECT ?x WHERE { ?x <http://e/p> ?v } ORDER BY STRLEN(?x) ?v")
    assert len(q.order_by) == 2
    assert q.order_by[0][0].op == "strlen"
    q2 = parse(
        "SELECT ?s (COUNT(?v) AS ?n) WHERE { ?s <http://e/p> ?v } "
        "GROUP BY ?s ORDER BY COUNT(?v)"
    )
    assert q2.order_by[0][0].op == "agg_count"


def test_limit_offset_validation():
    import pytest

    from ontario_spark.sparql.parser import SparqlSyntaxError, parse

    with pytest.raises(SparqlSyntaxError, match="LIMIT"):
        parse("SELECT ?x WHERE { ?x <http://e/p> ?v } LIMIT -5")
    with pytest.raises(SparqlSyntaxError, match="OFFSET"):
        parse("SELECT ?x WHERE { ?x <http://e/p> ?v } OFFSET x")


def test_trailing_values_clause_parses():
    """W3C ValuesClause: EVERY query form lands it on values_clause so
    the compiler can join it to the FINISHED pattern (§18.2.4.3) —
    round-8 ADVICE fix: ASK/CONSTRUCT/DESCRIBE previously appended
    into the WHERE group, force-binding OPTIONAL variables."""
    from ontario_spark.sparql.parser import parse

    q = parse(
        'SELECT ?n WHERE { ?s <http://e/name> ?n } VALUES ?n { "a" "b" }'
    )
    assert [type(e).__name__ for e in q.where.elements] == ["Triple"]
    assert q.values_clause is not None
    assert q.values_clause.variables == ["n"]
    assert len(q.values_clause.rows) == 2
    qa = parse(
        "SELECT (COUNT(?s) AS ?c) WHERE { ?s <http://e/name> ?n } "
        'VALUES ?z { "a" }'
    )
    assert qa.values_clause is not None
    qask = parse('ASK WHERE { ?s <http://e/name> ?n } VALUES ?n { "a" }')
    assert [type(e).__name__ for e in qask.where.elements] == ["Triple"]
    assert qask.values_clause is not None
    assert qask.values_clause.variables == ["n"]


def test_ill_typed_numeric_literal_keeps_lexical_form():
    """"abc"^^xsd:integer is a LEGAL RDF term with an ill-formed value
    (RDF 1.1 §3.3) — the parser keeps the lexical form instead of
    escaping with a raw ValueError (review fix)."""
    from ontario_spark.sparql.parser import parse

    q = parse(
        'SELECT ?s WHERE { ?s ?p '
        '"abc"^^<http://www.w3.org/2001/XMLSchema#integer> }'
    )
    t = q.where.elements[0].o
    assert t.py == "abc" and t.datatype.endswith("integer")
    # well-formed typed literals still coerce
    q2 = parse(
        'SELECT ?s WHERE { ?s ?p '
        '"42"^^<http://www.w3.org/2001/XMLSchema#integer> }'
    )
    assert q2.where.elements[0].o.py == 42


def test_out_of_range_unicode_escape_fails_closed():
    """\\UFFFFFFFF is beyond the Unicode range: SparqlSyntaxError, not
    a raw chr() ValueError/OverflowError escape (review fix)."""
    import pytest

    from ontario_spark.sparql.parser import SparqlSyntaxError, parse

    with pytest.raises(SparqlSyntaxError, match="unicode escape"):
        parse(r'SELECT ?s WHERE { ?s ?p "\UFFFFFFFF" }')
