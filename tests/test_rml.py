"""RML Turtle mapping loader: round-trips the reference's own demo
mapping files and drives a SPARQL query end-to-end over an RML-mapped
CSV source."""

from __future__ import annotations

import os

import pytest

from ontario_spark.catalog.model import CONSTANT, REFERENCE, TEMPLATE
from ontario_spark.catalog.rml import load_rml, load_rml_files, parse_turtle

CHEBI = "/root/reference/demo/mappings/tsv/chebi/Compound.ttl"
DRUGS = "/root/reference/demo/mappings/mysql/drugbank/drugs.ttl"


def test_parse_turtle_subset():
    triples = parse_turtle(
        """
        @prefix ex: <http://ex.org/> .
        ex:s a ex:Klass ; ex:p "v1", "v2" ; ex:q [ ex:r <http://o> ] .
        """
    )
    assert (("iri", "http://ex.org/s"),
            "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
            ("iri", "http://ex.org/Klass")) in triples
    lits = [o for s, p, o in triples if p == "http://ex.org/p"]
    assert lits == [("lit", "v1"), ("lit", "v2")]


@pytest.mark.skipif(not os.path.exists(CHEBI), reason="reference demo absent")
def test_chebi_tsv_mappings_round_trip():
    cat = load_rml_files([CHEBI], data_root="/data")
    assert len(cat.triple_maps) > 5
    tm = cat.triple_maps[
        "http://tib.de/ontario/mapping#"
        "http__bio2rdf.org_ns_chebi_Compound_Compound_has_part"
    ]
    assert tm.subject.kind == TEMPLATE
    assert tm.subject.value == "http://bio2rdf.org/chebi:{Compound}"
    assert tm.subject_class == "http://bio2rdf.org/ns/chebi#Compound"
    assert tm.source.table == "chebi/Compound_has_part.tsv"
    assert tm.source.fmt == "tsv"
    pred = "http://bio2rdf.org/ns/chebi#has_part"
    assert tm.pom[pred].kind == TEMPLATE
    # every chebi map lands on the shared tsv file source
    src = cat.source_of(tm)
    assert src.dstype == "tsv" and src.base_path == "/data"
    # RDF-MT indexes populated for source selection
    assert tm.name in cat.class_index[tm.subject_class]
    assert tm.name in cat.predicate_index[pred]


@pytest.mark.skipif(not os.path.exists(DRUGS), reason="reference demo absent")
def test_drugbank_mysql_mappings_round_trip():
    cat = load_rml_files([DRUGS])
    tm = next(iter(cat.triple_maps.values()))
    src = cat.source_of(tm)
    assert src.dstype == "mysql"
    assert src.name.startswith("jdbc:mysql://")
    params = dict(src.params)
    assert params["username"] == "root"
    assert "drugbank." in tm.source.table
    # remote source: executor must be injected before execution
    with pytest.raises(ValueError, match="no executor"):
        cat.executor_for(tm)


def test_rml_csv_source_end_to_end(spark, tmp_path):
    """An RML-mapped CSV answers a SPARQL star through the full engine."""
    (tmp_path / "people.csv").write_text(
        "pid,name,city\n1,Ada,London\n2,Erwin,Vienna\n3,Grace,NYC\n"
    )
    ttl = """
    @prefix rr: <http://www.w3.org/ns/r2rml#> .
    @prefix rml: <http://semweb.mmlab.be/ns/rml#> .
    @prefix ql: <http://semweb.mmlab.be/ns/ql#> .
    @prefix : <http://tib.de/ontario/mapping#> .

    :PeopleMap
        rml:logicalSource [
            rml:source "people.csv";
            rml:referenceFormulation ql:CSV;
            rml:iterator "*"
        ];
        rr:subjectMap [
            rr:template "http://ex.org/person/{pid}";
            rr:class <http://ex.org/Person>
        ];
        rr:predicateObjectMap [
            rr:predicate <http://ex.org/name>;
            rr:objectMap [ rml:reference "name" ]
        ];
        rr:predicateObjectMap [
            rr:predicate <http://ex.org/city>;
            rr:objectMap [ rml:reference "city" ]
        ].
    """
    cat = load_rml([ttl], data_root=str(tmp_path))
    from ontario_spark.compiler.query import SparqlEngine

    df = SparqlEngine(spark, cat).query(
        """PREFIX ex: <http://ex.org/>
           SELECT ?p ?name WHERE {
             ?p a ex:Person ; ex:name ?name ; ex:city "Vienna" }"""
    )
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0]["p"] == "http://ex.org/person/2"
    assert rows[0]["name"] == "Erwin"


def test_rml_term_map_kinds():
    ttl = """
    @prefix rr: <http://www.w3.org/ns/r2rml#> .
    @prefix rml: <http://semweb.mmlab.be/ns/rml#> .
    @prefix : <http://m#> .
    :M rml:logicalSource [ rml:source "t.csv" ];
       rr:subjectMap [ rr:template "http://e/{id}" ];
       rr:predicateObjectMap [
           rr:predicate <http://e/ref>; rr:objectMap [ rml:reference "c" ] ];
       rr:predicateObjectMap [
           rr:predicate <http://e/const>; rr:objectMap [ rr:constant "K" ] ];
       rr:predicateObjectMap [
           rr:predicate <http://e/short>; rr:object <http://e/thing> ] .
    """
    cat = load_rml([ttl])
    tm = cat.triple_maps["http://m#M"]
    assert tm.pom["http://e/ref"].kind == REFERENCE
    assert tm.pom["http://e/const"] == (
        tm.pom["http://e/const"].__class__(CONSTANT, "K")
    )
    assert tm.pom["http://e/short"].kind == CONSTANT


def test_parent_triples_map_resolves_to_template_link(spark, tmp_path):
    """rr:parentTriplesMap + rr:joinCondition becomes a template link
    (object URI = parent subject URI via the child column), so the
    cross-map join runs through the engine's normal keyed-join path."""
    (tmp_path / "orders.csv").write_text(
        "oid,cust\n10,1\n11,2\n12,1\n"
    )
    (tmp_path / "people.csv").write_text("pid,name\n1,Ada\n2,Erwin\n")
    ttl = """
    @prefix rr: <http://www.w3.org/ns/r2rml#> .
    @prefix rml: <http://semweb.mmlab.be/ns/rml#> .
    @prefix ql: <http://semweb.mmlab.be/ns/ql#> .
    @prefix : <http://m#> .

    :People rml:logicalSource [ rml:source "people.csv";
                                rml:referenceFormulation ql:CSV ];
        rr:subjectMap [ rr:template "http://ex.org/person/{pid}";
                        rr:class <http://ex.org/Person> ];
        rr:predicateObjectMap [
            rr:predicate <http://ex.org/name>;
            rr:objectMap [ rml:reference "name" ] ].

    :Orders rml:logicalSource [ rml:source "orders.csv";
                                rml:referenceFormulation ql:CSV ];
        rr:subjectMap [ rr:template "http://ex.org/order/{oid}";
                        rr:class <http://ex.org/Order> ];
        rr:predicateObjectMap [
            rr:predicate <http://ex.org/customer>;
            rr:objectMap [ rr:parentTriplesMap :People;
                           rr:joinCondition [ rr:child "cust";
                                              rr:parent "pid" ] ] ].
    """
    cat = load_rml([ttl], data_root=str(tmp_path))
    om = cat.triple_maps["http://m#Orders"].pom["http://ex.org/customer"]
    assert om.kind == TEMPLATE
    assert om.value == "http://ex.org/person/{cust}"

    from ontario_spark.compiler.query import SparqlEngine

    df = SparqlEngine(spark, cat).query(
        """PREFIX ex: <http://ex.org/>
           SELECT ?o ?name WHERE {
             ?o a ex:Order ; ex:customer ?p .
             ?p a ex:Person ; ex:name ?name }"""
    )
    got = sorted(map(tuple, df.collect()))
    assert got == [
        ("http://ex.org/order/10", "Ada"),
        ("http://ex.org/order/11", "Erwin"),
        ("http://ex.org/order/12", "Ada"),
    ]


def test_rml_xml_source_end_to_end(spark, tmp_path):
    """ql:XPath mapping → Spark 4's built-in XML reader with the RML
    iterator as rowTag — mappings for XML lakes work unchanged."""
    (tmp_path / "people.xml").write_text(
        "<people><person><pid>1</pid><name>Ada</name></person>"
        "<person><pid>2</pid><name>Erwin</name></person></people>"
    )
    ttl = """
    @prefix rr: <http://www.w3.org/ns/r2rml#> .
    @prefix rml: <http://semweb.mmlab.be/ns/rml#> .
    @prefix ql: <http://semweb.mmlab.be/ns/ql#> .
    @prefix : <http://m#> .
    :P rml:logicalSource [ rml:source "people.xml";
                           rml:referenceFormulation ql:XPath;
                           rml:iterator "person" ];
       rr:subjectMap [ rr:template "http://e/person/{pid}";
                       rr:class <http://e/Person> ];
       rr:predicateObjectMap [ rr:predicate <http://e/name>;
                               rr:objectMap [ rml:reference "name" ] ] .
    """
    cat = load_rml([ttl], data_root=str(tmp_path))
    tm = cat.triple_maps["http://m#P"]
    assert tm.source.fmt == "xml" and tm.source.iterator == "person"

    from ontario_spark.compiler.query import SparqlEngine

    df = SparqlEngine(spark, cat).query(
        """PREFIX e: <http://e/>
           SELECT ?p ?n WHERE { ?p a e:Person ; e:name ?n }"""
    )
    got = sorted(map(tuple, df.collect()))
    assert got == [
        ("http://e/person/1", "Ada"),
        ("http://e/person/2", "Erwin"),
    ]


def test_turtle_datatype_suffix_flush_punctuation():
    """A typed literal flush against ';' or '.' must not swallow the
    separator (round-5 review fix)."""
    from ontario_spark.catalog.rml import parse_turtle

    triples = parse_turtle(
        '@prefix ex: <http://e/> .\n'
        'ex:s ex:p "1.0"^^ex:version; ex:q "x" .\n'
        'ex:t ex:u "2"^^<http://www.w3.org/2001/XMLSchema#int>.\n'
    )
    preds = sorted(p for _, p, _ in triples)
    assert preds == ["http://e/p", "http://e/q", "http://e/u"]


def test_parent_triples_map_without_join_needs_shared_source():
    """No rr:joinCondition is only legal when child and parent share a
    logical source — otherwise skip (round-5 review fix: the parent's
    template was emitted over a column the child source lacks)."""
    from ontario_spark.catalog.rml import load_rml

    ttl = """
@prefix rr: <http://www.w3.org/ns/r2rml#> .
@prefix rml: <http://semweb.mmlab.be/ns/rml#> .
@prefix ql: <http://semweb.mmlab.be/ns/ql#> .
@prefix ex: <http://e/> .
ex:Child a rr:TriplesMap ;
  rml:logicalSource [ rml:source "child.csv" ;
                      rml:referenceFormulation ql:CSV ] ;
  rr:subjectMap [ rr:template "http://e/c/{cid}" ] ;
  rr:predicateObjectMap [ rr:predicate ex:parent ;
    rr:objectMap [ rr:parentTriplesMap ex:Parent ] ] .
ex:Parent a rr:TriplesMap ;
  rml:logicalSource [ rml:source "parent.csv" ;
                      rml:referenceFormulation ql:CSV ] ;
  rr:subjectMap [ rr:template "http://e/p/{pid}" ] .
"""
    cat = load_rml([ttl])
    child = cat.triple_maps["http://e/Child"]
    assert "http://e/parent" not in dict(child.predicates)  # skipped
    # shared logical source: the implicit self-join IS legal and the
    # parent's template carries over
    shared = ttl.replace('rml:source "parent.csv"', 'rml:source "child.csv"')
    cat2 = load_rml([shared])
    child2 = cat2.triple_maps["http://e/Child"]
    om = dict(child2.predicates).get("http://e/parent")
    assert om is not None and om.value == "http://e/p/{pid}"
