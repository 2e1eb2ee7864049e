"""RML / R2RML Turtle mapping loader.

Parses the mapping dialect the reference consumes via rdflib SPARQL
queries (``/root/reference/ontario/config/__init__.py:125-244`` —
``rml:logicalSource`` with file / D2RQ-database / Mongo / Neo4j
descriptors, ``rr:subjectMap`` with template / reference / constant +
``rr:class``, ``rr:predicateObjectMap`` with the same term-map kinds)
into this engine's :mod:`ontario_spark.catalog.model` objects, so
existing Ontario deployments' ``.ttl`` mappings load unchanged.

rdflib isn't available here, so a ~100-line recursive-descent parser
covers the Turtle subset RML mappings actually use: ``@prefix``,
IRIs, prefixed names, string literals (with ``^^datatype`` / ``@lang``
suffixes), blank-node property lists, ``a``, and ``;`` / ``,``
object lists. This is a clean-room implementation of the W3C Turtle
grammar subset — no reference code involved.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from ontario_spark.catalog.model import (
    TEMPLATE,
    Catalog,
    DataSource,
    LogicalSource,
    TermMap,
    TripleMap,
    const,
    ref,
    tpl,
)

RR = "http://www.w3.org/ns/r2rml#"
RML = "http://semweb.mmlab.be/ns/rml#"
D2RQ = "http://www.wiwiss.fu-berlin.de/suhl/bizer/D2RQ/0.1#"
ONT = "http://ontario.tib.eu/mapping/"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


class RmlParseError(Exception):
    pass


# --- Turtle subset parser ------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
      (?P<ws>\s+)
    | (?P<iri><[^<>"{}|^`\\\s]*>)
    | (?P<string>"(?:[^"\\]|\\.)*"(?:\^\^(?:<[^<>\s]*>|[^\s;,.\]]+)|@[A-Za-z][\w-]*(?:-[\w]+)*)?)
    | (?P<prefix_kw>@prefix\b)
    | (?P<pname>(?:[A-Za-z_][\w\-]*)?:[\w\-.%]*)
    | (?P<kw_a>\ba\b)
    | (?P<punct>[\[\];,.])
    | (?P<comment>\#[^\n]*)
    """,
    re.X,
)


@dataclass
class _Tok:
    kind: str
    value: str


def _tokenize(text: str) -> list[_Tok]:
    toks: list[_Tok] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise RmlParseError(f"bad Turtle at offset {pos}: {text[pos:pos+40]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind in ("ws", "comment"):
            continue
        val = m.group()
        if kind == "pname" and val.endswith("."):
            # Turtle local names may contain dots but the statement
            # terminator binds tighter: ':name.' is ':name' then '.'
            val = val[:-1]
            pos -= 1
        toks.append(_Tok(kind, val))
    return toks


# term representations: ("iri", str) | ("lit", str) | ("bnode", str)
Term = tuple


class _Parser:
    def __init__(self, text: str):
        self.toks = _tokenize(text)
        self.i = 0
        self.prefixes: dict[str, str] = {}
        self.triples: list[tuple[Term, str, Term]] = []
        self._bn = 0

    def _peek(self) -> _Tok | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def _next(self) -> _Tok:
        t = self._peek()
        if t is None:
            raise RmlParseError("unexpected end of mappings")
        self.i += 1
        return t

    def _expect(self, value: str) -> None:
        t = self._next()
        if t.value != value:
            raise RmlParseError(f"expected {value!r}, got {t.value!r}")

    def _expand(self, pname: str) -> str:
        pfx, local = pname.split(":", 1)
        try:
            return self.prefixes[pfx] + local
        except KeyError:
            raise RmlParseError(f"undefined prefix {pfx!r} in {pname!r}") from None

    def parse(self) -> list[tuple[Term, str, Term]]:
        while self._peek() is not None:
            if self._peek().kind == "prefix_kw":
                self._next()
                pname = self._next().value  # 'pfx:'
                iri = self._next().value  # '<...>'
                self._expect(".")
                self.prefixes[pname[:-1]] = iri[1:-1]
            else:
                s = self._term(subject=True)
                self._pred_obj_list(s)
                self._expect(".")
        return self.triples

    def _term(self, subject: bool = False) -> Term:
        t = self._next()
        if t.kind == "iri":
            return ("iri", t.value[1:-1])
        if t.kind == "pname":
            return ("iri", self._expand(t.value))
        if t.kind == "string":
            body = re.match(r'"(?:[^"\\]|\\.)*"', t.value).group()
            return ("lit", body[1:-1].replace('\\"', '"').replace("\\\\", "\\"))
        if t.value == "[":
            node = ("bnode", f"_:b{self._bn}")
            self._bn += 1
            if self._peek() and self._peek().value != "]":
                self._pred_obj_list(node)
            self._expect("]")
            return node
        raise RmlParseError(f"unexpected token {t.value!r} as term")

    def _pred_obj_list(self, s: Term) -> None:
        while True:
            t = self._next()
            if t.kind == "kw_a":
                p = RDF_TYPE
            elif t.kind == "iri":
                p = t.value[1:-1]
            elif t.kind == "pname":
                p = self._expand(t.value)
            else:
                raise RmlParseError(f"unexpected predicate token {t.value!r}")
            while True:
                self.triples.append((s, p, self._term()))
                if self._peek() and self._peek().value == ",":
                    self._next()
                    continue
                break
            if self._peek() and self._peek().value == ";":
                self._next()
                if self._peek() and self._peek().value in ("]", "."):
                    return  # trailing ';'
                continue
            return


def parse_turtle(text: str) -> list[tuple[Term, str, Term]]:
    return _Parser(text).parse()


# --- RML interpretation --------------------------------------------------


def _index(triples) -> dict[Term, dict[str, list[Term]]]:
    idx: dict[Term, dict[str, list[Term]]] = {}
    for s, p, o in triples:
        idx.setdefault(s, {}).setdefault(p, []).append(o)
    return idx


def _one(props: dict, *keys: str):
    for k in keys:
        if k in props:
            return props[k][0]
    return None


def _lit(term: Term | None) -> str | None:
    return term[1] if term else None


def _term_map(props: dict) -> TermMap | None:
    t = _one(props, RR + "template")
    if t is not None:
        return tpl(t[1])
    r = _one(props, RML + "reference", RR + "column")
    if r is not None:
        return ref(r[1])
    c = _one(props, RR + "constant")
    if c is not None:
        return const(c[1])
    return None


def _source_kind(source: Term, src_props: dict, ref_form: str | None,
                 sql_version) -> str:
    """Reference's type-inference ladder (config/__init__.py:171-238):
    SQL2008/jdbc driver sniffing, else referenceFormulation, else file
    extension."""
    if sql_version is not None or (ref_form and "SQL2008" in ref_form):
        driver = _lit(_one(src_props, D2RQ + "jdbcDriver")) or ""
        return "mysql" if "mysql" in driver else "ansi"
    if ref_form:
        for marker, kind in (
            ("JSON", "json"), ("XPath", "xml"), ("TSV", "tsv"),
            ("CSV", "csv"), ("Mongo", "mongodb"), ("Cypher", "neo4j"),
            ("Parquet", "parquet"),
        ):
            if marker in ref_form:
                return kind
    path = source[1] if source[0] == "lit" else ""
    for ext, kind in ((".json", "json"), (".xml", "xml"), (".tsv", "tsv"),
                      (".csv", "csv"), (".parquet", "parquet")):
        if path.endswith(ext):
            return kind
    return "csv"


def _resolve_parent_map(
    idx: dict, om_props: dict, child_ls: "tuple | None" = None
) -> TermMap | None:
    """``rr:parentTriplesMap`` + ``rr:joinCondition`` → a TEMPLATE term
    map: the parent's subject template with its key column replaced by
    the child's join column. Valid when the join condition targets
    exactly the parent subject template's single key column — then the
    object URI IS the parent subject URI for the joined row, which is
    this engine's native template-link representation (joins run on raw
    keys). Multi-key or non-subject joins stay unsupported (skipped),
    the same posture as the reference, which ignores parentTriplesMap
    entirely."""
    parent = _one(om_props, RR + "parentTriplesMap")
    if parent is None:
        return None
    jc = _one(om_props, RR + "joinCondition")
    parent_props = idx.get(parent, {})
    sm_term = _one(parent_props, RR + "subjectMap")
    sm = _term_map(idx.get(sm_term, {})) if sm_term else None
    if sm is None or sm.kind != TEMPLATE:
        return None
    cols = sm.template.columns
    if len(cols) != 1:
        return None
    if jc is None:
        # R2RML only permits the no-joinCondition form when child and
        # parent share ONE logical source (the implicit self-join);
        # emitting the parent's template over a column the child source
        # lacks breaks at query time (round-5 review fix) — verify by
        # logicalSource node identity or equal rml:source values.
        parent_ls = _one(parent_props, RML + "logicalSource")
        same_node = child_ls is not None and parent_ls == child_ls
        same_src = (
            child_ls is not None
            and parent_ls is not None
            and _one(idx.get(parent_ls, {}), RML + "source")
            == _one(idx.get(child_ls, {}), RML + "source")
        )
        if not (same_node or same_src):
            return None
        return tpl(sm.value)
    jc_props = idx.get(jc, {})
    child = _lit(_one(jc_props, RR + "child"))
    parent_col = _lit(_one(jc_props, RR + "parent"))
    if child is None or parent_col != cols[0]:
        return None
    return tpl(sm.value.replace(f"{{{cols[0]}}}", f"{{{child}}}"))


def load_rml(
    texts: list[str],
    data_root: str = "",
) -> Catalog:
    """Parse RML Turtle documents into a :class:`Catalog`.

    ``data_root`` is prepended (by the catalog's source loader) to
    relative file paths in ``rml:source`` literals. Database-backed maps
    (D2RQ jdbc / Mongo / Neo4j descriptors) become remote sources whose
    executors are injected later (``Catalog.executors``), exactly like
    hand-built catalogs."""
    triples: list = []
    parser_triples = [parse_turtle(t) for t in texts]
    for pt in parser_triples:
        triples.extend(pt)
    idx = _index(triples)

    cat = Catalog()
    pending: dict[str, tuple[DataSource, list[TripleMap]]] = {}

    for s, props in idx.items():
        ls_term = _one(props, RML + "logicalSource")
        if ls_term is None:
            continue
        tm_name = s[1]
        ls_props = idx.get(ls_term, {})
        source = _one(ls_props, RML + "source")
        if source is None:
            raise RmlParseError(f"{tm_name}: logicalSource has no rml:source")
        src_props = idx.get(source, {}) if source[0] != "lit" else {}
        ref_form_term = _one(ls_props, RML + "referenceFormulation")
        ref_form = ref_form_term[1] if ref_form_term else None
        sql_version = _one(ls_props, RR + "sqlVersion")
        kind = _source_kind(source, src_props, ref_form, sql_version)
        iterator = _lit(_one(ls_props, RML + "iterator"))
        if iterator == "*":
            iterator = None

        if kind in ("mysql", "ansi"):
            dsn = _lit(_one(src_props, D2RQ + "jdbcDSN")) or source[1]
            params = tuple(
                (k, _lit(_one(src_props, D2RQ + k)) or "")
                for k in ("username", "password", "jdbcDriver")
                if _one(src_props, D2RQ + k) is not None
            )
            ds = DataSource(name=dsn, dstype=kind, base_path=dsn, params=params)
            table = (
                _lit(_one(ls_props, RR + "tableName"))
                or _lit(_one(ls_props, RML + "query"))
                or ""
            )
            lsrc = LogicalSource(table=table)
        elif kind in ("mongodb", "neo4j"):
            db = _lit(_one(src_props, ONT + "database")) or source[1]
            params = tuple(
                (k, _lit(_one(src_props, ONT + k)) or "")
                for k in ("username", "password")
                if _one(src_props, ONT + k) is not None
            )
            ds = DataSource(name=db, dstype=kind, base_path=db, params=params)
            lsrc = LogicalSource(table=_lit(_one(ls_props, RR + "tableName")) or db,
                                 iterator=iterator)
        else:  # file-backed
            ds = DataSource(name=f"rml-files-{kind}", dstype=kind,
                            base_path=data_root)
            lsrc = LogicalSource(table=source[1], fmt=kind, iterator=iterator)

        sm_term = _one(props, RR + "subjectMap")
        if sm_term is not None:
            sm_props = idx.get(sm_term, {})
            subject = _term_map(sm_props)
            cls_term = _one(sm_props, RR + "class")
            subject_class = cls_term[1] if cls_term else None
        else:
            shorthand = _one(props, RR + "subject")
            subject = const(shorthand[1]) if shorthand else None
            subject_class = None
        if subject is None:
            continue  # reference skips maps without a resolvable subject

        poms: list[tuple[str, TermMap]] = []
        for pom_term in props.get(RR + "predicateObjectMap", []):
            pom_props = idx.get(pom_term, {})
            pred = _one(pom_props, RR + "predicate")
            if pred is None:
                pm = _one(pom_props, RR + "predicateMap")
                pred = _one(idx.get(pm, {}), RR + "constant") if pm else None
            if pred is None:
                continue
            obj_shorthand = _one(pom_props, RR + "object")
            if obj_shorthand is not None:
                om = const(obj_shorthand[1])
            else:
                om_term = _one(pom_props, RR + "objectMap")
                om_props = idx.get(om_term, {}) if om_term else {}
                om = _term_map(om_props)
                if om is None and om_term is not None:
                    om = _resolve_parent_map(idx, om_props, ls_term)
            if om is None:
                continue
            poms.append((pred[1], om))

        tmap = TripleMap(
            name=tm_name,
            source=lsrc,
            subject=subject,
            subject_class=subject_class,
            predicates=tuple(poms),
        )
        key = ds.name
        if key not in pending:
            pending[key] = (ds, [])
        pending[key][1].append(tmap)

    for ds, maps in pending.values():
        cat.add(ds, *maps)
    return cat


def load_rml_files(paths: list[str], data_root: str = "") -> Catalog:
    return load_rml([open(p, encoding="utf-8").read() for p in paths], data_root)
