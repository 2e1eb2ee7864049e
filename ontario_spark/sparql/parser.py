"""Hand-written SPARQL tokenizer + recursive-descent parser.

Covers the reference grammar (``ontario/sparql/parser/queryParser.py``
PLY lex/yacc: SELECT/ASK/CONSTRUCT, DISTINCT, prefixed names, predicate-
object lists, OPTIONAL, UNION, FILTER with the operator set of
``Xfilter.py:14-41``, ORDER BY/LIMIT/OFFSET) plus the SPARQL 1.1 pieces
the reference lacks entirely (SURVEY.md §2.5): GROUP BY + aggregates
(COUNT/SUM/AVG/MIN/MAX), HAVING, BIND, VALUES.

No PLY dependency — a compact regex tokenizer feeding an LL(1)-ish
parser. Unsupported syntax raises ``SparqlSyntaxError`` with position.
"""

from __future__ import annotations

import re

from ontario_spark.sparql.ast import (
    Bind,
    ExistsExpr,
    ExistsFilter,
    Expr,
    Filter,
    GraphBlock,
    Group,
    MinusBlock,
    NegatedPath,
    OptionalBlock,
    PathClosure,
    Query,
    SelectExpr,
    ServiceBlock,
    SubSelect,
    Term,
    Triple,
    UnionBlock,
    ValuesBlock,
)

XSD = "http://www.w3.org/2001/XMLSchema#"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


class SparqlSyntaxError(Exception):
    pass


_TOKEN_RE = re.compile(
    r"""
    (?P<WS>\s+|\#[^\n]*)
  | (?P<IRIREF><[^<>\s]*>)
  | (?P<VAR>[?$][A-Za-z_][A-Za-z0-9_]*)
  | (?P<NUMBER>[+-]?(?:\d+\.\d*[eE][+-]?\d+|\d+\.\d+|\.\d+|\d+)(?:[eE][+-]?\d+)?)
  | (?P<STRING>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
  | (?P<LANGTAG>@[A-Za-z]+(?:-[A-Za-z0-9]+)*)
  | (?P<DTYPE>\^\^)
  | (?P<PNAME>[A-Za-z_](?:[A-Za-z0-9_.-]*[A-Za-z0-9_-])?)?:(?P<PLOCAL>[A-Za-z0-9_](?:[A-Za-z0-9_.-]*[A-Za-z0-9_-])?)?
  | (?P<KEYWORD>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<OP>&&|\|\||!=|<=|>=|[{}()\[\].,;*/+\-=<>!|^?])
""",
    re.VERBOSE,
)


class Token:
    __slots__ = ("type", "value", "pos")

    def __init__(self, type_: str, value: str, pos: int):
        self.type = type_
        self.value = value
        self.pos = pos

    def __repr__(self) -> str:  # pragma: no cover
        return f"Token({self.type},{self.value!r})"


def tokenize(text: str) -> list[Token]:
    tokens: list[Token] = []
    i = 0
    while i < len(text):
        m = _TOKEN_RE.match(text, i)
        if not m:
            raise SparqlSyntaxError(f"unexpected character {text[i]!r} at {i}")
        i = m.end()
        kind = m.lastgroup
        if kind == "WS":
            continue
        if kind in ("PNAME", "PLOCAL") or ":" in m.group(0) and kind == "KEYWORD":
            kind = "PNAME"
        tokens.append(Token(kind or "PNAME", m.group(0), m.start()))
    tokens.append(Token("EOF", "", len(text)))
    return tokens


_AGGS = {"count", "sum", "avg", "min", "max", "group_concat", "sample"}
_BUILTINS = {
    "bound", "isiri", "isuri", "isblank", "isliteral", "str", "ucase",
    "lcase", "lang", "datatype", "regex", "sameterm", "langmatches",
    "contains", "strstarts", "strends", "strlen", "abs", "ceil", "floor",
    "round", "concat", "replace", "substr", "year", "month", "day", "if",
    "coalesce", "strbefore", "strafter", "encode_for_uri", "md5", "sha1",
    "sha256", "sha384", "sha512", "hours", "minutes", "seconds",
    "isnumeric", "iri", "uri", "now",
    # round-5 tail (completes SPARQL 1.1 §17.4 vs the reference's
    # closed functor list at ontario/sparql/parser/services.py:1259-1325)
    "strdt", "strlang", "uuid", "struuid", "tz", "timezone", "bnode",
    "rand",
}


class Parser:
    def __init__(self, text: str):
        self.toks = tokenize(text)
        self.i = 0
        self.prefixes: dict[str, str] = {}
        self.base: str | None = None

    def _resolve_iri(self, raw: str) -> str:
        """Resolve a (possibly relative) IRIREF body against BASE."""
        if self.base is None or ":" in raw.split("/", 1)[0].split("#", 1)[0]:
            return raw  # absolute (has a scheme) or no base declared
        from urllib.parse import urljoin

        return urljoin(self.base, raw)

    # --- token plumbing -------------------------------------------------

    def peek(self) -> Token:
        return self.toks[self.i]

    def next(self) -> Token:
        t = self.toks[self.i]
        if t.type == "EOF":
            # consuming the sentinel means the grammar expected MORE
            # input — fail closed as a syntax error, never an
            # IndexError on the following read (fuzz-found)
            raise SparqlSyntaxError(f"unexpected end of query at {t.pos}")
        self.i += 1
        return t

    def at_kw(self, *kws: str) -> bool:
        t = self.peek()
        return t.type == "KEYWORD" and t.value.lower() in kws

    def eat_kw(self, kw: str) -> None:
        if not self.at_kw(kw):
            raise SparqlSyntaxError(f"expected {kw.upper()} at {self.peek().pos}, got {self.peek().value!r}")
        self.next()

    def at_op(self, *ops: str) -> bool:
        t = self.peek()
        return t.type == "OP" and t.value in ops

    def eat_op(self, op: str) -> None:
        if not self.at_op(op):
            raise SparqlSyntaxError(f"expected {op!r} at {self.peek().pos}, got {self.peek().value!r}")
        self.next()

    # --- entry ----------------------------------------------------------

    def parse(self) -> Query:
        while self.at_kw("prefix", "base"):
            if self.at_kw("base"):
                self.next()
                b = self.next()
                if b.type != "IRIREF":
                    raise SparqlSyntaxError(f"BASE needs an IRI at {b.pos}")
                # relative IRIREFs resolve against this (round-5 review
                # fix: BASE was silently discarded, leaving relative
                # IRIs unresolved and queries matching nothing)
                self.base = b.value[1:-1]
                continue
            self.next()
            pname = self.next()
            iri = self.next()
            if not (pname.value.endswith(":") and iri.value.startswith("<")):
                raise SparqlSyntaxError(f"bad PREFIX at {pname.pos}")
            self.prefixes[pname.value[:-1]] = iri.value[1:-1]

        if self.at_kw("select"):
            q = self._select()
        elif self.at_kw("ask"):
            q = self._ask()
        elif self.at_kw("construct"):
            q = self._construct()
        elif self.at_kw("describe"):
            q = self._describe()
        else:
            raise SparqlSyntaxError(
                f"expected SELECT/ASK/CONSTRUCT/DESCRIBE at {self.peek().pos}"
            )
        q.prefixes = self.prefixes
        if self.at_kw("values"):
            # W3C ValuesClause: EVERY query form defers the join to
            # the compiler (Query.values_clause) — it must apply to
            # the FINISHED pattern (after OPTIONAL/MINUS/BIND; round-6
            # seventh-review fix: an in-group append joined before
            # those operators and force-bound OPTIONAL variables) and,
            # with aggregation, after grouping + HAVING (§18.2.4.3).
            # Round-8 ADVICE fix: ASK/CONSTRUCT/DESCRIBE previously
            # appended into the WHERE group, so an ASK whose trailing
            # VALUES constrained an OPTIONAL-bound variable could
            # force-bind it and answer differently from SELECT.
            # Round-9: never-UNDEF trailing-VALUES columns DO feed
            # SERVICE/wrapper bound-join pushdown again (the compiler
            # threads them as a key hint into the top-level group —
            # _values_pushdown_hint) while the join itself still
            # applies after the finished pattern; UNDEF-bearing
            # columns are §10.2 wildcards and never push.
            self.next()
            q.values_clause = self._values()
        if self.peek().type != "EOF":
            raise SparqlSyntaxError(f"trailing input at {self.peek().pos}: {self.peek().value!r}")
        return q

    def _select(self) -> Query:
        self.eat_kw("select")
        q = Query(query_type="select")
        if self.at_kw("distinct"):
            self.next()
            q.distinct = True
        elif self.at_kw("reduced"):
            self.next()
        if self.at_op("*"):
            self.next()
            q.select = None
        else:
            sel: list[SelectExpr] = []
            while True:
                t = self.peek()
                if t.type == "VAR":
                    self.next()
                    sel.append(SelectExpr(var=t.value[1:]))
                elif self.at_op("("):
                    self.next()
                    expr = self._expression()
                    self.eat_kw("as")
                    v = self.next()
                    if v.type != "VAR":
                        raise SparqlSyntaxError(f"expected var after AS at {v.pos}")
                    self.eat_op(")")
                    sel.append(SelectExpr(var=v.value[1:], expr=expr))
                else:
                    break
            if not sel:
                raise SparqlSyntaxError(f"empty SELECT list at {self.peek().pos}")
            q.select = sel
        self._dataset_clauses(q)
        if self.at_kw("where"):  # 'WHERE' is optional per the grammar
            self.next()
        q.where = self._group()
        self._solution_modifiers(q)
        return q

    def _dataset_clauses(self, q: Query) -> None:
        """``FROM <g>`` / ``FROM NAMED <g>`` (SPARQL §13.2): graph IRIs
        recorded verbatim; the compiler maps them onto catalog
        sources."""
        while self.at_kw("from"):
            self.next()
            named = False
            if self.at_kw("named"):
                self.next()
                named = True
            t = self.next()
            if t.type == "IRIREF":
                iri = self._resolve_iri(t.value[1:-1])
            elif t.type == "PNAME" and not t.value.startswith("_:"):
                iri = self._expand_pname(t)  # prefixed names are legal iri forms
            else:
                raise SparqlSyntaxError(
                    f"FROM needs an IRI at {t.pos}, got {t.value!r}"
                )
            (q.from_named if named else q.from_graphs).append(iri)

    def _ask(self) -> Query:
        self.eat_kw("ask")
        q = Query(query_type="ask")
        self._dataset_clauses(q)
        if self.at_kw("where"):
            self.next()
        q.where = self._group()
        return q

    def _construct(self) -> Query:
        self.eat_kw("construct")
        q = Query(query_type="construct")
        if self.at_kw("where", "from"):
            # CONSTRUCT [dataset] WHERE { ... } shorthand (§10.2.3):
            # the pattern (plain triples only) is also the template
            self._dataset_clauses(q)
            self.eat_kw("where")
            self.eat_op("{")
            q.construct_template = self._triples_block(stop_on_keywords=False)
            if any(not isinstance(t, Triple) for t in q.construct_template):
                raise SparqlSyntaxError(
                    "CONSTRUCT WHERE allows only plain triple patterns"
                )
            self.eat_op("}")
            q.where = Group(list(q.construct_template))
            self._solution_modifiers(q)
            return q
        self.eat_op("{")
        q.construct_template = self._triples_block(stop_on_keywords=False)
        if any(not isinstance(t, Triple) for t in q.construct_template):
            raise SparqlSyntaxError("property paths not allowed in CONSTRUCT template")
        self.eat_op("}")
        self._dataset_clauses(q)
        if self.at_kw("where"):  # 'WHERE' is optional per the grammar
            self.next()
        q.where = self._group()
        self._solution_modifiers(q)
        return q

    def _describe(self) -> Query:
        """DESCRIBE (var | iri)+ [WHERE group] [modifiers]. The spec
        leaves the description graph implementation-defined (§16.4); we
        emit all forward triples of each resource per the catalog's
        mappings (compiler ``_describe``)."""
        self.eat_kw("describe")
        q = Query(query_type="describe")
        while True:
            t = self.peek()
            if t.type == "VAR":
                self.next()
                q.describe_terms.append(Term("var", t.value[1:]))
            elif t.type in ("IRIREF", "PNAME"):
                q.describe_terms.append(self._term())
            else:
                break
        if not q.describe_terms:
            raise SparqlSyntaxError(f"DESCRIBE needs a var or IRI at {self.peek().pos}")
        self._dataset_clauses(q)
        if self.at_kw("where"):
            self.next()
            q.where = self._group()
        self._solution_modifiers(q)
        return q

    def _solution_modifiers(self, q: Query) -> None:
        if self.at_kw("group"):
            self.next()
            self.eat_kw("by")
            while True:
                if self.peek().type == "VAR":
                    q.group_by.append(self.next().value[1:])
                elif self.at_op("("):
                    # GROUP BY (expr AS ?v): computed key, bound before
                    # the aggregation
                    self.next()
                    expr = self._expression()
                    self.eat_kw("as")
                    v = self.next()
                    if v.type != "VAR":
                        raise SparqlSyntaxError(f"expected var after AS at {v.pos}")
                    self.eat_op(")")
                    q.group_by_binds.append((expr, v.value[1:]))
                    q.group_by.append(v.value[1:])
                else:
                    break
            if not q.group_by:
                raise SparqlSyntaxError(f"empty GROUP BY at {self.peek().pos}")
        if self.at_kw("having"):
            self.next()
            self.eat_op("(")
            q.having = self._expression()
            self.eat_op(")")
        if self.at_kw("order"):
            self.next()
            self.eat_kw("by")
            while True:
                asc = True
                if self.at_kw("asc", "desc"):
                    asc = self.next().value.lower() == "asc"
                    self.eat_op("(")
                    item = self._expression()
                    self.eat_op(")")
                elif self.peek().type == "VAR":
                    item = Term("var", self.next().value[1:])
                elif self.at_op("("):
                    self.next()
                    item = self._expression()
                    self.eat_op(")")
                elif self.peek().type == "KEYWORD" and (
                    self.peek().value.lower() in _BUILTINS
                    or self.peek().value.lower() in _AGGS
                ):
                    # bare Constraint order condition: ORDER BY
                    # STRLEN(?x) / COUNT(?x) — legal per OrderCondition
                    item = self._primary()
                else:
                    break
                q.order_by.append((item, asc))
            if not q.order_by:
                raise SparqlSyntaxError(f"empty ORDER BY at {self.peek().pos}")
        # LIMIT/OFFSET in either order; operand must be a non-negative
        # INTEGER (a bare int() on any token raised an untyped
        # ValueError and accepted negatives)
        def _count(kw: str) -> int:
            t = self.next()
            if t.type != "NUMBER" or not t.value.isdigit():
                raise SparqlSyntaxError(
                    f"{kw} needs a non-negative integer at {t.pos}, "
                    f"got {t.value!r}"
                )
            return int(t.value)

        for _ in range(2):
            if self.at_kw("limit"):
                self.next()
                q.limit = _count("LIMIT")
            elif self.at_kw("offset"):
                self.next()
                q.offset = _count("OFFSET")

    # --- graph patterns -------------------------------------------------

    def _group(self) -> Group:
        self.eat_op("{")
        g = Group()
        while not self.at_op("}"):
            mark = self.i
            if self.at_kw("optional"):
                self.next()
                g.elements.append(OptionalBlock(self._group()))
            elif self.at_kw("minus"):
                self.next()
                g.elements.append(MinusBlock(self._group()))
            elif self.at_kw("values"):
                self.next()
                g.elements.append(self._values())
            elif self.at_kw("graph"):
                self.next()
                gt = self._term()
                if not (gt.is_var or gt.is_iri):
                    raise SparqlSyntaxError(
                        "GRAPH name must be an IRI or variable"
                    )
                g.elements.append(GraphBlock(gt, self._group()))
            elif self.at_kw("service"):
                self.next()
                silent = False
                if self.at_kw("silent"):
                    self.next()
                    silent = True
                ep = self.next()
                if ep.type == "IRIREF":
                    ep_iri = self._resolve_iri(ep.value[1:-1])
                elif ep.type == "PNAME" and not ep.value.startswith("_:"):
                    ep_iri = self._expand_pname(ep)
                else:
                    raise SparqlSyntaxError(
                        f"SERVICE endpoint must be an IRI at {ep.pos} "
                        "(variable endpoints unsupported)"
                    )
                g.elements.append(
                    ServiceBlock(ep_iri, self._group(), silent)
                )
            elif self.at_kw("filter") and self._kw_ahead(1, "exists"):
                self.next(); self.next()
                g.elements.append(ExistsFilter(self._group(), negated=False))
            elif self.at_kw("filter") and self._kw_ahead(1, "not") and self._kw_ahead(2, "exists"):
                self.next(); self.next(); self.next()
                g.elements.append(ExistsFilter(self._group(), negated=True))
            elif self.at_kw("filter"):
                self.next()
                g.elements.append(Filter(self._bracketted_or_builtin()))
            elif self.at_kw("bind"):
                self.next()
                self.eat_op("(")
                expr = self._expression()
                self.eat_kw("as")
                v = self.next()
                if v.type != "VAR":
                    raise SparqlSyntaxError(
                        f"expected variable after AS at {v.pos}, got {v.value!r}"
                    )
                self.eat_op(")")
                g.elements.append(Bind(expr, v.value[1:]))
            elif self.at_op("{"):
                sub = self._group_or_subselect()
                branches = [sub]
                while self.at_kw("union"):
                    self.next()
                    branches.append(self._group_or_subselect())
                if len(branches) > 1:
                    g.elements.append(UnionBlock(branches))
                elif len(sub.elements) == 1 and isinstance(
                    sub.elements[0], SubSelect
                ):
                    # un-unioned subselect stays a flat element (the
                    # wrapper Group exists only for UNION branches)
                    g.elements.append(sub.elements[0])
                else:
                    g.elements.append(sub)
            else:
                g.elements.extend(self._triples_block())
            if self.at_op("."):
                self.next()
            if self.i == mark:
                t = self.peek()
                raise SparqlSyntaxError(
                    f"unexpected {t.value!r} in group pattern at {t.pos}"
                )
        self.eat_op("}")
        return g

    def _group_or_subselect(self):
        """``{ SELECT ... }`` or a plain group — both are legal
        GroupOrUnionGraphPattern branches, and either may continue with
        UNION (round-5 review fix: a subselect branch previously ate
        the closing brace and the caller had no UNION production)."""
        if self.at_op("{") and self._kw_ahead(1, "select"):
            self.next()
            sub = SubSelect(self._select())
            if self.at_kw("values"):
                # SubSelect ::= ... SolutionModifier ValuesClause —
                # same deferred placement as the top level
                self.next()
                sub.query.values_clause = self._values()
            self.eat_op("}")
            g = Group()
            g.elements.append(sub)
            return g
        return self._group()

    def _kw_ahead(self, n: int, kw: str) -> bool:
        j = self.i + n
        if j >= len(self.toks):
            return False
        t = self.toks[j]
        return t.type == "KEYWORD" and t.value.lower() == kw

    def _values(self) -> ValuesBlock:
        """VALUES ?v { t* }  |  VALUES (?a ?b) { (t t) (t t) }"""
        rows: list[tuple] = []
        if self.peek().type == "VAR":
            var = self.next().value[1:]
            self.eat_op("{")
            while not self.at_op("}"):
                rows.append((self._values_term(),))
            self.eat_op("}")
            return ValuesBlock([var], rows)
        self.eat_op("(")
        variables = []
        while self.peek().type == "VAR":
            variables.append(self.next().value[1:])
        self.eat_op(")")
        self.eat_op("{")
        while not self.at_op("}"):
            self.eat_op("(")
            row = tuple(self._values_term() for _ in variables)
            self.eat_op(")")
            rows.append(row)
        self.eat_op("}")
        return ValuesBlock(variables, rows)

    def _values_term(self):
        if self.at_kw("undef"):
            self.next()
            return None
        return self._term()

    def _triples_block(self, stop_on_keywords: bool = True) -> list[Triple]:
        out: list[Triple] = []
        while True:
            t = self.peek()
            if t.type == "EOF" or self.at_op("}", "{"):
                break
            if stop_on_keywords and self.at_kw(
                "optional", "filter", "bind", "union", "values", "minus",
                "service", "graph",
            ):
                break
            s = self._term()
            while True:
                p = self._verb()
                while True:
                    o = self._term()
                    out.extend(self._expand_path(s, p, o))
                    pending = self.__dict__.get("_pending")
                    if pending:
                        out.extend(pending)
                        pending.clear()
                    if self.at_op(","):
                        self.next()
                        continue
                    break
                if self.at_op(";"):
                    self.next()
                    if self.at_op(".", "}") or self.at_kw("optional", "filter", "bind"):
                        break
                    continue
                break
            if self.at_op("."):
                self.next()
                continue
            break
        return out

    def _verb(self):
        """Predicate position: a plain term, or a SPARQL 1.1 property
        path over IRIs (sequence ``/``, alternation ``|``, inverse
        ``^`` — beyond the reference, which has no paths at all,
        SURVEY.md §2.5). Paths are expanded to plain BGP elements by
        ``_expand_path`` (fresh ``__pp*`` join variables, UNION blocks
        for alternation), so the compiler never sees them."""
        return self._path_alt()

    def _path_alt(self):
        first = self._path_seq()
        if not self.at_op("|"):
            return first
        branches = [first]
        while self.at_op("|"):
            self.next()
            branches.append(self._path_seq())
        return ("alt", branches)

    def _path_seq(self):
        first = self._path_elt()
        if not self.at_op("/"):
            return first
        steps = [first]
        while self.at_op("/"):
            self.next()
            steps.append(self._path_elt())
        return ("seq", steps)

    def _path_elt(self):
        if self.at_op("^"):
            self.next()
            return ("inv", self._path_mod())
        return self._path_mod()

    def _path_mod(self):
        """PathPrimary with optional postfix ``+`` (one-or-more) or
        ``*`` (zero-or-more). NOTE: a signed numeric object written
        flush against the predicate (``ex:p+5``) tokenizes as a NUMBER
        and is NOT a closure — whitespace disambiguates, as in the
        SPARQL grammar's longest-token rule."""
        prim = self._path_primary()
        if self.at_op("+"):
            self.next()
            return ("closure", (prim, 1, None))
        if self.at_op("*"):
            self.next()
            return ("closure", (prim, 0, None))
        if self.at_op("?"):
            self.next()
            return ("closure", (prim, 0, 1))
        return prim

    def _path_primary(self):
        t = self.peek()
        if t.type == "KEYWORD" and t.value == "a":
            self.next()
            return Term("iri", RDF_TYPE)
        if self.at_op("!"):
            self.next()
            return ("negset", self._path_negated_set())
        if self.at_op("("):
            self.next()
            inner = self._path_alt()
            self.eat_op(")")
            return inner
        return self._term()

    def _path_negated_set(self) -> tuple[list[str], list[str]]:
        """After ``!``: one (possibly ``^``-inverted) IRI, or a
        parenthesized ``|``-list of them. Returns (forward, inverse)
        excluded-IRI lists."""

        def one() -> tuple[str, bool]:
            inv = False
            if self.at_op("^"):
                self.next()
                inv = True
            t = self._path_primary()
            if not (isinstance(t, Term) and t.is_iri):
                raise SparqlSyntaxError("negated property set needs plain IRIs")
            return t.value, inv

        members: list[tuple[str, bool]] = []
        if self.at_op("("):
            self.next()
            members.append(one())
            while self.at_op("|"):
                self.next()
                members.append(one())
            self.eat_op(")")
        else:
            members.append(one())
        fwd = [iri for iri, inv in members if not inv]
        bwd = [iri for iri, inv in members if inv]
        return fwd, bwd

    def _expand_path(self, s: Term, path, o: Term) -> list:
        """Path triple → plain elements. Sequence chains fresh
        variables; alternation becomes a UnionBlock; inverse swaps
        subject/object."""
        if isinstance(path, Term):
            return [Triple(s, path, o)]
        kind, arg = path
        if kind == "inv":
            return self._expand_path(o, arg, s)
        if kind == "seq":
            out: list = []
            cur = s
            for i, step in enumerate(arg):
                last = i == len(arg) - 1
                nxt = o if last else Term("var", self._fresh_var())
                out.extend(self._expand_path(cur, step, nxt))
                cur = nxt
            return out
        if kind == "alt":
            return [
                UnionBlock([Group(self._expand_path(s, b, o)) for b in arg])
            ]
        if kind == "closure":
            inner, min_len, max_len = arg
            src = Term("var", self._fresh_var())
            dst = Term("var", self._fresh_var())
            step = Group(self._expand_path(src, inner, dst))
            return [
                PathClosure(
                    s=s,
                    o=o,
                    src_var=src.value,
                    dst_var=dst.value,
                    step=step,
                    min_len=min_len,
                    max_len=max_len,
                )
            ]
        if kind == "negset":
            fwd, inv = arg
            return [NegatedPath(s=s, o=o, forward=fwd, inverse=inv)]
        raise SparqlSyntaxError(f"unsupported path kind {kind!r}")

    def _fresh_var(self) -> str:
        self._ppn = getattr(self, "_ppn", 0) + 1
        return f"__pp{self._ppn}"

    def _fresh_bnode(self) -> str:
        self._bnn = getattr(self, "_bnn", 0) + 1
        return f"__bn{self._bnn}"

    def _po_list(self, s: Term) -> None:
        """Predicate-object list inside a blank-node bracket; emitted
        elements go to ``_pending`` for the enclosing triples block."""
        pending = self.__dict__.setdefault("_pending", [])
        while True:
            p = self._verb()
            while True:
                o = self._term()
                pending.extend(self._expand_path(s, p, o))
                if self.at_op(","):
                    self.next()
                    continue
                break
            if self.at_op(";"):
                self.next()
                if self.at_op("]"):
                    break
                continue
            break

    def _term(self) -> Term:
        if self.at_op("["):
            # blank node property list [ p o ; ... ] — an anonymous
            # node, i.e. a fresh (non-projectable) variable; its inner
            # triples accumulate in _pending and are drained by
            # _triples_block (SPARQL treats query bnodes as variables)
            self.next()
            b = Term("var", self._fresh_bnode())
            if not self.at_op("]"):
                self._po_list(b)
            self.eat_op("]")
            return b
        t = self.next()
        if t.type == "VAR":
            return Term("var", t.value[1:])
        if t.type == "IRIREF":
            return Term("iri", self._resolve_iri(t.value[1:-1]))
        if t.type == "PNAME":
            if t.value.startswith("_:"):
                return Term("var", "__bn_" + t.value[2:])
            return Term("iri", self._expand_pname(t))
        if t.type == "NUMBER":
            return _number_term(t.value)
        if t.type == "STRING":
            lex = _unescape(t.value[1:-1])
            lang = None
            dt = None
            if self.peek().type == "LANGTAG":
                lang = self.next().value[1:]
            elif self.peek().type == "DTYPE":
                self.next()
                dt_tok = self.next()
                dt = dt_tok.value[1:-1] if dt_tok.type == "IRIREF" else self._expand_pname(dt_tok)
            return Term("literal", lex, datatype=dt, lang=lang, py=_coerce(lex, dt))
        if t.type == "KEYWORD" and t.value.lower() in ("true", "false"):
            b = t.value.lower() == "true"
            return Term("literal", t.value.lower(), datatype=XSD + "boolean", py=b)
        raise SparqlSyntaxError(f"unexpected term {t.value!r} at {t.pos}")

    def _expand_pname(self, t: Token) -> str:
        if ":" not in t.value:
            raise SparqlSyntaxError(f"expected prefixed name at {t.pos}: {t.value!r}")
        pfx, local = t.value.split(":", 1)
        if pfx not in self.prefixes:
            raise SparqlSyntaxError(f"unknown prefix {pfx!r} at {t.pos}")
        return self.prefixes[pfx] + local

    # --- expressions (precedence: || < && < cmp < add < mul < unary) ----

    def _bracketted_or_builtin(self) -> Expr:
        if self.at_op("("):
            self.next()
            e = self._expression()
            self.eat_op(")")
            return e
        e = self._unary()
        if isinstance(e, Term):
            e = Expr("ident", [e])
        return e

    def _expression(self) -> Expr:
        return self._or_expr()

    def _or_expr(self) -> Expr:
        left = self._and_expr()
        while self.at_op("||"):
            self.next()
            left = Expr("||", [left, self._and_expr()])
        return left

    def _and_expr(self) -> Expr:
        left = self._cmp_expr()
        while self.at_op("&&"):
            self.next()
            left = Expr("&&", [left, self._cmp_expr()])
        return left

    def _cmp_expr(self) -> Expr:
        left = self._add_expr()
        if self.at_op("=", "!=", "<", ">", "<=", ">="):
            op = self.next().value
            return Expr(op, [left, self._add_expr()])
        negated = False
        if self.at_kw("not") and self._kw_ahead(1, "in"):
            self.next()
            self.next()
            negated = True
        elif self.at_kw("in"):
            self.next()
        else:
            return left if isinstance(left, Expr) else Expr("ident", [left])
        self.eat_op("(")
        items = [self._expression()]
        while self.at_op(","):
            self.next()
            items.append(self._expression())
        self.eat_op(")")
        e = Expr("in", [left] + items)
        return Expr("!", [e]) if negated else e

    def _add_expr(self):
        left = self._mul_expr()
        while True:
            if self.at_op("+", "-"):
                op = self.next().value
                left = Expr(op, [left, self._mul_expr()])
            elif (
                self.peek().type == "NUMBER"
                and self.peek().value[0] in "+-"
            ):
                # SPARQL grammar: a SIGNED numeric literal flush against
                # the previous operand continues the additive expression
                # (AdditiveExpression ::= ... NumericLiteralPositive/
                # Negative) — '?year-1' means (?year - 1)
                t = self.next()
                left = Expr(
                    t.value[0], [left, _number_term(t.value[1:])]
                )
            else:
                return left

    def _mul_expr(self):
        left = self._unary()
        while self.at_op("*", "/"):
            op = self.next().value
            left = Expr(op, [left, self._unary()])
        return left

    def _unary(self):
        if self.at_op("!"):
            self.next()
            return Expr("!", [self._unary()])
        if self.at_op("-"):
            self.next()
            return Expr("neg", [self._unary()])
        if self.at_op("+"):
            self.next()
            return self._unary()
        return self._primary()

    def _primary(self):
        t = self.peek()
        if self.at_op("("):
            self.next()
            e = self._expression()
            self.eat_op(")")
            return e
        if t.type == "KEYWORD":
            name = t.value.lower()
            if name in _AGGS:
                self.next()
                self.eat_op("(")
                distinct = False
                if self.at_kw("distinct"):
                    self.next()
                    distinct = True
                if self.at_op("*"):
                    self.next()
                    arg: object = Term("iri", "*")
                else:
                    arg = self._expression()
                args = [arg]
                # GROUP_CONCAT(?x ; SEPARATOR="...") — separator rides
                # along as a trailing literal Term
                if name == "group_concat" and self.at_op(";"):
                    self.next()
                    self.eat_kw("separator")
                    self.eat_op("=")
                    args.append(self._term())
                self.eat_op(")")
                op = f"agg_{name}" + ("_distinct" if distinct else "")
                return Expr(op, args)
            if name in _BUILTINS:
                self.next()
                self.eat_op("(")
                args = []
                if not self.at_op(")"):
                    args.append(self._expression())
                    while self.at_op(","):
                        self.next()
                        args.append(self._expression())
                self.eat_op(")")
                return Expr(name, args)
            if name in ("true", "false"):
                return self._term()
            # [NOT] EXISTS { ... } as an EXPRESSION (§17.4.1.4) —
            # FILTER(... || EXISTS {...}), BIND(EXISTS {...} AS ?f).
            # The whole-filter form stays the dedicated ExistsFilter
            # element (parsed in _group, one semi/anti join).
            if name == "exists":
                self.next()
                return ExistsExpr(self._group(), negated=False)
            if name == "not" and self._kw_ahead(1, "exists"):
                self.next()
                self.next()
                return ExistsExpr(self._group(), negated=True)
            raise SparqlSyntaxError(f"unexpected keyword {t.value!r} at {t.pos}")
        return self._term()


_ESC_RE = re.compile(r"\\(u[0-9A-Fa-f]{4}|U[0-9A-Fa-f]{8}|.)")
_ESC_MAP = {
    "n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f",
    '"': '"', "'": "'", "\\": "\\",
}


def _unescape(s: str) -> str:
    """Single-pass ECHAR + UCHAR unescaping. Sequential str.replace
    passes corrupt adjacent escapes ('\\\\n' — an escaped backslash
    then a literal n — became a newline) and \\uXXXX wasn't handled."""

    def sub(m: "re.Match[str]") -> str:
        g = m.group(1)
        if (g[0] == "u" and len(g) == 5) or (g[0] == "U" and len(g) == 9):
            try:
                return chr(int(g[1:], 16))
            except (ValueError, OverflowError):
                # \UFFFFFFFF etc. — beyond the Unicode range. Fail
                # closed as a syntax error, not a raw chr() escape
                # (review fix: the parser's contract allows only
                # SparqlSyntaxError)
                raise SparqlSyntaxError(f"invalid unicode escape \\{g}")
        return _ESC_MAP.get(g, "\\" + g)

    return _ESC_RE.sub(sub, s)


def _number_term(lex: str) -> Term:
    if re.fullmatch(r"[+-]?\d+", lex):
        return Term("literal", lex, datatype=XSD + "integer", py=int(lex))
    return Term("literal", lex, datatype=XSD + "double", py=float(lex))


def _coerce(lex: str, dt: str | None):
    """Typed-literal coercion (reference: Xfilter.py data_types :43-63,
    queryParser.py :714-731). An ILL-TYPED literal (``"abc"^^xsd:int``)
    is still a LEGAL RDF term whose value is its lexical form (RDF 1.1
    §3.3 — the datatype map just fails), so coercion failure keeps the
    string rather than escaping with a raw ValueError (review fix: the
    parser's fail-closed contract allows only SparqlSyntaxError, and a
    syntactically valid query must not die here)."""
    if dt is None:
        return lex
    local = dt.rsplit("#", 1)[-1]
    try:
        if local in ("integer", "int", "long", "short", "byte",
                     "nonNegativeInteger", "positiveInteger",
                     "negativeInteger", "unsignedInt", "unsignedLong"):
            return int(lex)
        if local in ("decimal", "float", "double"):
            return float(lex)
    except ValueError:
        return lex  # ill-typed literal: value = lexical form
    if local == "boolean":
        return lex.lower() == "true"
    if local in ("dateTime", "date"):
        return lex  # compared lexically / via cast in the compiler
    return lex


def parse(text: str) -> Query:
    return Parser(text).parse()
