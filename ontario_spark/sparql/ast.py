"""SPARQL AST.

Mirrors the semantic roles of the reference AST
(``ontario/sparql/parser/services.py``: Query :7-138, UnionBlock
:374-491, JoinBlock :494-686, Optional :689-740, Triple :743-879,
Filter/Expression :882-1011, Argument :1014-1081) as plain dataclasses,
extended beyond the reference with GROUP BY / aggregates (SPARQL 1.1 —
the reference's grammar has none, SURVEY.md §2.5).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class Term:
    """A variable, IRI, or literal (reference: Argument)."""

    kind: str  # 'var' | 'iri' | 'literal'
    value: str  # var name (no '?'), absolute IRI, or lexical form
    datatype: str | None = None
    lang: str | None = None
    py: object = None  # parsed python value for typed literals

    @property
    def is_var(self) -> bool:
        return self.kind == "var"

    @property
    def is_iri(self) -> bool:
        return self.kind == "iri"


@dataclass(frozen=True)
class Triple:
    s: Term
    p: Term
    o: Term

    def variables(self) -> set[str]:
        return {t.value for t in (self.s, self.p, self.o) if t.is_var}


@dataclass
class Expr:
    """Operator application. ``op`` is a lowercase operator/function
    name ('&&','||','!','=','<','+','regex','contains','bound',...);
    args are Expr or Term."""

    op: str
    args: list  # list[Expr | Term]

    def variables(self) -> set[str]:
        out: set[str] = set()
        for a in self.args:
            if isinstance(a, Term):
                if a.is_var:
                    out.add(a.value)
            else:
                out |= a.variables()
        return out


@dataclass
class Filter:
    expr: Expr

    def variables(self) -> set[str]:
        return self.expr.variables()


@dataclass
class Bind:
    expr: Expr
    var: str


@dataclass
class OptionalBlock:
    block: "Group"


@dataclass
class UnionBlock:
    branches: list["Group"]


@dataclass
class MinusBlock:
    """SPARQL 1.1 MINUS (beyond the reference, which has no set ops
    besides UNION — SURVEY.md §2.5)."""

    block: "Group"


@dataclass
class ExistsFilter:
    """FILTER [NOT] EXISTS { ... } (SPARQL 1.1; beyond the reference)."""

    block: "Group"
    negated: bool = False


@dataclass(eq=False)
class ExistsExpr:
    """[NOT] EXISTS { ... } in EXPRESSION position (SPARQL 1.1
    §17.4.1.4) — e.g. ``FILTER(?x > 5 || EXISTS { ... })`` or
    ``BIND(EXISTS { ... } AS ?flag)``. Distinct from ExistsFilter,
    the whole-filter fast path (one semi/anti join, no extra column):
    an expression occurrence compiles to a boolean MARK column the
    engine attaches by pinning a row id and semi-join-restricting
    against the compiled block — the same BFrame.restrict machinery
    ExistsFilter uses, so correlation via shared variables and §10.2
    unbound wildcards behave identically. ``eq=False`` keeps identity
    hashing: the engine keys its mark-column map by node."""

    block: "Group"
    negated: bool = False

    def variables(self) -> set[str]:
        # deliberately empty: the block's variables are not in the
        # enclosing expression's scope (correlation happens inside the
        # semi-join), and reporting them would make OPTIONAL's filter
        # hoisting misread the filter as outer-referencing
        return set()


@dataclass
class SubSelect:
    """Nested ``{ SELECT ... }`` inside a group pattern (SPARQL 1.1
    §12; beyond the reference, which has no subqueries — SURVEY.md
    §2.5). Joined into the enclosing group on its projected variables."""

    query: "Query"


@dataclass
class PathClosure:
    """Transitive property path ``p+`` / ``p*`` (SPARQL 1.1; beyond the
    reference). The single-step pattern is pre-expanded by the parser
    into ``step`` — a Group binding ``src_var`` → ``dst_var`` — so the
    compiler can build the edge relation with the ordinary star
    machinery and iterate it to a fixpoint (operators/graph.py).

    ``min_len=0`` (``*``) adds zero-step identity pairs over the nodes
    of the edge relation — the practical engine restriction of the
    spec's "all graph terms" domain."""

    s: Term
    o: Term
    src_var: str
    dst_var: str
    step: "Group"
    min_len: int = 1
    # ``p?`` (zero-or-one) sets max_len=1: no fixpoint iteration, just
    # identity ∪ single step
    max_len: int | None = None


@dataclass
class NegatedPath:
    """Negated property set ``!p`` / ``!(p1|^p2|...)`` (SPARQL 1.1
    §9.1). Excluded predicates are recorded verbatim; the compiler
    expands the complement against the catalog's predicate universe
    (``Catalog.predicate_index``), mirroring how the reference would
    scan all TripleMaps for a variable predicate
    (``allTriplesLowSelectivity``, services.py:803-814). Forward
    branches apply only when ``forward`` is non-empty, inverse branches
    only when ``inverse`` is non-empty (spec's split semantics)."""

    s: Term
    o: Term
    forward: list[str]
    inverse: list[str]


@dataclass
class GraphBlock:
    """SPARQL 1.1 dataset clause: ``GRAPH (<iri>|?var) { ... }``.

    Beyond-reference scope: the reference has no dataset support. In a
    federation, each member data source IS a named graph, so the graph
    name maps onto the catalog's source name (``urn:graph:<source>``,
    or the bare source name as an IRI): ``GRAPH <iri>`` restricts
    source selection for the inner pattern to that source; a variable
    graph evaluates the pattern once per candidate source, binds the
    variable to the source's graph IRI, and unions the branches."""

    graph: Term  # iri or var
    block: "Group"


@dataclass
class ServiceBlock:
    """SPARQL 1.1 federation: ``SERVICE [SILENT] <endpoint> { ... }``.
    The reference federates implicitly via source selection; SERVICE is
    the explicit form. The compiler ships the inner pattern as SPARQL
    text to the endpoint (paged HTTP fetch, or an injected executor)
    and joins the returned bindings. SILENT turns endpoint failure into
    an empty (all-unbound) result instead of an error (§13.2)."""

    endpoint: str
    block: "Group"
    silent: bool = False


@dataclass
class ValuesBlock:
    """Inline data: VALUES ?v { ... } / VALUES (?a ?b) { (..) (..) }.
    Each row is a tuple of Term or None (UNDEF)."""

    variables: list[str]
    rows: list[tuple]


@dataclass
class Group:
    """A group graph pattern `{ ... }` (reference: JoinBlock)."""

    elements: list = field(default_factory=list)
    # Triple | Filter | Bind | OptionalBlock | UnionBlock | Group
    # | MinusBlock | ExistsFilter | ValuesBlock | PathClosure


@dataclass
class SelectExpr:
    """Projection item: plain var, or (expr AS ?var) with optional
    aggregate."""

    var: str
    expr: Expr | None = None  # None → plain variable


def expr_has_aggregate(e) -> bool:
    """True when the expression tree contains an aggregate operator
    (``agg_*``). THE shared probe: the parser's trailing-VALUES
    placement and the compiler's aggregation branch must agree on what
    counts as an aggregate query, so both import this one function
    (round-6 review fix for probe drift)."""
    if isinstance(e, Expr):
        return e.op.startswith("agg_") or any(
            expr_has_aggregate(a) for a in e.args
        )
    return False


def collect_exists_exprs(e, out: list | None = None) -> list:
    """All ExistsExpr nodes in an expression tree, in deterministic
    left-to-right order (no descent into their blocks — nested
    occurrences compile when the block itself does). The engine uses
    this to attach one mark column per node before compiling."""
    if out is None:
        out = []
    if isinstance(e, ExistsExpr):
        out.append(e)
    elif isinstance(e, Expr):
        for a in e.args:
            collect_exists_exprs(a, out)
    return out


@dataclass
class Query:
    query_type: str  # 'select' | 'ask' | 'construct' | 'describe'
    prefixes: dict[str, str] = field(default_factory=dict)
    select: list[SelectExpr] | None = None  # None → SELECT *
    distinct: bool = False
    # dataset clauses: FROM <g> merges named-graph sources into the
    # default graph; FROM NAMED <g> limits what GRAPH may range over
    from_graphs: list[str] = field(default_factory=list)
    from_named: list[str] = field(default_factory=list)
    where: Group = field(default_factory=Group)
    group_by: list[str] = field(default_factory=list)
    # GROUP BY (expr AS ?v) entries: (Expr, varname) bound pre-grouping
    group_by_binds: list[tuple] = field(default_factory=list)
    having: Expr | None = None
    # trailing W3C ValuesClause (§18.2.4.3: joined AFTER aggregation
    # and HAVING, before select expressions/projection)
    values_clause: "ValuesBlock | None" = None
    order_by: list[tuple[object, bool]] = field(default_factory=list)  # (var|Expr, asc)
    limit: int | None = None
    offset: int | None = None
    construct_template: list[Triple] = field(default_factory=list)
    # DESCRIBE <iri>/?var list; query_type 'describe'
    describe_terms: list[Term] = field(default_factory=list)
