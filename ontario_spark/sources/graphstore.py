"""Graph-store execution seam for the Neo4j wrapper path.

The reference runs its translated Cypher live
(``ontario/wrappers/neo4j/sparql2cypher.py:129`` via the bolt client at
``:11-127``); no Neo4j exists in this sandbox, so the seam is served by
a clean-room interpreter of exactly the Cypher subset
``translate.star_cypher`` emits:

    MATCH (n:Label) [WHERE c AND ...] RETURN n.p AS x, ... [SKIP n] [LIMIT n]

with conditions ``n.p IS NOT NULL``, comparisons against literals
(including ``toString(n.p) = '...'`` for template keys), ``IN [...]``,
and ``CONTAINS`` / ``STARTS WITH`` / ``ENDS WITH``. The interpreter
runs over an in-memory property graph ``{label: [node dict, ...]}`` —
the integration-test/driver stand-in; a production deployment swaps in
a bolt-driver executor with the same ``executor(cypher) -> [row dict]``
call convention (``compile_star._compile_remote``).
"""

from __future__ import annotations

from collections.abc import Callable


def _parse_literal(s: str):
    s = s.strip()
    if s.startswith("'"):
        assert s.endswith("'"), s
        body = s[1:-1]
        out = []
        i = 0
        while i < len(body):
            if body[i] == "\\" and i + 1 < len(body):
                out.append(body[i + 1])
                i += 2
            else:
                out.append(body[i])
                i += 1
        return "".join(out)
    if s == "true":
        return True
    if s == "false":
        return False
    if s.startswith("[") and s.endswith("]"):
        return [_parse_literal(p) for p in _split_top(s[1:-1], ", ")]
    try:
        return int(s)
    except ValueError:
        return float(s)


def _split_top(s: str, sep: str) -> list[str]:
    """Split on ``sep`` outside single-quoted strings (respecting
    backslash escapes)."""
    parts, buf, i, in_str = [], [], 0, False
    while i < len(s):
        ch = s[i]
        if in_str:
            buf.append(ch)
            if ch == "\\" and i + 1 < len(s):
                buf.append(s[i + 1])
                i += 1
            elif ch == "'":
                in_str = False
        elif ch == "'":
            in_str = True
            buf.append(ch)
        elif s.startswith(sep, i):
            parts.append("".join(buf))
            buf = []
            i += len(sep)
            continue
        else:
            buf.append(ch)
        i += 1
    if buf or not parts:
        parts.append("".join(buf))
    return parts


def _prop_of(expr: str) -> tuple[str, bool]:
    """'n.prop' or 'toString(n.prop)' → (prop, stringified?)."""
    expr = expr.strip()
    if expr.startswith("toString(") and expr.endswith(")"):
        return expr[len("toString(") : -1].split(".", 1)[1], True
    return expr.split(".", 1)[1], False


def _cond_holds(node: dict, cond: str) -> bool:
    cond = cond.strip()
    if cond == "false":
        return False
    if cond == "true":
        return True
    if cond.endswith(" IS NOT NULL"):
        prop, _ = _prop_of(cond[: -len(" IS NOT NULL")])
        return node.get(prop) is not None
    for op in (" STARTS WITH ", " ENDS WITH ", " CONTAINS ", " IN ",
               " <> ", " <= ", " >= ", " = ", " < ", " > "):
        parts = _split_top(cond, op)
        if len(parts) == 2:
            prop, stringify = _prop_of(parts[0])
            v = node.get(prop)
            if v is None:
                return False
            if stringify:
                v = str(v)
            lit = _parse_literal(parts[1])
            key = op.strip()
            return {
                "=": lambda: v == lit,
                "<>": lambda: v != lit,
                "<": lambda: v < lit,
                "<=": lambda: v <= lit,
                ">": lambda: v > lit,
                ">=": lambda: v >= lit,
                "IN": lambda: v in lit,
                "CONTAINS": lambda: lit in str(v),
                "STARTS WITH": lambda: str(v).startswith(lit),
                "ENDS WITH": lambda: str(v).endswith(lit),
            }[key]()
    raise ValueError(f"unsupported cypher condition: {cond}")


def run_cypher(query: str, graph: dict[str, list[dict]]) -> list[dict]:
    """Execute one emitted-subset Cypher query over the property
    graph; returns row dicts keyed by the RETURN aliases."""
    q = query.strip()
    assert q.startswith("MATCH (n:"), q
    label, rest = q[len("MATCH (n:") :].split(")", 1)
    rest = rest.strip()

    # keyword splits must ignore quoted literals: pushed FILTER
    # constants may legitimately contain " LIMIT "/" SKIP "/" RETURN "
    skip = limit = None
    parts = _split_top(rest, " LIMIT ")
    if len(parts) > 1:
        rest, limit = " LIMIT ".join(parts[:-1]), int(parts[-1])
    parts = _split_top(rest, " SKIP ")
    if len(parts) > 1:
        rest, skip = " SKIP ".join(parts[:-1]), int(parts[-1])

    conds: list[str] = []
    if rest.startswith("WHERE "):
        parts = _split_top(rest[len("WHERE ") :], " RETURN ")
        where, items_str = parts[0], " RETURN ".join(parts[1:])
        conds = _split_top(where, " AND ")
    else:
        assert rest.startswith("RETURN "), rest
        items_str = rest[len("RETURN ") :]

    items: list[tuple[str | None, str]] = []  # (prop, alias)
    for item in _split_top(items_str, ", "):
        item = item.strip()
        if item == "1":
            items.append((None, "__one"))
        else:
            expr, _, alias = item.partition(" AS ")
            prop, _ = _prop_of(expr)
            items.append((prop, alias.strip()))

    out = []
    for node in graph.get(label, []):
        if all(_cond_holds(node, c) for c in conds):
            out.append(
                {alias: (1 if prop is None else node.get(prop)) for prop, alias in items}
            )
    if skip:
        out = out[skip:]
    if limit is not None:
        out = out[:limit]
    return out


def executor_from_graph(
    graph: dict[str, list[dict]] | Callable[[], dict[str, list[dict]]],
) -> Callable[[str], list[dict]]:
    """Build a ``Catalog.executors`` entry with the neo4j call
    convention ``executor(cypher) -> [row dict]``."""

    def execr(cypher: str) -> list[dict]:
        g = graph() if callable(graph) else graph
        return run_cypher(cypher, g)

    return execr


def interpreter_bolt_driver(graph):
    """In-process bolt TRANSPORT: speaks the neo4j driver's exact
    session surface (``driver.session(database=...)`` context manager,
    ``run(cypher)`` yielding records with ``.data()``), backed by the
    tested Cypher interpreter — so the catalog (and therefore the
    bench row ``sparql_cypher_join``) routes through
    ``bolt_executor``'s production call path without the wheel
    (round 11, VERDICT r10 task 6; the Derby/spark_doc_executor
    pattern). ``graph`` is a node dict or a zero-arg callable resolved
    lazily per ``run()`` so parquet loads stay deferred."""

    class _Record:
        __slots__ = ("_row",)

        def __init__(self, row: dict):
            self._row = row

        def data(self) -> dict:
            return dict(self._row)

    class _Session:
        def __init__(self, database):
            self.database = database

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            return False

        def run(self, cypher: str):
            g = graph() if callable(graph) else graph
            return [_Record(r) for r in run_cypher(cypher, g)]

    class _Driver:
        def session(self, database=None):
            return _Session(database)

    return _Driver()


def bolt_executor(
    uri: str | None = None,
    auth: "tuple[str, str] | None" = None,
    database: str | None = None,
    driver=None,
) -> Callable[[str], list[dict]]:
    """PRODUCTION ``Catalog.executors`` entry: run the emitted Cypher
    through the Neo4j bolt driver (reference:
    ``ontario/wrappers/neo4j/sparql2cypher.py:129`` executing via the
    bolt client at ``:11-127``). One long-lived driver serves every
    call — bound joins re-invoke the executor once per key batch, and
    per-call connection setup is the classic federation-latency sink.

    ``driver`` injects the transport: anything speaking the neo4j
    driver's session surface (``driver.session(database=...)`` context
    manager whose ``run(cypher)`` yields records with ``.data()``).
    Tests exercise this executor end-to-end by injecting a stand-in
    over the interpreter above (the Derby pattern from
    ``sources/jdbc.py`` — same call path as production, sandbox-
    available backend); production omits it and the real driver is
    constructed, import-gated since the wheel isn't in this sandbox."""
    if driver is None:
        try:
            from neo4j import GraphDatabase  # pragma: no cover
        except ImportError as e:  # pragma: no cover - wheel not shipped
            raise NotImplementedError(
                "neo4j bolt driver not available in this environment; "
                "inject a transport via driver= or use executor_from_graph"
            ) from e
        driver = GraphDatabase.driver(uri, auth=auth)  # pragma: no cover

    def execr(cypher: str) -> list[dict]:
        with driver.session(database=database) as s:
            return [rec.data() for rec in s.run(cypher)]

    return execr
