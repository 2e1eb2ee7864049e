"""Result sinks.

The reference's only sinks are the output queue drained by the CLI
(``run_query.py:46-59``) and the Flask HTTP response (``app/query.py``);
CONSTRUCT results are formatted as N-Triples strings tuple-at-a-time in
Python (``Xconstruct.get_template_impl`` :46-105). Here formatting is
Column expressions (JVM-side, codegen) and any ``df.write`` target is a
sink — the two below are the engine-specific ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _term_nt(col: F.Column) -> F.Column:
    """RDF term → N-Triples token: IRIs angle-bracketed (hierarchical
    ``scheme://`` forms plus the scheme-only ``urn:`` family the CLI's
    SPARQL-JSON sink also treats as uri), blank nodes passed through,
    anything else a quoted literal with the full ECHAR set escaped —
    backslash, quote, and the control characters (LF/CR/TAB) that would
    otherwise split a triple across physical lines and break every
    line-oriented N-Triples parser."""
    s = col.cast("string")
    escaped = F.regexp_replace(
        F.regexp_replace(s, r"\\", r"\\\\"), '"', r"\\\""
    )
    escaped = F.regexp_replace(escaped, "\n", r"\\n")
    escaped = F.regexp_replace(escaped, "\r", r"\\r")
    escaped = F.regexp_replace(escaped, "\t", r"\\t")
    return (
        F.when(
            s.rlike("^[a-zA-Z][a-zA-Z0-9+.-]*://") | s.startswith("urn:"),
            F.concat(F.lit("<"), s, F.lit(">")),
        )
        .when(s.startswith("_:"), s)
        .otherwise(F.concat(F.lit('"'), escaped, F.lit('"')))
    )


def ntriples(construct_df: DataFrame) -> DataFrame:
    """CONSTRUCT result (s/p/o columns) → one ``ntriple`` string column
    (reference parity: ``Xconstruct`` N-Triples formatting, done here as
    a single codegen'd projection). Rows with ANY unbound (NULL) term
    are OMITTED per SPARQL CONSTRUCT semantics — concat_ws would
    otherwise silently drop just the NULL component and emit a
    truncated, malformed line (round-5 review fix)."""
    construct_df = construct_df.filter(
        F.col("s").isNotNull() & F.col("p").isNotNull() & F.col("o").isNotNull()
    )
    return construct_df.select(
        F.concat_ws(
            " ",
            _term_nt(F.col("s")),
            F.concat(F.lit("<"), F.col("p").cast("string"), F.lit(">")),
            _term_nt(F.col("o")),
            F.lit("."),
        ).alias("ntriple")
    )


def write_results(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist a result set. ``partition_by`` drives directory layout —
    at lake scale, partition by the column downstream reads filter on
    (partition pruning makes those reads touch only matching dirs)."""
    w = df.write.mode(mode).format(fmt)
    if fmt == "csv":
        w = w.option("header", True)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


# --- W3C SPARQL result serializations (CSV / TSV / XML) ----------------
#
# Beyond the reference (its only encodings are SPARQL-JSON and the
# N-Triples CONSTRUCT sink): the other three standard result formats,
# per https://www.w3.org/TR/sparql11-results-csv-tsv/ and
# .../rdf-sparql-XMLres/. All three are GENERATORS over a row iterator
# so the HTTP server can stream them chunk-by-chunk with driver memory
# bounded by one row — same posture as the JSON blocking path.


def term_kind(value) -> "tuple[str, str] | None":
    """Lexical value → (kind, string) with kind ∈ uri|bnode|literal —
    the SAME typing rule as the SPARQL-JSON sink (cli.sparql_json_term
    delegates here) so the four serializations cannot diverge."""
    if value is None:
        return None
    s = str(value)
    if s.startswith("http://") or s.startswith("https://") or s.startswith("urn:"):
        return ("uri", s)
    if s.startswith("_:"):
        return ("bnode", s[2:])
    return ("literal", s)


def _csv_field(s: str) -> str:
    if any(ch in s for ch in (",", '"', "\n", "\r")):
        return '"' + s.replace('"', '""') + '"'
    return s


def sparql_csv_chunks(rows, columns: list[str]):
    """``text/csv`` serialization: header of bare variable names, then
    one CRLF-terminated record per solution; IRIs bare, bnodes
    ``_:label``, literals as their lexical form, unbound empty —
    RFC 4180 quoting for fields containing comma/quote/newline."""
    yield ",".join(_csv_field(c) for c in columns) + "\r\n"
    for row in rows:
        out = []
        for c in columns:
            t = term_kind(row[c])
            if t is None:
                out.append("")
            elif t[0] == "bnode":
                out.append(_csv_field("_:" + t[1]))
            else:
                out.append(_csv_field(t[1]))
        yield ",".join(out) + "\r\n"


def _tsv_term(t: "tuple[str, str] | None") -> str:
    if t is None:
        return ""
    kind, s = t
    if kind == "uri":
        return "<" + s + ">"
    if kind == "bnode":
        return "_:" + s
    esc = (
        s.replace("\\", "\\\\")
        .replace('"', '\\"')
        .replace("\n", "\\n")
        .replace("\r", "\\r")
        .replace("\t", "\\t")
    )
    return '"' + esc + '"'


def sparql_tsv_chunks(rows, columns: list[str]):
    """``text/tab-separated-values`` serialization: header of
    ``?var`` names, then terms in SPARQL syntax — IRIs bracketed,
    literals quoted with ECHAR escapes (tab/newline/backslash/quote),
    unbound empty."""
    yield "\t".join("?" + c for c in columns) + "\n"
    for row in rows:
        yield "\t".join(_tsv_term(term_kind(row[c])) for c in columns) + "\n"


def sparql_xml_chunks(rows, columns: list[str]):
    """``application/sparql-results+xml`` serialization (SPARQL Query
    Results XML Format)."""
    from xml.sax.saxutils import escape, quoteattr

    yield (
        '<?xml version="1.0"?>\n'
        '<sparql xmlns="http://www.w3.org/2005/sparql-results#">\n<head>'
    )
    for c in columns:
        yield f"<variable name={quoteattr(c)}/>"
    yield "</head>\n<results>\n"
    for row in rows:
        parts = ["<result>"]
        for c in columns:
            t = term_kind(row[c])
            if t is None:
                continue
            kind, s = t
            tag = {"uri": "uri", "bnode": "bnode", "literal": "literal"}[kind]
            parts.append(
                f"<binding name={quoteattr(c)}>"
                f"<{tag}>{escape(s)}</{tag}></binding>"
            )
        parts.append("</result>\n")
        yield "".join(parts)
    yield "</results>\n</sparql>\n"


def sparql_srj_chunks(rows, columns: list[str]):
    """``application/sparql-results+json`` serialization — the W3C
    SPARQL 1.1 Query Results JSON Format (``{"head": {"vars"},
    "results": {"bindings"}}``), streamed fragment-by-fragment like
    the other three. Distinct from the engine's legacy blocking shape
    (``{"vars", "result", ...}``), which is honestly labeled plain
    ``application/json``: a standards client negotiating the W3C
    media type gets the W3C document (round-6 advice: the legacy
    shape was being served under the W3C label)."""
    import json as _json

    from ontario_spark.cli import binding_of  # lazy: cli imports sinks

    yield '{"head": {"vars": %s}, "results": {"bindings": [' % _json.dumps(
        columns
    )
    n = 0
    for row in rows:
        yield ("," if n else "") + _json.dumps(binding_of(row, columns))
        n += 1
    yield "]}}"


def sparql_srj_boolean_chunks(value: bool):
    """ASK result → the W3C SPARQL 1.1 JSON *boolean* document
    (``{"head": {}, "boolean": …}`` — NOT a bindings document; a
    standards client doing ASK-over-Accept reads the ``boolean`` key,
    round-9 advice)."""
    yield '{"head": {}, "boolean": %s}' % ("true" if value else "false")


def sparql_xml_boolean_chunks(value: bool):
    """ASK result → the W3C XML ``<boolean>`` document."""
    yield (
        '<?xml version="1.0"?>\n'
        '<sparql xmlns="http://www.w3.org/2005/sparql-results#">\n'
        "<head/>\n<boolean>%s</boolean>\n</sparql>\n"
        % ("true" if value else "false")
    )


def ntriples_chunks(rows):
    """``application/n-triples`` serialization for graph results
    (CONSTRUCT / DESCRIBE): one triple per line, streamed row-by-row.
    ``rows`` iterate the ``ntriples()`` projection above (single
    ``ntriple`` column) — formatting already happened JVM-side; the
    driver only concatenates."""
    for row in rows:
        yield row["ntriple"] + "\n"


# ``text/turtle`` (round 9): N-Triples is a subset of Turtle, so the
# canonical line-per-triple stream IS a conformant Turtle document —
# same serializer, different media type (carried by RESULT_MIME). No
# prefix compaction: streaming chunk-by-chunk forbids a second pass to
# discover namespaces, and absolute IRIs round-trip exactly. One
# function, not a copy — an escaping fix must not have to land twice.
turtle_chunks = ntriples_chunks


RESULT_MIME = {
    # legacy engine response shape ({"vars", "result", ...} — the
    # reference's Flask body, app/query.py:147): NOT the W3C document,
    # so NOT the W3C media type
    "json": "application/json",
    # W3C SPARQL 1.1 Query Results JSON Format
    "srj": "application/sparql-results+json",
    "csv": "text/csv; charset=utf-8",
    "tsv": "text/tab-separated-values; charset=utf-8",
    "xml": "application/sparql-results+xml",
    # graph serializations (CONSTRUCT / DESCRIBE only)
    "nt": "application/n-triples",
    "ttl": "text/turtle",
}

# ONE shared format→serializer table for every consumer (HTTP server
# dispatch, CLI --results-format). "json" is absent deliberately: the
# legacy response shape needs per-request state (timings), so each
# caller builds it — but callers must treat RESULT_MIME as the
# authority for WHICH formats exist and this table for HOW to stream
# them. Round-8 review fix: four hand-maintained copies of this dict
# were the exact drift that shipped round-7's srj-returns-400 bug.
RESULT_SERIALIZERS = {
    "srj": sparql_srj_chunks,
    "csv": sparql_csv_chunks,
    "tsv": sparql_tsv_chunks,
    "xml": sparql_xml_chunks,
}

# Per-query-form tables (round-9 advice): ASK must serialize as the
# W3C *boolean* document under srj/xml (a bindings document there is
# non-conformant), and CONSTRUCT/DESCRIBE stream N-Triples. Formats
# NOT in a form's table fall back to bindings-over-the-result-frame
# (legal for graph results serialized as s/p/o rows; refused for
# nonsensical pairs by the callers — see server._sparql / cli.run).
BOOLEAN_SERIALIZERS = {
    "srj": sparql_srj_boolean_chunks,
    "xml": sparql_xml_boolean_chunks,
}
GRAPH_SERIALIZERS = {
    "nt": ntriples_chunks,
    "ttl": turtle_chunks,
}

# bindings formats that have NO defined boolean (ASK) document —
# callers refuse these with a clear message instead of inventing one
ASK_UNSUPPORTED = frozenset(("csv", "tsv"))

# drift guard: every advertised format must be streamable (or the
# specially-handled legacy json). Boolean serializers must shadow a
# bindings format of the same name (same Accept type negotiates both),
# and graph formats must be disjoint from bindings formats. Not
# assert — must survive python -O (an optimized deployment would
# otherwise skip the fail-fast and hit the round-7 class of runtime
# 400s instead).
if set(RESULT_MIME) != set(RESULT_SERIALIZERS) | {"json"} | set(
    GRAPH_SERIALIZERS
):
    raise RuntimeError(
        "RESULT_MIME / RESULT_SERIALIZERS drift: "
        f"{sorted(RESULT_MIME)} vs {sorted(RESULT_SERIALIZERS)} + json "
        f"+ {sorted(GRAPH_SERIALIZERS)}"
    )
if not set(BOOLEAN_SERIALIZERS) <= set(RESULT_SERIALIZERS) or (
    set(GRAPH_SERIALIZERS) & (set(RESULT_SERIALIZERS) | {"json"})
):
    raise RuntimeError(
        "per-query-form serializer drift: boolean "
        f"{sorted(BOOLEAN_SERIALIZERS)} must shadow bindings formats; "
        f"graph {sorted(GRAPH_SERIALIZERS)} must not"
    )
if not ASK_UNSUPPORTED <= set(RESULT_SERIALIZERS):
    raise RuntimeError("ASK_UNSUPPORTED names unknown formats")
