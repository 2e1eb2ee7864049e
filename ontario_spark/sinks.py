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
