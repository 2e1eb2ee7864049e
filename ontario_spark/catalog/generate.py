"""Catalog generation: probe a data lake and emit TripleMaps + indexes.

Plays the role of the reference's RDF-MT manager
(``ontario/rdfmt/__init__.py`` ``RDFMTMgr``: source probing
``get_typed_concepts`` :518, mapping-driven generation
``create_from_mapping`` :1055-1171; CLI ``scripts/create_rdfmts.py``) —
but probes Spark-readable tables instead of SPARQL endpoints: each
table becomes one molecule; the primary key column drives the subject
template; columns named like another table's key become object-property
TEMPLATE maps (the cross-molecule links the reference stores as
``RDFMT.linkedTo``).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ontario_spark.catalog.model import (
    Catalog,
    DataSource,
    LogicalSource,
    TripleMap,
    ref,
    tpl,
)


def discover_tables(base_path: str) -> dict[str, str]:
    """Probe a lake directory for readable tables (reference:
    ``LocalFlatFileClient``, ``ontario/wrappers/flatfile/__init__.py:10``
    — lists csv/tsv/json/xml files for RDF-MT generation). Returns
    table name → format."""
    import os

    exts = {".parquet": "parquet", ".csv": "csv", ".tsv": "tsv",
            ".json": "json", ".xml": "xml"}
    out: dict[str, str] = {}
    for entry in sorted(os.listdir(base_path)):
        stem, ext = os.path.splitext(entry)
        if ext in exts:
            out[stem] = exts[ext]
    return out


def _class_name(table: str) -> str:
    return table[:-1].capitalize() if table.endswith("s") else table.capitalize()


def generate_catalog(
    spark: SparkSession,
    base_path: str,
    tables: list[str],
    namespace: str,
    keys: dict[str, str] | None = None,
    fmt: str = "parquet",
) -> Catalog:
    """Probe each table's schema and build a catalog.

    ``keys``: table → primary key column; defaults to the first column.
    A column equal to another table's key (ignoring the one-letter
    TPC-H-style prefix, e.g. ``c_nationkey`` vs ``n_nationkey``) becomes
    an object-property link to that molecule.
    """
    keys = dict(keys or {})
    fmts = fmt if isinstance(fmt, dict) else {t: fmt for t in tables}
    schemas: dict[str, list[str]] = {}
    for t in tables:
        from ontario_spark.data import table as load

        f = fmts.get(t, "parquet")
        if f == "parquet":
            schemas[t] = load(spark, base_path, t).columns
        elif f in ("csv", "tsv", "json"):
            # probe the REAL file (discover_tables returns stems) with
            # the SAME reader options load_source_df uses at query time
            # (header=true), so probed column names match query-time
            # column names
            path = f"{base_path}/{t}.{f}"
            if f == "json":
                schemas[t] = spark.read.json(path).columns
            else:
                sep = "\t" if f == "tsv" else ","
                schemas[t] = (
                    spark.read.option("sep", sep)
                    .option("header", "true")
                    .csv(path)
                    .columns
                )
        else:
            # one un-probeable file (xml, binary) must not abort the
            # whole lake scan (round-5 review fix) — skip it loudly
            import sys

            print(
                f"generate_catalog: skipping {t!r} — cannot probe "
                f"schema for format {f!r}",
                file=sys.stderr,
            )
            continue
        keys.setdefault(t, schemas[t][0])

    def stem(col: str) -> str:
        return col.split("_", 1)[1] if "_" in col else col

    key_owner = {stem(keys[t]): t for t in tables}

    cat = Catalog()
    default_fmt = (
        "parquet" if any(f == "parquet" for f in fmts.values()) or not fmts
        else next(iter(sorted(fmts.values())))
    )
    src = DataSource(
        name="generated_lake", dstype=default_fmt, base_path=base_path
    )
    maps = []
    for t in tables:
        pk = keys[t]
        f = fmts.get(t, "parquet")
        preds = []
        for col in schemas[t]:
            if col == pk:
                continue
            owner = key_owner.get(stem(col))
            pname = namespace + stem(col)
            if owner and owner != t:
                preds.append(
                    (namespace + owner, tpl(f"{namespace}{owner}/{{{col}}}"))
                )
            else:
                preds.append((pname, ref(col)))
        maps.append(
            TripleMap(
                name=f"{_class_name(t)}Gen",
                source=LogicalSource(
                    table=t if f == "parquet" else f"{t}.{f}",
                    fmt=None if f == "parquet" else f,
                ),
                subject=tpl(f"{namespace}{t}/{{{pk}}}"),
                subject_class=namespace + _class_name(t),
                predicates=tuple(preds),
            )
        )
    cat.add(src, *maps)
    return cat


RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def generate_from_endpoint(
    executor,
    source_name: str = "endpoint",
    max_classes: int | None = None,
) -> Catalog:
    """Live-endpoint RDF-MT generation: probe a SPARQL endpoint for its
    molecules (reference: ``RDFMTMgr.get_typed_concepts``,
    ``ontario/rdfmt/__init__.py:518`` — classes via ``?s a ?t``, then
    per-class predicate sets), and build a catalog whose maps carry the
    class + predicate indexes source selection needs. Queries against
    these molecules ship verbatim as SPARQL text (``star_sparql_text``),
    so the term maps are descriptive only.

    ``executor``: ``query_text → iterable of binding dicts`` — e.g.
    ``functools.partial(paged_bindings, url)`` for a real HTTP endpoint,
    making this the counterpart of the reference's live probing; tests
    inject fakes."""
    classes = [
        b["t"]
        for b in executor("SELECT DISTINCT ?t WHERE { ?s a ?t }")
        if b.get("t")
    ]
    if max_classes is not None:
        classes = classes[:max_classes]
    cat = Catalog()
    src = DataSource(name=source_name, dstype="sparql")
    maps = []
    for cls in classes:
        preds = [
            b["p"]
            for b in executor(
                f"SELECT DISTINCT ?p WHERE {{ ?s a <{cls}> . ?s ?p ?o }}"
            )
            if b.get("p") and b["p"] != RDF_TYPE
        ]
        local = cls.rsplit("/", 1)[-1].rsplit("#", 1)[-1]
        maps.append(
            TripleMap(
                name=f"{local}Endpoint",
                source=LogicalSource(table="-"),
                subject=ref("s"),
                subject_class=cls,
                predicates=tuple(
                    (p, ref(p.rsplit("/", 1)[-1].rsplit("#", 1)[-1]))
                    for p in preds
                ),
            )
        )
    cat.add(src, *maps)
    return cat


def main(argv: list[str] | None = None) -> int:
    """CLI parity with the reference's ``scripts/create_rdfmts.py``:
    probe a lake directory, emit the catalog JSON (loadable by
    ``serde.load`` / the query CLI) and an RDF-MT-style molecule
    summary."""
    import argparse
    import json

    ap = argparse.ArgumentParser(description=main.__doc__)
    ap.add_argument("--lake", required=True, help="directory of tables")
    ap.add_argument("--namespace", default="http://ex.org/lake/")
    ap.add_argument("--out", required=True, help="catalog JSON output path")
    ap.add_argument("--summary", default=None, help="molecule summary JSON path")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from ontario_spark.catalog.serde import save
    from ontario_spark.session import get_spark

    existing = SparkSession.getActiveSession()
    spark = existing or get_spark("ontario-spark-rdfmt")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        tables = discover_tables(args.lake)
        cat = generate_catalog(
            spark, args.lake, sorted(tables), args.namespace, fmt=tables
        )
        save(cat, args.out)
        if args.summary:
            with open(args.summary, "w") as f:
                json.dump(describe(cat), f, indent=1)
        print(f"catalog: {len(cat.triple_maps)} molecules -> {args.out}")
    finally:
        if existing is None:  # don't tear down a caller's session
            spark.stop()
    return 0


def describe(cat: Catalog) -> dict:
    """JSON-able molecule summary (the RDF-MT view: per-class
    predicates + cross-links), for persistence or inspection."""
    out = {}
    for name, tm in sorted(cat.triple_maps.items()):
        links = [
            p for p, om in tm.predicates if om.kind == "template"
        ]
        out[name] = {
            "class": tm.subject_class,
            "table": tm.source.table,
            "subject": tm.subject.value,
            "predicates": [p for p, _ in tm.predicates],
            "linked_to": links,
        }
    return out
if __name__ == "__main__":
    import sys
    sys.exit(main())
