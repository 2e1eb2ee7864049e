"""REST_SERVICE source: JSON rows from an HTTP API answering SPARQL
stars through the normal star compilation (iterators included)."""

from __future__ import annotations

import json
import threading

import pytest

from ontario_spark.catalog.model import (
    Catalog,
    DataSource,
    LogicalSource,
    TripleMap,
    ref,
    tpl,
)
from ontario_spark.compiler.query import SparqlEngine

EX = "http://ex.org/"

ROWS = [
    {"id": 1, "name": "aspirin", "atc": {"code": "N02BA01"}},
    {"id": 2, "name": "ibuprofen", "atc": {"code": "M01AE01"}},
]


def _catalog(executor=None, base_path="") -> Catalog:
    cat = Catalog()
    src = DataSource(name="api", dstype="rest", base_path=base_path)
    tm = TripleMap(
        name="DrugApi",
        source=LogicalSource(table="drugs", fmt="rest"),
        subject=tpl(EX + "drug/{id}"),
        subject_class=EX + "Drug",
        predicates=(
            (EX + "name", ref("name")),
            (EX + "atc", ref("atc/code")),  # nested reference path
        ),
    )
    cat.add(src, tm)
    if executor is not None:
        cat.executors["api"] = executor
    return cat


def test_rest_star_with_injected_executor(spark):
    calls = []

    def api(path: str):
        calls.append(path)
        return ROWS

    df = SparqlEngine(spark, _catalog(api)).query(
        f"""PREFIX ex: <{EX}>
            SELECT ?d ?name ?atc WHERE {{
              ?d a ex:Drug ; ex:name ?name ; ex:atc ?atc .
              FILTER (STRSTARTS(?atc, "N")) }}"""
    )
    rows = [tuple(r) for r in df.collect()]
    assert rows == [(EX + "drug/1", "aspirin", "N02BA01")]
    assert calls == ["drugs"]


def test_rest_star_over_real_http(spark):
    """No injected executor: the catalog fetches from a live HTTP
    endpoint (default urllib path) using the source base URL."""
    from http.server import BaseHTTPRequestHandler, HTTPServer

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            assert self.path == "/drugs"
            body = json.dumps(ROWS).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    server = HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{server.server_port}"
        df = SparqlEngine(spark, _catalog(base_path=base)).query(
            f"""PREFIX ex: <{EX}>
                SELECT ?name WHERE {{ ?d a ex:Drug ; ex:name ?name }}"""
        )
        assert sorted(r["name"] for r in df.collect()) == ["aspirin", "ibuprofen"]
    finally:
        server.shutdown()


def test_fetch_json_params():
    from ontario_spark.sources.rest import fetch_json
    from http.server import BaseHTTPRequestHandler, HTTPServer

    seen = {}

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            seen["path"] = self.path
            body = b'{"ok": true}'
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    server = HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        out = fetch_json(
            f"http://127.0.0.1:{server.server_port}/q", params={"page": "2"}
        )
        assert out == {"ok": True}
        assert seen["path"] == "/q?page=2"
    finally:
        server.shutdown()
