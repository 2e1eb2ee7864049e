"""Apache Drill federation seam over Drill's HTTP REST protocol.

The reference executes its translated Drill SQL through the pydrill
HTTP client (``ontario/wrappers/drill/sparql2drill.py:94-150`` — POST
``/query.json``, result rows back as JSON). This module reproduces
that call convention with the standard library (no client wheel
needed):

- ``drill_rest_executor`` is the PRODUCTION ``Catalog.executors``
  entry — it POSTs ``{"queryType": "SQL", "query": ...}`` to
  ``<base>/query.json`` and materializes the JSON ``rows``, exactly
  the request/response shape a real drillbit serves.
- ``duckdb_drillbit`` starts an in-process HTTP server SPEAKING that
  protocol, backed by DuckDB over the lake parquet with the dialect's
  backtick quoting swapped to ANSI — the sandbox-available backend
  standing in for a drillbit (the Derby / ``interpreter_bolt_driver``
  pattern: same executor code path as production, real HTTP
  round-trip, stand-in engine behind it).

So the bench/driver row ``sparql_drill_join`` measures translation →
HTTP POST → JSON decode end-to-end; only the engine behind the socket
differs from production.
"""

from __future__ import annotations

import json
import threading
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable

#: One embedded drillbit per (sf_dir, tables) for the process lifetime
#: — executors run lazily inside Spark actions, so per-call servers
#: could be torn down while a query still needs them.
_SERVERS: dict[tuple, str] = {}
_LOCK = threading.Lock()


def drill_rest_executor(
    base_url: str, timeout: float = 30.0
) -> Callable[[str], list[dict]]:
    """Run translated Drill SQL through the REST protocol (reference:
    pydrill's ``Drill.query`` → POST ``/query.json``). Returns the
    standard row-dict contract every SQL executor in this engine
    shares."""

    def run(sql: str) -> list[dict]:
        payload = json.dumps({"queryType": "SQL", "query": sql}).encode()
        req = urllib.request.Request(
            base_url.rstrip("/") + "/query.json",
            data=payload,
            headers={"Content-Type": "application/json"},
        )
        try:
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                body = json.load(resp)
        except urllib.error.HTTPError as e:
            # Drill ships failures as a JSON errorMessage body; surface
            # it instead of the bare status line
            try:
                msg = json.load(e).get("errorMessage", str(e))
            except Exception:
                msg = str(e)
            raise RuntimeError(f"drill error: {msg}") from e
        if "errorMessage" in body:
            raise RuntimeError(f"drill error: {body['errorMessage']}")
        return list(body.get("rows", []))

    return run


def _unbacktick(sql: str) -> str:
    """Swap Drill's backtick identifier quoting to ANSI double quotes
    WITHOUT touching backticks inside single-quoted string literals
    (round-12 ADVICE: a pushed FILTER constant may legitimately carry
    one). Walks the query once, tracking literal state; '' inside a
    literal is the standard escaped quote and stays inside."""
    out = []
    in_lit = False
    i = 0
    while i < len(sql):
        ch = sql[i]
        if in_lit:
            if ch == "'":
                if i + 1 < len(sql) and sql[i + 1] == "'":
                    out.append("''")
                    i += 2
                    continue
                in_lit = False
            out.append(ch)
        elif ch == "'":
            in_lit = True
            out.append(ch)
        elif ch == "`":
            out.append('"')
        else:
            out.append(ch)
        i += 1
    return "".join(out)


def duckdb_drillbit(sf_dir: str, tables: tuple[str, ...] = ("customer",)) -> str:
    """Start (or reuse) the in-process drillbit stand-in for
    ``sf_dir`` and return its base URL. DuckDB executes each query
    with the Drill dialect's backtick identifier quoting swapped to
    ANSI — the one syntactic difference the dialect carries
    (``sources/translate.py::DRILL``)."""
    key = (sf_dir, tables)
    with _LOCK:
        if key in _SERVERS:
            return _SERVERS[key]

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # keep pytest output clean
                pass

            def do_POST(self):
                if self.path != "/query.json":
                    self.send_error(404)
                    return
                try:
                    n = int(self.headers.get("Content-Length", "0"))
                    req = json.loads(self.rfile.read(n))
                    assert req.get("queryType") == "SQL", req
                    sql = _unbacktick(req["query"])
                    import duckdb

                    con = duckdb.connect()
                    try:
                        for t in tables:
                            con.execute(
                                f"CREATE VIEW {t} AS SELECT * FROM "
                                f"read_parquet('{sf_dir}/{t}.parquet')"
                            )
                        cur = con.execute(sql)
                        cols = [d[0] for d in cur.description]
                        # JSON carries numbers as numbers (a real
                        # drillbit serializes DECIMAL columns as JSON
                        # numerics too); anything else non-native
                        # (dates, ...) falls back to default=str
                        from decimal import Decimal

                        rows = [
                            {
                                c: (float(v) if isinstance(v, Decimal) else v)
                                for c, v in zip(cols, r)
                            }
                            for r in cur.fetchall()
                        ]
                    finally:
                        con.close()
                    body = json.dumps(
                        {"columns": cols, "rows": rows}, default=str
                    ).encode()
                    self.send_response(200)
                except Exception as ex:  # protocol-shaped error, like Drill
                    body = json.dumps({"errorMessage": str(ex)}).encode()
                    self.send_response(500)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        url = f"http://127.0.0.1:{srv.server_address[1]}"
        _SERVERS[key] = url
        return url
