"""In-package deterministic demo REST API for driver-checkable extract.

The REST source's error-domain matrix (auth failures, malformed pages,
conflicting filters, shard chains...) lives in tests/test_connector.py; this
module serves the ONE deterministic dataset that lets the full extract path
— Python DataSource, partitioned offset pagination, env-resolved auth
header, rate-limit retry — run as a REGISTERED QUERY with a DuckDB oracle
(plans/connector_queries.connector_rest_extract_e2e). The dataset is a pure
formula (item i -> name "item<i>", value i * 2.5 — exact in binary, so JSON
round-tripping cannot drift), which is what makes the oracle expressible as
a priori SQL.

Server lifecycle: a singleton daemon thread bound to 127.0.0.1:<ephemeral>,
started on first use and left running until process exit — the registered
query returns a LAZY DataFrame whose executors fetch pages whenever the
driver materializes it, so the server must outlive the query function.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

DEMO_TOKEN = "demo-token"
DEMO_TOKEN_ENV = "SPARK_GRAFT_DEMO_TOKEN"
N_ITEMS = 12
PAGE_SIZE = 4


def record(i: int) -> dict:
    return {"id": i, "name": f"item{i}", "value": i * 2.5}


class _DemoApi(BaseHTTPRequestHandler):
    #: first request per server answers 429 + Retry-After, so every fresh
    #: process exercises the bounded-retry/backoff path (S4) on real HTTP
    rate_limited_once = False

    def log_message(self, *args) -> None:  # noqa: D102 — silence
        pass

    def do_GET(self) -> None:  # noqa: N802 (http.server API)
        if self.headers.get("Authorization") != f"Bearer {DEMO_TOKEN}":
            self._send(401, {"error": "unauthorized"})
            return
        if not _DemoApi.rate_limited_once:
            _DemoApi.rate_limited_once = True
            self._send(429, {"error": "rate limited"}, {"Retry-After": "0.05"})
            return
        q = {k: v[0] for k, v in parse_qs(urlparse(self.path).query).items()}
        page = int(q.get("page", 0))
        lo = page * PAGE_SIZE
        data = [record(i) for i in range(lo, min(lo + PAGE_SIZE, N_ITEMS))]
        self._send(200, {"data": data, "next_cursor": None})

    def _send(self, code: int, body: dict, headers: dict | None = None) -> None:
        payload = json.dumps(body).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        for k, v in (headers or {}).items():
            self.send_header(k, v)
        self.end_headers()
        self.wfile.write(payload)


_LOCK = threading.Lock()
_SERVER: ThreadingHTTPServer | None = None


def demo_api_url() -> str:
    """Start (once per process) and return the demo API's base URL."""
    global _SERVER
    with _LOCK:
        if _SERVER is None:
            _SERVER = ThreadingHTTPServer(("127.0.0.1", 0), _DemoApi)
            threading.Thread(
                target=_SERVER.serve_forever, daemon=True
            ).start()
        return f"http://127.0.0.1:{_SERVER.server_port}/items"
