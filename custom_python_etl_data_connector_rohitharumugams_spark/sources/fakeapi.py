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

import datetime as _dt
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

DEMO_TOKEN = "demo-token"
DEMO_TOKEN_ENV = "SPARK_GRAFT_DEMO_TOKEN"
N_ITEMS = 12
PAGE_SIZE = 4
#: 2024-03-01T00:00:00 — item i's server-side update time is this + i hours,
#: a pure formula both the incremental-sync query's oracle (epoch arithmetic
#: in DuckDB) and the server's ``since`` filter evaluate identically
BASE_UPDATED_EPOCH = 1_709_251_200


def updated_at(i: int) -> str:
    """ISO-8601 (naive/UTC) update timestamp for item ``i``."""
    t = _dt.datetime(2024, 3, 1) + _dt.timedelta(hours=i)
    return t.isoformat()


def record(i: int) -> dict:
    return {"id": i, "name": f"item{i}", "value": i * 2.5,
            "updated_at": updated_at(i)}


class _DemoApi(BaseHTTPRequestHandler):
    #: first request per rate-limit epoch answers 429 + Retry-After, so the
    #: bounded-retry/backoff path (S4) runs on real HTTP. Checked-and-set
    #: under a lock (ThreadingHTTPServer serves partitions concurrently, so
    #: an unsynchronized flag could 429 several first requests — harmless
    #: but imprecise). Coverage is once per process by default; queries that
    #: need THEIR OWN 429 (the registered extract/sync rows) call
    #: :func:`reset_rate_limit` first, so per-query S4 coverage never
    #: depends on registry execution order.
    rate_limited_once = False
    _rl_lock = threading.Lock()

    def log_message(self, *args) -> None:  # noqa: D102 — silence
        pass

    def do_GET(self) -> None:  # noqa: N802 (http.server API)
        if self.headers.get("Authorization") != f"Bearer {DEMO_TOKEN}":
            self._send(401, {"error": "unauthorized"})
            return
        with _DemoApi._rl_lock:
            limited = not _DemoApi.rate_limited_once
            _DemoApi.rate_limited_once = True
        if limited:
            self._send(429, {"error": "rate limited"}, {"Retry-After": "0.05"})
            return
        q = {k: v[0] for k, v in parse_qs(urlparse(self.path).query).items()}
        max_id = int(q.get("max_id", N_ITEMS - 1))
        since = q.get("since")
        # min_id: the id-offset delta filter the STREAMING reader's
        # delta_param option targets (greater-or-equal — id offsets are
        # exact, unlike timestamp boundaries, so no boundary nudge)
        min_id = int(q.get("min_id", 0))
        ids = range(min_id, min(max_id, N_ITEMS - 1) + 1)
        if since is not None:
            # strictly-greater semantics: the connector's _ge_boundary nudge
            # exists precisely so a > server re-delivers boundary records
            cut = _dt.datetime.fromisoformat(since)
            ids = [i for i in ids if _dt.datetime.fromisoformat(updated_at(i)) > cut]
        else:
            ids = list(ids)
        page = int(q.get("page", 0))
        lo = page * PAGE_SIZE
        data = [record(i) for i in ids[lo:lo + PAGE_SIZE]]
        self._send(200, {"data": data, "next_cursor": None})

    def _send(self, code: int, body: dict, headers: dict | None = None) -> None:
        payload = json.dumps(body).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        for k, v in (headers or {}).items():
            self.send_header(k, v)
        self.end_headers()
        self.wfile.write(payload)


def reset_rate_limit() -> None:
    """Arm the next request to receive a fresh 429 (see _DemoApi docstring)."""
    with _DemoApi._rl_lock:
        _DemoApi.rate_limited_once = False


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
