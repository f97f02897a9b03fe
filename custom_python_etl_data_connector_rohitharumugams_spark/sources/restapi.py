"""REST API Spark data source (SURVEY.md S1-S4) on the PySpark 4 Python
Data Source API — the Spark-native form of the reference's extract contract
(/root/reference/README.md:12-13,22: auth headers, pagination, rate limits,
retry on connectivity errors).

Usage:
    spark.dataSource.register(RestApiDataSource)
    df = (spark.read.format("restapi")
          .option("base_url", "http://api.example.com/items")
          .option("mode", "offset")           # or "cursor"
          .option("num_partitions", "8")
          .option("schema_ddl", "id bigint, name string")
          .option("auth_env", "API_TOKEN")    # env var holding the bearer token
          .option("fields_param", "fields")   # API supports ?fields=a,b column
          .load())                            # pruning (see RestApiReader)

Parallelism model: offset pagination splits the page range across N input
partitions (each fetched by a separate executor-side Python worker — this is
what makes extract scale); cursor pagination is inherently sequential and
runs as one partition. Rate limiting, bounded retry with exponential backoff
and Retry-After honoring live inside the per-partition reader.

Malformed payloads: if the declared schema contains ``_corrupt_record``, an
unparseable page lands there as raw text (PERMISSIVE semantics, SURVEY.md
P4); otherwise the reader raises after retries.
"""

from __future__ import annotations

import json
import os
import time
import urllib.error
import urllib.parse
import urllib.request
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

RETRIABLE_STATUS = {429, 500, 502, 503, 504}
CORRUPT_COL = "_corrupt_record"


def _retry_after_seconds(value: str | None) -> float | None:
    """RFC 7231 Retry-After: delta-seconds OR an HTTP-date."""
    if not value:
        return None
    try:
        return max(0.0, float(value))
    except ValueError:
        pass
    try:
        from email.utils import parsedate_to_datetime

        dt = parsedate_to_datetime(value)
        return max(0.0, dt.timestamp() - time.time())
    except (TypeError, ValueError):
        return None


class PageRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class CursorShard(InputPartition):
    """One independent cursor chain, scoped to a server-side shard value
    (key range, tenant, date bucket — whatever the API partitions by)."""

    def __init__(self, param: str, value: str):
        self.param = param
        self.value = value


def resolve_auth_headers(options: dict) -> dict[str, str]:
    """Build auth headers from ``auth_token`` (pre-resolved) or ``auth_env``.

    NOTE: every Python DataSource callback — including construction and
    ``partitions()`` — runs in JVM-spawned Python workers that inherit the
    executor environment, NOT the driver process where ``.env`` was loaded.
    Driver-side config (pipeline.extract) therefore resolves the env var
    itself and passes the token via ``auth_token``; ``auth_env`` here is the
    fallback for deployments that ship credentials via spark.executorEnv.*.
    """
    headers = {"Accept": "application/json"}
    token = options.get("auth_token")
    if token is None and options.get("auth_env"):
        token = os.environ.get(options["auth_env"], "")
        if not token:
            # fail FAST with the cause: "" would pass the is-not-None check
            # below and every page request would carry a malformed
            # "Bearer " header — an opaque executor-side 401 storm
            # (pipeline.extract guards this driver-side; this is the
            # equivalent guard for direct .option("auth_env", ...) users)
            raise ValueError(
                f"auth_env {options['auth_env']!r} is unset or empty in the "
                "process resolving credentials — pass the token via "
                "auth_token (resolved where your .env was loaded) or ship "
                "the variable via spark.executorEnv.*"
            )
    if token is not None:
        scheme = options.get("auth_scheme", "Bearer")
        headers[options.get("auth_header", "Authorization")] = (
            f"{scheme} {token}" if scheme else token
        )
    return headers


class _HttpClient:
    """Per-partition HTTP client: rate limit + bounded retry/backoff."""

    def __init__(self, options: dict, headers: dict[str, str]):
        self.headers = headers
        self.max_retries = int(options.get("max_retries", 4))
        self.backoff_s = float(options.get("backoff_s", 0.2))
        rps = float(options.get("rate_limit_rps", 0) or 0)
        self.min_interval = 1.0 / rps if rps > 0 else 0.0
        self._last_request = 0.0

    def get_json(self, url: str) -> tuple[str, object]:
        """GET with retries; returns (raw_body, parsed_json_or_None)."""
        attempt = 0
        while True:
            if self.min_interval:
                wait = self._last_request + self.min_interval - time.monotonic()
                if wait > 0:
                    time.sleep(wait)
            self._last_request = time.monotonic()
            try:
                req = urllib.request.Request(url, headers=self.headers)
                with urllib.request.urlopen(req, timeout=30) as resp:
                    # errors="replace": a non-UTF-8 body (proxy error page,
                    # misconfigured server) must flow into the declared
                    # corrupt-record channel as a failed JSON parse, not
                    # kill the task with an uncatchable UnicodeDecodeError
                    body = resp.read().decode("utf-8", errors="replace")
                try:
                    return body, json.loads(body)
                except (json.JSONDecodeError, ValueError):
                    return body, None
            except urllib.error.HTTPError as e:
                if e.code in RETRIABLE_STATUS and attempt < self.max_retries:
                    delay = _retry_after_seconds(e.headers.get("Retry-After"))
                    if delay is None:
                        delay = self.backoff_s * (2**attempt)
                    time.sleep(min(delay, 60.0))
                    attempt += 1
                    continue
                raise
            except urllib.error.URLError:
                if attempt < self.max_retries:
                    time.sleep(self.backoff_s * (2**attempt))
                    attempt += 1
                    continue
                raise


class RestApiReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.options = options
        self.mode = options.get("mode", "cursor")
        self.page_size = int(options.get("page_size", 100))
        self.max_pages = int(options.get("max_pages", 10_000))
        self.num_partitions = int(options.get("num_partitions", 4))
        self.base_url = options["base_url"]
        self.fields = [f.name for f in schema.fields]
        # resolved at READER CONSTRUCTION — a JVM-spawned planning worker,
        # not the user's driver process (see resolve_auth_headers docstring);
        # auth_env therefore only works when the variable reaches executor
        # environments (spark.executorEnv.*), which is why pipeline.extract
        # resolves credentials itself and passes auth_token
        self.auth_headers = resolve_auth_headers(options)
        # columns the API is declared to filter server-side (option
        # ``pushable_params``, comma-separated); only these are pushed
        self.pushable = {
            c.strip() for c in options.get("pushable_params", "").split(",") if c.strip()
        }
        self.pushed_params: dict[str, object] = {}
        # COLUMN PRUNING (SURVEY.md SS4): option ``fields_param`` declares
        # the API supports server-side field selection (the ?fields=a,b
        # convention). The reader then asks for exactly the declared
        # schema's data columns on every page, so a narrow schema_ddl
        # shrinks the TRANSFERRED payload, not just the parsed one. The
        # Python DataSource API has no pruneColumns planning hook (only
        # partitions/pushFilters/read), so the schema IS the pruning
        # contract — same explicit-declaration philosophy as
        # pushable_params. Landing/diagnostic columns (raw ``record``,
        # ``_corrupt_record``) are never API fields and are excluded.
        self.fields_param = options.get("fields_param")
        self.api_fields = [f for f in self.fields if f not in (CORRUPT_COL, "record")]
        if self.fields_param and self.api_fields:
            self.pushed_params[self.fields_param] = ",".join(self.api_fields)

    # -- planning ----------------------------------------------------------
    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Translate simple equality predicates into API query params
        (SURVEY.md SS4 source pushdown): ``df.filter(col == lit)`` on a
        declared pushable column becomes ``?col=lit`` on every page fetch, so
        the API returns (and the connector transfers) only matching records.
        Anything else is returned to Spark to evaluate post-scan. Spark
        treats accepted filters as fully applied — hence the explicit
        ``pushable_params`` contract rather than guessing."""
        # pagination/protocol params would OVERWRITE a same-named pushed
        # filter in _url (params merge last) — Spark would then drop the
        # filter from post-scan evaluation while no server ever saw it:
        # silently wrong RESULTS. Filters on reserved names are handed
        # back to Spark instead.
        reserved = {
            "page",
            "page_size",
            "cursor",
            self.fields_param,
            self.options.get("shard_param"),
        }
        for f in filters:
            if (
                isinstance(f, EqualTo)
                and len(f.attribute) == 1
                and f.attribute[0] in self.pushable
                and f.attribute[0] not in reserved
                and f.attribute[0] not in self.pushed_params  # two EqualTo on
                # one column: accepting both would overwrite the first and
                # Spark would drop BOTH from post-scan evaluation — push the
                # first, hand the second back to Spark
                and isinstance(f.value, (str, int, float, bool))
            ):
                # JSON APIs match lowercase booleans; Python's str(True)
                # would urlencode as "True" and silently match nothing
                # (Spark drops accepted filters from post-scan evaluation,
                # so a wrong encoding means wrong RESULTS, not slow ones)
                v = f.value
                self.pushed_params[f.attribute[0]] = (
                    "true" if v is True else "false" if v is False else v
                )
            else:
                yield f

    def partitions(self) -> Sequence[InputPartition]:
        if self.mode == "offset":
            n = min(self.num_partitions, self.max_pages)
            per = (self.max_pages + n - 1) // n
            return [PageRange(i * per, min((i + 1) * per, self.max_pages)) for i in range(n)]
        # A single cursor chain is sequential by protocol. The scale answer
        # (DESIGN.md S1-S9) is many independent chains: option
        # ``shard_param=shard`` + ``shard_values=a,b,c`` plans one partition
        # per shard value, each walking its own cursor chain with
        # ``?shard=<value>`` on every page — aggregate throughput scales
        # with the shard count, each shard keeping its own rate limiter.
        shard_param = self.options.get("shard_param")
        shard_values = [
            v.strip() for v in self.options.get("shard_values", "").split(",") if v.strip()
        ]
        if shard_param and shard_values:
            return [CursorShard(shard_param, v) for v in shard_values]
        return [PageRange(0, self.max_pages)]

    # -- execution (runs in executor-side Python workers) ------------------
    def read(self, partition: InputPartition) -> Iterator[tuple]:
        client = _HttpClient(self.options, self.auth_headers)
        if self.mode == "offset":
            yield from self._read_offset(client, partition)
        elif isinstance(partition, CursorShard):
            yield from self._read_cursor(client, {partition.param: partition.value})
        else:
            yield from self._read_cursor(client)

    def _url(self, params: dict) -> str:
        sep = "&" if "?" in self.base_url else "?"
        merged = {**self.pushed_params, **params}
        return f"{self.base_url}{sep}{urllib.parse.urlencode(merged)}"

    def _read_offset(self, client: _HttpClient, pr: PageRange) -> Iterator[tuple]:
        for page in range(pr.start, pr.end):
            url = self._url({"page": page, "page_size": self.page_size})
            body, payload = client.get_json(url)
            rows, done = self._emit(body, payload)
            yield from rows
            if done:
                break

    def _read_cursor(
        self, client: _HttpClient, extra_params: dict | None = None
    ) -> Iterator[tuple]:
        cursor = None
        for _ in range(self.max_pages):
            params = {"page_size": self.page_size, **(extra_params or {})}
            if cursor:
                params["cursor"] = cursor
            body, payload = client.get_json(self._url(params))
            rows, done = self._emit(body, payload)
            yield from rows
            if done:
                break
            cursor = payload.get("next_cursor") if isinstance(payload, dict) else None
            if not cursor:
                break

    def _corrupt_row(self, body: str, context: str) -> tuple:
        """One corrupt-channel row (the PERMISSIVE contract), or a loud
        error when the schema declared no corrupt column."""
        if CORRUPT_COL not in self.fields:
            raise ValueError(f"{context} (no {CORRUPT_COL} column declared): {body[:200]!r}")
        return tuple(body if f == CORRUPT_COL else None for f in self.fields)

    def _emit(self, body: str, payload: object) -> tuple[list[tuple], bool]:
        """Map one page to schema-ordered tuples. Returns (rows, exhausted)."""
        if payload is None:
            # malformed JSON body: same 200-with-garbage failure mode as
            # the error-shaped dict below, same termination — record the
            # page and STOP this partition's chain rather than fetching
            # (and corrupting) every remaining page of a broken gateway
            return [self._corrupt_row(body, "malformed JSON page")], True
        if isinstance(payload, dict) and "data" not in payload:
            # An error-shaped 200 body ({"error": ...}) is NOT silently
            # swallowed as an exhausted page (that would truncate the
            # extract with no signal) — but it DOES end this partition's
            # fetching: record one corrupt row and stop, instead of
            # hammering an already-erroring API once per remaining page.
            return [self._corrupt_row(body, "page payload has no 'data' field")], True
        records = payload["data"] if isinstance(payload, dict) else payload
        if records is None:
            # {"data": null} — servers commonly end pagination this way;
            # an exhausted page, not an error
            return [], True
        if not isinstance(records, list):
            # a bare string/number/dict payload would otherwise iterate its
            # characters (silent zero rows) or crash the task — route it to
            # the corrupt channel like any other malformed page
            return [self._corrupt_row(body, "page payload is not a record list")], True
        rows = []
        for rec in records:
            if isinstance(rec, dict):
                rows.append(
                    tuple(
                        json.dumps(rec) if f == "record" and f not in rec else rec.get(f)
                        for f in self.fields
                    )
                )
            else:
                # a null/scalar entry among the records: PERMISSIVE means
                # it lands in the corrupt channel, never silently vanishes
                rows.append(
                    self._corrupt_row(json.dumps(rec), "non-object record entry")
                )
        return rows, len(records) == 0




class RestApiSimpleStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch STREAMING twin of the batch reader: ``spark.readStream
    .format("restapi")`` turns the polled REST endpoint into a Structured
    Streaming source whose offset is the upstream id high-water mark
    ``{"next_id": k}`` — the streaming-native form of the reference's
    scheduled re-run story (/root/reference/README.md:24-29): each trigger
    transfers only records with ``id >= next_id``, the checkpoint persists
    the offset durably, and a restarted query resumes EXACTLY where the
    committed offset left off (no re-delivery, no gap) with
    ``readBetweenOffsets`` replaying any uncommitted batch
    deterministically from the source.

    Scale/fidelity notes:
    - A SimpleDataSourceStreamReader runs driver-side by design (Spark
      prefetches on the driver and ships records to executors); the
      per-partition executor parallelism story belongs to the BATCH
      reader. This is the right shape for an offset-polling API head:
      one poller, many downstream tasks.
    - The same bounded-retry/backoff client as the batch reader fetches
      pages, so 429 + Retry-After handling (S4) is exercised on the
      streaming path too.
    - Offsets are upstream ids, not wall-clock: replays are exact and
      the source is immune to clock skew between poller and API.
    - With ``delta_param`` configured (an API query param meaning
      "records with id >= value"), each trigger asks the SERVER for the
      delta, so the per-batch transfer is O(new records), not O(history)
      — the client-side id filter stays on as a correctness net for
      servers that ignore the param. Without it, every trigger re-pages
      the full endpoint and filters locally: correct, but document that
      cost before pointing it at a large upstream.
    - Records without an integer ``id`` cannot be ordered against the
      offset and are SKIPPED (the batch reader's _corrupt_record channel
      is the landing path for malformed payloads; a streaming offset
      log cannot hold a row it cannot order).
    - REQUIRES append-only, monotonically assigned ids: ``read``
      advances the offset to max(id)+1, so a record later backfilled
      BELOW a committed high-water mark is permanently skipped. The
      "no re-delivery, no gap" guarantee above holds only under that
      assumption. For upstreams that backfill or assign ids out of
      order, use the BATCH reader on a schedule (full- or
      delta-window re-extract) instead of this offset-polling source.
    - ``Trigger.AvailableNow`` falls back to single-batch execution for
      Python streaming sources (Spark logs this); with id-ordered
      offsets the fallback is correct here — each run drains everything
      past the committed offset in one batch and commits.
    """

    def __init__(self, schema: StructType, options: dict):
        self.fields = [f.name for f in schema.fields]
        self.base_url = options["base_url"]
        self.delta_param = options.get("delta_param")
        # same runaway-pagination bound as the batch reader: a server that
        # ignores the page param must hang the poller with a clear error,
        # not loop the driver to OOM
        self.max_pages = int(options.get("max_pages", 10000))
        self.client = _HttpClient(options, resolve_auth_headers(options))

    def initialOffset(self) -> dict:
        return {"next_id": 0}

    def _fetch_from(self, lo: int) -> list[dict]:
        """Page through the endpoint; with ``delta_param`` the server
        filters to id >= lo and the transfer is the delta, not history.

        Page-shape contract mirrors the batch reader's ``_emit``
        (restapi.py ~:315): a malformed-JSON body, an error-shaped dict
        without ``data``, or a non-list payload RAISES instead of being
        treated as an exhausted page. The batch reader can route such
        pages to its corrupt-record channel; a streaming source cannot —
        a corrupt row has no id to order against the offset log, and
        silently truncating the page chain would (a) end the micro-batch
        early with no signal and (b) make ``readBetweenOffsets`` replay
        FEWER rows than the committed batch if the error page appears
        mid-replay. Failing the task instead lets Spark retry the batch
        against a recovered gateway with exactly-once semantics intact.
        A bare JSON-list body is a valid record page (same as batch);
        ``{"data": null}`` is the exhausted-page convention."""
        url = self.base_url
        sep = "&" if "?" in url else "?"
        if self.delta_param is not None:
            url = f"{url}{sep}{self.delta_param}={lo}"
            sep = "&"
        out: list[dict] = []
        for page in range(self.max_pages):
            body, parsed = self.client.get_json(f"{url}{sep}page={page}")
            if parsed is None:
                raise ValueError(
                    f"restapi stream: malformed JSON page: {body[:200]!r}"
                )
            if isinstance(parsed, dict):
                if "data" not in parsed:
                    raise ValueError(
                        "restapi stream: page payload has no 'data' field: "
                        f"{body[:200]!r}"
                    )
                recs = parsed["data"]
                if recs is None:
                    return out  # {"data": null}: exhausted, not an error
            else:
                recs = parsed
            if not isinstance(recs, list):
                raise ValueError(
                    f"restapi stream: page payload is not a record list: {body[:200]!r}"
                )
            # same fail-loud contract as the malformed-page shapes above: a
            # non-dict ENTRY is the server corrupting a record, and silently
            # dropping it would skew the committed offset log. NOTE: a JSON
            # null record parses to None, so None cannot be the not-found
            # sentinel here — it is one of the very shapes being rejected.
            _ok = object()
            bad = next((r for r in recs if not isinstance(r, dict)), _ok)
            if bad is not _ok:
                raise ValueError(
                    f"restapi stream: non-object record in page: {bad!r:.200}"
                )
            out.extend(recs)
            if not recs:
                return out
        raise RuntimeError(
            f"restapi stream: exceeded max_pages={self.max_pages} without an "
            "empty page — the server is ignoring pagination; raise max_pages "
            "only if the upstream is really that large"
        )

    @staticmethod
    def _rec_id(r: dict) -> int | None:
        rid = r.get("id")
        return rid if isinstance(rid, int) and not isinstance(rid, bool) else None

    def _rows(self, recs: list[dict]) -> Iterator[tuple]:
        # a LIST iterator, not a generator: Spark's driver-side prefetch
        # cache copy.copy()s the iterator it stores, and generators are
        # not copyable (the batch is bounded by the upstream delta anyway)
        return iter([tuple(r.get(f) for f in self.fields) for r in recs])

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        lo = int(start["next_id"])
        # client-side filter stays on even with server-side delta: a server
        # that ignores delta_param must not re-deliver committed records
        recs = [
            r
            for r in self._fetch_from(lo)
            if self._rec_id(r) is not None and self._rec_id(r) >= lo
        ]
        nxt = max((self._rec_id(r) for r in recs), default=lo - 1) + 1
        return self._rows(recs), {"next_id": max(nxt, lo)}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        lo, hi = int(start["next_id"]), int(end["next_id"])
        return self._rows(
            [
                r
                for r in self._fetch_from(lo)
                if self._rec_id(r) is not None and lo <= self._rec_id(r) < hi
            ]
        )

    def commit(self, end: dict) -> None:
        # offsets are derived from upstream ids; nothing to release
        pass


class RestApiDataSource(DataSource):
    """``spark.read.format("restapi")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "restapi"

    def schema(self) -> str | StructType:
        # user-pinned DDL, else the raw-JSON landing schema (normalize later
        # with from_json — schema inference over HTTP would re-fetch pages)
        return self.options.get("schema_ddl", "record string")

    def reader(self, schema: StructType) -> RestApiReader:
        return RestApiReader(schema, dict(self.options))

    def simpleStreamReader(self, schema: StructType) -> RestApiSimpleStreamReader:
        return RestApiSimpleStreamReader(schema, dict(self.options))
