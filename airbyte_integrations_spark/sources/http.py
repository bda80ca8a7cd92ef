"""Paginated HTTP/API source: the reference's single most used source
class, re-expressed Spark-first.

Reference parity (public airbyte-cdk):
- ``HttpStream`` read loop — pagination via next_page_token until
  exhausted, request_params/request_headers per page
  (airbyte-cdk/python/airbyte_cdk/sources/streams/http/http.py:70-454).
- Retry policy — retry 429 and 5xx with exponential backoff (factor *
  2^tries) capped, honor a server ``Retry-After`` on 429, GIVE UP
  immediately on any other 4xx, max_retries attempts then fail
  (rate_limiting.py:1-77: default_backoff_handler.should_give_up +
  user_defined_backoff_handler.sleep_on_ratelimit).
- Incremental slices — a sync is a list of bounded cursor windows;
  each slice is an independent read checkpointed on completion, and
  two sequential reads must only produce records at-or-above the first
  read's final state (source_acceptance_test/tests/
  test_incremental.py:112-207).

Spark-first dataflow (NOT the CDK's driver-side record iterator):
- slices are the unit of DISTRIBUTION: ``read_http_stream`` ships the
  slice list to executors (one task per slice via mapInPandas), each
  task runs its own pagination+backoff loop and yields Arrow batches
  of raw record JSON — records never pass through the driver.
- record parsing stays JVM-side: the task emits JSON strings and the
  plan applies ``from_json(record_schema)`` (Catalyst, codegen) —
  the only Python in the path is the HTTP I/O itself.
- incremental sync reuses the engine's epoch-keyed idempotent MERGE:
  epoch key ``http:<from_lsn>`` with from/to lsn meta (the jdbc_sync
  convention), one STATE message per committed slice — kill anywhere
  and re-run converges (committed slices are epoch no-ops, the
  interrupted slice re-fetches under the same epoch key).

Auth: headers (e.g. Authorization) ride in the config; they are never
logged or embedded in error messages (connector.mask_secrets is the
check()-level guard).
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.parse
import urllib.request
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from airbyte_integrations_spark.config import SyncConfig
from airbyte_integrations_spark.connector import state_message
from airbyte_integrations_spark.lakehouse.merge import merge_into
from airbyte_integrations_spark.lakehouse.table import LakeTable
from airbyte_integrations_spark.sources.jdbc import as_change_events


@dataclass(frozen=True)
class HttpStreamConfig:
    """One API stream (HttpStream analogue). Pagination modes:
    - "offset": ?<page_param>=<n_records_so_far>&<size_param>=<page_size>
    - "page":   ?<page_param>=<page_number>&<size_param>=<page_size>
    - "token":  first request bare; then ?<page_param>=<token> where the
      token is response[next_token_field] (None/absent = last page)
    - "url":    first request bare; then follow the absolute next link
      in response[next_token_field] until absent (Link-style paging)
    records_field: key of the record list in the response body (None =
    the body IS the list). A short page (< page_size) or an absent/empty
    list ends offset/page pagination.

    next_token_field accepts a DOTTED path into the body
    ("metadata.next_cursor") — the InterpolatedPaginator's
    decoded_response namespace (declarative/requesters/paginators/
    interpolated_paginator.py:21-29) restricted to field paths.

    token_in_header: read the next token/url from this RESPONSE HEADER
    instead of the body (the reference paginator's ``headers``
    namespace). The special value "Link" parses RFC5988 web linking
    (GitHub-style ``Link: <url>; rel="next"``).

    stop_condition: optional callable ``(body, headers, last_records)
    -> bool`` checked after every page; True ends the read. For
    offset/page modes it REPLACES the short-page rule (the reference's
    ConditionalPaginator: conditional_paginator.py:13-41, where a
    boolean template over decoded_response/headers/last_records is the
    only terminator)."""

    url_base: str
    path: str = ""
    params: dict = field(default_factory=dict)
    headers: dict = field(default_factory=dict)  # auth lives here; never logged
    records_field: str | None = "data"
    page_size: int = 100
    pagination: str = "offset"  # offset | page | token | url
    page_param: str = "offset"
    size_param: str = "limit"
    next_token_field: str | None = "next_page_token"
    max_retries: int = 5
    retry_factor: float = 5.0
    backoff_cap: float = 600.0
    timeout: float = 30.0
    auth: "Oauth2Authenticator | None" = None  # refresh-token flow
    # POST/search-style APIs (HttpStream.http_method http.py:89 +
    # request_body_json http.py:180-189): body_json is a static JSON
    # body; params_in_body routes the per-page params (slice window +
    # paging) into the JSON body instead of the query string — the
    # shape of search endpoints that page via POST
    http_method: str = "GET"
    body_json: dict | None = None
    params_in_body: bool = False
    token_in_header: str | None = None
    stop_condition: object | None = None  # callable(body, headers, records) -> bool
    # Error-handling knobs beyond the default policy (the reference's
    # per-connector should_retry/backoff_time overrides):
    # - retry_on_status: EXTRA retryable codes — connectors widen the
    #   retry set beyond 429/5xx (source-github streams.py:63-66 retries
    #   specific codes and rate-limit-header states)
    # - backoff_strategy "constant": fixed wait between tries
    # - backoff_strategy "wait_time_from_header": the server names the
    #   wait in a response header (source-freshdesk streams.py:47
    #   Retry-After-as-backoff_time; source-github streams.py:74-90
    #   Retry-After / X-RateLimit-Reset); absent header falls back to
    #   exponential. An explicit Retry-After on a 429 always wins.
    # - backoff_strategy "wait_until_time_from_header": the header is an
    #   ABSOLUTE unix epoch to resume at (source-github streams.py:80-91
    #   X-RateLimit-Reset: wait reset_time - now, floored at
    #   backoff_min_wait so clock skew never yields a negative sleep)
    retry_on_status: tuple = ()
    backoff_strategy: str = "exponential"  # exponential | constant | wait_time_from_header | wait_until_time_from_header
    backoff_time: float = 5.0  # seconds, for "constant"
    backoff_wait_header: str | None = None  # for "wait_*_from_header"
    backoff_min_wait: float = 0.0  # floor for "wait_until_time_from_header"


class Oauth2Authenticator:
    """OAuth2 refresh-token flow (reference parity: airbyte-cdk
    requests_native_auth/oauth.py Oauth2Authenticator): POSTs
    {grant_type: refresh_token, client_id, client_secret,
    refresh_token} to the token endpoint when the cached access token
    has expired (expires_in-driven, PREEMPTIVE — the CDK never waits
    for a 401), then attaches Authorization: Bearer <token>.

    Executor note: the instance pickles into read_http_stream tasks
    with an empty token cache, so each task refreshes independently —
    correct (tokens are per-client, not per-process) and bounded (one
    refresh per task per expiry window). Credentials never appear in
    logs or error messages."""

    def __init__(
        self,
        token_refresh_endpoint: str,
        client_id: str,
        client_secret: str,
        refresh_token: str,
        scopes: list | None = None,
        access_token_name: str = "access_token",
        expires_in_name: str = "expires_in",
    ):
        self.token_refresh_endpoint = token_refresh_endpoint
        self.client_id = client_id
        self.client_secret = client_secret
        self.refresh_token = refresh_token
        self.scopes = scopes
        self.access_token_name = access_token_name
        self.expires_in_name = expires_in_name
        self._access_token: str | None = None
        self._expires_at: float = 0.0  # epoch seconds; 0 = expired

    def token_has_expired(self) -> bool:
        return time.time() > self._expires_at

    def get_refresh_request_body(self) -> dict:
        payload = {
            "grant_type": "refresh_token",
            "client_id": self.client_id,
            "client_secret": self.client_secret,
            "refresh_token": self.refresh_token,
        }
        if self.scopes:
            payload["scopes"] = self.scopes
        return payload

    def refresh_access_token(self) -> tuple[str, float]:
        data = urllib.parse.urlencode(self.get_refresh_request_body()).encode()
        req = urllib.request.Request(
            self.token_refresh_endpoint,
            data=data,
            headers={"Content-Type": "application/x-www-form-urlencoded"},
            method="POST",
        )
        try:
            with urllib.request.urlopen(req, timeout=30) as resp:
                body = json.loads(resp.read().decode("utf-8"))
            return body[self.access_token_name], float(body[self.expires_in_name])
        except Exception as e:
            # never echo the request body (it carries the client secret)
            raise HttpGiveUpError(-1, self.token_refresh_endpoint,
                                  f"token refresh failed: {type(e).__name__}")

    def get_access_token(self) -> str:
        if self.token_has_expired():
            t0 = time.time()
            token, expires_in = self.refresh_access_token()
            self._access_token = token
            self._expires_at = t0 + expires_in
        return self._access_token

    def get_auth_header(self) -> dict:
        return {"Authorization": f"Bearer {self.get_access_token()}"}

    def __getstate__(self):
        # ship credentials, not the token cache (each task refreshes)
        d = dict(self.__dict__)
        d["_access_token"] = None
        d["_expires_at"] = 0.0
        return d


class MultipleTokenAuthenticator:
    """Round-robin over a token pool, one token per REQUEST (reference
    parity: airbyte-cdk streams/http/auth/token.py:26-34
    MultipleTokenAuthenticator — source-github's rate-limit spreading:
    each request draws the next token, so a pool of N tokens gets N
    times the per-token rate limit). Fits the same ``cfg.auth`` slot as
    Oauth2Authenticator: get_auth_header() is consulted per request.

    Executor note: the rotation index ships at 0 and advances per task
    independently — rotation is a rate-spreading heuristic, not a
    correctness contract, and per-task round-robin spreads load the
    same way the reference's per-process cycle() does. Tokens never
    appear in logs or error messages."""

    def __init__(
        self,
        tokens: list,
        auth_method: str = "Bearer",
        auth_header: str = "Authorization",
    ):
        if not tokens:
            raise ValueError("MultipleTokenAuthenticator needs >=1 token")
        self._tokens = list(tokens)
        self.auth_method = auth_method
        self.auth_header = auth_header
        self._i = 0

    def get_auth_header(self) -> dict:
        tok = self._tokens[self._i % len(self._tokens)]
        self._i += 1
        return {self.auth_header: f"{self.auth_method} {tok}"}

    def __getstate__(self):
        d = dict(self.__dict__)
        d["_i"] = 0  # each task starts its own rotation
        return d


class HttpGiveUpError(RuntimeError):
    """Non-retryable HTTP failure (4xx other than 429, or retries
    exhausted). The status code is in .status; the message never
    embeds request headers."""

    def __init__(self, status: int, url: str, detail: str = ""):
        self.status = status
        super().__init__(f"HTTP {status} for {url}: {detail[:200]}")


def _get_json(url: str, cfg: HttpStreamConfig, opener=None, body: dict | None = None):
    """One request with the reference retry policy: 429/5xx/connection
    errors retry with capped exponential backoff (Retry-After wins on
    429 — the user-defined backoff arm), any other 4xx gives up
    immediately, max_retries retries then give up. ``body`` (a dict)
    is sent as a JSON POST body (request_body_json, http.py:180-189).
    Returns ``(parsed_body, response_headers)`` — headers feed the
    paginator's ``headers`` namespace (interpolated_paginator.py:24)."""
    open_fn = opener or urllib.request.urlopen
    tries = 0
    while True:
        try:
            hdrs = dict(cfg.headers)
            if cfg.auth is not None:
                hdrs.update(cfg.auth.get_auth_header())
            data = None
            if body is not None or cfg.http_method != "GET":
                data = json.dumps(body or {}, sort_keys=True).encode("utf-8")
                hdrs["Content-Type"] = "application/json"
            req = urllib.request.Request(
                url, data=data, headers=hdrs, method=cfg.http_method
            )
            with open_fn(req, timeout=cfg.timeout) as resp:
                resp_headers = dict(getattr(resp, "headers", None) or {})
                return json.loads(resp.read().decode("utf-8")), resp_headers
        except urllib.error.HTTPError as e:
            status = e.code
            retry_after = e.headers.get("Retry-After") if e.headers else None
            err_body = ""  # NOT `body` — that's the request body a retry resends
            try:
                err_body = e.read().decode("utf-8", "replace")
            except Exception:
                pass
            if (
                status != 429
                and status not in cfg.retry_on_status
                and 400 <= status < 500
            ):
                raise HttpGiveUpError(status, url, err_body)  # non-rate-limit 4xx: no retry
            if tries >= cfg.max_retries:
                raise HttpGiveUpError(status, url, f"retries exhausted: {err_body}")
            wait = None
            if status == 429 and retry_after is not None:
                wait = float(retry_after)  # user-defined backoff arm
            elif cfg.backoff_strategy == "wait_time_from_header":
                hv = (
                    e.headers.get(cfg.backoff_wait_header or "Retry-After")
                    if e.headers
                    else None
                )
                if hv is not None:
                    wait = float(hv)
            elif cfg.backoff_strategy == "wait_until_time_from_header":
                hv = (
                    e.headers.get(cfg.backoff_wait_header or "X-RateLimit-Reset")
                    if e.headers
                    else None
                )
                if hv is not None:
                    wait = max(float(hv) - time.time(), cfg.backoff_min_wait)
            elif cfg.backoff_strategy == "constant":
                wait = cfg.backoff_time
            if wait is None:  # default arm, and header-absent fallback
                wait = cfg.retry_factor * (2**tries)
            time.sleep(min(wait, cfg.backoff_cap))
            tries += 1
        except (urllib.error.URLError, TimeoutError, ConnectionError) as e:
            # transient transport errors: default exponential backoff
            if tries >= cfg.max_retries:
                raise HttpGiveUpError(-1, url, f"retries exhausted: {e}")
            time.sleep(min(cfg.retry_factor * (2**tries), cfg.backoff_cap))
            tries += 1


def _walk(obj, dotted: str):
    """Dotted field-path walk into nested dicts; None on any miss."""
    cur = obj
    for part in dotted.split("."):
        if not isinstance(cur, dict):
            return None
        cur = cur.get(part)
    return cur


def _select_records(body, records_field: str | None):
    """Resolve the record list inside a response body. None = the body
    IS the list; a dotted path ("response.results") walks nested
    objects — the engine's analogue of the reference's jq record
    selector (declarative/extractors/jq.py: pyjq over the decoded
    body), restricted to the field-path shapes connectors actually use."""
    if records_field is None:
        # body IS the record list — or, for a dict body, the body is
        # ONE record (source-exchange-rates parse_response yields the
        # whole response json: source_exchange_rates/source.py:49-51)
        if isinstance(body, list):
            return body
        return [body] if isinstance(body, dict) else []
    cur = _walk(body, records_field)
    return cur if isinstance(cur, list) else []


def _parse_link_next(link_header: str | None) -> str | None:
    """RFC5988 ``Link`` header -> the rel="next" target url (the
    GitHub/GitLab pagination shape the reference's NextPageUrlPaginator
    consumes)."""
    if not link_header:
        return None
    for part in link_header.split(","):
        seg = part.split(";")
        if len(seg) < 2:
            continue
        url = seg[0].strip()
        if not (url.startswith("<") and url.endswith(">")):
            continue
        for attr in seg[1:]:
            k, _, v = attr.strip().partition("=")
            if k == "rel" and v.strip('"').strip("'") == "next":
                return url[1:-1]
    return None


def _next_token(cfg: HttpStreamConfig, body, headers) -> object | None:
    """Next token/url per the configured extraction source: a response
    header (Link-aware) or a dotted body path."""
    if cfg.token_in_header is not None:
        raw = None
        for k, v in headers.items():
            if k.lower() == cfg.token_in_header.lower():
                raw = v
                break
        if cfg.token_in_header.lower() == "link":
            return _parse_link_next(raw)
        return raw or None
    if cfg.next_token_field is None or not isinstance(body, dict):
        return None
    return _walk(body, cfg.next_token_field)


def fetch_records(cfg: HttpStreamConfig, extra_params: dict | None = None, opener=None):
    """The HttpStream.read_records pagination loop for ONE slice:
    yields record dicts until next_page_token is exhausted. Runs
    wherever it is called — on an executor inside read_http_stream's
    tasks, or driver-side in tests.

    extra_params may carry the reserved key ``__path__``: a per-slice
    request path overriding cfg.path (substream slices interpolate the
    parent record into the path, declarative.py); it is never sent as
    a query parameter."""
    base = cfg.url_base.rstrip("/")
    static = {**cfg.params, **(extra_params or {})}
    eff_path = static.pop("__path__", cfg.path)
    path = ("/" + eff_path.lstrip("/")) if eff_path else ""
    n_seen = 0
    page_no = 0
    token = None
    next_url = None
    while True:
        q = dict(static)
        if cfg.pagination == "offset":
            q[cfg.page_param] = n_seen
            q[cfg.size_param] = cfg.page_size
        elif cfg.pagination == "page":
            q[cfg.page_param] = page_no
            q[cfg.size_param] = cfg.page_size
        elif cfg.pagination == "token":
            if token is not None:
                q[cfg.page_param] = token
        elif cfg.pagination == "url":
            pass  # first request plain; later requests follow next_url
        else:
            raise ValueError(f"unknown pagination mode {cfg.pagination!r}")
        req_body = cfg.body_json
        if cfg.params_in_body:
            # search-style POST API: per-page params ride in the JSON
            # body, not the query string (request_body_json)
            req_body = {**(cfg.body_json or {}), **q}
            q = {}
        if cfg.pagination == "url" and next_url is not None:
            url = next_url  # server-provided absolute next link
        else:
            qs = f"?{urllib.parse.urlencode(q)}" if q else ""
            url = f"{base}{path}{qs}"
        body, resp_headers = _get_json(url, cfg, opener=opener, body=req_body)
        records = _select_records(body, cfg.records_field)
        for r in records:
            yield r
        n_seen += len(records)
        page_no += 1
        if cfg.stop_condition is not None:
            # ConditionalPaginator: the boolean over decoded_response/
            # headers/last_records is the terminator — a full final
            # page never triggers a wasted empty-page request. An empty
            # page still ends the read (never loop on an exhausted
            # server whose condition mis-fires).
            if cfg.stop_condition(body, resp_headers, records) or not records:
                return
        if cfg.pagination == "token":
            token = _next_token(cfg, body, resp_headers)
            if token is None:
                return
        elif cfg.pagination == "url":
            # link-driven: terminate when the server stops sending a
            # next link (page size plays no termination role)
            next_url = _next_token(cfg, body, resp_headers)
            if not next_url:
                return
        else:
            if cfg.stop_condition is None and len(records) < cfg.page_size:
                return


def read_http_stream(
    spark: SparkSession,
    cfg: HttpStreamConfig,
    slices: list[dict] | None,
    record_schema: T.StructType,
    slice_col: str | None = None,
    slice_meta: list[dict] | None = None,
) -> DataFrame:
    """Distributed paginated read: one executor task per slice, each
    running its own pagination/backoff loop; records leave the task as
    raw JSON strings and are parsed JVM-side with from_json (the only
    Python work is the HTTP I/O). `slices` is a list of extra-param
    dicts (time windows, shards, ...); None means one unsliced read.
    With slice_col, the originating slice's JSON rides along; when
    slice_meta is given (parallel to slices), that LOGICAL slice dict
    is what rides — the declarative path passes the stream_slice
    namespace here while `slices` carries the concrete request params
    derived from it."""
    import pandas as pd

    eff = slices or [{}]
    meta = slice_meta if slice_meta is not None else eff
    if len(meta) != len(eff):
        raise ValueError("slice_meta must parallel slices")
    sl = [
        json.dumps({"params": s, "meta": m}, sort_keys=True)
        for s, m in zip(eff, meta)
    ]
    sdf = spark.createDataFrame([(s,) for s in sl], "slice_json string").repartition(
        len(sl), "slice_json"
    )

    def fetch(batches):
        for pdf in batches:
            for sj in pdf["slice_json"]:
                obj = json.loads(sj)
                recs = [
                    json.dumps(r, sort_keys=True)
                    for r in fetch_records(cfg, obj["params"])
                ]
                yield pd.DataFrame(
                    {
                        "slice_json": json.dumps(obj["meta"], sort_keys=True),
                        "record_json": recs,
                    }
                )

    raw = sdf.mapInPandas(
        fetch, "slice_json string, record_json string"
    )
    parsed = raw.select(
        F.from_json("record_json", record_schema).alias("r"),
        F.col("slice_json"),
    )
    cols = [F.col("r." + f.name).alias(f.name) for f in record_schema.fields]
    if slice_col:
        cols.append(F.col("slice_json").alias(slice_col))
    return parsed.select(*cols)


def plan_window_slices(
    from_lsn: int | None, to_lsn: int, width: int
) -> list[tuple[int, int]]:
    """Half-open cursor windows (lo, hi] above the watermark up to the
    sync's fixed target position — deterministic in (watermark,
    to_lsn, width), so a crashed-and-restarted run re-plans identical
    slices (the target-position-at-start rule the CDC path uses)."""
    start = from_lsn if from_lsn is not None else -1
    out, cur = [], start
    while cur < to_lsn:
        to = min(cur + width, to_lsn)
        out.append((cur, to))
        cur = to
    return out


def sync_http_incremental(
    spark: SparkSession,
    cfg: HttpStreamConfig,
    table: LakeTable,
    config: SyncConfig,
    record_schema: T.StructType,
    key_col: str,
    cursor_col: str,
    to_lsn: int,
    slice_width: int = 1_000_000,
    since_param: str = "since",
    until_param: str = "until",
    updated_at_col: str | None = None,
    deleted_at_col: str | None = None,
    max_slices: int | None = None,
    seed_lsn: int | None = None,
) -> list[dict]:
    """Incremental HTTP sync: cursor windows above the durable
    watermark, one epoch-keyed idempotent MERGE + one STATE message per
    slice (the per-slice checkpoint cadence of jdbc_sync; acceptance
    semantics per source_acceptance_test test_incremental.py:112-207 —
    a second read starts strictly above the first read's committed
    cursor). The API receives the window as ?since=<lo>&until=<hi>
    (half-open: since exclusive, until inclusive — the server filters
    cursor > since AND cursor <= until).

    Kill at any point and re-run: committed slices are epoch no-ops,
    the interrupted slice re-fetches under the same epoch key, and the
    watermark advances only on durable commit."""
    wm = table.watermark(config.stream)
    if wm is None:
        # fresh destination + incoming state document: start past the
        # seeded cursor (the _seed_state convention of the catalog loop)
        wm = seed_lsn
    slices = plan_window_slices(wm, to_lsn, slice_width)
    if max_slices is not None:
        slices = slices[:max_slices]
    messages: list[dict] = []
    for lo, hi in slices:
        epoch = f"http:{lo}"
        if table.is_epoch_committed(config.stream, epoch):
            continue
        batch = read_http_stream(
            spark, cfg, [{since_param: lo, until_param: hi}], record_schema
        )
        events = as_change_events(
            batch,
            key_col=key_col,
            cursor_col=cursor_col,
            updated_at_col=updated_at_col,
            deleted_at_col=deleted_at_col,
        )
        merge_into(
            table,
            events,
            stream=config.stream,
            epoch=epoch,
            epoch_meta={"from_lsn": lo, "to_lsn": hi},
            cursor="_ab_cdc_lsn",
            secondary=config.secondary_order,
            mode=config.write_mode,
            dedup_impl=config.dedup_impl,
            key=config.primary_key,
            n_buckets=config.n_buckets,
        )
        # per-slice checkpoint cadence: STATE after the durable commit
        messages.append(state_message(table, config.stream))
    return messages
