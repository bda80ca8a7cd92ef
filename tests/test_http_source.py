"""HTTP/API incremental source against a LIVE local fixture server:
pagination (offset + token), 429 retry with Retry-After, give-up on
other 4xx, distributed slice fan-out, per-slice STATE cadence,
two-sequential-reads acceptance, and mid-sync resume.

Reference semantics: airbyte-cdk http.py:70-454 (HttpStream read loop),
rate_limiting.py:1-77 (retry policy), source_acceptance_test
test_incremental.py:112-207 (sequential-read state contract)."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from airbyte_integrations_spark.config import SyncConfig
from airbyte_integrations_spark.lakehouse.table import LakeTable
from airbyte_integrations_spark.sources.http import (
    HttpGiveUpError,
    HttpStreamConfig,
    Oauth2Authenticator,
    fetch_records,
    plan_window_slices,
    read_http_stream,
    sync_http_incremental,
)

RECORD_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("ver", T.LongType()),
        T.StructField("name", T.StringType()),
    ]
)


class _State:
    def __init__(self):
        self.rows: list[dict] = []
        self.requests: list[str] = []
        self.fail_429_remaining = 0
        self.fail_500_always = False
        self.tokens_issued: list[str] = []
        self.lock = threading.Lock()


def _make_handler(state: _State):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # silence
            pass

        def _json(self, code: int, body, headers=None):
            data = json.dumps(body).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            for k, v in (headers or {}).items():
                self.send_header(k, v)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            u = urlparse(self.path)
            q = {k: v[0] for k, v in parse_qs(u.query).items()}
            with state.lock:
                state.requests.append(self.path)
                if state.fail_429_remaining > 0:
                    state.fail_429_remaining -= 1
                    return self._json(429, {"error": "rate limited"},
                                      {"Retry-After": "0"})
            if state.fail_500_always:
                return self._json(500, {"error": "boom"})
            if u.path == "/items":
                rows = sorted(state.rows, key=lambda r: r["ver"])
                if "since" in q:
                    rows = [r for r in rows if r["ver"] > int(q["since"])]
                if "until" in q:
                    rows = [r for r in rows if r["ver"] <= int(q["until"])]
                off = int(q.get("offset", 0))
                lim = int(q.get("limit", 100))
                return self._json(200, {"data": rows[off : off + lim]})
            if u.path == "/tok":
                rows = sorted(state.rows, key=lambda r: r["ver"])
                off = int(q.get("cursor", 0))
                lim = 100
                page = rows[off : off + lim]
                body = {"data": page}
                if off + lim < len(rows):
                    body["next_page_token"] = off + lim
                return self._json(200, body)
            if u.path == "/secure":
                auth = self.headers.get("Authorization", "")
                with state.lock:
                    ok = state.tokens_issued and auth == f"Bearer {state.tokens_issued[-1]}"
                if not ok:
                    return self._json(401, {"error": "bad token"})
                rows = sorted(state.rows, key=lambda r: r["ver"])
                off = int(q.get("offset", 0))
                lim = int(q.get("limit", 100))
                return self._json(200, {"data": rows[off : off + lim]})
            return self._json(404, {"error": "no such endpoint"})

        def do_POST(self):
            u = urlparse(self.path)
            if u.path == "/token":
                with state.lock:
                    state.requests.append(self.path)
                    tok = f"tok{len(state.tokens_issued)}"
                    state.tokens_issued.append(tok)
                return self._json(200, {"access_token": tok, "expires_in": 3600})
            return self._json(404, {"error": "no such endpoint"})

    return Handler


@pytest.fixture()
def api(tmp_path):
    state = _State()
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(state))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_port}", state
    finally:
        srv.shutdown()


def _rows(n, start=1):
    return [{"id": f"k{i % 40}", "ver": i, "name": f"row-{i}"} for i in range(start, start + n)]


def _cfg(base, **kw):
    defaults = dict(
        url_base=base, path="items", records_field="data", page_size=100,
        pagination="offset", page_param="offset", size_param="limit",
        max_retries=3, retry_factor=0.01,
        headers={"Authorization": "Bearer test-token"},
    )
    defaults.update(kw)
    return HttpStreamConfig(**defaults)


def test_offset_pagination_reads_all_pages(api):
    base, state = api
    state.rows = _rows(250)
    got = list(fetch_records(_cfg(base)))
    assert len(got) == 250
    assert {r["ver"] for r in got} == set(range(1, 251))
    # 3 pages: 100 + 100 + 50 (short page ends pagination)
    assert len(state.requests) == 3


def test_token_pagination(api):
    base, state = api
    state.rows = _rows(230)
    cfg = _cfg(base, path="tok", pagination="token", page_param="cursor",
               next_token_field="next_page_token")
    got = list(fetch_records(cfg))
    assert len(got) == 230 and len(state.requests) == 3


def test_429_retries_with_retry_after_then_succeeds(api):
    base, state = api
    state.rows = _rows(50)
    state.fail_429_remaining = 2
    got = list(fetch_records(_cfg(base)))
    assert len(got) == 50
    assert len(state.requests) == 3  # 2 rate-limited + 1 success


def test_non_429_4xx_gives_up_immediately(api):
    base, state = api
    cfg = _cfg(base, path="nope")
    with pytest.raises(HttpGiveUpError) as e:
        list(fetch_records(cfg))
    assert e.value.status == 404
    assert len(state.requests) == 1  # NO retries on a plain 4xx


def test_5xx_retries_then_exhausts(api):
    base, state = api
    state.rows = _rows(10)
    state.fail_500_always = True
    with pytest.raises(HttpGiveUpError) as e:
        list(fetch_records(_cfg(base)))
    assert e.value.status == 500
    assert len(state.requests) == 4  # initial + max_retries(3)


def test_auth_header_sent(api):
    base, state = api
    state.rows = _rows(5)
    seen = {}
    orig = _make_handler  # noqa: F841 (documentation of intent)
    # verify at the protocol level: the fixture echoes via request log;
    # instead assert by sending to an opener that records headers
    import urllib.request

    def opener(req, timeout=None):
        seen["auth"] = req.get_header("Authorization")
        return urllib.request.urlopen(req, timeout=timeout)

    list(fetch_records(_cfg(base), opener=opener))
    assert seen["auth"] == "Bearer test-token"


def test_distributed_read_matches_driver_side(spark, api):
    base, state = api
    state.rows = _rows(300)
    slices = [{"since": 0, "until": 150}, {"since": 150, "until": 300}]
    df = read_http_stream(spark, _cfg(base), slices, RECORD_SCHEMA)
    got = {(r["id"], r["ver"], r["name"]) for r in df.collect()}
    want = {(r["id"], r["ver"], r["name"]) for r in fetch_records(_cfg(base))}
    assert got == want and len(got) == 300


def test_plan_window_slices_deterministic():
    assert plan_window_slices(None, 10, 4) == [(-1, 3), (3, 7), (7, 10)]
    assert plan_window_slices(100, 100, 10) == []
    assert plan_window_slices(3, 10, 4) == plan_window_slices(3, 10, 4)


def test_incremental_sync_state_per_slice_and_sequential_reads(spark, api, tmp_path):
    base, state = api
    state.rows = _rows(120)
    table = LakeTable(spark, str(tmp_path / "lake"))
    cfg = SyncConfig(stream="items", n_buckets=4)
    msgs = sync_http_incremental(
        spark, _cfg(base), table, cfg, RECORD_SCHEMA,
        key_col="id", cursor_col="ver", to_lsn=120, slice_width=50,
    )
    # one STATE per committed slice: (-1,49],(49,99],(99,120]
    assert len(msgs) == 3
    assert table.watermark("items") == 120
    final = table.read()
    assert final.count() == 40  # one winner per id
    # winners carry the max ver per key
    assert final.agg(F.max("_ab_cdc_lsn")).first()[0] == 120

    # SECOND sequential read (acceptance: starts strictly above the
    # committed cursor, fetches only the new tail)
    state.rows = _rows(150)
    state.requests.clear()
    msgs2 = sync_http_incremental(
        spark, _cfg(base), table, cfg, RECORD_SCHEMA,
        key_col="id", cursor_col="ver", to_lsn=150, slice_width=50,
    )
    assert len(msgs2) == 1
    assert all("since=120" in r for r in state.requests)
    assert table.watermark("items") == 150
    assert table.read().count() == 40


def test_kill_and_resume_mid_sync_converges(spark, api, tmp_path):
    base, state = api
    state.rows = _rows(120)
    table = LakeTable(spark, str(tmp_path / "lake2"))
    cfg = SyncConfig(stream="items", n_buckets=4)
    # crash after slice 1
    msgs = sync_http_incremental(
        spark, _cfg(base), table, cfg, RECORD_SCHEMA,
        key_col="id", cursor_col="ver", to_lsn=120, slice_width=50,
        max_slices=1,
    )
    assert len(msgs) == 1 and table.watermark("items") == 49
    # resume: remaining slices apply, committed one is an epoch no-op
    sync_http_incremental(
        spark, _cfg(base), table, cfg, RECORD_SCHEMA,
        key_col="id", cursor_col="ver", to_lsn=120, slice_width=50,
    )
    assert table.watermark("items") == 120
    v = table.current_version()
    # full re-run at the same target: pure no-op
    msgs3 = sync_http_incremental(
        spark, _cfg(base), table, cfg, RECORD_SCHEMA,
        key_col="id", cursor_col="ver", to_lsn=120, slice_width=50,
    )
    assert msgs3 == [] and table.current_version() == v


def test_http_stream_through_read_catalog(spark, api, tmp_path):
    """kind='http' in the multi-stream catalog loop: an incremental API
    stream and a full-refresh API snapshot side by side."""
    from airbyte_integrations_spark.catalog_sync import (
        ConfiguredCatalog,
        ConfiguredStream,
        read_catalog,
        stream_table,
    )
    from airbyte_integrations_spark.config import DestinationSyncMode, SyncMode

    base, state = api
    state.rows = _rows(120)
    inc = ConfiguredStream(
        config=SyncConfig(stream="api_items", n_buckets=4),
        source={
            "kind": "http", "config": _cfg(base), "record_schema": RECORD_SCHEMA,
            "key_col": "id", "cursor_col": "ver", "to_lsn": 120, "slice_width": 60,
        },
    )
    snap = ConfiguredStream(
        config=SyncConfig(
            stream="api_snapshot",
            primary_key=("id",),
            sync_mode=SyncMode.FULL_REFRESH,
            destination_sync_mode=DestinationSyncMode.OVERWRITE,
            n_buckets=4,
        ),
        source={"kind": "http", "config": _cfg(base),
                "record_schema": RECORD_SCHEMA,
                "slices": [{"since": 0, "until": 60}, {"since": 60, "until": 120}]},
    )
    lake = str(tmp_path / "lake3")
    msgs = read_catalog(spark, ConfiguredCatalog(streams=(inc, snap)), lake)
    assert len(msgs) == 2
    t_inc = stream_table(spark, lake, "api_items")
    assert t_inc.read().count() == 40 and t_inc.watermark("api_items") == 120
    t_snap = stream_table(spark, lake, "api_snapshot")
    assert t_snap.read().count() == 120  # raw snapshot, all versions
    # re-run converges: incremental is an epoch no-op
    v = t_inc.current_version()
    read_catalog(spark, ConfiguredCatalog(streams=(inc, snap)), lake)
    assert t_inc.current_version() == v


def test_http_seed_state_fresh_table(spark, api, tmp_path):
    """A state document from another deployment seeds a FRESH http
    stream: the sync starts past the seeded cursor (the catalog loop's
    _seed_state convention)."""
    from airbyte_integrations_spark.catalog_sync import (
        ConfiguredCatalog,
        ConfiguredStream,
        read_catalog,
        stream_table,
    )

    base, state = api
    state.rows = _rows(150)
    inc = ConfiguredStream(
        config=SyncConfig(stream="seeded", n_buckets=4),
        source={
            "kind": "http", "config": _cfg(base), "record_schema": RECORD_SCHEMA,
            "key_col": "id", "cursor_col": "ver", "to_lsn": 150, "slice_width": 100,
        },
    )
    seed = {
        "type": "STATE",
        "state": {
            "state_type": "PER_STREAM",
            "streams": [{"name": "seeded", "state": {"lsn_watermark": 100}}],
        },
    }
    lake = str(tmp_path / "lakeseed")
    read_catalog(spark, ConfiguredCatalog(streams=(inc,)), lake, state=seed)
    t = stream_table(spark, lake, "seeded")
    # winners only — and every one strictly above the seeded cursor
    assert t.read().agg(F.min("_ab_cdc_lsn")).first()[0] > 100
    assert t.read().count() == 40  # all 40 keys appear in (100, 150]
    # the fixture only ever saw requests windowed above the seed
    item_reqs = [r for r in state.requests if "/items" in r]
    assert item_reqs and all("since=100" in r or "since=125" in r for r in item_reqs)
    assert t.watermark("seeded") == 150


def _oauth(base, **kw):
    return Oauth2Authenticator(
        token_refresh_endpoint=f"{base}/token",
        client_id="cid", client_secret="s3cret-client", refresh_token="rtok",
        **kw,
    )


def test_oauth_refresh_then_bearer(api):
    base, state = api
    state.rows = _rows(150)
    cfg = _cfg(base, path="secure", headers={}, auth=_oauth(base))
    got = list(fetch_records(cfg))
    assert len(got) == 150
    assert len(state.tokens_issued) == 1  # one refresh, reused across pages


def test_oauth_preemptive_reexpiry_refresh(api):
    import time as _t

    base, state = api
    state.rows = _rows(10)
    auth = _oauth(base)
    cfg = _cfg(base, path="secure", headers={}, auth=auth)
    list(fetch_records(cfg))
    auth._expires_at = _t.time() - 1  # simulate expiry
    list(fetch_records(cfg))
    assert len(state.tokens_issued) == 2  # preemptive refresh, never a 401


def test_oauth_refresh_failure_never_leaks_secret(api):
    base, state = api
    auth = Oauth2Authenticator(
        token_refresh_endpoint=f"{base}/no-such-token-endpoint",
        client_id="cid", client_secret="s3cret-client", refresh_token="rtok",
    )
    with pytest.raises(HttpGiveUpError) as e:
        auth.get_access_token()
    assert "s3cret-client" not in str(e.value) and "rtok" not in str(e.value)


def test_oauth_pickles_without_token_cache(api):
    import pickle

    base, state = api
    state.rows = _rows(5)
    auth = _oauth(base)
    cfg = _cfg(base, path="secure", headers={}, auth=auth)
    list(fetch_records(cfg))
    assert auth._access_token is not None
    clone = pickle.loads(pickle.dumps(auth))
    assert clone._access_token is None and clone._expires_at == 0.0
    assert clone.client_secret == "s3cret-client"  # credentials survive


# ---------------- POST body-json + next-URL pagination (http.py:89,
# :163-189 http_method/request_body_json; Link-style next pointers)


def test_post_search_api_params_in_body(api):
    """Search-style endpoint: POST with the page window in the JSON
    body (request_body_json), offset pagination."""
    import json as _json
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    import threading

    rows = _rows(230)
    seen_bodies = []

    class H(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            body = _json.loads(self.rfile.read(n).decode())
            seen_bodies.append(body)
            assert self.headers.get("Content-Type") == "application/json"
            rs = [r for r in rows if body.get("q") in r["name"]]
            off, lim = int(body["offset"]), int(body["limit"])
            data = _json.dumps({"data": rs[off : off + lim]}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        cfg = HttpStreamConfig(
            url_base=f"http://127.0.0.1:{srv.server_port}",
            path="search",
            http_method="POST",
            params_in_body=True,
            body_json={"q": "row-"},
            page_size=100,
            max_retries=2, retry_factor=0.01,
        )
        got = list(fetch_records(cfg))
        assert len(got) == 230
        # paging rode in the body, three pages: offsets 0/100/200
        assert [b["offset"] for b in seen_bodies] == [0, 100, 200]
        assert all(b["q"] == "row-" and b["limit"] == 100 for b in seen_bodies)
    finally:
        srv.shutdown()


def test_url_pagination_follows_next_links():
    """pagination='url': follow absolute next links until absent —
    termination is link-driven, page size plays no role."""
    import json as _json
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    import threading

    rows = _rows(95)  # 4 pages of 30 + final 5: short pages mid-stream
    pages = [rows[i : i + 30] for i in range(0, 95, 30)]

    class H(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            from urllib.parse import parse_qs, urlparse

            q = {k: v[0] for k, v in parse_qs(urlparse(self.path).query).items()}
            i = int(q.get("p", 0))
            body = {"data": pages[i]}
            if i + 1 < len(pages):
                body["next"] = (
                    f"http://127.0.0.1:{self.server.server_port}/feed?p={i + 1}"
                )
            data = _json.dumps(body).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        cfg = HttpStreamConfig(
            url_base=f"http://127.0.0.1:{srv.server_port}",
            path="feed",
            pagination="url",
            next_token_field="next",
            page_size=1000,  # deliberately larger than any page
            max_retries=2, retry_factor=0.01,
        )
        got = list(fetch_records(cfg))
        assert [r["ver"] for r in got] == [r["ver"] for r in rows]
    finally:
        srv.shutdown()


def test_parse_link_next_rfc5988():
    from airbyte_integrations_spark.sources.http import _parse_link_next

    h = ('<https://api.example/items?page=3>; rel="next", '
         '<https://api.example/items?page=9>; rel="last"')
    assert _parse_link_next(h) == "https://api.example/items?page=3"
    assert _parse_link_next('<https://x/>; rel="prev"') is None
    assert _parse_link_next(None) is None
    assert _parse_link_next("") is None


def test_nested_next_token_path():
    """next_token_field as a dotted path into the body — the
    InterpolatedPaginator decoded_response namespace restricted to
    field paths (interpolated_paginator.py:21-29)."""
    rows = _rows(70)

    class H(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            q = {k: v[0] for k, v in parse_qs(urlparse(self.path).query).items()}
            off = int(q.get("cursor", 0))
            page = rows[off : off + 30]
            body = {"data": page, "meta": {}}
            if off + 30 < len(rows):
                body["meta"]["next"] = off + 30
            data = json.dumps(body).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        cfg = HttpStreamConfig(
            url_base=f"http://127.0.0.1:{srv.server_port}", path="t",
            pagination="token", page_param="cursor",
            next_token_field="meta.next", max_retries=2, retry_factor=0.01,
        )
        got = list(fetch_records(cfg))
        assert [r["ver"] for r in got] == [r["ver"] for r in rows]
    finally:
        srv.shutdown()


def test_link_header_pagination():
    """token_in_header='Link': GitHub-style RFC5988 next links in the
    RESPONSE HEADER drive pagination (the reference paginator's
    ``headers`` namespace)."""
    rows = _rows(75)
    seen = []

    class H(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            seen.append(self.path)
            q = {k: v[0] for k, v in parse_qs(urlparse(self.path).query).items()}
            p = int(q.get("page", 1))
            page = rows[(p - 1) * 30 : p * 30]
            hdrs = {}
            if p * 30 < len(rows):
                nxt = f"http://127.0.0.1:{self.server.server_port}/gh?page={p + 1}"
                hdrs["Link"] = f'<{nxt}>; rel="next", <http://x/>; rel="last"'
            data = json.dumps(page).encode()  # body IS the list (GitHub shape)
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            for k, v in hdrs.items():
                self.send_header(k, v)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        cfg = HttpStreamConfig(
            url_base=f"http://127.0.0.1:{srv.server_port}", path="gh",
            pagination="url", token_in_header="Link", records_field=None,
            page_size=999, max_retries=2, retry_factor=0.01,
        )
        got = list(fetch_records(cfg))
        assert [r["ver"] for r in got] == [r["ver"] for r in rows]
        assert len(seen) == 3  # link-driven termination, no 4th request
    finally:
        srv.shutdown()


def test_stop_condition_replaces_short_page_rule():
    """ConditionalPaginator (conditional_paginator.py:13-41): the
    boolean over the decoded response terminates — a FULL final page
    makes no wasted empty-page request, and a short mid-stream page
    does NOT terminate."""
    rows = _rows(90)
    pages = [rows[0:40], rows[40:50], rows[50:90]]  # short page MID-stream
    n_req = []

    class H(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            q = {k: v[0] for k, v in parse_qs(urlparse(self.path).query).items()}
            p = int(q.get("page", 0))
            n_req.append(p)
            body = {"data": pages[p] if p < len(pages) else [],
                    "is_last": p >= len(pages) - 1}
            data = json.dumps(body).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        cfg = HttpStreamConfig(
            url_base=f"http://127.0.0.1:{srv.server_port}", path="c",
            pagination="page", page_param="page", size_param="limit",
            page_size=40, max_retries=2, retry_factor=0.01,
            stop_condition=lambda body, headers, recs: bool(body.get("is_last")),
        )
        got = list(fetch_records(cfg))
        assert [r["ver"] for r in got] == [r["ver"] for r in rows]
        assert n_req == [0, 1, 2]  # short page 1 kept going; full page 2 stopped
    finally:
        srv.shutdown()


def test_retried_post_resends_original_body():
    """Regression: a 429 mid-POST must retry with the ORIGINAL JSON
    body, not the error text (the `body` local must never clobber the
    request-body parameter)."""
    bodies = []
    fails = [2]

    class H(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            raw = self.rfile.read(int(self.headers.get("Content-Length", 0)))
            bodies.append(json.loads(raw))
            if fails[0] > 0:
                fails[0] -= 1
                data = json.dumps({"error": "slow down"}).encode()
                self.send_response(429)
                self.send_header("Retry-After", "0")
            else:
                data = json.dumps({"data": [{"id": "a", "ver": 1, "name": "x"}]}).encode()
                self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        cfg = HttpStreamConfig(
            url_base=f"http://127.0.0.1:{srv.server_port}", path="search",
            http_method="POST", params_in_body=True, page_size=10,
            max_retries=4, retry_factor=0.01,
        )
        got = list(fetch_records(cfg, {"q": "web"}))
        assert len(got) == 1
        assert len(bodies) == 3  # 2 failures + success
        assert all(b == bodies[0] for b in bodies), bodies
        assert bodies[0]["q"] == "web"
    finally:
        srv.shutdown()
