"""Declarative (low-code) manifest source: interpolation, datetime /
substream slicers, manifest -> streams, distributed parent->child read,
CheckStream, discover.

Reference semantics: airbyte-cdk sources/declarative/ —
declarative_stream.py:14-80, substream_slicer.py:16-66,
datetime_stream_slicer.py:16-103, extractors/jq.py, checks/.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from airbyte_integrations_spark.sources.declarative import (
    DatetimeStreamSlicer,
    DeclarativeSource,
    InterpolationError,
    SubstreamSlicer,
    interpolate,
    interpolate_mapping,
    parse_step,
    schema_from_json_schema,
)

ORGS = [
    {"org_id": 11, "org": "alpha"},
    {"org_id": 22, "org": "beta"},
    {"org_id": 33, "org": "empty-org"},
]
REPOS = {
    11: [{"repo_id": i, "org_id": 11, "stars": i * 10} for i in range(1, 8)],
    22: [{"repo_id": i, "org_id": 22, "stars": i} for i in range(100, 350)],
    33: [],
}
EVENTS = [
    {"ev_id": i, "day": f"2021-01-{i:02d}", "kind": "click"}
    for i in range(1, 11)
]


def _make_handler():
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _json(self, code, body):
            data = json.dumps(body).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            u = urlparse(self.path)
            q = {k: v[0] for k, v in parse_qs(u.query).items()}
            parts = [p for p in u.path.split("/") if p]
            off, lim = int(q.get("offset", 0)), int(q.get("limit", 100))
            if parts == ["orgs"]:
                return self._json(200, {"data": ORGS[off : off + lim]})
            if len(parts) == 3 and parts[0] == "orgs" and parts[2] == "repos":
                rows = REPOS.get(int(parts[1]), [])
                return self._json(200, {"data": rows[off : off + lim]})
            if parts == ["events"]:
                rows = [
                    e
                    for e in EVENTS
                    if q["start_date"] <= e["day"] <= q["end_date"]
                ]
                return self._json(
                    200, {"response": {"results": rows[off : off + lim]}}
                )
            return self._json(404, {"error": "no such endpoint"})

    return Handler


@pytest.fixture()
def api():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler())
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        yield f"http://127.0.0.1:{srv.server_port}"
    finally:
        srv.shutdown()


# ------------------------------------------------------- interpolation


def test_interpolate_passthrough_and_native():
    assert interpolate(7, config={}) == 7
    assert interpolate("plain", config={}) == "plain"
    # single-expression template returns the NATIVE value
    assert interpolate("{{ config.n }}", config={"n": 42}) == 42
    assert interpolate(
        "{{ parent_record['id'] }}", parent_record={"id": 9}
    ) == 9


def test_interpolate_mixed_string_and_nested():
    out = interpolate(
        "orgs/{{ stream_slice.org_id }}/repos",
        stream_slice={"org_id": 22},
    )
    assert out == "orgs/22/repos"
    assert (
        interpolate("{{ config.a.b }}", config={"a": {"b": "x"}}) == "x"
    )


def test_interpolate_unknown_namespace_raises():
    with pytest.raises(InterpolationError):
        interpolate("{{ nope.x }}", config={})
    with pytest.raises(InterpolationError):
        interpolate("{{ config.missing }}", config={})


def test_interpolate_none_chaining_and_mapping():
    # parent_record=None (empty parent slice): chained access gives None
    assert interpolate("{{ parent_record.id }}", parent_record=None) is None
    assert (
        interpolate("x={{ parent_record.id }}", parent_record=None) == "x="
    )
    m = interpolate_mapping(
        {"{{ config.k }}": "{{ config.v }}"}, config={"k": "key", "v": 5}
    )
    assert m == {"key": 5}


# ------------------------------------------------------------- slicers


def test_parse_step():
    import datetime

    assert parse_step("1w") == datetime.timedelta(weeks=1)
    assert parse_step("2d12h") == datetime.timedelta(days=2, hours=12)
    with pytest.raises(ValueError):
        parse_step("bogus")


def test_datetime_slicer_windows_and_state():
    sl = DatetimeStreamSlicer(
        start_time="{{ config.start }}",
        end_time="2021-01-10",
        step="1w",
        cursor_field="day",
        config={"start": "2021-01-01"},
    )
    # step windows: end_date = start + step - 1 day, truncated at end
    assert sl.stream_slices() == [
        {"start_date": "2021-01-01", "end_date": "2021-01-07"},
        {"start_date": "2021-01-08", "end_date": "2021-01-10"},
    ]
    # state moves the effective start forward
    assert sl.stream_slices({"day": "2021-01-08"}) == [
        {"start_date": "2021-01-08", "end_date": "2021-01-10"},
    ]
    # state past end -> no slices
    assert sl.stream_slices({"day": "2021-02-01"}) == []


def _source(base, manifest_extra=""):
    manifest = f"""
version: "0.1.0"
check:
  stream_names: [repos]
streams:
  - name: orgs
    requester:
      url_base: "{{{{ config.api_url }}}}"
      path: orgs
    record_selector: data
    primary_key: org_id
    json_schema:
      properties:
        org_id: {{type: integer}}
        org: {{type: string}}
  - name: repos
    requester:
      url_base: "{{{{ config.api_url }}}}"
      path: "orgs/{{{{ stream_slice.org_id }}}}/repos"
    record_selector: data
    primary_key: repo_id
    paginator: {{type: offset, page_size: 97}}
    slicer:
      type: substream
      parent_stream: orgs
      slice_definition:
        org_id: "{{{{ parent_record.org_id }}}}"
    json_schema:
      properties:
        repo_id: {{type: integer}}
        org_id: {{type: integer}}
        stars: {{type: integer}}
{manifest_extra}"""
    return DeclarativeSource.from_yaml(manifest, {"api_url": base})


def test_substream_slicer_slices_and_empty_parent(api):
    src = _source(api)
    slices = src.streams["repos"].stream_slices()
    # one slice per parent record; org 33 has repos=[] but is itself a
    # parent RECORD (not an empty parent slice), so it yields a slice
    assert slices == [{"org_id": 11}, {"org_id": 22}, {"org_id": 33}]


def test_substream_empty_parent_slice_emits_none_record(api):
    src = _source(api)
    # parent with NO records at all: the slicer still emits one slice
    # with parent_record=None (substream_slicer.py:56-60)
    empty_parent = src.streams["orgs"]
    empty_parent.requester = dict(
        empty_parent.requester, path="orgs/33/repos"
    )
    sl = SubstreamSlicer(
        parent=empty_parent,
        slice_definition={"org_id": "{{ parent_record.org_id }}"},
    )
    assert sl.stream_slices() == [{"org_id": None}]


# ------------------------------------------------- end-to-end manifest


def test_parent_child_read_distributed(spark, api):
    src = _source(api)
    df = src.streams["repos"].read(spark).orderBy("repo_id", "org_id")
    got = [r.asDict() for r in df.collect()]
    want = sorted(
        (r for rows in REPOS.values() for r in rows),
        key=lambda r: (r["repo_id"], r["org_id"]),
    )
    assert [
        {"repo_id": g["repo_id"], "org_id": g["org_id"], "stars": g["stars"]}
        for g in got
    ] == want
    # 250-repo org paginated with page_size 97 (not a divisor): the
    # equality above proves pagination across parents loses nothing


def test_datetime_sliced_stream_read(spark, api):
    manifest = {
        "streams": [
            {
                "name": "events",
                "requester": {
                    "url_base": "{{ config.api_url }}",
                    "path": "events",
                },
                "record_selector": "response.results",
                "cursor_field": "day",
                "request_params": {
                    "start_date": "{{ stream_slice.start_date }}",
                    "end_date": "{{ stream_slice.end_date }}",
                },
                "slicer": {
                    "type": "datetime",
                    "start_time": "2021-01-01",
                    "end_time": "2021-01-10",
                    "step": "3d",
                    "cursor_field": "day",
                },
                "json_schema": {
                    "properties": {
                        "ev_id": {"type": "integer"},
                        "day": {"type": "string"},
                        "kind": {"type": "string"},
                    }
                },
            }
        ]
    }
    src = DeclarativeSource(manifest, {"api_url": api})
    df = src.streams["events"].read(spark, slice_col="_slice")
    rows = [r.asDict() for r in df.collect()]
    # windows partition the range: every event exactly once
    assert sorted(r["ev_id"] for r in rows) == list(range(1, 11))
    assert len({r["_slice"] for r in rows}) == 4  # ceil(10/3) windows
    # incremental: state past most of the range reads only the tail
    df2 = src.streams["events"].read(
        spark, stream_state={"day": "2021-01-10"}
    )
    assert sorted(r["ev_id"] for r in df2.collect()) == [10]


def test_check_discover_and_errors(api):
    src = _source(api)
    ok, msg = src.check()
    assert ok, msg
    cat = src.discover()
    names = {c["name"]: c for c in cat}
    assert set(names) == {"orgs", "repos"}
    assert names["repos"]["source_defined_primary_key"] == "repo_id"
    assert "full_refresh" in names["repos"]["supported_sync_modes"]

    bad = DeclarativeSource(
        src.manifest, {"api_url": "http://127.0.0.1:1/nope"}
    )
    for s in bad.streams.values():
        s_cfg = s.http_config()
        assert s_cfg.max_retries == 5  # default policy reaches check
    # unreachable host: check fails with a typed message, no secrets
    bad_manifest = dict(src.manifest)
    src_bad = DeclarativeSource(bad_manifest, {"api_url": api + "/missing"})
    ok2, msg2 = src_bad.check()
    assert not ok2 and "repos" in msg2


def test_manifest_validation_errors(api):
    with pytest.raises(ValueError, match="declared BEFORE"):
        DeclarativeSource(
            {
                "streams": [
                    {
                        "name": "child",
                        "requester": {"url_base": api, "path": "x"},
                        "slicer": {
                            "type": "substream",
                            "parent_stream": "ghost",
                            "slice_definition": {},
                        },
                    }
                ]
            },
            {},
        )
    with pytest.raises(ValueError, match="unknown slicer"):
        DeclarativeSource(
            {
                "streams": [
                    {
                        "name": "s",
                        "requester": {"url_base": api},
                        "slicer": {"type": "wat"},
                    }
                ]
            },
            {},
        )


def test_schema_from_json_schema():
    from pyspark.sql import types as T

    st = schema_from_json_schema(
        {
            "properties": {
                "id": {"type": "integer"},
                "name": {"type": ["null", "string"]},
                "score": {"type": "number"},
                "flag": {"type": "boolean"},
                "tags": {"type": "array", "items": {"type": "string"}},
                "meta": {
                    "type": "object",
                    "properties": {"k": {"type": "integer"}},
                },
            }
        }
    )
    assert st["id"].dataType == T.LongType()
    assert st["name"].dataType == T.StringType()
    assert st["score"].dataType == T.DoubleType()
    assert st["flag"].dataType == T.BooleanType()
    assert st["tags"].dataType == T.ArrayType(T.StringType())
    assert isinstance(st["meta"].dataType, T.StructType)


# ------------------------------------------- incremental sync to lake


@pytest.fixture()
def ts_api():
    """Mutable timestamped-record API for the incremental sync tests:
    /recs?start_date=&end_date= filters by the record's day, paginated
    with offset/limit."""
    state = {"rows": []}

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            u = urlparse(self.path)
            q = {k: v[0] for k, v in parse_qs(u.query).items()}
            rows = sorted(state["rows"], key=lambda r: r["ts"])
            if "start_date" in q:
                rows = [
                    r
                    for r in rows
                    if q["start_date"] <= r["ts"][:10] <= q["end_date"]
                ]
            off, lim = int(q.get("offset", 0)), int(q.get("limit", 100))
            data = json.dumps({"data": rows[off : off + lim]}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        yield f"http://127.0.0.1:{srv.server_port}", state
    finally:
        srv.shutdown()


def _ts_manifest(end="2021-01-06"):
    return {
        "streams": [
            {
                "name": "recs",
                "requester": {
                    "url_base": "{{ config.api_url }}",
                    "path": "recs",
                },
                "record_selector": "data",
                "primary_key": "id",
                "cursor_field": "ts",
                "request_params": {
                    "start_date": "{{ stream_slice.start_date }}",
                    "end_date": "{{ stream_slice.end_date }}",
                },
                "slicer": {
                    "type": "datetime",
                    "start_time": "2021-01-01",
                    "end_time": end,
                    "step": "2d",
                    "cursor_field": "ts",
                },
                "json_schema": {
                    "properties": {
                        "id": {"type": "string"},
                        "ts": {"type": "string"},
                        "val": {"type": "integer"},
                    }
                },
            }
        ]
    }


def _ts_rows():
    # keys k0..k9 written on day 1, k0..k4 UPDATED on day 4 (same sync
    # range): latest-wins must keep the day-4 versions
    rows = [
        {"id": f"k{i}", "ts": f"2021-01-01 0{i % 5}:00:00", "val": i}
        for i in range(10)
    ]
    rows += [
        {"id": f"k{i}", "ts": f"2021-01-04 12:00:00", "val": 100 + i}
        for i in range(5)
    ]
    return rows


def test_declarative_incremental_sync_and_resume(spark, ts_api, tmp_path):
    from pyspark.sql import types as T

    from airbyte_integrations_spark.config import SyncConfig
    from airbyte_integrations_spark.lakehouse.table import LakeTable

    base, state = ts_api
    state["rows"] = _ts_rows()
    manifest = _ts_manifest()
    src = DeclarativeSource(manifest, {"api_url": base})
    # parse ts as a real timestamp so the cursor maps via unix_micros
    src.streams["recs"].json_schema = None
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("val", T.LongType()),
        ]
    )
    src.streams["recs"].spark_schema = lambda: schema

    table = LakeTable(spark, str(tmp_path / "lake"))
    cfg = SyncConfig(stream="recs", n_buckets=4)

    # crash after the first window
    msgs = src.sync_incremental(
        spark, "recs", table, cfg, key_col="id", cursor_col="ts",
        max_slices=1,
    )
    assert len(msgs) == 1
    # resume: windows re-plan from the advanced watermark's day — the
    # watermark window re-reads (dedup-exact via the > wm filter),
    # then the remaining range applies
    msgs2 = src.sync_incremental(
        spark, "recs", table, cfg, key_col="id", cursor_col="ts"
    )
    # (01-01..02) re-reads but every row is at-or-below the watermark
    # (dedup filter) -> no commit; (01-03..04) applies; the empty tail
    # (01-05..06) does NOT commit (max-seen state rule keeps it open
    # for late arrivals)
    assert len(msgs2) == 1
    final = {r["url"]: r["val"] for r in table.read().collect()}
    assert final == {
        **{f"k{i}": i for i in range(5, 10)},
        **{f"k{i}": 100 + i for i in range(5)},
    }

    # SECOND sequential sync: new records on a later day; only the
    # re-planned tail windows are read, watermark rows are filtered
    state["rows"] = _ts_rows() + [
        {"id": "k0", "ts": "2021-01-06 01:00:00", "val": 999},
        {"id": "knew", "ts": "2021-01-05 02:00:00", "val": 55},
    ]
    msgs3 = src.sync_incremental(
        spark, "recs", table, cfg, key_col="id", cursor_col="ts"
    )
    assert len(msgs3) >= 1
    final2 = {r["url"]: r["val"] for r in table.read().collect()}
    assert final2["k0"] == 999 and final2["knew"] == 55
    assert final2["k7"] == 7  # untouched keys survive

    # converged: a third run is a pure content no-op
    final3 = {r["url"]: r["val"] for r in table.read().collect()}
    src.sync_incremental(spark, "recs", table, cfg, key_col="id", cursor_col="ts")
    assert {r["url"]: r["val"] for r in table.read().collect()} == final3


def test_declarative_sync_requires_datetime_slicer(spark, ts_api, tmp_path):
    from airbyte_integrations_spark.config import SyncConfig
    from airbyte_integrations_spark.lakehouse.table import LakeTable

    base, _ = ts_api
    manifest = _ts_manifest()
    manifest["streams"][0].pop("slicer")
    src = DeclarativeSource(manifest, {"api_url": base})
    with pytest.raises(ValueError, match="datetime slicer"):
        src.sync_incremental(
            spark, "recs",
            LakeTable(spark, str(tmp_path / "lake2")),
            SyncConfig(stream="recs", n_buckets=4),
            key_col="id", cursor_col="ts",
        )


# --------------------------- reference connector as a manifest


def test_exchange_rates_connector_as_manifest(spark):
    """The reference's source-exchange-rates connector re-expressed as
    a declarative manifest (source_exchange_rates/source.py:17-81):
    path IS the slice date (path() returns stream_slice['date']),
    request_params carries access_key + base from config
    (source.py:41-47), parse_response yields the WHOLE response json
    as the single record (source.py:49-51 — record_selector: null),
    stream_slices = one day per slice (chunk_date_range)."""
    calls = []

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            u = urlparse(self.path)
            q = {k: v[0] for k, v in parse_qs(u.query).items()}
            calls.append((u.path, q.get("access_key"), q.get("base")))
            day = u.path.strip("/").split("/")[-1]
            body = {
                "success": True,
                "date": day,
                "base": q.get("base", "EUR"),
                "rates": {"USD": 1.1 + len(day) % 3, "GBP": 0.9},
            }
            data = json.dumps(body).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{srv.server_port}"
        manifest = {
            "streams": [
                {
                    "name": "exchange_rates",
                    "requester": {
                        "url_base": "{{ config.api_url }}/v1",
                        "path": "{{ stream_slice.start_date }}",
                    },
                    "record_selector": None,
                    "cursor_field": "date",
                    "request_params": {
                        "access_key": "{{ config.access_key }}",
                        "base": "{{ config.base }}",
                    },
                    "slicer": {
                        "type": "datetime",
                        "start_time": "{{ config.start_date }}",
                        "end_time": "2021-01-05",
                        "step": "1d",
                        "cursor_field": "date",
                    },
                    "json_schema": {
                        "properties": {
                            "date": {"type": "string"},
                            "base": {"type": "string"},
                            "rates": {
                                "type": "object",
                                "properties": {
                                    "USD": {"type": "number"},
                                    "GBP": {"type": "number"},
                                },
                            },
                        }
                    },
                }
            ]
        }
        src = DeclarativeSource(
            manifest,
            {
                "api_url": base,
                "access_key": "k-secret",
                "base": "EUR",
                "start_date": "2021-01-01",
            },
        )
        df = src.streams["exchange_rates"].read(spark)
        rows = sorted(
            (r.asDict(recursive=True) for r in df.collect()),
            key=lambda r: r["date"],
        )
        # one record per day slice, whole body as the record
        assert [r["date"] for r in rows] == [
            f"2021-01-0{d}" for d in range(1, 6)
        ]
        assert all(r["base"] == "EUR" for r in rows)
        assert all(r["rates"]["GBP"] == 0.9 for r in rows)
        # the API saw the date AS THE PATH + config-sourced params
        seen_paths = sorted(p for p, _, _ in calls)
        assert seen_paths == [f"/v1/2021-01-0{d}" for d in range(1, 6)]
        assert all(k == "k-secret" and b == "EUR" for _, k, b in calls)
    finally:
        srv.shutdown()


def test_declarative_streams_through_read_catalog(spark, ts_api, api, tmp_path):
    """kind='declarative' in the multi-stream catalog loop: an
    incremental manifest stream (datetime windows, max-seen state) and
    a full-refresh substream snapshot side by side."""
    from pyspark.sql import types as T

    from airbyte_integrations_spark.catalog_sync import (
        ConfiguredCatalog,
        ConfiguredStream,
        read_catalog,
        stream_table,
    )
    from airbyte_integrations_spark.config import (
        DestinationSyncMode,
        SyncConfig,
        SyncMode,
    )

    ts_base, state = ts_api
    state["rows"] = _ts_rows()
    rec_schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("val", T.LongType()),
        ]
    )
    inc = ConfiguredStream(
        config=SyncConfig(stream="recs", n_buckets=4),
        source={
            "kind": "declarative",
            "manifest": _ts_manifest(),
            "config": {"api_url": ts_base},
            "stream": "recs",
            "record_schema": rec_schema,
            "key_col": "id",
            "cursor_col": "ts",
        },
    )
    # full-refresh: the substream (parent->child) repos stream
    repos_manifest = _source(api).manifest
    snap = ConfiguredStream(
        config=SyncConfig(
            stream="repos_snapshot",
            primary_key=("repo_id",),
            sync_mode=SyncMode.FULL_REFRESH,
            destination_sync_mode=DestinationSyncMode.OVERWRITE,
            n_buckets=4,
        ),
        source={
            "kind": "declarative",
            "manifest": repos_manifest,
            "config": {"api_url": api},
            "stream": "repos",
        },
    )
    lake = str(tmp_path / "lake_decl")
    msgs = read_catalog(spark, ConfiguredCatalog(streams=(inc, snap)), lake)
    assert len(msgs) == 2
    t_inc = stream_table(spark, lake, "recs")
    final = {r["url"]: r["val"] for r in t_inc.read().collect()}
    assert final == {
        **{f"k{i}": i for i in range(5, 10)},
        **{f"k{i}": 100 + i for i in range(5)},
    }
    t_snap = stream_table(spark, lake, "repos_snapshot")
    assert t_snap.read().count() == 257  # 7 + 250 + 0 repos
    # re-run converges: no new windows, same content
    read_catalog(spark, ConfiguredCatalog(streams=(inc, snap)), lake)
    assert {r["url"]: r["val"] for r in t_inc.read().collect()} == final


# ------------------------------------------- requester/paginator extras


def test_declarative_token_auth_stop_condition_and_post_body(spark):
    """Manifest-level coverage of the requester/paginator extras:
    - authenticator: {type: token} -> interpolated Bearer header
      (requests_native_auth TokenAuthenticator parity)
    - http_method POST + request_body_json + params_in_body (search
      endpoint shape; http_requester request_body_json)
    - paginator stop_condition template over decoded_response
      (conditional_paginator.py:13-41)
    - retrier: {max_retries, retry_factor} (default_retrier.py:12-28)
      exercised by one 429 mid-read."""
    rows = [{"id": i, "score": i * 2} for i in range(1, 91)]
    seen = {"auths": [], "bodies": [], "n_429": 1}

    class H(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _json(self, code, body, hdrs=None):
            data = json.dumps(body).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            for k, v in (hdrs or {}).items():
                self.send_header(k, v)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_POST(self):
            body = json.loads(
                self.rfile.read(int(self.headers.get("Content-Length", 0)))
            )
            seen["auths"].append(self.headers.get("X-Api-Key"))
            seen["bodies"].append(body)
            if seen["n_429"] > 0:
                seen["n_429"] -= 1
                return self._json(429, {"error": "slow"}, {"Retry-After": "0"})
            off = int(body.get("offset", 0))
            lim = int(body.get("limit", 100))
            page = rows[off : off + lim]
            return self._json(
                200,
                {"results": page, "is_last": off + lim >= len(rows)},
            )

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        manifest = {
            "version": "0.1.0",
            "streams": [
                {
                    "name": "scores",
                    "requester": {
                        "url_base": "{{ config.api_url }}",
                        "path": "search",
                        "http_method": "POST",
                        "params_in_body": True,
                        "request_body_json": {
                            "query": "kind:{{ config.kind }}",
                        },
                        "authenticator": {
                            "type": "token",
                            "api_token": "{{ config.api_key }}",
                            "header": "X-Api-Key",
                            "prefix": "",
                        },
                        "retrier": {"max_retries": 3, "retry_factor": 0.01},
                    },
                    "record_selector": "results",
                    "paginator": {
                        "type": "offset",
                        "page_size": 40,
                        "stop_condition": "{{ decoded_response.is_last }}",
                    },
                    "json_schema": {
                        "properties": {
                            "id": {"type": "integer"},
                            "score": {"type": "integer"},
                        }
                    },
                }
            ],
        }
        src = DeclarativeSource(
            manifest,
            {
                "api_url": f"http://127.0.0.1:{srv.server_port}",
                "api_key": "sekrit-key",
                "kind": "score",
            },
        )
        df = src.streams["scores"].read(spark)
        got = sorted(r.id for r in df.collect())
        assert got == [r["id"] for r in rows]
        # full final page (40+40+10... rows=90: pages 40/40/10) — the
        # LAST page is short here, so prove the condition fired by
        # request count: 1x429 + 3 pages, no 4th empty-page request
        assert len(seen["bodies"]) == 4
        assert all(a == "sekrit-key" for a in seen["auths"])
        # static interpolated body rides along with paging params
        assert all(b["query"] == "kind:score" for b in seen["bodies"])
        # retried request resent the original body
        assert seen["bodies"][0] == seen["bodies"][1]
    finally:
        srv.shutdown()


def test_declarative_stop_condition_full_final_page(spark):
    """A FULL final page + is_last=true: the stop condition terminates
    without the extra empty-page request the short-page rule needs."""
    rows = [{"id": i, "score": i} for i in range(1, 81)]  # 2 pages of 40
    n_req = []

    class H(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            q = {k: v[0] for k, v in parse_qs(urlparse(self.path).query).items()}
            off = int(q.get("offset", 0))
            n_req.append(off)
            page = rows[off : off + 40]
            body = {"data": page, "is_last": off + 40 >= len(rows)}
            data = json.dumps(body).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        manifest = {
            "streams": [
                {
                    "name": "s",
                    "requester": {"url_base": "{{ config.api_url }}", "path": "x"},
                    "paginator": {
                        "type": "offset",
                        "page_size": 40,
                        "stop_condition": "{{ decoded_response.is_last }}",
                    },
                    "json_schema": {
                        "properties": {
                            "id": {"type": "integer"},
                            "score": {"type": "integer"},
                        }
                    },
                }
            ]
        }
        src = DeclarativeSource(
            manifest, {"api_url": f"http://127.0.0.1:{srv.server_port}"}
        )
        assert src.streams["s"].read(spark).count() == len(rows)
        assert n_req == [0, 40]  # exactly 2 requests — no empty 3rd page
    finally:
        srv.shutdown()


def test_declarative_oauth2_authenticator_builds(spark):
    """authenticator: {type: oauth2} builds an Oauth2Authenticator with
    interpolated credentials; unknown types reject."""
    manifest = {
        "streams": [
            {
                "name": "s",
                "requester": {
                    "url_base": "http://api.example",
                    "path": "x",
                    "authenticator": {
                        "type": "oauth2",
                        "token_refresh_endpoint": "{{ config.api_url }}/token",
                        "client_id": "{{ config.client_id }}",
                        "client_secret": "{{ config.client_secret }}",
                        "refresh_token": "{{ config.refresh_token }}",
                    },
                },
                "json_schema": {"properties": {"id": {"type": "integer"}}},
            }
        ]
    }
    src = DeclarativeSource(
        manifest,
        {
            "api_url": "http://auth.example",
            "client_id": "cid",
            "client_secret": "cs",
            "refresh_token": "rt",
        },
    )
    cfg = src.streams["s"].http_config()
    assert cfg.auth is not None
    assert cfg.auth.token_refresh_endpoint == "http://auth.example/token"
    assert cfg.auth.client_id == "cid"

    bad = {
        "streams": [
            {
                "name": "b",
                "requester": {
                    "url_base": "http://x",
                    "authenticator": {"type": "hmac"},
                },
                "json_schema": {"properties": {}},
            }
        ]
    }
    with pytest.raises(ValueError, match="unknown authenticator"):
        DeclarativeSource(bad, {}).streams["b"].http_config()
