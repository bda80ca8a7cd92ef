"""Declarative record filter + transformations (compiled to Catalyst)
and the widened HTTP error-handling knobs.

Reference semantics:
- client-side record filtering against state/slice —
  connectors/source-bigcommerce/source_bigcommerce/source.py:122,
  source-intercom/source_intercom/source.py:107 (``record[cursor] >=
  stream_state[cursor]``); condition language per
  airbyte-cdk declarative/interpolation/interpolated_boolean.py:10-24.
- record reshaping in parse_response — source-github/source_github/
  streams.py:174,337,520,602-603 (``record["repository"] =
  stream_slice["repository"]``, ``record["user_id"] =
  record["user"]["id"]``).
- retry-set widening + header-driven backoff — source-github
  streams.py:63-90 (extra retryable codes, Retry-After /
  X-RateLimit-Reset waits), source-freshdesk streams.py:47.

Spark-first checks: the filter and the added fields must appear as
Catalyst expressions over the parsed DataFrame — the ONLY Python in
the plan is the HTTP fetch task itself.
"""

from __future__ import annotations

import io
import json
import threading
import urllib.error
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

import airbyte_integrations_spark.sources.http as http_mod
from airbyte_integrations_spark.sources.declarative import (
    DeclarativeSource,
    InterpolationError,
    build_transformations,
    compile_condition,
    compile_value,
)
from airbyte_integrations_spark.sources.http import (
    HttpGiveUpError,
    HttpStreamConfig,
    _get_json,
)

# ------------------------------------------------------------- compiler


SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("ok", T.BooleanType()),
        T.StructField("tags", T.ArrayType(T.StringType())),
        T.StructField(
            "user",
            T.StructType([T.StructField("uid", T.LongType())]),
        ),
    ]
)

ROWS = [
    (1, "alpha", True, ["a", "b"], (10,)),
    (2, "beta", False, ["c"], (20,)),
    (3, None, None, [], (30,)),
    (4, "delta", True, ["a"], (40,)),
]


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def _ids(df_, cond):
    return sorted(r.id for r in df_.filter(cond).collect())


def test_condition_comparisons_and_boolean_ops(df):
    cfg = {"min_id": 2}
    c = lambda s: compile_condition(s, config=cfg, record_schema=SCHEMA)
    assert _ids(df, c("{{ record['id'] >= 2 }}")) == [2, 3, 4]
    assert _ids(df, c("{{ record.name == 'beta' }}")) == [2]
    assert _ids(df, c("{{ record.id >= config.min_id and record.ok }}")) == [4]
    assert _ids(df, c("{{ record.id == 1 or record.id == 4 }}")) == [1, 4]
    assert _ids(df, c("{{ not record.ok }}")) == [2, 3]
    assert _ids(df, c("{{ record.name in ['alpha', 'delta'] }}")) == [1, 4]
    assert _ids(df, c("{{ record.id not in [1, 2, 3] }}")) == [4]
    assert _ids(df, c("{{ 'a' in record.tags }}")) == [1, 4]
    # null-safe equality: None == None is True (Jinja parity)
    assert _ids(df, c("{{ record.name == none }}")) == [3]
    assert _ids(df, c("{{ record.name != none }}")) == [1, 2, 4]
    # nested record path, parenthesized precedence
    assert _ids(
        df, c("{{ record.user.uid >= 30 and (record.ok or record.id == 3) }}")
    ) == [3, 4]


def test_condition_slice_reference_casts_to_record_type(spark, df):
    sdf = df.withColumn("_s", F.lit('{"lo": "2", "name": "beta"}'))
    smap = F.from_json(F.col("_s"), "map<string,string>")
    got = sorted(
        r.id
        for r in sdf.filter(
            compile_condition(
                "{{ record.id >= stream_slice.lo }}",
                config={},
                record_schema=SCHEMA,
                slice_map=smap,
            )
        ).collect()
    )
    assert got == [2, 3, 4]  # "2" cast to long, not string-compared


def test_condition_strict_rejections(df):
    c = lambda s, **kw: compile_condition(
        s, config={}, record_schema=SCHEMA, **kw
    )
    with pytest.raises(ValueError):
        c("record.id >= 2")  # not a {{ }} template
    with pytest.raises(ValueError):
        c("{{ record.nope == 1 }}")  # field not in declared schema
    with pytest.raises(ValueError):
        c("{{ __import__('os') }}")  # no code execution, paths only
    with pytest.raises(ValueError):
        c("{{ record.id >= 2 garbage }}")  # trailing tokens
    with pytest.raises(ValueError):
        c("{{ record.id >= stream_slice.lo }}")  # no slice col available
    with pytest.raises(InterpolationError):
        c("{{ config.absent == 1 }}")


def test_compile_value_native_and_concat(spark, df):
    cfg = {"tag": "prod", "n": 7}
    out = df.select(
        compile_value(
            "{{ record.user.uid }}", config=cfg, record_schema=SCHEMA
        ).alias("uid"),
        compile_value("{{ config.n }}", config=cfg, record_schema=SCHEMA).alias(
            "n"
        ),
        compile_value(
            "{{ config.tag }}-{{ record.name }}",
            config=cfg,
            record_schema=SCHEMA,
        ).alias("mix"),
    ).collect()
    assert [r.uid for r in out] == [10, 20, 30, 40]
    assert all(r.n == 7 for r in out)
    assert out[0].mix == "prod-alpha"
    assert out[2].mix == "prod-"  # None renders as '' in mixed templates
    # native types survive: uid is a LONG, n a literal int
    assert isinstance(out[0].uid, int)


def test_transformations_add_then_remove(df):
    steps = build_transformations(
        [
            {
                "type": "AddFields",
                "fields": [
                    {"path": ["uid"], "value": "{{ record.user.uid }}"},
                    {"path": "label", "value": "v-{{ record.id }}"},
                ],
            },
            {"type": "RemoveFields", "field_pointers": [["user"], ["tags"]]},
        ],
        config={},
        record_schema=SCHEMA,
    )
    out = df
    for s in steps:
        out = s(out)
    assert out.columns == ["id", "name", "ok", "uid", "label"]
    r = {x.id: x for x in out.collect()}
    assert r[2].uid == 20 and r[2].label == "v-2"


def test_transformations_strict_rejections():
    with pytest.raises(ValueError):
        build_transformations(
            [{"type": "Jq", "fields": []}], config={}, record_schema=SCHEMA
        )
    with pytest.raises(ValueError):
        build_transformations(
            [
                {
                    "type": "AddFields",
                    "fields": [{"path": ["a", "b"], "value": "1"}],
                }
            ],
            config={},
            record_schema=SCHEMA,
        )


# ----------------------------------------------------- end-to-end read


def _fixture_rows():
    # two shards x versions; nested user object like the github shape
    out = []
    for i in range(1, 61):
        out.append(
            {
                "id": i,
                "ver": i,
                "name": f"row-{i}",
                "user": {"uid": i * 10},
                "shard": "even" if i % 2 == 0 else "odd",
            }
        )
    return out


@pytest.fixture()
def shard_api():
    rows = _fixture_rows()

    class H(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            u = urlparse(self.path)
            q = {k: v[0] for k, v in parse_qs(u.query).items()}
            shard = u.path.strip("/").split("/")[-1]
            rs = [r for r in rows if r["shard"] == shard]
            off, lim = int(q.get("offset", 0)), int(q.get("limit", 100))
            data = json.dumps({"data": rs[off : off + lim]}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        yield f"http://127.0.0.1:{srv.server_port}", rows
    finally:
        srv.shutdown()


def _manifest(base):
    return {
        "version": "0.1.0",
        "streams": [
            {
                "name": "shard_list",
                "requester": {"url_base": base, "path": "items/meta"},
                "record_selector": "data",
                "json_schema": {
                    "properties": {"shard": {"type": "string"}}
                },
            },
            {
                "name": "shards",
                "requester": {
                    "url_base": base,
                    "path": "items/{{ stream_slice.shard }}",
                },
                "record_selector": "data",
                "primary_key": "id",
                "paginator": {"type": "offset", "page_size": 13},
                "slicer": {
                    "type": "substream",
                    "parent_stream": "shard_list",
                    "slice_definition": {
                        "shard": "{{ parent_record.shard }}"
                    },
                },
                # keep records past the slice's floor AND drop odd ids
                # below 20 (bigcommerce source.py:122 shape, compiled
                # to a Catalyst Filter)
                "record_filter": (
                    "{{ record['ver'] >= config['min_ver'] and"
                    " record.id not in [1, 3] }}"
                ),
                "transformations": [
                    {
                        "type": "AddFields",
                        "fields": [
                            # github streams.py:174: slice -> record
                            {
                                "path": ["shard_from_slice"],
                                "value": "{{ stream_slice.shard }}",
                            },
                            # github streams.py:520: nested -> top level
                            {
                                "path": ["uid"],
                                "value": "{{ record.user.uid }}",
                            },
                        ],
                    },
                    {"type": "RemoveFields", "field_pointers": [["user"]]},
                ],
                "json_schema": {
                    "properties": {
                        "id": {"type": "integer"},
                        "ver": {"type": "integer"},
                        "name": {"type": "string"},
                        "user": {
                            "type": "object",
                            "properties": {"uid": {"type": "integer"}},
                        },
                        "shard": {"type": "string"},
                    }
                },
            },
        ],
    }


def test_declarative_filter_and_transform_end_to_end(spark, shard_api):
    base, rows = shard_api
    # the fixture serves no /items/meta shard rows, so stand in for the
    # parent read with explicit slices (the substream fan-out itself is
    # pinned by test_declarative.py) — the subject here is the compiled
    # filter + transformations over a multi-slice, multi-page read
    src = DeclarativeSource(_manifest(base), {"min_ver": 5})
    child = src.streams["shards"]
    child.slicer = type(
        "S",
        (),
        {
            "stream_slices": lambda self, stream_state=None: [
                {"shard": "even"},
                {"shard": "odd"},
            ]
        },
    )()
    df = child.read(spark)
    got = {r.id: r for r in df.collect()}
    want = [
        r
        for r in rows
        if r["ver"] >= 5 and r["id"] not in (1, 3)
    ]
    assert sorted(got) == sorted(r["id"] for r in want)
    assert set(df.columns) == {
        "id",
        "ver",
        "name",
        "shard",
        "shard_from_slice",
        "uid",
    }
    for r in want:
        assert got[r["id"]].shard_from_slice == r["shard"]
        assert got[r["id"]].uid == r["user"]["uid"]
    # the slice column does not leak into the result
    assert "_ab_slice_json" not in df.columns


def test_filter_runs_jvm_side(spark, shard_api):
    """The record pipeline must be Catalyst: exactly ONE Python node
    (the HTTP fetch mapInPandas) and a real Filter in the plan —
    filtering/enrichment never drops to per-record Python."""
    base, _ = shard_api
    src = DeclarativeSource(_manifest(base), {"min_ver": 5})
    child = src.streams["shards"]
    child.slicer = type(
        "S",
        (),
        {"stream_slices": lambda self, stream_state=None: [{"shard": "even"}]},
    )()
    df = child.read(spark)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("MapInPandas") == 1
    assert "BatchEvalPython" not in plan
    assert "Filter" in plan
    assert "from_json" in plan  # slice map parsed JVM-side


# ------------------------------------------------- error-handling knobs


class _Resp:
    def __init__(self, body):
        self._b = json.dumps(body).encode()
        self.headers = {}

    def read(self):
        return self._b

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def _flaky_opener(fail_statuses, headers=None):
    """Opener failing with the given statuses in order, then 200."""
    calls = []

    def opener(req, timeout=None):
        calls.append(req.full_url)
        if len(calls) <= len(fail_statuses):
            code = fail_statuses[len(calls) - 1]
            raise urllib.error.HTTPError(
                req.full_url, code, "err", dict(headers or {}), io.BytesIO(b"")
            )
        return _Resp({"data": []})

    opener.calls = calls
    return opener


def _sleeps(monkeypatch):
    waits = []
    monkeypatch.setattr(http_mod.time, "sleep", lambda s: waits.append(s))
    return waits


def test_retry_on_status_widens_the_retry_set(monkeypatch):
    _sleeps(monkeypatch)
    cfg = HttpStreamConfig(
        url_base="http://x", retry_on_status=(420,), max_retries=3,
        retry_factor=0.01,
    )
    opener = _flaky_opener([420, 420])
    body, _ = _get_json("http://x/items", cfg, opener=opener)
    assert body == {"data": []} and len(opener.calls) == 3


def test_unlisted_4xx_still_gives_up_immediately(monkeypatch):
    _sleeps(monkeypatch)
    cfg = HttpStreamConfig(url_base="http://x", retry_on_status=(420,))
    opener = _flaky_opener([418])
    with pytest.raises(HttpGiveUpError) as ei:
        _get_json("http://x/items", cfg, opener=opener)
    assert ei.value.status == 418 and len(opener.calls) == 1


def test_constant_backoff_strategy(monkeypatch):
    waits = _sleeps(monkeypatch)
    cfg = HttpStreamConfig(
        url_base="http://x", backoff_strategy="constant", backoff_time=2.5,
        max_retries=3,
    )
    _get_json("http://x/items", cfg, opener=_flaky_opener([500, 500]))
    assert waits == [2.5, 2.5]


def test_wait_time_from_header_strategy(monkeypatch):
    waits = _sleeps(monkeypatch)
    cfg = HttpStreamConfig(
        url_base="http://x",
        backoff_strategy="wait_time_from_header",
        backoff_wait_header="X-Wait-Seconds",
        max_retries=3,
        retry_factor=8.0,
    )
    _get_json(
        "http://x/items",
        cfg,
        opener=_flaky_opener([503], headers={"X-Wait-Seconds": "0.75"}),
    )
    assert waits == [0.75]


def test_wait_header_absent_falls_back_to_exponential(monkeypatch):
    waits = _sleeps(monkeypatch)
    cfg = HttpStreamConfig(
        url_base="http://x",
        backoff_strategy="wait_time_from_header",
        backoff_wait_header="X-Wait-Seconds",
        max_retries=3,
        retry_factor=0.5,
    )
    _get_json("http://x/items", cfg, opener=_flaky_opener([500]))
    assert waits == [0.5]  # factor * 2^0


def test_retry_after_on_429_still_wins(monkeypatch):
    waits = _sleeps(monkeypatch)
    cfg = HttpStreamConfig(
        url_base="http://x", backoff_strategy="constant", backoff_time=9.0,
        max_retries=3,
    )
    _get_json(
        "http://x/items",
        cfg,
        opener=_flaky_opener([429], headers={"Retry-After": "0.25"}),
    )
    assert waits == [0.25]


def test_declarative_retrier_spec_maps_to_config():
    src = DeclarativeSource(
        {
            "streams": [
                {
                    "name": "s",
                    "requester": {
                        "url_base": "http://x",
                        "path": "p",
                        "retrier": {
                            "max_retries": 7,
                            "retry_on_status": [420, 520],
                            "backoff": {
                                "type": "wait_time_from_header",
                                "header": "X-RateLimit-Reset",
                            },
                        },
                    },
                    "json_schema": {"properties": {"a": {"type": "string"}}},
                }
            ]
        },
        {},
    )
    cfg = src.streams["s"].http_config()
    assert cfg.max_retries == 7
    assert cfg.retry_on_status == (420, 520)
    assert cfg.backoff_strategy == "wait_time_from_header"
    assert cfg.backoff_wait_header == "X-RateLimit-Reset"


# ----------------------------------------------- token-pool authenticator


def test_multiple_token_authenticator_rotates_per_request():
    """auth/token.py:26-34: each request draws the NEXT token from the
    pool (source-github's rate-limit spreading)."""
    from airbyte_integrations_spark.sources.http import (
        MultipleTokenAuthenticator,
    )

    auth = MultipleTokenAuthenticator(["t1", "t2", "t3"], auth_method="token")
    seen = [auth.get_auth_header()["Authorization"] for _ in range(5)]
    assert seen == ["token t1", "token t2", "token t3", "token t1", "token t2"]
    # pickling resets rotation (per-task independence), keeps the pool
    import pickle

    a2 = pickle.loads(pickle.dumps(auth))
    assert a2.get_auth_header() == {"Authorization": "token t1"}
    with pytest.raises(ValueError):
        MultipleTokenAuthenticator([])


def test_declarative_tokens_authenticator_cycles_on_the_wire():
    """A live read with a 2-token pool: consecutive requests must carry
    alternating Authorization headers."""
    seen = []
    rows = [{"id": i} for i in range(1, 26)]

    class H(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            seen.append(self.headers.get("Authorization"))
            q = {k: v[0] for k, v in parse_qs(urlparse(self.path).query).items()}
            off, lim = int(q.get("offset", 0)), int(q.get("limit", 100))
            b = json.dumps({"data": rows[off : off + lim]}).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(b)))
            self.end_headers()
            self.wfile.write(b)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        src = DeclarativeSource(
            {
                "streams": [
                    {
                        "name": "s",
                        "requester": {
                            "url_base": f"http://127.0.0.1:{srv.server_port}",
                            "path": "items",
                            "authenticator": {
                                "type": "tokens",
                                "api_tokens": [
                                    "{{ config.tok_a }}",
                                    "{{ config.tok_b }}",
                                ],
                            },
                        },
                        "record_selector": "data",
                        "paginator": {"type": "offset", "page_size": 10},
                        "json_schema": {
                            "properties": {"id": {"type": "integer"}}
                        },
                    }
                ]
            },
            {"tok_a": "aaa", "tok_b": "bbb"},
        )
        got = list(
            __import__(
                "airbyte_integrations_spark.sources.http",
                fromlist=["fetch_records"],
            ).fetch_records(src.streams["s"].http_config())
        )
        assert len(got) == 25
        # 3 pages -> tokens alternate a, b, a
        assert seen == ["Bearer aaa", "Bearer bbb", "Bearer aaa"]
    finally:
        srv.shutdown()


def test_wait_until_time_from_header_strategy(monkeypatch):
    """github streams.py:80-91: the header is an ABSOLUTE epoch; wait
    reset - now, floored so clock skew never sleeps negative."""
    import time as _time

    waits = _sleeps(monkeypatch)
    monkeypatch.setattr(http_mod.time, "time", lambda: 1000.0)
    cfg = HttpStreamConfig(
        url_base="http://x",
        backoff_strategy="wait_until_time_from_header",
        backoff_wait_header="X-RateLimit-Reset",
        backoff_min_wait=0.1,
        max_retries=3,
    )
    _get_json(
        "http://x/items",
        cfg,
        opener=_flaky_opener([500], headers={"X-RateLimit-Reset": "1002.5"}),
    )
    assert waits == [2.5]
    # reset already in the past: floor applies
    waits.clear()
    _get_json(
        "http://x/items",
        cfg,
        opener=_flaky_opener([500], headers={"X-RateLimit-Reset": "900"}),
    )
    assert waits == [0.1]
