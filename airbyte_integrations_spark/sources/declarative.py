"""Declarative (low-code) connector manifests -> executable streams.

The reference's declarative CDK lets a connector be a YAML document
instead of Python: a stream is a requester (url/path/params) + a
record selector + a paginator + a stream slicer, with ``{{ ... }}``
interpolation tying components to the user config, the current slice,
and parent records. This module re-expresses that surface over the
engine's distributed HTTP reader (sources/http.py).

Reference parity (public airbyte-cdk, sources/declarative/):
- ``YamlDeclarativeSource`` / ``DeclarativeSource``
  (yaml_declarative_source.py:1-28, declarative_source.py) — manifest
  in, streams + check out.
- ``DeclarativeStream`` (declarative_stream.py:14-80) — delegates to
  schema loader + retriever; here the retriever is
  ``read_http_stream`` (slices fan out to executor tasks, records
  parse JVM-side with from_json).
- Interpolation (interpolation/jinja.py, interpolated_string.py,
  interpolated_mapping.py) — the reference evaluates Jinja with
  ``config``/``stream_slice``/``parent_record`` in scope. Re-expressed
  as a dependency-free ``{{ dotted.path }}`` resolver over the same
  fixed namespaces: no arbitrary code execution, and a template that
  is exactly one expression returns the NATIVE value (an int parent id
  stays an int in request params), matching Jinja's behavior for
  single-expression templates in practice.
- Record selection (extractors/jq.py JqExtractor) — dotted field path
  into the decoded body (http._select_records), the restriction of jq
  to the field-path shapes connectors actually use.
- Stream slicers (stream_slicers/single_slice.py,
  datetime_stream_slicer.py:16-103, substream_slicer.py:16-66) —
  SingleSlice / DatetimeStreamSlicer / SubstreamSlicer below.
- CheckStream (checks/check_stream.py) — connection check = read the
  first record of each named stream.

Spark-first split: slicers run DRIVER-side over metadata-sized inputs
(a datetime range partition; a parent stream's records — orgs, repos,
boards — the reference iterates these same records on its single
worker thread), producing a concrete slice list; the CHILD reads —
where the data volume is — fan out one executor task per slice via
``read_http_stream``, so a 10k-parent sync is 10k parallel paginated
reads, not a serial driver loop.
"""

from __future__ import annotations

import datetime
import re
from dataclasses import dataclass, field
from typing import Any, Iterable, Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from airbyte_integrations_spark.sources.http import (
    HttpStreamConfig,
    Oauth2Authenticator,
    fetch_records,
    read_http_stream,
)

_EXPR = re.compile(r"\{\{\s*(.*?)\s*\}\}")
_STEP = re.compile(r"([A-Za-z_][A-Za-z0-9_]*)|\['([^']*)'\]|\[\"([^\"]*)\"\]")


class InterpolationError(KeyError):
    """Unknown namespace or missing key in a ``{{ ... }}`` template."""


def _resolve(expr: str, ns: Mapping[str, Any]) -> Any:
    """Evaluate one dotted/bracket path (``config.start``,
    ``parent_record['id']``, ``stream_slice.start_date``) against the
    fixed namespaces. No code execution — paths only."""
    pos = 0
    cur: Any = ns
    first = True
    while pos < len(expr):
        if expr[pos] == ".":
            pos += 1
            continue
        m = _STEP.match(expr, pos)
        if not m:
            raise InterpolationError(f"unparseable expression {expr!r}")
        key = m.group(1) or m.group(2) or m.group(3)
        if first and key not in ns:
            raise InterpolationError(
                f"unknown namespace {key!r} in {expr!r} "
                f"(have {sorted(ns)})"
            )
        if cur is None:
            # traversal into a None value (e.g. parent_record=None for
            # an empty parent slice) resolves to None, matching the
            # reference's Jinja undefined-chaining behavior
            return None
        if not isinstance(cur, Mapping) or key not in cur:
            raise InterpolationError(f"missing key {key!r} in {expr!r}")
        cur = cur[key]
        first = False
        pos = m.end()
    return cur


def interpolate(template: Any, **ns: Any) -> Any:
    """InterpolatedString.eval analogue. A non-string passes through;
    a string that is EXACTLY one ``{{ expr }}`` returns the resolved
    native value; otherwise each ``{{ expr }}`` is substituted as str.
    ``None`` resolved values render as empty string in mixed templates
    and pass through as None for single-expression templates (the
    empty-parent-slice contract of SubstreamSlicer)."""
    if not isinstance(template, str):
        return template
    whole = _EXPR.fullmatch(template.strip())
    if whole:
        return _resolve(whole.group(1), ns)
    return _EXPR.sub(
        lambda m: "" if (v := _resolve(m.group(1), ns)) is None else str(v),
        template,
    )


def interpolate_mapping(mapping: Mapping[str, Any], **ns: Any) -> dict:
    """InterpolatedMapping.eval analogue: keys AND values evaluated."""
    return {
        interpolate(k, **ns): interpolate(v, **ns) for k, v in mapping.items()
    }


# ---------------------------------------------------------------- slicers


class SingleSlice:
    """single_slice.py: the whole stream is one slice."""

    def stream_slices(self, stream_state: Mapping | None = None) -> list[dict]:
        return [{}]


_TIMEDELTA = re.compile(
    r"((?P<weeks>[\.\d]+?)w)?((?P<days>[\.\d]+?)d)?((?P<hours>[\.\d]+?)h)?"
    r"((?P<minutes>[\.\d]+?)m)?((?P<seconds>[\.\d]+?)s)?$"
)


def parse_step(step: str) -> datetime.timedelta:
    """``1w2d3h4m5s`` -> timedelta (datetime_stream_slicer.py:92-103)."""
    m = _TIMEDELTA.match(step)
    if m is None or not any(m.groupdict().values()):
        raise ValueError(f"unparseable step {step!r}")
    return datetime.timedelta(
        **{k: float(v) for k, v in m.groupdict().items() if v}
    )


@dataclass
class DatetimeStreamSlicer:
    """datetime_stream_slicer.py:16-103: partition [start, end] into
    step-sized windows ``{start_date, end_date}`` (end_date inclusive,
    ``start + step - 1 day`` truncated to the range end — the
    reference's daily-granularity window rule). An incoming
    stream_state moves the effective start to max(state cursor,
    start_time); a state past end yields no slices. All values render
    through ``datetime_format``; templates may reference ``config``."""

    start_time: str
    end_time: str
    step: str
    cursor_field: str
    datetime_format: str = "%Y-%m-%d"
    config: Mapping[str, Any] = field(default_factory=dict)

    def _parse(self, v: str) -> datetime.datetime:
        return datetime.datetime.strptime(v, self.datetime_format)

    def stream_slices(self, stream_state: Mapping | None = None) -> list[dict]:
        start = self._parse(interpolate(self.start_time, config=self.config))
        end = self._parse(interpolate(self.end_time, config=self.config))
        state = (stream_state or {}).get(self.cursor_field)
        if state is not None:
            start = max(start, self._parse(state))
        step = parse_step(self.step)
        out = []
        while start <= end:
            w_end = min(start + step - datetime.timedelta(days=1), end)
            out.append(
                {
                    "start_date": start.strftime(self.datetime_format),
                    "end_date": w_end.strftime(self.datetime_format),
                }
            )
            start += step
        return out


@dataclass
class SubstreamSlicer:
    """substream_slicer.py:16-66: one slice per PARENT record, built by
    interpolating ``slice_definition`` with ``parent_record`` /
    ``parent_stream_slice`` / ``parent_stream_name`` in scope. A parent
    slice with no records still emits one slice with
    ``parent_record=None`` (the reference's empty-parent contract).

    The parent read happens driver-side via fetch_records — parent
    streams are metadata-sized by construction (the reference iterates
    the same records serially); the fan-out the slices feed is the
    distributed part."""

    parent: "DeclarativeStream"
    slice_definition: Mapping[str, Any]

    def stream_slices(self, stream_state: Mapping | None = None) -> list[dict]:
        out = []
        for parent_slice in self.parent.stream_slices(stream_state=None):
            empty = True
            for rec in fetch_records(
                self.parent.http_config(), self.parent.slice_params(parent_slice)
            ):
                empty = False
                out.append(self._definition(parent_slice, rec))
            if empty:
                out.append(self._definition(parent_slice, None))
        return out

    def _definition(self, parent_slice, parent_record) -> dict:
        return interpolate_mapping(
            self.slice_definition,
            parent_stream_slice=dict(parent_slice),
            parent_record=parent_record,
            parent_stream_name={"name": self.parent.name},
            config=self.parent.config,
        )


# ----------------------------------------------------------------- stream


_SPARK_TYPES = {
    "string": T.StringType(),
    "integer": T.LongType(),
    "number": T.DoubleType(),
    "boolean": T.BooleanType(),
}


def schema_from_json_schema(js: Mapping[str, Any]) -> T.StructType:
    """JSON-schema properties -> Spark StructType (the schema loader
    arm of DeclarativeStream.get_json_schema; scalar + one-level array
    coverage — nested objects recurse)."""
    fields = []
    for name, spec in js.get("properties", {}).items():
        jt = spec.get("type")
        if isinstance(jt, list):  # ["null", "string"] nullable idiom
            jt = next((t for t in jt if t != "null"), "string")
        if jt == "object":
            dt: T.DataType = schema_from_json_schema(spec)
        elif jt == "array":
            items = spec.get("items", {"type": "string"})
            it = items.get("type", "string")
            dt = T.ArrayType(
                schema_from_json_schema(items)
                if it == "object"
                else _SPARK_TYPES.get(it, T.StringType())
            )
        else:
            dt = _SPARK_TYPES.get(jt, T.StringType())
        fields.append(T.StructField(name, dt))
    return T.StructType(fields)


class DeclarativeStream:
    """declarative_stream.py:14-80 over the engine's HTTP machinery.
    Holds the manifest fragments; ``http_config()`` builds the
    per-stream HttpStreamConfig, ``stream_slices()`` runs the slicer,
    ``read(spark)`` is the distributed paginated read."""

    def __init__(
        self,
        name: str,
        requester: Mapping[str, Any],
        config: Mapping[str, Any],
        primary_key=None,
        cursor_field: str | None = None,
        record_selector: str | None = "data",
        paginator: Mapping[str, Any] | None = None,
        slicer=None,
        request_params: Mapping[str, Any] | None = None,
        json_schema: Mapping[str, Any] | None = None,
    ):
        self.name = name
        self.requester = requester
        self.config = dict(config)
        self.primary_key = primary_key
        self.cursor_field = cursor_field
        self.record_selector = record_selector
        self.paginator = dict(paginator or {})
        self.slicer = slicer or SingleSlice()
        self.request_params = dict(request_params or {})
        self.json_schema = json_schema

    def _stop_condition(self):
        """ConditionalPaginator's boolean template
        (conditional_paginator.py:13-41) -> a callable over the page:
        ``{{ decoded_response.is_last }}`` evaluated with
        decoded_response / headers / last_records / config in scope.
        A path missing from a page is falsy (Jinja-undefined parity)."""
        tmpl = self.paginator.get("stop_condition")
        if tmpl is None:
            return None
        cfg = self.config

        def stop(body, headers, records):
            try:
                v = interpolate(
                    tmpl,
                    decoded_response=body if isinstance(body, Mapping) else {},
                    headers={k.lower(): v for k, v in dict(headers).items()},
                    last_records={"count": len(records)},
                    config=cfg,
                )
            except InterpolationError:
                return False
            return bool(v) and v != "False"

        return stop

    def _authenticator(self):
        """requester.authenticator -> header injection (token) or an
        Oauth2Authenticator (requests_native_auth/oauth.py parity).
        Secret-bearing values interpolate from config and never log."""
        spec = self.requester.get("authenticator")
        if spec is None:
            return {}, None
        kind = spec.get("type", "token")
        ns = {"config": self.config}
        if kind == "token":
            token = interpolate(spec["api_token"], **ns)
            header = spec.get("header", "Authorization")
            prefix = spec.get("prefix", "Bearer")
            value = f"{prefix} {token}" if prefix else str(token)
            return {header: value}, None
        if kind == "oauth2":
            return {}, Oauth2Authenticator(
                token_refresh_endpoint=interpolate(
                    spec["token_refresh_endpoint"], **ns
                ),
                client_id=interpolate(spec["client_id"], **ns),
                client_secret=interpolate(spec["client_secret"], **ns),
                refresh_token=interpolate(spec["refresh_token"], **ns),
                scopes=spec.get("scopes"),
            )
        raise ValueError(f"unknown authenticator type {kind!r}")

    def http_config(self) -> HttpStreamConfig:
        r = self.requester
        pg = self.paginator
        retrier = r.get("retrier", {})  # DefaultRetrier knobs (default_retrier.py:12-28)
        auth_headers, auth = self._authenticator()
        headers = interpolate_mapping(r.get("request_headers", {}), config=self.config)
        headers.update(auth_headers)
        body = r.get("request_body_json")
        return HttpStreamConfig(
            url_base=interpolate(r["url_base"], config=self.config),
            path="",  # per-slice (__path__) — path may interpolate slice vars
            params={},
            headers=headers,
            records_field=self.record_selector,
            page_size=int(pg.get("page_size", 100)),
            pagination=pg.get("type", "offset"),
            page_param=pg.get("page_param", "offset"),
            size_param=pg.get("size_param", "limit"),
            next_token_field=pg.get("next_token_field", "next_page_token"),
            token_in_header=pg.get("token_in_header"),
            stop_condition=self._stop_condition(),
            http_method=r.get("http_method", "GET"),
            body_json=(
                interpolate_mapping(body, config=self.config)
                if body is not None
                else None
            ),
            params_in_body=bool(r.get("params_in_body", False)),
            max_retries=int(retrier.get("max_retries", 5)),
            retry_factor=float(retrier.get("retry_factor", 5.0)),
            auth=auth,
        )

    def stream_slices(self, stream_state: Mapping | None = None) -> list[dict]:
        return self.slicer.stream_slices(stream_state=stream_state)

    def slice_params(self, stream_slice: Mapping[str, Any]) -> dict:
        """Concrete request dict for one slice: interpolated path under
        the reserved ``__path__`` key + interpolated request params,
        with ``config`` and ``stream_slice`` in scope."""
        ns = {"config": self.config, "stream_slice": dict(stream_slice)}
        out = {"__path__": interpolate(self.requester.get("path", ""), **ns)}
        for k, v in self.request_params.items():
            out[interpolate(k, **ns)] = interpolate(v, **ns)
        return out

    def spark_schema(self) -> T.StructType:
        if self.json_schema is None:
            raise ValueError(f"stream {self.name!r} declares no schema")
        return schema_from_json_schema(self.json_schema)

    def read(
        self,
        spark: SparkSession,
        record_schema: T.StructType | None = None,
        stream_state: Mapping | None = None,
        slice_col: str | None = None,
    ) -> DataFrame:
        """Distributed read: slicer -> concrete slice dicts ->
        one executor task per slice (read_http_stream)."""
        slices = [
            self.slice_params(s) for s in self.stream_slices(stream_state)
        ]
        return read_http_stream(
            spark,
            self.http_config(),
            slices,
            record_schema or self.spark_schema(),
            slice_col=slice_col,
        )

    def read_first_record(self) -> dict | None:
        """Driver-side single-record probe (CheckStream's read)."""
        for s in self.stream_slices(None):
            for rec in fetch_records(self.http_config(), self.slice_params(s)):
                return rec
        return None


# ----------------------------------------------------------------- source


class DeclarativeSource:
    """declarative_source.py + yaml_declarative_source.py: manifest in
    (dict or YAML text), streams + check out. Manifest shape::

        version: "0.1.0"
        check: {stream_names: [children]}
        streams:
          - name: parents
            requester: {url_base: "{{ config.api_url }}", path: orgs}
            record_selector: data
            primary_key: id
            json_schema: {properties: {id: {type: integer}}}
          - name: children
            requester:
              url_base: "{{ config.api_url }}"
              path: "orgs/{{ stream_slice.org_id }}/repos"
            slicer:
              type: substream
              parent_stream: parents
              slice_definition: {org_id: "{{ parent_record.id }}"}
            paginator: {type: offset, page_size: 100}

    slicer.type: single (default) | datetime | substream.
    """

    def __init__(self, manifest: Mapping[str, Any], config: Mapping[str, Any]):
        self.manifest = dict(manifest)
        self.config = dict(config)
        self.streams: dict[str, DeclarativeStream] = {}
        for spec in self.manifest.get("streams", []):
            self.streams[spec["name"]] = self._build_stream(spec)

    @classmethod
    def from_yaml(cls, text: str, config: Mapping[str, Any]):
        import yaml

        return cls(yaml.safe_load(text), config)

    def _build_stream(self, spec: Mapping[str, Any]) -> DeclarativeStream:
        sl = spec.get("slicer") or {"type": "single"}
        kind = sl.get("type", "single")
        if kind == "single":
            slicer: Any = SingleSlice()
        elif kind == "datetime":
            slicer = DatetimeStreamSlicer(
                start_time=sl["start_time"],
                end_time=sl["end_time"],
                step=sl["step"],
                cursor_field=sl.get("cursor_field", "start_date"),
                datetime_format=sl.get("datetime_format", "%Y-%m-%d"),
                config=self.config,
            )
        elif kind == "substream":
            parent = self.streams.get(sl["parent_stream"])
            if parent is None:
                raise ValueError(
                    f"substream parent {sl['parent_stream']!r} must be "
                    f"declared BEFORE its child"
                )
            slicer = SubstreamSlicer(
                parent=parent, slice_definition=sl["slice_definition"]
            )
        else:
            raise ValueError(f"unknown slicer type {kind!r}")
        return DeclarativeStream(
            name=spec["name"],
            requester=spec["requester"],
            config=self.config,
            primary_key=spec.get("primary_key"),
            cursor_field=spec.get("cursor_field"),
            record_selector=spec.get("record_selector", "data"),
            paginator=spec.get("paginator"),
            slicer=slicer,
            request_params=spec.get("request_params"),
            json_schema=spec.get("json_schema"),
        )

    def check(self) -> tuple[bool, str]:
        """checks/check_stream.py CheckStream: succeed iff every named
        stream yields at least one record (or reads cleanly)."""
        names = self.manifest.get("check", {}).get(
            "stream_names", list(self.streams)
        )
        for name in names:
            if name not in self.streams:
                return False, f"check references unknown stream {name!r}"
            try:
                self.streams[name].read_first_record()
            except Exception as e:
                return False, f"stream {name!r}: {type(e).__name__}: {e}"
        return True, "ok"

    def sync_incremental(
        self,
        spark: SparkSession,
        stream_name: str,
        table,
        config,
        key_col: str,
        cursor_col: str,
        updated_at_col: str | None = None,
        deleted_at_col: str | None = None,
        max_slices: int | None = None,
    ) -> list[dict]:
        """Incremental declarative sync into the lake: one idempotent
        epoch-keyed MERGE + one STATE message per datetime window — the
        low-code stream wired into the SAME durable-commit loop the
        jdbc/http sources use (per-slice checkpoint cadence of the CDK
        read loop; acceptance semantics per source_acceptance_test
        test_incremental.py:112-207).

        Watermark contract: the durable watermark (max committed
        ``_ab_cdc_lsn``, micros for timestamp cursors) fast-forwards
        the slicer via stream_state, so a new sync re-plans only from
        the watermark's window onward; rows at-or-below the watermark
        are filtered (strictly-``>`` rule), so the inevitable re-read
        of the watermark's own window is dedup-exact, not duplicated.
        Epoch keys embed the planning watermark
        (``decl:<wm>:<start_date>``): a re-run with NO new progress
        (same watermark) skips committed windows by key; a resume or
        later sync with an ADVANCED watermark re-plans windows from the
        watermark's day — fresh keys, and the re-read of the watermark
        window is a content-level no-op via the strictly-``>`` filter +
        deterministic ab_id + winner dedup (the CDK's at-least-once
        slice re-read, exactly-once effect). Kill anywhere and re-run
        converges."""
        import datetime as _dt

        from airbyte_integrations_spark.connector import state_message
        from airbyte_integrations_spark.lakehouse.merge import merge_into
        from airbyte_integrations_spark.sources.jdbc import as_change_events

        stream = self.streams[stream_name]
        slicer = stream.slicer
        if not isinstance(slicer, DatetimeStreamSlicer):
            raise ValueError(
                "sync_incremental requires a datetime slicer "
                f"(stream {stream_name!r} has {type(slicer).__name__})"
            )
        wm = table.watermark(config.stream)
        state = None
        if wm is not None:
            wm_dt = _dt.datetime.utcfromtimestamp(wm / 1_000_000)
            state = {slicer.cursor_field: wm_dt.strftime(slicer.datetime_format)}
        slices = stream.stream_slices(state)
        if max_slices is not None:
            slices = slices[:max_slices]
        messages: list[dict] = []
        for s in slices:
            epoch = f"decl:{wm if wm is not None else 'init'}:{s['start_date']}"
            if table.is_epoch_committed(config.stream, epoch):
                continue
            batch = read_http_stream(
                spark,
                stream.http_config(),
                [stream.slice_params(s)],
                stream.spark_schema(),
            )
            events = as_change_events(
                batch,
                key_col=key_col,
                cursor_col=cursor_col,
                updated_at_col=updated_at_col,
                deleted_at_col=deleted_at_col,
            )
            from pyspark.sql import functions as F

            if wm is not None:
                events = events.filter(F.col("_ab_cdc_lsn") > wm)
            events = events.localCheckpoint(eager=True)
            # max-cursor-SEEN state rule (the CDK's cursor checkpoint):
            # committing the window's calendar end instead would advance
            # the watermark past records that arrive later inside an
            # already-read window and silently drop them on the next
            # sync. Bounded scalar agg — one row per slice.
            to_lsn = events.agg(F.max("_ab_cdc_lsn")).first()[0]
            if to_lsn is None:
                # empty window: nothing durable to commit; the next sync
                # re-reads it from the same watermark (cheap, and the
                # only rule that keeps late arrivals)
                continue
            from_lsn = wm if wm is not None else -1
            merge_into(
                table,
                events,
                stream=config.stream,
                epoch=epoch,
                epoch_meta={"from_lsn": from_lsn, "to_lsn": to_lsn},
                cursor="_ab_cdc_lsn",
                secondary=config.secondary_order,
                mode=config.write_mode,
                dedup_impl=config.dedup_impl,
                key=config.primary_key,
                n_buckets=config.n_buckets,
            )
            messages.append(state_message(table, config.stream))
        return messages

    def discover(self) -> list[dict]:
        """Catalog entries (name, json_schema, supported modes) — the
        discover() surface of the declarative source."""
        out = []
        for s in self.streams.values():
            modes = ["full_refresh"]
            if s.cursor_field:
                modes.append("incremental")
            out.append(
                {
                    "name": s.name,
                    "json_schema": s.json_schema or {},
                    "supported_sync_modes": modes,
                    "source_defined_primary_key": s.primary_key,
                    "default_cursor_field": s.cursor_field,
                }
            )
        return out
