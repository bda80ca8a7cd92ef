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
    MultipleTokenAuthenticator,
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


def _single_expr(template: str) -> str | None:
    """The inner expression when the template is EXACTLY one
    ``{{ expr }}`` — None otherwise. fullmatch alone is not enough:
    the lazy ``.*?`` backtracks across ``}}-{{`` in two-expression
    templates like ``{{ a }}-{{ b }}``, so the inner must also be
    brace-free."""
    whole = _EXPR.fullmatch(template.strip())
    if whole is None:
        return None
    inner = whole.group(1)
    if "{{" in inner or "}}" in inner:
        return None
    return inner


def interpolate(template: Any, **ns: Any) -> Any:
    """InterpolatedString.eval analogue. A non-string passes through;
    a string that is EXACTLY one ``{{ expr }}`` returns the resolved
    native value; otherwise each ``{{ expr }}`` is substituted as str.
    ``None`` resolved values render as empty string in mixed templates
    and pass through as None for single-expression templates (the
    empty-parent-slice contract of SubstreamSlicer)."""
    if not isinstance(template, str):
        return template
    inner = _single_expr(template)
    if inner is not None:
        return _resolve(inner, ns)
    return _EXPR.sub(
        lambda m: "" if (v := _resolve(m.group(1), ns)) is None else str(v),
        template,
    )


def interpolate_mapping(mapping: Mapping[str, Any], **ns: Any) -> dict:
    """InterpolatedMapping.eval analogue: keys AND values evaluated."""
    return {
        interpolate(k, **ns): interpolate(v, **ns) for k, v in mapping.items()
    }


# -------------------------------------- record filter / transformations
#
# The reference filters and reshapes records CLIENT-side, per record, in
# Python: ``if record[cursor] >= stream_state[cursor]`` (connectors/
# source-bigcommerce/source_bigcommerce/source.py:122, source-intercom/
# source_intercom/source.py:107, source-delighted:76) and
# ``record["repository"] = stream_slice["repository"]`` /
# ``record["user_id"] = record["user"]["id"]`` (source-github/
# source_github/streams.py:174,337,520,602-603,750,783). The declarative
# CDK's condition language is InterpolatedBoolean
# (declarative/interpolation/interpolated_boolean.py:10-24).
#
# Spark-first re-expression: the condition / value templates COMPILE to
# Catalyst expressions applied to the parsed DataFrame — record paths
# become columns, config paths resolve to literals at compile time, and
# stream_slice paths read from the slice-JSON column that rides along
# with every record (parsed once as map<string,string>), so filtering
# and enrichment stay JVM-side instead of a per-record Python loop.
# Grammar is paths + literals + comparisons + and/or/not/in — no code
# execution (same restriction as the path-only interpolation above).

_COND_TOKEN = re.compile(
    r"""(?:
      (?P<op>==|!=|>=|<=|>|<)
    | (?P<str>'[^']*'|"[^"]*")
    | (?P<num>-?\d+(?:\.\d+)?)
    | (?P<name>[A-Za-z_][A-Za-z0-9_]*)
    | (?P<punct>[\[\].,()])
    )""",
    re.X,
)

_SLICE_NS = re.compile(r"\bstream_slice\b")


def _cond_tokens(src: str) -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    pos, n = 0, len(src)
    while pos < n:
        if src[pos].isspace():
            pos += 1
            continue
        m = _COND_TOKEN.match(src, pos)
        if m is None:
            raise ValueError(
                f"unparseable condition near {src[pos:pos + 20]!r}"
            )
        out.append((m.lastgroup, m.group(m.lastgroup)))
        pos = m.end()
    return out


def _schema_dtype(record_schema: T.StructType | None, path: list[str]):
    """Walk the declared record schema down a field path; None when the
    schema is unknown, ValueError when the schema is known and the
    field is not (catches manifest typos at build time, not mid-read)."""
    if record_schema is None:
        return None
    cur: T.DataType = record_schema
    for part in path:
        if not isinstance(cur, T.StructType) or part not in cur.fieldNames():
            raise ValueError(
                f"record field {'.'.join(path)!r} is not in the declared "
                f"json_schema (have {record_schema.fieldNames()})"
            )
        cur = cur[part].dataType
    return cur


class _Operand:
    """One side of a comparison: a record column (typed), a slice-map
    lookup (string-typed), or a Python literal/list resolved now."""

    __slots__ = ("kind", "col", "value", "dtype")

    def __init__(self, kind, col=None, value=None, dtype=None):
        self.kind = kind  # "col" | "slice" | "lit" | "list"
        self.col = col
        self.value = value
        self.dtype = dtype


class _ConditionParser:
    """Recursive-descent parser over the restricted condition grammar::

        or_expr  := and_expr ('or' and_expr)*
        and_expr := not_expr ('and' not_expr)*
        not_expr := 'not' not_expr | comparison
        cmp      := operand (('=='|'!='|'>='|'<='|'>'|'<'|'in'|
                              'not' 'in') operand)? | '(' or_expr ')'
        operand  := record/config/stream_slice path | literal | [list]

    ``==``/``!=`` are null-safe (None == None is True — Jinja parity);
    a bare operand is truthy iff non-null (boolean columns: iff true),
    matching InterpolatedBoolean's presence-is-truthy rule
    (interpolated_boolean.py:20-24)."""

    def __init__(self, tokens, config, record_schema, slice_map):
        self.toks = tokens
        self.i = 0
        self.config = config
        self.schema = record_schema
        self.slice_map = slice_map

    def _peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def _take(self):
        t = self._peek()
        self.i += 1
        return t

    def _expect(self, kind, val=None):
        k, v = self._take()
        if k != kind or (val is not None and v != val):
            raise ValueError(f"expected {val or kind}, got {v!r}")
        return v

    # -- grammar -----------------------------------------------------
    def parse(self):
        from pyspark.sql import Column

        col = self._or()
        if self.i != len(self.toks):
            raise ValueError(f"trailing tokens from {self._peek()[1]!r}")
        assert isinstance(col, Column)
        return col

    def _or(self):
        left = self._and()
        while self._peek() == ("name", "or"):
            self._take()
            left = left | self._and()
        return left

    def _and(self):
        left = self._not()
        while self._peek() == ("name", "and"):
            self._take()
            left = left & self._not()
        return left

    def _not(self):
        if self._peek() == ("name", "not") and (
            self.i + 1 >= len(self.toks) or self.toks[self.i + 1][1] != "in"
        ):
            self._take()
            return ~self._not()
        return self._cmp()

    def _cmp(self):
        if self._peek() == ("punct", "("):
            self._take()
            inner = self._or()
            self._expect("punct", ")")
            return inner
        lhs = self.operand()
        k, v = self._peek()
        if k == "op":
            self._take()
            return self._compare(lhs, v, self.operand())
        if (k, v) == ("name", "in"):
            self._take()
            return self._compare(lhs, "in", self.operand())
        if (
            (k, v) == ("name", "not")
            and self.i + 1 < len(self.toks)
            and self.toks[self.i + 1][1] == "in"
        ):
            self.i += 2
            return ~self._compare(lhs, "in", self.operand())
        return self._truthy(lhs)

    # -- operands ----------------------------------------------------
    def operand(self) -> _Operand:
        k, v = self._take()
        if k == "str":
            return _Operand("lit", value=v[1:-1])
        if k == "num":
            return _Operand(
                "lit", value=float(v) if "." in v else int(v)
            )
        if k == "punct" and v == "[":
            vals = []
            while True:
                o = self.operand()
                if o.kind != "lit":
                    raise ValueError("list elements must be literals")
                vals.append(o.value)
                k2, v2 = self._take()
                if (k2, v2) == ("punct", "]"):
                    return _Operand("list", value=vals)
                if (k2, v2) != ("punct", ","):
                    raise ValueError(f"expected , or ] in list, got {v2!r}")
        if k == "name":
            low = v.lower()
            if low in ("true", "false"):
                return _Operand("lit", value=low == "true")
            if low in ("none", "null"):
                return _Operand("lit", value=None)
            return self._path(v)
        raise ValueError(f"unexpected token {v!r}")

    def _path(self, ns_name: str) -> _Operand:
        from pyspark.sql import functions as F

        parts: list[str] = []
        while True:
            k, v = self._peek()
            if (k, v) == ("punct", "."):
                self._take()
                parts.append(self._expect("name"))
            elif (k, v) == ("punct", "["):
                self._take()
                key = self._expect("str")
                parts.append(key[1:-1])
                self._expect("punct", "]")
            else:
                break
        if not parts:
            raise ValueError(f"bare name {ns_name!r} (expected a path)")
        if ns_name == "record":
            dtype = _schema_dtype(self.schema, parts)
            return _Operand("col", col=F.col(".".join(parts)), dtype=dtype)
        if ns_name == "config":
            cur: Any = self.config
            for p in parts:
                if not isinstance(cur, Mapping) or p not in cur:
                    raise InterpolationError(
                        f"missing config key {'.'.join(parts)!r}"
                    )
                cur = cur[p]
            return _Operand("lit", value=cur)
        if ns_name == "stream_slice":
            if self.slice_map is None:
                raise ValueError(
                    "condition references stream_slice but no slice "
                    "column is available"
                )
            if len(parts) != 1:
                raise ValueError("stream_slice paths are one level deep")
            return _Operand(
                "slice", col=F.element_at(self.slice_map, parts[0])
            )
        raise ValueError(
            f"unknown namespace {ns_name!r} (record/config/stream_slice)"
        )

    # -- comparison building -----------------------------------------
    def _truthy(self, o: _Operand):
        from pyspark.sql import functions as F

        if o.kind == "lit":
            return F.lit(bool(o.value))
        if o.kind == "col" and isinstance(o.dtype, T.BooleanType):
            return F.coalesce(o.col, F.lit(False))
        if o.kind in ("col", "slice"):
            return o.col.isNotNull()
        raise ValueError("a bare list is not a condition")

    def _compare(self, lhs: _Operand, op: str, rhs: _Operand):
        from pyspark.sql import functions as F

        if op == "in":
            if rhs.kind == "list":
                return self._as_col(lhs, None).isin(*rhs.value)
            if rhs.kind == "col" and isinstance(rhs.dtype, T.ArrayType):
                return F.array_contains(rhs.col, self._as_col(lhs, None))
            raise ValueError("'in' needs a literal list or an array field")
        if lhs.kind == "list" or rhs.kind == "list":
            raise ValueError(f"a list is not comparable with {op!r}")
        # pick a target dtype so slice-map strings compare typed: the
        # record column's type wins; a numeric literal forces double
        dtype = lhs.dtype if lhs.kind == "col" else rhs.dtype
        if dtype is None:
            for o in (lhs, rhs):
                if o.kind == "lit" and isinstance(o.value, bool):
                    dtype = T.BooleanType()
                elif o.kind == "lit" and isinstance(o.value, (int, float)):
                    dtype = T.DoubleType()
        l, r = self._as_col(lhs, dtype), self._as_col(rhs, dtype)
        if op == "==":
            return l.eqNullSafe(r)
        if op == "!=":
            return ~l.eqNullSafe(r)
        return {"<": l < r, "<=": l <= r, ">": l > r, ">=": l >= r}[op]

    def _as_col(self, o: _Operand, dtype):
        from pyspark.sql import functions as F

        if o.kind == "lit":
            return F.lit(o.value)
        if o.kind == "slice" and dtype is not None:
            return o.col.cast(dtype)
        return o.col


def compile_condition(
    template: str,
    *,
    config: Mapping[str, Any],
    record_schema: T.StructType | None = None,
    slice_map=None,
):
    """RecordFilter: ``{{ record['created_at'] >= stream_slice[
    'start_date'] }}`` -> a Catalyst boolean Column. The template must
    be exactly one ``{{ ... }}`` expression (InterpolatedBoolean's
    shape). See the grammar on _ConditionParser."""
    inner = _single_expr(template)
    if inner is None:
        raise ValueError(
            f"record_filter must be one {{{{ ... }}}} expression, "
            f"got {template!r}"
        )
    return _ConditionParser(
        _cond_tokens(inner), config, record_schema, slice_map
    ).parse()


def compile_value(
    template: Any,
    *,
    config: Mapping[str, Any],
    record_schema: T.StructType | None = None,
    slice_map=None,
):
    """AddFields value template -> a Catalyst Column. A single
    ``{{ expr }}`` keeps its native type (``{{ record.user.id }}`` is
    the typed nested column; ``{{ config.tag }}`` a literal;
    ``{{ stream_slice.start_date }}`` the slice-map string); a mixed
    string renders each expression as string and concatenates, None
    rendering as '' (interpolate() parity)."""
    from pyspark.sql import functions as F

    if not isinstance(template, str):
        return F.lit(template)

    def one(expr: str):
        p = _ConditionParser(
            _cond_tokens(expr), config, record_schema, slice_map
        )
        o = p.operand()
        if p.i != len(p.toks):
            raise ValueError(f"value template must be one path: {expr!r}")
        if o.kind == "lit":
            return F.lit(o.value)
        if o.kind == "list":
            raise ValueError("a list is not a field value")
        return o.col

    inner = _single_expr(template)
    if inner is not None:
        return one(inner)
    parts, last = [], 0
    for m in _EXPR.finditer(template):
        if m.start() > last:
            parts.append(F.lit(template[last : m.start()]))
        parts.append(F.coalesce(one(m.group(1)).cast("string"), F.lit("")))
        last = m.end()
    if last < len(template):
        parts.append(F.lit(template[last:]))
    return F.concat(*parts) if len(parts) > 1 else parts[0]


def _field_path(p) -> str:
    """AddFields path / RemoveFields field_pointer: ["name"] or "name".
    Top-level only — nested struct rewrite is strictly rejected, not
    silently wrong."""
    if isinstance(p, (list, tuple)):
        if len(p) != 1:
            raise ValueError(
                f"nested transformation path {list(p)!r} unsupported "
                "(top-level fields only)"
            )
        p = p[0]
    if not isinstance(p, str):
        raise ValueError(f"bad transformation path {p!r}")
    return p


def build_transformations(
    specs,
    *,
    config: Mapping[str, Any],
    record_schema: T.StructType | None = None,
    slice_map=None,
):
    """Transformation specs -> DataFrame steps, applied in declared
    order (the reference applies its parse_response record reshaping
    in code order: source-github streams.py:174,337,602-603)::

        - {type: AddFields, fields: [{path: [branch],
             value: "{{ stream_slice.branch }}"}]}
        - {type: RemoveFields, field_pointers: [[obsolete]]}
    """
    steps = []
    for spec in specs or []:
        t = spec.get("type")
        if t == "AddFields":
            compiled = [
                (
                    _field_path(f["path"]),
                    compile_value(
                        f["value"],
                        config=config,
                        record_schema=record_schema,
                        slice_map=slice_map,
                    ),
                )
                for f in spec.get("fields", [])
            ]

            def add(df, compiled=compiled):
                for name, col in compiled:
                    df = df.withColumn(name, col)
                return df

            steps.append(add)
        elif t == "RemoveFields":
            names = [
                _field_path(p) for p in spec.get("field_pointers", [])
            ]
            steps.append(lambda df, names=names: df.drop(*names))
        else:
            raise ValueError(f"unknown transformation type {t!r}")
    return steps


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
        record_filter: str | None = None,
        transformations: list | None = None,
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
        self.record_filter = record_filter
        self.transformations = list(transformations or [])

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
        if kind == "tokens":
            # round-robin token pool (auth/token.py:26-34); headers are
            # per-REQUEST, so the pool rides as an authenticator, not a
            # static header
            toks = [interpolate(t, **ns) for t in spec["api_tokens"]]
            return {}, MultipleTokenAuthenticator(
                toks,
                auth_method=spec.get("prefix", "Bearer"),
                auth_header=spec.get("header", "Authorization"),
            )
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
            retry_on_status=tuple(retrier.get("retry_on_status", ())),
            backoff_strategy=retrier.get("backoff", {}).get(
                "type", "exponential"
            ),
            backoff_time=float(retrier.get("backoff", {}).get("time", 5.0)),
            backoff_wait_header=retrier.get("backoff", {}).get("header"),
            backoff_min_wait=float(
                retrier.get("backoff", {}).get("min_wait", 0.0)
            ),
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

    def _needs_slice_ns(self) -> bool:
        """True when the record filter or a transformation value
        references ``stream_slice`` — the read must then carry the
        slice column for the compiled expressions to draw on."""
        texts = [self.record_filter or ""]
        for spec in self.transformations:
            for f in spec.get("fields", []):
                v = f.get("value")
                if isinstance(v, str):
                    texts.append(v)
        return any(_SLICE_NS.search(t) for t in texts)

    def apply_record_pipeline(
        self,
        df: DataFrame,
        record_schema: T.StructType,
        slice_json_col: str | None = None,
    ) -> DataFrame:
        """Filter then transform, all JVM-side (the reference's
        record_selector order: extract -> filter -> reshape; filtering
        sees the RAW record, so a RemoveFields cannot hide the filter's
        own input). slice_json_col carries each record's originating
        slice as JSON; it parses ONCE per expression tree into
        map<string,string> for ``stream_slice`` references."""
        from pyspark.sql import functions as F

        slice_map = (
            F.from_json(F.col(slice_json_col), "map<string,string>")
            if slice_json_col is not None
            else None
        )
        if self.record_filter:
            df = df.filter(
                compile_condition(
                    self.record_filter,
                    config=self.config,
                    record_schema=record_schema,
                    slice_map=slice_map,
                )
            )
        for step in build_transformations(
            self.transformations,
            config=self.config,
            record_schema=record_schema,
            slice_map=slice_map,
        ):
            df = step(df)
        return df

    def read(
        self,
        spark: SparkSession,
        record_schema: T.StructType | None = None,
        stream_state: Mapping | None = None,
        slice_col: str | None = None,
    ) -> DataFrame:
        """Distributed read: slicer -> concrete slice dicts ->
        one executor task per slice (read_http_stream), then the
        compiled record filter + transformations over the parsed
        DataFrame."""
        logical = [dict(s) for s in self.stream_slices(stream_state)]
        slices = [self.slice_params(s) for s in logical]
        schema = record_schema or self.spark_schema()
        carry = slice_col or (
            "_ab_slice_json" if self._needs_slice_ns() else None
        )
        df = read_http_stream(
            spark,
            self.http_config(),
            slices,
            schema,
            slice_col=carry,
            slice_meta=logical,
        )
        df = self.apply_record_pipeline(df, schema, slice_json_col=carry)
        if carry is not None and slice_col is None:
            df = df.drop(carry)
        return df

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
            record_filter=spec.get("record_filter"),
            transformations=spec.get("transformations"),
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
            carry = "_ab_slice_json" if stream._needs_slice_ns() else None
            batch = read_http_stream(
                spark,
                stream.http_config(),
                [stream.slice_params(s)],
                stream.spark_schema(),
                slice_col=carry,
                slice_meta=[dict(s)],
            )
            batch = stream.apply_record_pipeline(
                batch, stream.spark_schema(), slice_json_col=carry
            )
            if carry is not None:
                batch = batch.drop(carry)
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
