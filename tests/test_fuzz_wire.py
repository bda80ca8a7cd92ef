"""Property fuzz of the twelfth-pass codecs.

- Avro wire format: generated record schemas (scalars, null-unions,
  arrays, a nested record) and matching values must round-trip
  bit-exactly through write_avro_wire -> read_avro_wire.
- MySQL binlog fold: generated (file ordinal, pos) pairs must fold to
  exactly ordinal*2^40+pos and stay order-isomorphic to the composite
  lexicographic order (MySqlCdcTargetPosition.java:71-80 rule).
- Schemaless discovery: generated document sets must discover exactly
  what a pure-Python model of the reference rule predicts
  (MongoUtils.getUniqueFields:202-214: key union, per-key type sets,
  mixed/only-null => <name>_aibyte_transform string, single-typed
  object recursion, array element typing).
"""

import json
import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ----------------------------------------------------------- avro wire

_SCALARS = [
    ("long", T.LongType(), st.integers(min_value=-(2**62), max_value=2**62)),
    (
        "double",
        T.DoubleType(),
        st.floats(allow_nan=False, allow_infinity=False, width=64),
    ),
    ("string", T.StringType(), st.text(max_size=20)),
    ("boolean", T.BooleanType(), st.booleans()),
]


@st.composite
def wire_cases(draw):
    n_fields = draw(st.integers(min_value=1, max_value=5))
    fields = []
    for i in range(n_fields):
        kind = draw(st.integers(min_value=0, max_value=len(_SCALARS) + 1))
        name = f"f{i}"
        if kind < len(_SCALARS):
            alias, stype, vals = _SCALARS[kind]
            nullable = draw(st.booleans())
            avro = ["null", alias] if nullable else alias
            vstrat = st.none() | vals if nullable else vals
            fields.append((name, avro, stype, vstrat, nullable))
        elif kind == len(_SCALARS):
            elem_alias, elem_stype, elem_vals = _SCALARS[
                draw(st.integers(min_value=0, max_value=2))
            ]
            avro = ["null", {"type": "array", "items": elem_alias}]
            stype = T.ArrayType(elem_stype, False)
            vstrat = st.none() | st.lists(elem_vals, max_size=4)
            fields.append((name, avro, stype, vstrat, True))
        else:
            avro = [
                "null",
                {
                    "type": "record",
                    "name": f"rec{i}",
                    "fields": [
                        {"name": "a", "type": "long"},
                        {"name": "b", "type": ["null", "string"], "default": None},
                    ],
                },
            ]
            stype = T.StructType(
                [
                    T.StructField("a", T.LongType(), True),
                    T.StructField("b", T.StringType(), True),
                ]
            )
            vstrat = st.none() | st.fixed_dictionaries(
                {
                    "a": st.integers(min_value=-(2**40), max_value=2**40),
                    "b": st.none() | st.text(max_size=8),
                }
            )
            fields.append((name, avro, stype, vstrat, True))
    n_rows = draw(st.integers(min_value=1, max_value=6))
    rows = [
        tuple(draw(f[3]) for f in fields) for _ in range(n_rows)
    ]
    return fields, rows


@given(wire_cases())
@settings(max_examples=10, deadline=None)
def test_avro_wire_fuzz_roundtrip(spark, case):
    from airbyte_integrations_spark.sources.avro_wire import (
        read_avro_wire,
        write_avro_wire,
    )

    fields, rows = case
    avro_schema = {
        "type": "record",
        "name": "fuzz",
        "fields": [
            {"name": n, "type": a, **({"default": None} if nul else {})}
            for n, a, _, _, nul in fields
        ],
    }
    spark_schema = T.StructType(
        [T.StructField(n, t, True) for n, _, t, _, _ in fields]
    )
    df = spark.createDataFrame(rows, spark_schema)
    back = read_avro_wire(
        write_avro_wire(df, avro_schema, 1), {1: avro_schema}
    )
    a = sorted(map(repr, df.collect()))
    b = sorted(map(repr, back.collect()))
    assert a == b


# ----------------------------------------------------------- mysql fold


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**22),
            st.integers(min_value=0, max_value=2**40 - 1),
        ),
        min_size=1,
        max_size=40,
        unique=True,
    )
)
@settings(max_examples=15, deadline=None)
def test_mysql_fold_fuzz_exact_and_order_isomorphic(spark, pairs):
    from airbyte_integrations_spark.sources.debezium import mysql_binlog_lsn

    df = spark.createDataFrame(
        [(f"mysql-bin.{seq:06d}", pos) for seq, pos in pairs],
        "file string, pos long",
    )
    got = [
        r["lsn"]
        for r in df.select(
            mysql_binlog_lsn("file", "pos").alias("lsn")
        ).collect()
    ]
    want = [seq * (1 << 40) + pos for seq, pos in pairs]
    assert got == want
    # order isomorphism to the composite compare
    by_fold = sorted(range(len(pairs)), key=lambda i: got[i])
    by_pair = sorted(range(len(pairs)), key=lambda i: pairs[i])
    assert by_fold == by_pair


# ------------------------------------------------- schemaless discovery

_KEYS = ["a", "b", "c", "d"]

_doc_scalar = (
    st.none()
    | st.integers(min_value=-(2**50), max_value=2**50)
    | st.text(max_size=6)
    | st.booleans()
    | st.floats(allow_nan=False, allow_infinity=False, width=64).filter(
        lambda v: math.isfinite(v)
    )
)

_doc_value = (
    _doc_scalar
    | st.lists(
        st.integers(min_value=0, max_value=99) | st.text(max_size=4), max_size=3
    )
    | st.fixed_dictionaries({}, optional={"x": st.integers(0, 9), "y": st.text(max_size=3)})
)


@st.composite
def doc_sets(draw):
    n = draw(st.integers(min_value=1, max_value=8))
    docs = []
    for i in range(n):
        doc = {"_id": f"d{i}"}
        for k in _KEYS:
            if draw(st.booleans()):
                doc[k] = draw(_doc_value)
        docs.append(doc)
    return docs


def _model_alias(v):
    # python-value analogue of Mongo's $type alias, matching JSON
    # rendering: bool before int (bool is an int subclass)
    if v is None:
        return None
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, int):
        return "long"
    if isinstance(v, float):
        # json.dumps renders integral floats as "2.0" => decimal => double
        return "double"
    if isinstance(v, str):
        return "string"
    if isinstance(v, list):
        return "array"
    if isinstance(v, dict):
        return "object"
    raise AssertionError(v)


def _model_discover(docs):
    """Pure-Python model of getUniqueFields: union of keys, per-key
    observed type set minus nulls; != 1 type => suffixed string;
    object => recurse; array => single-scalar-element type else
    string elements."""
    from airbyte_integrations_spark.sources.mongo import AIRBYTE_SUFFIX

    keys = sorted({k for d in docs for k in d})
    out = {}
    for k in keys:
        seen = [d[k] for d in docs if k in d]
        tys = {_model_alias(v) for v in seen} - {None}
        if len(tys) != 1:
            out[k + AIRBYTE_SUFFIX] = "mixed-string"
            continue
        ty = next(iter(tys))
        if ty == "object":
            out[k] = _model_discover([v for v in seen if isinstance(v, dict)])
        elif ty == "array":
            etys = {
                _model_alias(e) for v in seen if isinstance(v, list) for e in v
            } - {None}
            out[k] = (
                f"array<{next(iter(etys))}>" if len(etys) == 1 else "array<string>"
            )
        else:
            out[k] = ty
    return out


def _render(fields):
    from airbyte_integrations_spark.sources.mongo import FieldInfo

    out = {}
    for f in fields:
        if isinstance(f.dtype, T.StructType):
            out[f.name] = _render(f.children)
        elif f.mixed:
            out[f.name] = "mixed-string"
        elif isinstance(f.dtype, T.ArrayType):
            e = {
                T.LongType(): "long",
                T.DoubleType(): "double",
                T.StringType(): "string",
                T.BooleanType(): "boolean",
            }[f.dtype.elementType]
            out[f.name] = f"array<{e}>"
        else:
            out[f.name] = {
                T.LongType(): "long",
                T.DoubleType(): "double",
                T.StringType(): "string",
                T.BooleanType(): "boolean",
            }[f.dtype]
    return out


@given(doc_sets())
@settings(max_examples=12, deadline=None)
def test_discovery_fuzz_vs_reference_model(spark, docs):
    from airbyte_integrations_spark.sources.mongo import discover_collection

    lines = spark.createDataFrame(
        [(json.dumps(d),) for d in docs], "value string"
    )
    got = _render(discover_collection(spark, lines))
    want = _model_discover(docs)
    # the model keeps empty objects as {} sub-discoveries; Spark can't
    # type an empty struct's fields either — both sides render {}
    assert got == want
