"""Vendored Avro codec: binary round trips, container framing, Spark
schema mapping, and the distributed binaryFile+mapInPandas read path
with the file-source mtime cursor."""

import datetime as dt
import io

import pytest

from airbyte_integrations_spark.sources.avro_io import (
    _read_long,
    _write_long,
    avro_spark_schema,
    decode_avro_file,
    read_avro,
    read_avro_header,
    write_avro_file,
)
from pyspark.sql import types as T

SCHEMA = {
    "type": "record",
    "name": "Page",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "url", "type": ["null", "string"]},
        {"name": "score", "type": "double"},
        {"name": "ok", "type": "boolean"},
        {"name": "raw", "type": "bytes"},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "props", "type": {"type": "map", "values": "long"}},
        {
            "name": "fetched_at",
            "type": {"type": "long", "logicalType": "timestamp-micros"},
        },
    ],
}


def _records(n):
    base = dt.datetime(2024, 1, 1)
    return [
        {
            "id": i,
            "url": None if i % 5 == 0 else f"https://ex.com/{i}",
            "score": i * 0.25,
            "ok": i % 2 == 0,
            "raw": bytes([i % 256, 255 - i % 256]),
            "tags": [f"t{i}", "x"] if i % 3 else [],
            "props": {"a": i, "b": -i} if i % 4 else {},
            "fetched_at": int(
                (base + dt.timedelta(seconds=i))
                .replace(tzinfo=dt.timezone.utc)
                .timestamp() * 1e6
            ),
        }
        for i in range(n)
    ]


def test_zigzag_varint_roundtrip():
    for v in (0, -1, 1, 63, 64, -64, -65, 2**31, -(2**31), 2**62, -(2**62)):
        out = io.BytesIO()
        _write_long(out, v)
        assert _read_long(io.BytesIO(out.getvalue())) == v


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_container_roundtrip(tmp_path, codec):
    p = str(tmp_path / f"f_{codec}.avro")
    recs = _records(50)
    write_avro_file(p, SCHEMA, recs, codec=codec)
    with open(p, "rb") as f:
        data = f.read()
    schema, got = decode_avro_file(data)
    assert schema["name"] == "Page"
    assert len(got) == 50
    assert got[0]["url"] is None and got[1]["url"] == "https://ex.com/1"
    assert got[7]["raw"] == bytes([7, 248])
    assert got[3]["tags"] == [] and got[3]["props"] == {"a": 3, "b": -3}
    assert got[4]["tags"] == ["t4", "x"] and got[4]["props"] == {}
    # timestamps decode to naive-UTC datetimes
    assert got[10]["fetched_at"] == dt.datetime(2024, 1, 1, 0, 0, 10)
    # header alone parses
    sch, cdc, sync, off = read_avro_header(data)
    assert cdc == codec and len(sync) == 16 and off > 4


def test_corrupt_sync_marker_detected(tmp_path):
    p = str(tmp_path / "bad.avro")
    write_avro_file(p, SCHEMA, _records(3), codec="null")
    data = bytearray(open(p, "rb").read())
    data[-1] ^= 0xFF  # clobber trailing sync
    with pytest.raises(ValueError, match="sync"):
        decode_avro_file(bytes(data))


def test_spark_schema_mapping():
    st = avro_spark_schema(SCHEMA)
    d = {f.name: f for f in st.fields}
    assert d["id"].dataType == T.LongType() and d["id"].nullable is False
    assert d["url"].dataType == T.StringType() and d["url"].nullable is True
    assert d["raw"].dataType == T.BinaryType()
    assert d["tags"].dataType == T.ArrayType(T.StringType(), False)
    assert d["props"].dataType == T.MapType(T.StringType(), T.LongType(), False)
    assert d["fetched_at"].dataType == T.TimestampType()
    # multi-branch unions now map to the widened Spark type
    st2 = avro_spark_schema(
        {"type": "record", "name": "R",
         "fields": [{"name": "u", "type": ["null", "string", "long"]},
                    {"name": "n", "type": ["int", "long"]},
                    {"name": "x", "type": ["null", "int", "double"]}]}
    )
    d2 = {f.name: f for f in st2.fields}
    assert d2["u"].dataType == T.StringType() and d2["u"].nullable is True
    assert d2["n"].dataType == T.LongType() and d2["n"].nullable is False
    assert d2["x"].dataType == T.DoubleType() and d2["x"].nullable is True


def test_distributed_read_and_mtime_cursor(spark, tmp_path):
    """The closed gate: fmt='avro' through read_files_incremental —
    executor-side decode, system columns, strictly-greater mtime
    resume."""
    import os
    import time

    from airbyte_integrations_spark.sources.files import (
        CURSOR_COL,
        URL_COL,
        read_files_incremental,
    )

    root = str(tmp_path / "avro_src")
    os.makedirs(root)
    for i, codec in enumerate(["deflate", "null"]):
        p = os.path.join(root, f"part{i}.avro")
        write_avro_file(p, SCHEMA, _records(20), codec=codec)
        os.utime(p, (time.time() - 60 + i * 10,) * 2)

    df, state = read_files_incremental(spark, root, fmt="avro", suffix=".avro")
    assert df.count() == 40
    assert {URL_COL, CURSOR_COL} <= set(df.columns)
    assert df.select(URL_COL).distinct().count() == 2
    row = df.filter("id = 1").orderBy(URL_COL).first()
    assert row["url"] == "https://ex.com/1" and row["fetched_at"] is not None

    # nothing new => no dataframe, state unchanged
    df2, state2 = read_files_incremental(spark, root, fmt="avro", state=state)
    assert df2 is None and state2 == state

    # a newer file arrives => only it is read
    p3 = os.path.join(root, "part2.avro")
    write_avro_file(p3, SCHEMA, _records(5), codec="deflate")
    df3, state3 = read_files_incremental(spark, root, fmt="avro", state=state)
    assert df3.count() == 5 and state3.cursor > state.cursor


def test_codec_property_roundtrip_hypothesis(tmp_path):
    """Property: encode -> container write -> decode is the identity on
    records drawn from the schema's value domain (both codecs)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    rec = st.fixed_dictionaries(
        {
            "id": st.integers(min_value=-(2**63), max_value=2**63 - 1),
            "url": st.one_of(st.none(), st.text(max_size=40)),
            "score": st.floats(allow_nan=False, allow_infinity=False, width=64),
            "ok": st.booleans(),
            "raw": st.binary(max_size=32),
            "tags": st.lists(st.text(max_size=10), max_size=5),
            "props": st.dictionaries(st.text(min_size=1, max_size=8),
                                     st.integers(min_value=-10**12, max_value=10**12),
                                     max_size=4),
            "fetched_at": st.integers(min_value=0, max_value=2**52),
        }
    )

    @settings(max_examples=25, deadline=None)
    @given(recs=st.lists(rec, min_size=0, max_size=20),
           codec=st.sampled_from(["null", "deflate"]))
    def run(recs, codec):
        p = str(tmp_path / "prop.avro")
        write_avro_file(p, SCHEMA, recs, codec=codec)
        _schema, got = decode_avro_file(open(p, "rb").read())
        assert len(got) == len(recs)
        for a, b in zip(got, recs):
            assert a["id"] == b["id"] and a["url"] == b["url"]
            assert a["ok"] == b["ok"] and a["raw"] == b["raw"]
            assert a["tags"] == b["tags"] and a["props"] == b["props"]
            assert a["score"] == b["score"]

    run()


def test_avro_options_rejected_not_ignored(spark, tmp_path):
    import os

    from airbyte_integrations_spark.sources.files import read_files_incremental

    root = str(tmp_path / "a")
    os.makedirs(root)
    write_avro_file(os.path.join(root, "x.avro"), SCHEMA, _records(2))
    with pytest.raises(ValueError, match="no options"):
        read_files_incremental(spark, root, fmt="avro", header=True)


def test_header_larger_than_probe_falls_back(tmp_path):
    """A >1MB metadata block must not crash the driver probe."""
    import json as _json

    from airbyte_integrations_spark.sources.avro_io import read_avro

    big_schema = dict(SCHEMA)
    big_schema = {
        **SCHEMA,
        "doc": "x" * (1 << 20 + 1),  # pad metadata past the 1MB probe
    }
    p = str(tmp_path / "big.avro")
    write_avro_file(p, big_schema, _records(3))
    assert len(_json.dumps(big_schema)) > (1 << 20)
    # driver-side schema probe only (no spark session needed): the
    # module-level fallback path re-reads the whole file
    from airbyte_integrations_spark.sources import avro_io

    with open(p, "rb") as f:
        head = f.read(1 << 20)
    with pytest.raises((IndexError, KeyError)):
        avro_io.read_avro_header(head)
    schema, recs = avro_io.decode_avro_file(open(p, "rb").read())
    assert len(recs) == 3


UNION_SCHEMA = {
    "type": "record",
    "name": "U",
    "fields": [
        {"name": "id", "type": "long"},
        # heterogeneous 3-branch union -> canonical-JSON string column
        {"name": "u", "type": ["null", "long", "string"]},
        # all-numeric unions -> widened typed columns
        {"name": "n", "type": ["int", "long"]},
        {"name": "x", "type": ["null", "int", "double"]},
    ],
}


def test_multi_branch_union_roundtrip(tmp_path):
    """3-branch union fixture round-trip (reference parity: source-s3's
    fastavro avro_parser accepts arbitrary unions; heterogeneous ones
    land as strings)."""
    from airbyte_integrations_spark.sources.avro_io import (
        decode_avro_file,
        write_avro_file,
    )

    recs = [
        {"id": 1, "u": 42, "n": 7, "x": 5},
        {"id": 2, "u": "hello", "n": 2**40, "x": 2.5},
        {"id": 3, "u": None, "n": 3, "x": None},
    ]
    p = str(tmp_path / "u.avro")
    write_avro_file(p, UNION_SCHEMA, recs)
    _schema, out = decode_avro_file(open(p, "rb").read())
    assert [r["u"] for r in out] == ["42", '"hello"', None]
    assert [r["n"] for r in out] == [7, 2**40, 3]
    assert [r["x"] for r in out] == [5, 2.5, None]


def test_multi_branch_union_distributed_read(spark, tmp_path):
    from airbyte_integrations_spark.sources.avro_io import read_avro, write_avro_file

    recs = [
        {"id": 1, "u": 42, "n": 7, "x": 5},
        {"id": 2, "u": "hello", "n": 2**40, "x": 2.5},
        {"id": 3, "u": None, "n": 3, "x": None},
    ]
    p = str(tmp_path / "u2.avro")
    write_avro_file(p, UNION_SCHEMA, recs)
    df = read_avro(spark, [p]).orderBy("id")
    sch = {f.name: f.dataType for f in df.schema.fields}
    assert sch["u"] == T.StringType()
    assert sch["n"] == T.LongType()
    assert sch["x"] == T.DoubleType()
    rows = df.collect()
    assert [r["u"] for r in rows] == ["42", '"hello"', None]
    assert [r["n"] for r in rows] == [7, 2**40, 3]
    assert [r["x"] for r in rows] == [5.0, 2.5, None]
