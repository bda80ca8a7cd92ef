"""Minimal vendored Avro Object Container File codec (pure Python).

The reference reads Avro with fastavro
(source-s3/.../formats/avro_parser.py); neither fastavro nor the
spark-avro jar exists in this environment, so this module implements
the public Avro 1.11 spec directly — container framing (magic "Obj\\x01",
metadata map with avro.schema/avro.codec, 16-byte sync marker, blocks
of <count, byte-size, data, sync>), binary encoding (zigzag-varint
ints/longs, little-endian IEEE float/double, length-prefixed
bytes/string, records as concatenated fields, unions as branch-index +
value, arrays/maps as counted blocks), and the null/deflate codecs.

Scale design: `read_avro` decodes DISTRIBUTED — Spark's binaryFile
source ships each file's bytes to an executor, a mapInPandas worker
decodes it there with this codec, and rows come back Arrow-batched.
The driver touches only the first file's header (schema). One file =
one task, the same granularity the jar-based reader would use.

A matching minimal writer (`write_avro_file`) exists for fixture
generation and round-trip tests; it is not a production sink.
"""

from __future__ import annotations

import io
import json
import struct
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MAGIC = b"Obj\x01"

# ----------------------------------------------------------- primitives


def _read_long(buf: io.BytesIO) -> int:
    """Zigzag varint (spec: int and long share the encoding)."""
    b = buf.read(1)[0]
    n = b & 0x7F
    shift = 7
    while b & 0x80:
        b = buf.read(1)[0]
        n |= (b & 0x7F) << shift
        shift += 7
    return (n >> 1) ^ -(n & 1)


def _write_long(out: io.BytesIO, v: int) -> None:
    n = (v << 1) ^ (v >> 63)
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            return


def _read_bytes(buf: io.BytesIO) -> bytes:
    return buf.read(_read_long(buf))


def _write_bytes(out: io.BytesIO, v: bytes) -> None:
    _write_long(out, len(v))
    out.write(v)


# -------------------------------------------------------------- decoding


def _decoder(schema):
    """Compile an Avro schema (parsed JSON) into a decode(buf) closure."""
    if isinstance(schema, str):
        schema = {"type": schema}
    if isinstance(schema, list):  # union: branch index then value
        branches = [_decoder(s) for s in schema]
        mode = _union_plan(schema)[0]

        def dec_union(buf):
            v = branches[_read_long(buf)](buf)
            if mode == "json" and v is not None:
                return _json_canon(v)
            return v

        return dec_union

    t = schema["type"]
    if t == "null":
        return lambda buf: None
    if t == "boolean":
        return lambda buf: buf.read(1) == b"\x01"
    if t in ("int", "long"):
        logical = schema.get("logicalType")
        if logical in ("timestamp-millis", "timestamp-micros"):
            import datetime as _dt

            unit = 1_000 if logical == "timestamp-millis" else 1_000_000

            def dec_ts(buf):
                v = _read_long(buf)
                return _dt.datetime.fromtimestamp(v / unit, tz=_dt.timezone.utc).replace(tzinfo=None)

            return dec_ts
        if logical == "date":
            import datetime as _dt

            epoch = _dt.date(1970, 1, 1)
            return lambda buf: epoch + _dt.timedelta(days=_read_long(buf))
        return _read_long
    if t == "float":
        return lambda buf: struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return lambda buf: struct.unpack("<d", buf.read(8))[0]
    if t == "bytes":
        return _read_bytes
    if t == "string":
        return lambda buf: _read_bytes(buf).decode("utf-8")
    if t == "fixed":
        size = schema["size"]
        return lambda buf: buf.read(size)
    if t == "enum":
        symbols = schema["symbols"]
        return lambda buf: symbols[_read_long(buf)]
    if t == "record":
        fields = [(f["name"], _decoder(f["type"])) for f in schema["fields"]]

        def dec_record(buf):
            return {name: dec(buf) for name, dec in fields}

        return dec_record
    if t == "array":
        item = _decoder(schema["items"])

        def dec_array(buf):
            out = []
            while True:
                count = _read_long(buf)
                if count == 0:
                    return out
                if count < 0:  # negative count: byte size follows, skip it
                    count = -count
                    _read_long(buf)
                for _ in range(count):
                    out.append(item(buf))

        return dec_array
    if t == "map":
        val = _decoder(schema["values"])

        def dec_map(buf):
            out = {}
            while True:
                count = _read_long(buf)
                if count == 0:
                    return out
                if count < 0:
                    count = -count
                    _read_long(buf)
                for _ in range(count):
                    k = _read_bytes(buf).decode("utf-8")
                    out[k] = val(buf)

        return dec_map
    raise NotImplementedError(f"avro type {t!r}")


def read_avro_header(data: bytes) -> tuple[dict, str, bytes, int]:
    """-> (schema, codec, sync_marker, body_offset)."""
    buf = io.BytesIO(data)
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        count = _read_long(buf)
        if count == 0:
            break
        if count < 0:
            count = -count
            _read_long(buf)
        for _ in range(count):
            k = _read_bytes(buf).decode("utf-8")
            meta[k] = _read_bytes(buf)
    sync = buf.read(16)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise NotImplementedError(f"avro codec {codec!r}")
    return schema, codec, sync, buf.tell()


def decode_avro_file(data: bytes) -> tuple[dict, list[dict]]:
    """Decode a whole container file -> (schema, records)."""
    schema, codec, sync, off = read_avro_header(data)
    dec = _decoder(schema)
    buf = io.BytesIO(data)
    buf.seek(off)
    records: list[dict] = []
    while buf.tell() < len(data):
        count = _read_long(buf)
        block = buf.read(_read_long(buf))
        if codec == "deflate":
            block = zlib.decompress(block, -15)  # raw deflate per spec
        bbuf = io.BytesIO(block)
        for _ in range(count):
            records.append(dec(bbuf))
        if buf.read(16) != sync:
            raise ValueError("sync marker mismatch (corrupt block)")
    return schema, records



# ------------------------------------------------- multi-branch unions

_NUM_UNION = {"int", "long", "float", "double"}


def _union_plan(schema_list) -> tuple[str, "T.DataType", bool]:
    """Strategy for an Avro union (parity: the reference's fastavro
    parser accepts arbitrary unions — avro_parser.py in source-s3
    represents non-trivially-typed ones as strings):

    -> (mode, spark_type, nullable)
    - single non-null branch          -> ("typed", branch type, has_null)
    - all-numeric branches            -> ("typed", widened numeric,
      has_null) along Avro's own promotion lattice int<long<float<double
      (int|long stay LONG exactly; any float mixed with int/long widens
      to DOUBLE so 64-bit ints survive better than float32)
    - anything else (string|record, bytes|enum, ...) -> ("json",
      StringType, has_null): decoded values are canonical-JSON-ified.
    """
    names = []
    has_null = False
    non_null = []
    for b in schema_list:
        bt = b if isinstance(b, str) else (b.get("type") if isinstance(b, dict) else None)
        if bt == "null":
            has_null = True
            continue
        non_null.append(b)
        names.append(bt)
    if len(non_null) == 1:
        dt, _ = avro_to_spark_type(non_null[0])
        return "typed", dt, has_null
    if non_null and all(n in _NUM_UNION for n in names) and not any(
        isinstance(b, dict) and b.get("logicalType") for b in non_null
    ):
        if set(names) <= {"int", "long"}:
            return "typed", T.LongType(), has_null
        if set(names) == {"float"}:
            return "typed", T.FloatType(), has_null
        return "typed", T.DoubleType(), has_null
    return "json", T.StringType(), has_null


def _json_canon(v) -> str:
    """Deterministic JSON for union-as-string values: sorted keys, no
    whitespace; bytes -> base64, datetimes/dates -> ISO via str()."""
    import base64 as _b64

    def _default(x):
        if isinstance(x, bytes):
            return _b64.b64encode(x).decode("ascii")
        return str(x)

    return json.dumps(v, separators=(",", ":"), sort_keys=True, default=_default)


# ----------------------------------------------- schema -> Spark mapping


def avro_to_spark_type(schema) -> tuple[T.DataType, bool]:
    """-> (spark type, nullable). Unions of [null, X] -> nullable X;
    multi-branch unions decode to the WIDENED Spark type: all-numeric
    branches widen along Avro's promotion lattice, heterogeneous
    branches land as canonical-JSON strings (_union_plan — parity with
    the reference's fastavro union handling in source-s3's
    avro_parser)."""
    if isinstance(schema, str):
        schema = {"type": schema}
    if isinstance(schema, list):
        non_null = [s for s in schema if s != "null" and not (isinstance(s, dict) and s.get("type") == "null")]
        if len(non_null) != 1:
            _mode, dt, has_null = _union_plan(schema)
            return dt, has_null or len(non_null) == 0
        dt, _ = avro_to_spark_type(non_null[0])
        return dt, True
    t = schema["type"]
    logical = schema.get("logicalType")
    simple = {
        "boolean": T.BooleanType(), "int": T.IntegerType(),
        "long": T.LongType(), "float": T.FloatType(),
        "double": T.DoubleType(), "bytes": T.BinaryType(),
        "string": T.StringType(), "fixed": T.BinaryType(),
        "enum": T.StringType(),
    }
    if t in ("int", "long") and logical in ("timestamp-millis", "timestamp-micros"):
        return T.TimestampType(), False
    if t == "int" and logical == "date":
        return T.DateType(), False
    if t in simple:
        return simple[t], False
    if t == "record":
        fields = []
        for f in schema["fields"]:
            dt, nullable = avro_to_spark_type(f["type"])
            fields.append(T.StructField(f["name"], dt, nullable))
        return T.StructType(fields), False
    if t == "array":
        dt, nullable = avro_to_spark_type(schema["items"])
        return T.ArrayType(dt, containsNull=nullable), False
    if t == "map":
        dt, nullable = avro_to_spark_type(schema["values"])
        return T.MapType(T.StringType(), dt, valueContainsNull=nullable), False
    raise NotImplementedError(f"avro type {t!r}")


def avro_spark_schema(schema: dict) -> T.StructType:
    dt, _ = avro_to_spark_type(schema)
    if not isinstance(dt, T.StructType):
        raise ValueError("top-level Avro schema must be a record")
    return dt


# ------------------------------------------------------ distributed read

PATH_COL = "_avro_file_path"


def read_avro(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Distributed Avro read: binaryFile scan -> per-file executor-side
    decode -> Arrow batches. Output carries `_avro_file_path` so callers
    can attach file-level cursors. All files must share the first
    file's schema (the reference's per-stream single-schema contract)."""
    import pandas as pd

    # Probe 1 MB for the header; a container whose metadata block is
    # larger truncates mid-varint (IndexError/KeyError) OR mid-value —
    # the short avro.schema bytes then raise json.JSONDecodeError
    # (a ValueError) or UnicodeDecodeError — fall back to reading the
    # whole first file in every truncation shape.
    with open(paths[0], "rb") as f:
        head = f.read(1 << 20)
    try:
        schema = read_avro_header(head)[0]
    except (IndexError, KeyError, ValueError, UnicodeDecodeError):
        with open(paths[0], "rb") as f:
            schema = read_avro_header(f.read())[0]
    out_schema = avro_spark_schema(schema).add(PATH_COL, T.StringType(), False)
    field_names = [f.name for f in out_schema.fields if f.name != PATH_COL]

    def decode(batches):
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                _s, records = decode_avro_file(bytes(content))
                out = pd.DataFrame(records, columns=field_names)
                out[PATH_COL] = path
                yield out

    bf = spark.read.format("binaryFile").load(paths).select("path", "content")
    return bf.mapInPandas(decode, out_schema)


# ---------------------------------------------------------------- writer


def _encoder(schema):
    if isinstance(schema, str):
        schema = {"type": schema}
    if isinstance(schema, list):
        branches = [(s if isinstance(s, str) else s["type"], _encoder(s)) for s in schema]

        def _matches(name: str, v) -> bool:
            # Python-type -> branch dispatch for multi-branch unions
            # (fixtures/round-trips; [null, T] keeps its old behavior)
            if name == "null":
                return v is None
            if v is None:
                return False
            if name == "boolean":
                return isinstance(v, bool)
            if name in ("int", "long"):
                import datetime as _dt

                return (isinstance(v, int) and not isinstance(v, bool)) or isinstance(
                    v, (_dt.datetime, _dt.date)
                )
            if name in ("float", "double"):
                return isinstance(v, float)
            if name in ("string", "enum"):
                return isinstance(v, str)
            if name in ("bytes", "fixed"):
                return isinstance(v, (bytes, bytearray))
            if name in ("record", "map"):
                return isinstance(v, dict)
            if name == "array":
                return isinstance(v, list)
            return False

        def enc_union(out, v):
            for i, (name, enc) in enumerate(branches):
                if _matches(name, v):
                    _write_long(out, i)
                    if name != "null":
                        enc(out, v)
                    return
            raise ValueError(f"no union branch for {v!r}")

        return enc_union
    t = schema["type"]
    if t == "null":
        return lambda out, v: None
    if t == "boolean":
        return lambda out, v: out.write(b"\x01" if v else b"\x00")
    if t in ("int", "long"):
        return _write_long
    if t == "float":
        return lambda out, v: out.write(struct.pack("<f", v))
    if t == "double":
        return lambda out, v: out.write(struct.pack("<d", v))
    if t == "bytes":
        return _write_bytes
    if t == "string":
        return lambda out, v: _write_bytes(out, v.encode("utf-8"))
    if t == "record":
        fields = [(f["name"], _encoder(f["type"])) for f in schema["fields"]]

        def enc_record(out, v):
            for name, enc in fields:
                enc(out, v.get(name))

        return enc_record
    if t == "array":
        item = _encoder(schema["items"])

        def enc_array(out, v):
            if v:
                _write_long(out, len(v))
                for x in v:
                    item(out, x)
            _write_long(out, 0)

        return enc_array
    if t == "map":
        val = _encoder(schema["values"])

        def enc_map(out, v):
            if v:
                _write_long(out, len(v))
                for k, x in v.items():
                    _write_bytes(out, k.encode("utf-8"))
                    val(out, x)
            _write_long(out, 0)

        return enc_map
    raise NotImplementedError(f"avro write type {t!r}")


def write_avro_file(
    path: str, schema: dict, records: list[dict], codec: str = "deflate",
    sync: bytes = b"0123456789abcdef",
) -> None:
    """Minimal single-block container writer (fixtures / round trips)."""
    enc = _encoder(schema)
    body = io.BytesIO()
    for r in records:
        enc(body, r)
    block = body.getvalue()
    if codec == "deflate":
        block = zlib.compress(block)[2:-4]  # strip zlib header+adler -> raw
    out = io.BytesIO()
    out.write(MAGIC)
    meta = {"avro.schema": json.dumps(schema).encode(), "avro.codec": codec.encode()}
    _write_long(out, len(meta))
    for k, v in meta.items():
        _write_bytes(out, k.encode())
        _write_bytes(out, v)
    _write_long(out, 0)
    out.write(sync)
    _write_long(out, len(records))
    _write_bytes(out, block)
    out.write(sync)
    with open(path, "wb") as f:
        f.write(out.getvalue())


def spark_schema_to_avro(schema, name: str = "record") -> dict:
    """Map a Spark StructType to a writable Avro record schema, every
    field nullable (union with null) — the shape the reference's Avro
    destination emits (destination-s3 avro/AvroRecordFactory + the
    JsonToAvroSchemaConverter's nullable-by-default rule).

    Timestamps map to long/timestamp-micros and dates to int/date, the
    logical types the vendored decoder round-trips (this file,
    _decoder logical handling above).
    """
    from pyspark.sql import types as T

    def conv(dt, path):
        if isinstance(dt, T.StructType):
            return {
                "type": "record",
                "name": path,
                "fields": [
                    {"name": f.name, "type": ["null", conv(f.dataType, f"{path}_{f.name}")]}
                    for f in dt.fields
                ],
            }
        if isinstance(dt, T.ArrayType):
            return {"type": "array", "items": ["null", conv(dt.elementType, f"{path}_item")]}
        if isinstance(dt, T.MapType):
            return {"type": "map", "values": ["null", conv(dt.valueType, f"{path}_value")]}
        if isinstance(dt, T.TimestampType):
            return {"type": "long", "logicalType": "timestamp-micros"}
        if isinstance(dt, T.DateType):
            return {"type": "int", "logicalType": "date"}
        prim = {
            T.StringType: "string", T.BooleanType: "boolean",
            T.LongType: "long", T.IntegerType: "int",
            T.ShortType: "int", T.ByteType: "int",
            T.DoubleType: "double", T.FloatType: "float",
            T.BinaryType: "bytes",
        }.get(type(dt))
        if prim is None:
            raise NotImplementedError(f"avro mapping for spark type {dt}")
        return prim

    return conv(schema, name)


def to_avro_value(v):
    """Render a Python/Spark row value into what the vendored encoder
    expects for the schema produced by spark_schema_to_avro: datetimes
    become micros-since-epoch, dates become days-since-epoch."""
    import datetime as _dt

    if isinstance(v, _dt.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=_dt.timezone.utc)
        return int(v.timestamp() * 1_000_000)
    if isinstance(v, _dt.date):
        return (v - _dt.date(1970, 1, 1)).days
    if hasattr(v, "asDict"):  # nested Row -> record dict
        return {k: to_avro_value(x) for k, x in v.asDict().items()}
    if isinstance(v, (list, tuple)):
        return [to_avro_value(x) for x in v]
    if isinstance(v, dict):
        return {k: to_avro_value(x) for k, x in v.items()}
    if isinstance(v, bytearray):
        return bytes(v)
    return v
