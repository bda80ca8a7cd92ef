"""Kafka single-record Avro wire format (schema-registry framing).

Production Debezium/Kafka topics rarely carry JSON: each message value
is the Confluent wire format — ``0x00`` magic byte, 4-byte big-endian
schema id, then the SCHEMALESS Avro binary body (no container framing,
no embedded schema; the id points into the registry). The reference
reads registry-framed Avro through Kafka consumers configured with the
registry deserializer (source-kafka's consumer properties;
source-s3's avro path handles the container flavor via fastavro,
avro_parser.py). This module implements the wire flavor over the same
vendored pure-Python codec as sources/avro_io.py.

Scale shape: decode and encode are Arrow-batched ``mapInPandas``
passes — each executor task decodes its own partition's messages with
a per-schema-id compiled decoder (compiled once per task, cached), and
every non-value column (partition, offset, key, timestamp) rides
through untouched, so the output feeds sync_partitioned_log's vector
offset state directly. A topic may interleave MANY schema ids (the
registry's subject history): every row decodes under its WRITER
schema, then projects to the reader schema — missing fields null,
extra fields dropped — which is exactly Avro's reader/writer
resolution for the additive-evolution case and lands on the engine's
schema-evolution taxonomy.
"""

from __future__ import annotations

import io
import json

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from airbyte_integrations_spark.sources.avro_io import (
    _decoder,
    _encoder,
    avro_spark_schema,
)

MAGIC_BYTE = 0
_HEADER_LEN = 5


def _parse_schema(s) -> dict:
    return json.loads(s) if isinstance(s, str) else s


def wire_header(schema_id: int) -> bytes:
    if not 0 <= schema_id < (1 << 32):
        raise ValueError("schema_id must fit 4 bytes")
    return bytes([MAGIC_BYTE]) + schema_id.to_bytes(4, "big")


def wire_schema_id(value: bytes) -> int:
    """Schema id of one framed message (validates the magic byte)."""
    if len(value) < _HEADER_LEN or value[0] != MAGIC_BYTE:
        raise ValueError(
            "not Confluent wire format: expected magic byte 0x00 + 4-byte "
            f"schema id, got {value[:_HEADER_LEN]!r}"
        )
    return int.from_bytes(value[1:_HEADER_LEN], "big")


def read_avro_wire(
    df: DataFrame,
    registry: dict[int, dict | str],
    reader_schema_id: int | None = None,
    value_col: str = "value",
    null_value_policy: str = "error",
) -> DataFrame:
    """Decode a frame of wire-framed Avro messages.

    ``registry`` maps schema id -> Avro schema (parsed JSON or JSON
    string) — the subject's version history. The output schema is the
    READER schema (``reader_schema_id``, default the highest id);
    rows written under older ids project into it (absent fields null).
    Unknown ids and bad magic bytes fail the task with a clear error —
    a poisoned topic should stop the sync, not silently drop rows.
    Every column except ``value_col`` passes through unchanged.

    ``null_value_policy`` handles Kafka log-compaction tombstones —
    messages whose VALUE is null, which Debezium appends after every
    delete envelope so compaction can drop the key. "error" (default)
    refuses them, "skip" drops them (the Debezium consumer's own
    behavior — the delete was already a full envelope), "keep" emits
    the row with every decoded field null (passthrough columns intact)
    so a compacted-topic consumer can treat the key's presence itself
    as the deletion."""
    import pandas as pd

    if null_value_policy not in ("error", "skip", "keep"):
        raise ValueError(f"unknown null_value_policy {null_value_policy!r}")
    reg = {int(k): _parse_schema(v) for k, v in registry.items()}
    if not reg:
        raise ValueError("empty schema registry")
    reader_id = max(reg) if reader_schema_id is None else int(reader_schema_id)
    if reader_id not in reg:
        raise ValueError(f"reader schema id {reader_id} not in registry")
    reader_struct = avro_spark_schema(reg[reader_id])
    field_names = [f.name for f in reader_struct.fields]
    passthrough = [f for f in df.schema.fields if f.name != value_col]
    # reader fields are nullable regardless of the Avro nullability:
    # older writer versions lack newer fields, and the "keep" tombstone
    # policy emits all-null payload rows
    out_schema = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in reader_struct.fields]
        + passthrough
    )

    def decode(batches):
        decoders: dict[int, object] = {}
        for pdf in batches:
            recs = []
            keep_mask = []
            for v in pdf[value_col]:
                if v is None:
                    if null_value_policy == "error":
                        raise ValueError(
                            "null message value (log-compaction tombstone); "
                            "pass null_value_policy='skip' or 'keep'"
                        )
                    keep_mask.append(null_value_policy == "keep")
                    if null_value_policy == "keep":
                        recs.append({f: None for f in field_names})
                    continue
                keep_mask.append(True)
                b = bytes(v)
                sid = wire_schema_id(b)
                dec = decoders.get(sid)
                if dec is None:
                    if sid not in reg:
                        raise ValueError(
                            f"message schema id {sid} not in registry "
                            f"(known: {sorted(reg)})"
                        )
                    dec = decoders[sid] = _decoder(reg[sid])
                rec = dec(io.BytesIO(b[_HEADER_LEN:]))
                recs.append({f: rec.get(f) for f in field_names})
            out = pd.DataFrame(recs, columns=field_names)
            for f in passthrough:
                out[f.name] = pdf[f.name].values[keep_mask]
            yield out

    return df.mapInPandas(decode, out_schema)


def write_avro_wire(
    df: DataFrame,
    schema: dict | str,
    schema_id: int,
    value_cols: list[str] | None = None,
    value_col: str = "value",
) -> DataFrame:
    """Encode rows as wire-framed Avro messages (the fixture/emitter
    inverse; distributed mapInPandas). ``value_cols`` picks the fields
    of the body (default: the schema's own field names); every other
    column passes through, so (partition, offset) framing built by the
    caller survives alongside the encoded ``value``."""
    import pandas as pd

    sch = _parse_schema(schema)
    enc = None  # compiled lazily on the executor
    header = wire_header(int(schema_id))
    cols = value_cols or [f["name"] for f in sch["fields"]]
    passthrough = [f for f in df.schema.fields if f.name not in cols]
    out_schema = T.StructType(
        [T.StructField(value_col, T.BinaryType(), False)] + passthrough
    )

    # Arrow->pandas turns nullable int64 columns into float64 (NaN has
    # no int representation); re-integerize them so the union encoder
    # sees real longs, not 1.6e15 floats.
    int_cols = {
        f.name
        for f in df.schema.fields
        if f.name in cols
        and isinstance(f.dataType, (T.LongType, T.IntegerType, T.ShortType))
    }

    def encode(batches):
        nonlocal enc
        if enc is None:
            enc = _encoder(sch)
        import numpy as np

        def pyify(v):
            # Arrow->pandas hands arrays as np.ndarray, scalars as
            # numpy generics, structs as dicts of the same — normalize
            # to plain Python so union-branch matching sees real types
            if v is None or (isinstance(v, float) and v != v):
                return None
            if isinstance(v, np.ndarray):
                return [pyify(x) for x in v.tolist()]
            if isinstance(v, np.generic):
                return v.item()
            if isinstance(v, dict):
                return {k: pyify(x) for k, x in v.items()}
            if isinstance(v, list):
                return [pyify(x) for x in v]
            return v

        for pdf in batches:
            vals = []
            for rec in pdf[cols].to_dict("records"):
                clean = {}
                for k, v in rec.items():
                    v = pyify(v)
                    if v is not None and k in int_cols:
                        v = int(v)
                    clean[k] = v
                buf = io.BytesIO()
                enc(buf, clean)
                vals.append(header + buf.getvalue())
            out = pd.DataFrame({value_col: vals})
            for f in passthrough:
                out[f.name] = pdf[f.name].values
            yield out

    return df.mapInPandas(encode, out_schema)
