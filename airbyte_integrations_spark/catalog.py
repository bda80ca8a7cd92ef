"""Catalog: JSON-Schema streams -> Spark types, identifier
normalization, and multi-stream sync orchestration.

Reference parity:
- JSON-Schema type lattice + predicates (utils.py:19-92) and cast rules
  (stream_processor.py:499-569): boolean < integer < number < string,
  date/date-time formats, object/array complex types; unknown -> string
  (JdbcSourceOperations.java:95-100 fallback).
- Identifier normalization (destination_name_transformer.py:69-161;
  stream_processor.py:313-341): lowercase, strip quotes/specials to _,
  prefix non-letter starts, truncate, suffix collisions _1, _2, ...
- Multi-stream run order: incremental streams first, then full-refresh
  (AbstractDbSource.java:135-140).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from airbyte_integrations_spark.config import DestinationSyncMode, SyncConfig, SyncMode
from airbyte_integrations_spark.pipeline import apply_batch
from airbyte_integrations_spark.lakehouse.table import LakeTable

# ---------------------------------------------------------------- types

_JSON_PRIMITIVES = {
    "boolean": T.BooleanType(),
    "integer": T.LongType(),  # integer -> bigint (stream_processor.py:506)
    "number": T.DoubleType(),  # number -> float8 (:512)
    "string": T.StringType(),
}


def json_schema_to_spark(prop: dict) -> T.DataType:
    """One JSON-Schema property -> Spark type (lattice + formats)."""
    typ = prop.get("type", "string")
    if isinstance(typ, list):  # e.g. ["null", "integer"] — nullable union
        non_null = [t for t in typ if t != "null"]
        if len(non_null) == 1:
            typ = non_null[0]
        else:  # widen across the union, string as the top
            widened = "boolean"
            order = ["boolean", "integer", "number", "string"]
            for t in non_null:
                if t not in order:
                    return T.StringType()
                if order.index(t) > order.index(widened):
                    widened = t
            typ = widened
    if typ == "string":
        fmt = prop.get("format", "")
        if fmt == "date":
            return T.DateType()
        if fmt in ("date-time", "datetime"):
            return T.TimestampType()
        return T.StringType()
    if typ == "object":
        props = prop.get("properties")
        if not props:
            return T.StringType()  # opaque json blob
        return T.StructType(
            [T.StructField(k, json_schema_to_spark(v), True) for k, v in props.items()]
        )
    if typ == "array":
        items = prop.get("items", {"type": "string"})
        return T.ArrayType(json_schema_to_spark(items))
    return _JSON_PRIMITIVES.get(typ, T.StringType())


def stream_struct(json_schema: dict) -> T.StructType:
    """AirbyteStream.json_schema -> StructType for from_json."""
    props = json_schema.get("properties", {})
    return T.StructType(
        [T.StructField(k, json_schema_to_spark(v), True) for k, v in props.items()]
    )


# ------------------------------------------------------ identifier names

_MAX_IDENT = 63  # postgres limit, the reference's common denominator


def normalize_name(name: str) -> str:
    """Lower/underscore identifier normalization
    (destination_name_transformer.py:69-161 semantics)."""
    s = re.sub(r"[^A-Za-z0-9_]", "_", name)
    s = s.lower()
    if not s or not re.match(r"[a-z_]", s[0]):
        s = "_" + s
    return s[:_MAX_IDENT]


def normalize_names(names: list[str]) -> dict[str, str]:
    """Collision-suffixed normalization map (stream_processor.py:313-341:
    colliding normalized names get _1, _2, ... in input order)."""
    out: dict[str, str] = {}
    seen: dict[str, int] = {}
    for n in names:
        base = normalize_name(n)
        if base in seen:
            seen[base] += 1
            cand = f"{base[: _MAX_IDENT - len(str(seen[base])) - 1]}_{seen[base]}"
            out[n] = cand
        else:
            seen[base] = 0
            out[n] = base
    return out


# ------------------------------------------------------- catalog runner

@dataclass(frozen=True)
class ConfiguredStream:
    config: SyncConfig
    json_schema: dict | None = None


def run_catalog_sync(
    spark: SparkSession,
    streams: list[tuple[ConfiguredStream, DataFrame]],
    lake_root: str,
    epoch: int | None = None,
) -> dict[str, int]:
    """One sync over a configured catalog: incremental streams first,
    then full-refresh (AbstractDbSource.java:135-140), each applied to
    its own LakeTable under lake_root (namespaced streams nest under
    `<namespace>/<stream>`, the reference's ${NAMESPACE}/${STREAM}
    path template, S3DestinationConstants.java:19). Returns
    {qualified stream: version}."""
    ordered = sorted(
        streams, key=lambda s: 0 if s[0].config.sync_mode == SyncMode.INCREMENTAL else 1
    )
    versions: dict[str, int] = {}
    for cs, df in ordered:
        cfg = cs.config
        ns = cfg.properties.get("namespace")
        rel = (
            f"{normalize_name(ns)}/{normalize_name(cfg.stream)}"
            if ns
            else normalize_name(cfg.stream)
        )
        table = LakeTable(spark, f"{lake_root}/{rel}")
        key = f"{ns}.{cfg.stream}" if ns else cfg.stream
        versions[key] = apply_batch(table, df, cfg, epoch=epoch)
    return versions
