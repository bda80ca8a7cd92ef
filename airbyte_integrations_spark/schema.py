"""Canonical StructTypes and the type-widening lattice.

PAGES matches BASELINE.json's input_hint. CHANGE_EVENTS adds the CDC /
system columns the reference injects:
  - _ab_cdc_lsn / _ab_cdc_updated_at / _ab_cdc_deleted_at:
    DebeziumEventUtils.java:19-20 (delete => before-image + stamp
    _ab_cdc_deleted_at), PostgresSource.java:53 (lsn column).
  - _airbyte_ab_id / _airbyte_emitted_at: JavaBaseConstants.java:19-21.

The widening lattice mirrors the reference's JSON-Schema lattice
boolean < integer < number < string (utils.py:19-92, cast rules
stream_processor.py:499-569) projected onto Spark types.
"""

from __future__ import annotations

from pyspark.sql import types as T

PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

CDC_COLUMNS = T.StructType(
    [
        T.StructField("_ab_cdc_lsn", T.LongType(), True),
        T.StructField("_ab_cdc_updated_at", T.TimestampType(), True),
        T.StructField("_ab_cdc_deleted_at", T.TimestampType(), True),
        T.StructField("_airbyte_ab_id", T.StringType(), False),
        T.StructField("_airbyte_emitted_at", T.TimestampType(), False),
    ]
)

CHANGE_EVENTS = T.StructType(list(PAGES.fields) + list(CDC_COLUMNS.fields))

# Lineage row: per (epoch, source partition) offset range + counts,
# mirroring the replication worker's per-stream stats
# (DefaultReplicationWorker.java:197-228).
LINEAGE = T.StructType(
    [
        T.StructField("stream", T.StringType(), False),
        T.StructField("epoch", T.LongType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("from_lsn", T.LongType(), True),
        T.StructField("to_lsn", T.LongType(), True),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("n_deletes", T.LongType(), False),
    ]
)

# Checkpoint row: committed epoch bounds per stream
# (STATE-after-commit rule, BufferedStreamConsumer.java:175-193).
CHECKPOINTS = T.StructType(
    [
        T.StructField("stream", T.StringType(), False),
        T.StructField("epoch", T.LongType(), False),
        T.StructField("from_lsn", T.LongType(), True),
        T.StructField("to_lsn", T.LongType(), False),
        T.StructField("n_applied", T.LongType(), False),
    ]
)

# --- widening lattice (boolean < integer < number < string) ------------

_WIDENING_ORDER = [
    T.BooleanType(),
    T.ByteType(),
    T.ShortType(),
    T.IntegerType(),
    T.LongType(),
    T.FloatType(),
    T.DoubleType(),
    T.StringType(),
]
_RANK = {t.typeName(): i for i, t in enumerate(_WIDENING_ORDER)}


def widen(a: T.DataType, b: T.DataType) -> T.DataType:
    """Least common widened type of two Spark types.

    Numeric/boolean widen along the lattice; any other mismatch widens to
    string (the reference's fallback: unknown -> VARCHAR,
    JdbcSourceOperations.java:95-100).
    """
    if a == b:
        return a
    ra, rb = _RANK.get(a.typeName()), _RANK.get(b.typeName())
    if ra is not None and rb is not None:
        return _WIDENING_ORDER[max(ra, rb)]
    # timestamp/date keep themselves when equal (handled above); mixed
    # complex or temporal vs anything -> string
    return T.StringType()


def merge_schemas(old: T.StructType, new: T.StructType) -> T.StructType:
    """Union-by-name schema merge with widening casts.

    Additive columns flow from the new batch, old rows get NULL; type
    conflicts widen (star_intersect.sql:9-47 + catalog_schema_change
    semantics, SURVEY §2.9).
    """
    fields: dict[str, T.StructField] = {f.name: f for f in old.fields}
    for f in new.fields:
        if f.name in fields:
            prev = fields[f.name]
            fields[f.name] = T.StructField(
                f.name, widen(prev.dataType, f.dataType), prev.nullable or f.nullable
            )
        else:
            # additive column: old rows are null-backfilled
            fields[f.name] = T.StructField(f.name, f.dataType, True)
    return T.StructType(list(fields.values()))


# Parquet widened-read compatibility (Spark 4.1 vectorized reader),
# verified empirically in this environment: integer upcasts, small-int
# -> double, float -> double read fine against old files; everything
# involving boolean, -> float, long -> double and -> string does NOT
# (FAILED_READ_FILE.PARQUET_COLUMN_DATA_TYPE_MISMATCH). A widening
# outside this set therefore requires rewriting existing files, or the
# committed manifest schema would make old buckets unreadable.
_PARQUET_WIDEN_OK = {
    ("byte", "short"), ("byte", "integer"), ("byte", "long"), ("byte", "double"),
    ("short", "integer"), ("short", "long"), ("short", "double"),
    ("integer", "long"), ("integer", "double"),
    ("float", "double"),
}


def parquet_read_compatible(old: T.DataType, new: T.DataType) -> bool:
    """Can parquet files written with physical type `old` be scanned
    under read schema `new` without a rewrite?"""
    if old == new:
        return True
    return (old.typeName(), new.typeName()) in _PARQUET_WIDEN_OK


def incompatible_widenings(
    old_schema: T.StructType, target_schema: T.StructType
) -> list[tuple[str, str, str]]:
    """Columns whose old->target type change cannot be served by the
    parquet reader over existing files -> [(name, old, new)]."""
    old = {f.name: f.dataType for f in old_schema.fields}
    out = []
    for f in target_schema.fields:
        if f.name in old and not parquet_read_compatible(old[f.name], f.dataType):
            out.append((f.name, old[f.name].simpleString(), f.dataType.simpleString()))
    return out
