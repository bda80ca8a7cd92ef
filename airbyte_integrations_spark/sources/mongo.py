"""Schemaless (MongoDB-style) collection source: sampled field/type
discovery with the mixed-type string fallback, `_id` primary key, and
strict-`>` cursor reads.

Reference semantics (source-mongodb-v2 + airbyte-db mongodb):

- Discovery samples the first DISCOVER_LIMIT (10,000) documents and
  takes the UNION of field names (MongoUtils.getFieldsName:240-255,
  one `$objectToArray`/`$unwind`/`$addToSet` pipeline), then the SET of
  observed types per field excluding missing/null
  (MongoUtils.getTypes:257-270). A field observed with more than one
  type is renamed ``<name>_aibyte_transform`` and typed string
  (MongoUtils.transformName:224-226, getUniqueType); document-typed
  fields recurse into sub-fields (setSubFields:228-238). ``_id`` is
  always the primary key (MongoDbSource.java:60,120-126).
- Reads stringify the raw value of every mixed-marked field
  (MongoUtils.transformToStringIfMarked:138-147); incremental reads
  filter strictly greater than the cursor
  (MongoDbSource.queryTableIncremental:183-191 ``Filters.gt``).

Spark-first: the reference runs 2 aggregation pipelines PER FIELD
against the server; here discovery is ONE distributed aggregation per
nesting level — ``LATERAL variant_explode(parse_json(doc))`` to
``(key, schema_of_variant(value))`` pairs, types normalized to
bson-ish aliases, ``collect_set`` per key — and the read is ONE
codegen projection of ``try_variant_get`` extractions over the parsed
VARIANT (no per-row Python anywhere). ``try_variant_get(path,
'string')`` both stringifies mixed scalars and renders mixed
objects/arrays as their JSON text, strictly more faithful than
Jackson's ``asText()`` (which returns "" for containers).

The "collection" is a JSONL directory (one extended-JSON document per
line) — the sandbox stand-in for a live server; every discovery and
read semantic above is the connector's own.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

AIRBYTE_SUFFIX = "_aibyte_transform"  # MongoUtils.java:58
DISCOVER_LIMIT = 10_000  # MongoUtils.java:59
PRIMARY_KEY = "_id"  # MongoDbSource.java:60

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")

_SCALARS = {
    "long": T.LongType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
    "string": T.StringType(),
}


def _alias(ty: str) -> str:
    """Normalize a schema_of_variant string to a bson-ish type alias —
    the analogue of Mongo's `$type` aliases the reference unions
    (getTypes ignores shape inside object/array exactly like this)."""
    if ty.startswith("OBJECT<") or ty == "OBJECT":
        return "object"
    if ty.startswith("ARRAY<") or ty == "ARRAY":
        return "array"
    if ty in ("BIGINT", "INT", "SMALLINT", "TINYINT"):
        return "long"
    if ty.startswith("DECIMAL") or ty in ("DOUBLE", "FLOAT"):
        return "double"
    if ty == "BOOLEAN":
        return "boolean"
    if ty == "VOID":
        return "null"
    return "string"


@dataclass(frozen=True)
class FieldInfo:
    """One discovered field: `name` is the OUTPUT column (suffixed when
    mixed), `path` the raw document key, `dtype` the Spark read type.
    `mixed` marks the string-fallback rule; struct fields carry their
    sub-discovery in `children`."""

    name: str
    path: str
    dtype: T.DataType
    mixed: bool = False
    children: tuple["FieldInfo", ...] = ()


def _key_types(vdf: DataFrame) -> list[tuple[str, list[str]]]:
    """(key, observed type aliases) over one nesting level — one
    distributed explode + aggregate; `vdf` has one VARIANT column `v`.
    variant_explode is a table function, hence the LATERAL form."""
    spark = vdf.sparkSession
    pairs = spark.sql(
        "SELECT e.key AS key, schema_of_variant(e.value) AS ty "
        "FROM {vdf}, LATERAL variant_explode(v) AS e",
        vdf=vdf,
    )
    rows = pairs.groupBy("key").agg(F.collect_set("ty").alias("tys")).collect()
    out = []
    for r in rows:
        if r["key"] is None:
            continue  # non-object document at this level
        aliases = sorted({_alias(t) for t in r["tys"]} - {"null"})
        out.append((r["key"], aliases))
    return sorted(out)


def _element_type(vdf: DataFrame, key: str) -> T.DataType:
    """Array element type: union the element aliases (one more explode
    agg); a single scalar alias keeps its type, anything else falls to
    string (the reference types array items as untyped ARRAY)."""
    arr = vdf.select(
        F.try_variant_get(F.col("v"), "$" + _path_seg(key), "variant").alias("v")
    )
    elems = vdf.sparkSession.sql(
        "SELECT DISTINCT schema_of_variant(e.value) AS ty "
        "FROM {arr}, LATERAL variant_explode(v) AS e",
        arr=arr,
    )
    aliases = {
        _alias(r["ty"]) for r in elems.collect() if r["ty"] is not None
    } - {"null"}
    if len(aliases) == 1:
        return _SCALARS.get(next(iter(aliases)), T.StringType())
    return T.StringType()


def _discover_level(vdf: DataFrame, depth: int, max_depth: int) -> tuple[FieldInfo, ...]:
    fields: list[FieldInfo] = []
    for key, aliases in _key_types(vdf):
        # any key expressible as a path segment (identifier or bracket-
        # quotable) recurses/types normally; a key holding both quote
        # chars is inexpressible and fails loudly in _path_seg below
        recursable = "'" not in key or '"' not in key
        if len(aliases) != 1:
            # mixed types => string + rename (transformName:224-226)
            fields.append(
                FieldInfo(key + AIRBYTE_SUFFIX, key, T.StringType(), mixed=True)
            )
            continue
        a = aliases[0]
        if a == "object" and recursable and depth < max_depth:
            sub = vdf.select(
                F.try_variant_get(
                    F.col("v"), "$" + _path_seg(key), "variant"
                ).alias("v")
            ).filter(F.col("v").isNotNull())
            children = _discover_level(sub, depth + 1, max_depth)
            dtype = T.StructType(
                [T.StructField(c.name, c.dtype, True) for c in children]
            )
            fields.append(FieldInfo(key, key, dtype, children=children))
        elif a == "object":
            # depth-capped or non-identifier key: carry as JSON text
            fields.append(FieldInfo(key, key, T.StringType(), mixed=True))
        elif a == "array" and recursable:
            fields.append(
                FieldInfo(key, key, T.ArrayType(_element_type(vdf, key), True))
            )
        elif a == "array":
            fields.append(FieldInfo(key, key, T.StringType(), mixed=True))
        else:
            fields.append(FieldInfo(key, key, _SCALARS[a]))
    return tuple(fields)


def discover_collection(
    spark: SparkSession,
    path: str | DataFrame,
    limit: int = DISCOVER_LIMIT,
    max_depth: int = 4,
) -> tuple[FieldInfo, ...]:
    """Sampled schemaless discovery over a JSONL collection (or a
    one-string-column DataFrame). Returns the discovered field list;
    `collection_schema` renders it as a StructType and
    `read_collection` compiles it to the extraction projection."""
    lines = (
        spark.read.text(path) if isinstance(path, str) else path.toDF("value")
    ).filter(F.length(F.trim("value")) > 0)
    vdf = lines.limit(int(limit)).select(F.parse_json("value").alias("v"))
    # one cached sample feeds every level's aggregate
    vdf = vdf.localCheckpoint(eager=False)
    return _discover_level(vdf, 0, max_depth)


def collection_schema(fields: tuple[FieldInfo, ...]) -> T.StructType:
    return T.StructType([T.StructField(f.name, f.dtype, True) for f in fields])


def _path_seg(key: str) -> str:
    """One variant-path segment for an arbitrary Mongo field name:
    ``.key`` for identifier keys, bracket notation otherwise (the
    parser accepts either quote char but supports NO escaping inside
    the quotes, so pick the one the key doesn't contain; a key holding
    BOTH quote chars is inexpressible as a path and fails loudly —
    same strict-rejection contract as the lsn bit-budget overflow)."""
    if _IDENT.match(key):
        return "." + key
    if '"' not in key:
        return f'["{key}"]'
    if "'" not in key:
        return f"['{key}']"
    raise ValueError(
        f"field name {key!r} contains both quote characters and cannot "
        "be expressed as a variant path segment"
    )


def _extract(v: Column, prefix: str, f: FieldInfo) -> Column:
    path = prefix + _path_seg(f.path)
    if isinstance(f.dtype, T.StructType):
        sub = F.when(
            F.try_variant_get(v, path, "variant").isNotNull(),
            F.struct(*[_extract(v, path, c).alias(c.name) for c in f.children]),
        )
        return sub.alias(f.name)
    ddl = f.dtype.simpleString()
    return F.try_variant_get(v, path, ddl).alias(f.name)


def read_collection(
    spark: SparkSession,
    path: str | DataFrame,
    fields: tuple[FieldInfo, ...],
    columns: list[str] | None = None,
    cursor_gt: tuple[str, object] | None = None,
) -> DataFrame:
    """Read the collection under a discovered field list — one codegen
    projection (parse_json + typed try_variant_get per column), then
    the optional strict-`>` cursor filter (queryTableIncremental
    :183-191) and column selection. Mixed fields come back as the raw
    value's string/JSON rendering (transformToStringIfMarked parity).
    """
    lines = (
        spark.read.text(path) if isinstance(path, str) else path.toDF("value")
    ).filter(F.length(F.trim("value")) > 0)
    v = F.parse_json("value")
    want = {c for c in columns} if columns is not None else None
    cols = [
        _extract(v, "$", f)
        for f in fields
        if want is None or f.name in want or f.name == PRIMARY_KEY
    ]
    out = lines.select(*cols)
    if cursor_gt is not None:
        cname, cval = cursor_gt
        out = out.filter(F.col(cname) > F.lit(cval))
    return out


def mongo_change_events(
    spark: SparkSession,
    path: str | DataFrame,
    fields: tuple[FieldInfo, ...],
    cursor_col: str,
    key_col: str = PRIMARY_KEY,
    columns: list[str] | None = None,
    cursor_gt: object | None = None,
) -> DataFrame:
    """Adapt a collection read into the change-event shape the sync
    loop consumes (same taxonomy as the JDBC incremental adapter:
    cursor plays the lsn, deterministic ab_id, no tombstones — a
    collection scan never observes deletes)."""
    from airbyte_integrations_spark.sources.jdbc import as_change_events

    df = read_collection(
        spark,
        path,
        fields,
        columns=columns,
        cursor_gt=None if cursor_gt is None else (cursor_col, cursor_gt),
    )
    return as_change_events(df, key_col=key_col, cursor_col=cursor_col)


# ------------------------------------------------------------------ CDC:
# native change streams. A MongoDB change-stream event is
#   {"_id": {"_data": <opaque resume token>},
#    "operationType": insert|update|replace|delete,
#    "clusterTime": {"$timestamp": {"t": <epoch sec>, "i": <ordinal>}},
#    "documentKey": {"_id": ...},
#    "fullDocument": {...}}       -- ABSENT for deletes
# (public server API; this is the wire Debezium's mongodb connector and
# any resume-token consumer tails). Two semantics differ from WAL CDC:
# the position is the composite BsonTimestamp (t, i) — folded below as
# t*2^32 + i, exactly BsonTimestamp's own 64-bit comparable value — and
# DELETES CARRY ONLY THE KEY (no before image), so tombstones flow to
# the MERGE with null payload columns and the apply must delete by key
# alone. The resume token is opaque: it rides through as a column and
# the max-position token is what a consumer would hand back to
# resumeAfter.

_CLUSTER_TS = T.StructType(
    [
        T.StructField(
            "$timestamp",
            T.StructType(
                [
                    T.StructField("t", T.LongType(), True),
                    T.StructField("i", T.LongType(), True),
                ]
            ),
            True,
        )
    ]
)


def change_stream_schema(
    doc_schema: T.StructType, update_description: bool = False
) -> T.StructType:
    fields = [
        T.StructField(
            "_id",
            T.StructType([T.StructField("_data", T.StringType(), True)]),
            True,
        ),
        T.StructField("operationType", T.StringType(), True),
        T.StructField("clusterTime", _CLUSTER_TS, True),
        T.StructField(
            "ns",
            T.StructType(
                [
                    T.StructField("db", T.StringType(), True),
                    T.StructField("coll", T.StringType(), True),
                ]
            ),
            True,
        ),
        T.StructField(
            "documentKey",
            T.StructType([T.StructField("_id", T.StringType(), True)]),
            True,
        ),
        T.StructField("fullDocument", doc_schema, True),
    ]
    if update_description:
        fields.append(
            T.StructField(
                "updateDescription",
                T.StructType(
                    [
                        T.StructField("updatedFields", doc_schema, True),
                        T.StructField(
                            "removedFields",
                            T.ArrayType(T.StringType()),
                            True,
                        ),
                    ]
                ),
                True,
            )
        )
    return T.StructType(fields)


def cluster_time_lsn(t: Column, i: Column) -> Column:
    """BsonTimestamp's comparable 64-bit value: seconds<<32 | ordinal —
    the total order change streams resume along."""
    return (t * F.lit(1 << 32) + i).cast("long")


def _raw_doc_schema(fields: tuple[FieldInfo, ...]) -> T.StructType:
    """from_json schema keyed by the RAW document keys (mixed fields
    read their original key as string — from_json renders container
    values under a StringType field as their JSON text)."""
    out = []
    for f in fields:
        if isinstance(f.dtype, T.StructType):
            out.append(T.StructField(f.path, _raw_doc_schema(f.children), True))
        else:
            out.append(T.StructField(f.path, f.dtype, True))
    return T.StructType(out)


def _renamed(parent: Column, f: FieldInfo) -> Column:
    c = parent[f.path]
    if isinstance(f.dtype, T.StructType):
        return F.when(
            c.isNotNull(),
            F.struct(*[_renamed(c, ch).alias(ch.name) for ch in f.children]),
        ).alias(f.name)
    return c.alias(f.name)


def parse_change_stream(
    lines: DataFrame,
    fields: tuple[FieldInfo, ...],
    json_col: str = "value",
    malformed: str = "error",
    include_collection: bool = False,
    update_description: bool = False,
    nested_updates: str = "error",
) -> DataFrame:
    """Change-stream JSONL -> change-event frame (one from_json
    projection). Payload columns come from ``fullDocument`` under the
    discovered field list (mixed rule included: the raw key is read as
    string and surfaced under its suffixed name); deletes have ONLY
    ``documentKey._id`` — every payload column is null. Output:
    payload..., ``_id`` (the document key), ``_ab_cdc_lsn`` (folded
    clusterTime), ``_ab_cdc_updated_at``, ``_ab_cdc_deleted_at``,
    ``_resume_token``, ``_op``, ``_airbyte_ab_id``,
    ``_airbyte_emitted_at``. ``malformed`` handles non-JSON lines like
    the Debezium parser: "error" (default) fails the job, "skip" drops
    exactly the corrupt lines, "permissive" keeps all-null rows.

    ``update_description=True`` decodes the DEFAULT server wire for
    updates (no ``fullDocument`` unless updateLookup is on): an update
    event carries only ``updateDescription.updatedFields`` ($set) and
    ``.removedFields`` ($unset). Each payload column then gains a
    boolean sibling ``_w_<name>`` — "this event WROTE this field":
    true for every field on insert/replace (a replace drops absent
    fields, so absence is itself a write of null), true on update iff
    the field is in updatedFields or removedFields, false on delete.
    The masks feed `operators/patch.fold_patch_writes(mask_cols=...)`,
    where an explicit $unset null WINS over an earlier value — a plain
    sparse fold would wrongly keep it. ``nested_updates``: a dotted
    updatedFields key (sub-document surgery, e.g. "meta.k") cannot be
    represented as a top-level column write — "error" (default) fails
    the job on the first such event, "ignore" skips those keys."""
    from airbyte_integrations_spark.sources.debezium import _parsed_with_policy

    if nested_updates not in ("error", "ignore"):
        raise ValueError("nested_updates must be 'error' or 'ignore'")
    env = change_stream_schema(
        _raw_doc_schema(fields), update_description=update_description
    )
    raw = F.col(json_col)
    lines, p = _parsed_with_policy(lines, raw, env, malformed)
    t = p["clusterTime"]["$timestamp"]["t"]
    i = p["clusterTime"]["$timestamp"]["i"]
    lsn = cluster_time_lsn(t, i)
    updated = F.timestamp_seconds(t)
    op = p["operationType"]
    is_del = op == F.lit("delete")
    is_upd = op == F.lit("update")
    payload_fields = [f for f in fields if f.name != PRIMARY_KEY]
    if update_description:
        upd = p["updateDescription"]
        # written-key set from the raw JSON text (a $set to null is a
        # write the typed struct cannot distinguish from absence)
        upd_keys = F.coalesce(
            F.json_object_keys(
                F.get_json_object(raw, "$.updateDescription.updatedFields")
            ),
            F.array().cast("array<string>"),
        )
        removed = F.coalesce(
            upd["removedFields"], F.array().cast("array<string>")
        )
        written_keys = F.array_union(upd_keys, removed)
        dotted = F.exists(written_keys, lambda k: k.contains("."))
        payload = [
            F.when(is_upd, _renamed(upd["updatedFields"], f))
            .otherwise(_renamed(p["fullDocument"], f))
            .alias(f.name)
            for f in payload_fields
        ]

        def _mask(f: FieldInfo) -> Column:
            wrote = F.when(
                is_upd, F.array_contains(written_keys, f.path)
            ).otherwise(~is_del)
            if nested_updates == "error":
                wrote = F.when(
                    is_upd & dotted,
                    F.raise_error(
                        F.concat(
                            F.lit(
                                "nested (dotted) updatedFields path cannot "
                                "patch a top-level column; event: "
                            ),
                            raw,
                        )
                    ).cast("boolean"),
                ).otherwise(wrote)
            return wrote.alias("_w_" + f.name)

        masks = [_mask(f) for f in payload_fields]
    else:
        payload = [_renamed(p["fullDocument"], f) for f in payload_fields]
        masks = []
    extra = (
        [p["ns"]["coll"].alias("_collection")] if include_collection else []
    )
    return lines.select(
        p["documentKey"]["_id"].alias(PRIMARY_KEY),
        *payload,
        *masks,
        lsn.alias("_ab_cdc_lsn"),
        updated.alias("_ab_cdc_updated_at"),
        F.when(is_del, updated).alias("_ab_cdc_deleted_at"),
        p["_id"]["_data"].alias("_resume_token"),
        op.alias("_op"),
        F.md5(raw).alias("_airbyte_ab_id"),
        updated.alias("_airbyte_emitted_at"),
        *extra,
    )


def emit_change_stream(
    events: DataFrame,
    value_cols: list[str],
    key_col: str = "url",
    lsn_col: str = "_ab_cdc_lsn",
    deleted_col: str = "_ab_cdc_deleted_at",
    collection_col: str | None = None,
    db_name: str = "db",
    op_col: str | None = None,
    removed_col: str | None = None,
) -> DataFrame:
    """Change-event frame -> change-stream JSONL (the fixture
    generator / inverse). clusterTime (t, i) is the lsn split along the
    same fold; the resume token is the zero-padded hex of the folded
    position (opaque to consumers, monotone like real tokens); deletes
    render with documentKey only. ``collection_col`` names a per-row
    column rendered as ``ns.coll`` — the database-level ``db.watch()``
    wire, where one stream carries every collection's events and ``ns``
    routes them (server change-events API; Debezium's mongodb connector
    names each record's stream from exactly this field).

    ``op_col`` names a column of operation types; rows marked
    ``update`` render the DEFAULT (no-updateLookup) update wire —
    ``updateDescription`` with updatedFields = the row's NON-NULL
    payload columns (to_json's null-dropping produces the sparse
    rendering) and removedFields from ``removed_col`` (array<string>,
    the $unset paths) — and carry NO fullDocument. An explicit $set to
    null is not expressible this way; unset travels via removedFields,
    matching how drivers surface it. Deletes always win over op_col."""
    is_del = F.col(deleted_col).isNotNull()
    lsn = F.col(lsn_col).cast("long")
    doc = F.struct(
        F.col(key_col).alias("_id"),
        *[F.col(c) for c in value_cols],
    )
    ns = (
        [
            F.struct(
                F.lit(db_name).alias("db"),
                F.col(collection_col).alias("coll"),
            ).alias("ns")
        ]
        if collection_col is not None
        else []
    )
    if op_col is not None:
        op = F.when(is_del, F.lit("delete")).otherwise(F.col(op_col))
    else:
        op = F.when(is_del, F.lit("delete")).otherwise(F.lit("replace"))
    is_upd = op == F.lit("update")
    full_doc = F.when(~is_del & ~is_upd, doc)
    upd_members = [
        F.struct(*[F.col(c) for c in value_cols]).alias("updatedFields")
    ]
    if removed_col is not None:
        upd_members.append(F.col(removed_col).alias("removedFields"))
    update_desc = F.when(is_upd, F.struct(*upd_members))
    envelope = F.struct(
        F.struct(
            F.lpad(F.hex(lsn), 16, "0").alias("_data")
        ).alias("_id"),
        op.alias("operationType"),
        F.struct(
            F.struct(
                F.expr(f"CAST({lsn_col} AS BIGINT) div CAST({1 << 32} AS BIGINT)").alias("t"),
                (lsn % F.lit(1 << 32)).alias("i"),
            ).alias("$timestamp")
        ).alias("clusterTime"),
        *ns,
        F.struct(F.col(key_col).alias("_id")).alias("documentKey"),
        full_doc.alias("fullDocument"),
        update_desc.alias("updateDescription"),
    )
    return events.select(F.to_json(envelope).alias("value"))


def shared_change_stream(
    spark: SparkSession,
    path: str | DataFrame,
    fields: tuple[FieldInfo, ...],
    stream_col: str = "stream",
    malformed: str = "error",
) -> DataFrame:
    """Database-level change-stream JSONL -> the interleaved shared-log
    frame `sync_shared_log` consumes: one total clusterTime order across
    collections, routed by ``stream_col`` = the event's ``ns.coll``
    (``db.watch()`` emits ONE stream for every collection in the
    database — the Mongo analogue of the multi-table Debezium envelope
    log, and the shape the reference's mongodb CDC connector tails with
    a single resume token for the whole connection). ``fields`` is the
    UNION of the member collections' discovered fields (same contract
    as the Debezium path's single value_schema): absent fields decode
    null, and BsonTimestamp positions are global, so the GLOBAL-state
    lock-step loop applies unchanged. Still one from_json projection."""
    lines = path if isinstance(path, DataFrame) else (
        spark.read.text(path).filter(F.length(F.trim("value")) > 0)
    )
    return (
        parse_change_stream(
            lines, fields, malformed=malformed, include_collection=True
        )
        .drop("_op")
        .withColumnRenamed("_collection", stream_col)
    )


def latest_resume_token(events: DataFrame) -> str | None:
    """The resume token at the max position — what a live consumer
    would pass back as ``resumeAfter`` (the STATE document's opaque
    cursor). One tiny agg; null on an empty batch."""
    row = events.agg(
        F.max_by("_resume_token", "_ab_cdc_lsn").alias("tok")
    ).collect()[0]
    return row["tok"]


def fields_from_schema(schema: T.StructType | str) -> tuple[FieldInfo, ...]:
    """Declared-schema alternative to sampled discovery (the JSON-CLI
    path, where a FieldInfo tuple is not expressible): build the field
    list straight from a Spark schema / DDL string. No mixed-type
    marks — a declared schema asserts stable types; fields whose name
    already carries the _aibyte_transform suffix read their UNSUFFIXED
    raw key as string (so declared and discovered catalogs agree)."""
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    out = []
    for sf in schema.fields:
        if isinstance(sf.dataType, T.StructType):
            children = fields_from_schema(sf.dataType)
            out.append(
                FieldInfo(sf.name, sf.name, sf.dataType, children=children)
            )
        elif sf.name.endswith(AIRBYTE_SUFFIX):
            raw = sf.name[: -len(AIRBYTE_SUFFIX)]
            out.append(FieldInfo(sf.name, raw, T.StringType(), mixed=True))
        else:
            out.append(FieldInfo(sf.name, sf.name, sf.dataType))
    return tuple(out)
