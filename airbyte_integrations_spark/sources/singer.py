"""Singer-tap adapter source.

The reference wraps Singer taps behind the Airbyte protocol
(airbyte-cdk/python/airbyte_cdk/sources/singer/singer_helpers.py): a tap
prints one Singer message JSON per line — SCHEMA / RECORD / STATE /
ACTIVATE_VERSION — and ``SingerHelper`` translates them per record in
driver-side Python (``_airbyte_message_from_json``,
singer_helpers.py:239-265: SCHEMA and ACTIVATE_VERSION are dropped,
STATE's ``value`` becomes the Airbyte state blob, everything else is a
RECORD). The Singer *discover* catalog translates to an Airbyte catalog
(``singer_catalog_to_airbyte_catalog``, :112-141) with
``key_properties`` -> source-defined primary key and stream-level
metadata (``valid-replication-keys`` / ``forced-replication-method``,
:70-90) deciding sync modes, and the configured Airbyte catalog renders
back to a *selected* Singer catalog
(``create_singer_catalog_with_selection``, :267-304).

Spark-first: the tap's JSONL lands in files and parses with one
``from_json``/``get_json_object`` projection — distributed, codegen,
zero per-record Python — emitting the exact landing shape
``airbyte_wire.read_messages`` produces, so every downstream wire
helper (``records_for_stream``, ``latest_state``,
``infer_record_schema``) and the whole catalog-sync/MERGE machinery run
on a Singer tap unchanged. The catalog translation and selection
rendering are driver-side pure functions over metadata-sized JSON (the
reference also does these driver-side; they are not data-plane work).

Determinism divergence (deliberate, same policy as
``airbyte_wire.read_messages``): the reference stamps RECORDs with
``emitted_at = now()`` (singer_helpers.py:252), which makes replays
non-idempotent. Here ``emitted_at`` is the Singer message's own
``time_extracted`` when present, else a caller-fixed constant — so the
same tap output always lands identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_INCREMENTAL = "INCREMENTAL"
_FULL_TABLE = "FULL_TABLE"


def read_singer_messages(
    spark: SparkSession, path: str, default_emitted_at_millis: int = 0
) -> DataFrame:
    """Parse Singer-tap JSONL into the wire landing shape:
    (_airbyte_ab_id, _airbyte_emitted_at, _airbyte_data, stream, type,
    _state_blob, + file/line ordering metadata).

    Translation parity with singer_helpers.py:239-265
    ``_airbyte_message_from_json``: SCHEMA and ACTIVATE_VERSION lines
    are dropped; STATE keeps its ``value`` blob; RECORD keeps its
    ``record`` payload as the raw ``_airbyte_data`` JSON. The filter
    the reference applies per-row in Python is one codegen'd Catalyst
    predicate here.
    """
    lines = spark.read.text(path).filter(F.length(F.trim("value")) > 0)
    env = lines.select(
        F.col("value"),
        F.get_json_object("value", "$.type").alias("_stype"),
        F.get_json_object("value", "$.stream").alias("stream"),
        F.get_json_object("value", "$.record").alias("_airbyte_data"),
        F.get_json_object("value", "$.value").alias("_state_blob"),
        F.get_json_object("value", "$.time_extracted").alias("_time_extracted"),
        # same file/line ordering reconstruction as
        # airbyte_wire.read_messages: partition ids alone do not follow
        # file order (splits pack largest-first), so carry file metadata
        # + block offset and break in-block ties with the monotonic id.
        F.col("_metadata.file_modification_time").alias("_file_mtime"),
        F.col("_metadata.file_path").alias("_file"),
        F.col("_metadata.file_block_start").alias("_block_start"),
        F.monotonically_increasing_id().alias("_line_id"),
    ).filter(F.col("_stype").isin("RECORD", "STATE"))
    return env.select(
        F.md5("value").alias("_airbyte_ab_id"),
        F.coalesce(
            F.to_timestamp("_time_extracted"),
            F.timestamp_millis(F.lit(default_emitted_at_millis)),
        ).alias("_airbyte_emitted_at"),
        F.col("_airbyte_data"),
        F.col("stream"),
        F.col("_stype").alias("type"),
        F.col("_state_blob"),
        F.col("_file_mtime"),
        F.col("_file"),
        F.col("_block_start"),
        F.col("_line_id"),
    )


def _is_field_metadata(metadata: dict) -> bool:
    """singer_helpers.py:39-43 — a metadata entry is field-level when
    its breadcrumb has exactly two components and the first is not the
    literal "property" (field breadcrumbs are ["properties", <name>];
    the stream-level entry has an empty breadcrumb)."""
    crumb = metadata.get("breadcrumb") or []
    if len(crumb) != 2:
        return False
    return crumb[0] != "property"


def _stream_level_metadata(metadatas: list[dict]) -> dict | None:
    """singer_helpers.py:49-54 — first non-field entry carrying a
    ``metadata`` object."""
    for metadata in metadatas:
        if not _is_field_metadata(metadata) and "metadata" in metadata:
            return metadata.get("metadata")
    return None


def _sync_modes_from_metadata(metadatas: list[dict]) -> dict:
    """singer_helpers.py:69-90 ``set_sync_modes_from_metadata``:
    declared ``valid-replication-keys`` make the stream incremental with
    a source-defined cursor on the (deterministically) first sorted
    key; else ``forced-replication-method`` (string or
    {"replication-method": ...} dict) forces INCREMENTAL or
    FULL_TABLE."""
    out: dict = {}
    stream_md = _stream_level_metadata(metadatas)
    if not stream_md:
        return out
    replication_keys = stream_md.get("valid-replication-keys", [])
    if len(replication_keys) > 0:
        out["source_defined_cursor"] = True
        out["supported_sync_modes"] = ["incremental"]
        out["default_cursor_field"] = [sorted(replication_keys)[0]]
    elif "forced-replication-method" in stream_md:
        forced = stream_md["forced-replication-method"]
        if isinstance(forced, dict):
            forced = forced.get("replication-method", "")
        if forced.upper() == _INCREMENTAL:
            out["source_defined_cursor"] = True
            out["supported_sync_modes"] = ["incremental"]
        elif forced.upper() == _FULL_TABLE:
            out["source_defined_cursor"] = False
            out["supported_sync_modes"] = ["full_refresh"]
    return out


def singer_catalog_to_streams(
    singer_catalog: dict,
    sync_mode_overrides: dict[str, dict] | None = None,
    primary_key_overrides: dict[str, list[str]] | None = None,
    excluded_streams: tuple[str, ...] = (),
) -> list[dict]:
    """Translate a Singer discover catalog to Airbyte-stream
    descriptors (singer_helpers.py:112-141
    ``singer_catalog_to_airbyte_catalog`` + :156-176 ``get_catalogs``
    exclusion): per stream a dict of name / json_schema /
    supported_sync_modes / source_defined_cursor / default_cursor_field
    / source_defined_primary_key.

    Override parity: a sync-mode override REPLACES metadata-derived
    modes (and, per override_sync_modes:93-98, an override without
    ``source_defined_cursor`` means False, not "keep"); a primary-key
    override wins over the stream's ``key_properties``.
    """
    sync_mode_overrides = sync_mode_overrides or {}
    primary_key_overrides = primary_key_overrides or {}
    out: list[dict] = []
    for stream in singer_catalog.get("streams", []):
        name = stream.get("stream")
        if name in excluded_streams:
            continue
        desc: dict = {
            "name": name,
            "json_schema": stream.get("schema"),
            "supported_sync_modes": ["full_refresh"],
            "source_defined_cursor": False,
            "default_cursor_field": None,
            "source_defined_primary_key": None,
        }
        if name in sync_mode_overrides:
            ov = sync_mode_overrides[name]
            desc["source_defined_cursor"] = bool(
                ov.get("source_defined_cursor") or False
            )
            if ov.get("supported_sync_modes"):
                desc["supported_sync_modes"] = list(ov["supported_sync_modes"])
            if ov.get("default_cursor_field") is not None:
                desc["default_cursor_field"] = list(ov["default_cursor_field"])
        else:
            desc.update(_sync_modes_from_metadata(stream.get("metadata", [])))
        if name in primary_key_overrides:
            desc["source_defined_primary_key"] = [
                [k] for k in primary_key_overrides[name]
            ]
        elif stream.get("key_properties"):
            desc["source_defined_primary_key"] = [
                [k] for k in stream["key_properties"]
            ]
        out.append(desc)
    return out


def render_selected_catalog(
    configured: dict[str, dict], discovered: dict
) -> dict:
    """Render the configured selection back into a Singer catalog the
    tap consumes (singer_helpers.py:267-304
    ``create_singer_catalog_with_selection``): configured streams get
    ``schema.selected = true`` and every metadata entry selected; the
    stream-level entry gains ``forced-replication-method`` /
    ``replication-method`` from the configured sync mode (plus
    ``replication-key`` when an incremental stream configures a cursor
    field); field entries carrying non-empty ``fieldExclusions`` are
    DE-selected. Unconfigured streams pass through unchanged.

    ``configured`` maps stream name -> {"sync_mode": "incremental" |
    "full_refresh", "cursor_field": [..] | None}. Returns the combined
    catalog dict (the reference writes it to a file for the tap
    subprocess; the dict is the contract).
    """
    import copy

    masked: list[dict] = []
    for singer_stream in copy.deepcopy(discovered.get("streams", [])):
        name = singer_stream.get("stream")
        if name in configured:
            cfg = configured[name]
            singer_stream.setdefault("schema", {})["selected"] = True
            new_metadatas = []
            for metadata in singer_stream.get("metadata", []):
                metadata.setdefault("metadata", {})["selected"] = True
                if not _is_field_metadata(metadata):
                    if cfg.get("sync_mode") == "incremental":
                        method = _INCREMENTAL
                        if cfg.get("cursor_field"):
                            metadata["metadata"]["replication-key"] = cfg[
                                "cursor_field"
                            ][0]
                    else:
                        method = _FULL_TABLE
                    metadata["metadata"]["forced-replication-method"] = method
                    metadata["metadata"]["replication-method"] = method
                elif "fieldExclusions" in metadata["metadata"]:
                    metadata["metadata"]["selected"] = not metadata["metadata"][
                        "fieldExclusions"
                    ]
                new_metadatas.append(metadata)
            if singer_stream.get("metadata") is not None:
                singer_stream["metadata"] = new_metadatas
        masked.append(singer_stream)
    return {"streams": masked}
