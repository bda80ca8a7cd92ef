"""Multi-stream catalog orchestration: the reference's
`AbstractSource.read(config, catalog, state)` loop re-expressed over
LakeTable sinks.

Reference parity:

- `AbstractDbSource.read` walks the ConfiguredAirbyteCatalog and
  builds the incremental iterators FIRST, then the full-refresh ones
  (`source-relational-db/.../AbstractDbSource.java:135-140` — "data
  syncs in the incremental stage ... full_refresh streams are
  traversed after"), concatenating them into one ordered read.
- Each stream's records flow through its own configured
  (sync_mode, destination_sync_mode) pair — the pipeline.apply_batch
  matrix — into its own destination table.
- One protocol STATE message (PER_STREAM arm, airbyte_protocol.yaml:
  71-108) is emitted after each stream's DURABLE commit, carrying the
  state of every stream known so far — the CDK's per-stream state
  cadence with the reference's state-after-commit rule
  (BufferedStreamConsumer.java:175-193): nothing is emitted that is
  not already recoverable from the sink's commit log.
- Resume: the sink commit logs ARE the state of record (exactly-once
  epochs). An incoming `state` document (the pinned wire shape) seeds
  streams whose tables have no commits yet — the reference's
  state-input path for a fresh destination.

Spark-first notes: each stream is one bounded `run_sync` /
`apply_batch` plan — declarative DataFrame reads (JDBC pushdown, file
pruning, parquet scan) per stream; the catalog loop itself is
metadata-only driver code.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from airbyte_integrations_spark.config import DestinationSyncMode, SyncConfig, SyncMode
from airbyte_integrations_spark.connector import resume_lsn
from airbyte_integrations_spark.lakehouse.table import LakeTable
from airbyte_integrations_spark.pipeline import apply_batch
from airbyte_integrations_spark.streaming.microbatch import run_sync


@dataclass(frozen=True)
class ConfiguredStream:
    """ConfiguredAirbyteStream analogue: the per-stream SyncConfig plus
    a declarative source spec telling the loop how to read records.

    source kinds:
      {"kind": "cdc_log", "path": <parquet dir of change events>}
      {"kind": "jdbc", "config": JdbcSourceConfig, "key_col": ...,
       "cursor_col": ..., "deleted_at_col": None}
      {"kind": "files", "root": ..., "format": ..., "suffix": ...,
       "options": {...}}
      {"kind": "dataframe", "df": DataFrame}  (tests / embedded use)
      {"kind": "cdc_shared", "group": <wal id>, "df"/"path": <shared
       interleaved log>, "stream_col": "stream"}  — members of one
       group sync lock-step through sync_shared_log (GLOBAL state)
      {"kind": "mongo", "path": <JSONL dir of schemaless documents>,
       "cursor_col": <numeric cursor field> (incremental),
       "key_col": "_id" (default), "fields": optional pre-computed
       discovery, "discover_limit": 10000}
       — source-mongodb-v2 taxonomy: sampled schemaless discovery
       (mixed-type fields -> <name>_aibyte_transform strings), _id PK,
       strict-> cursor incremental (sources/mongo.py)
      {"kind": "debezium", "path": <JSONL dir of Debezium envelopes>,
       "value_schema": <DDL string>, "emitted_at_millis": optional,
       "dialect": "postgres"|"mysql" (default postgres)}
       — raw engine envelopes decoded to change events in one
       from_json projection (sources/debezium.py), then the normal
       CDC epoch loop; dialect "mysql" decodes composite (file, pos)
       binlog positions into the engine's total order
    """

    config: SyncConfig
    source: dict = field(default_factory=dict)


@dataclass(frozen=True)
class ConfiguredCatalog:
    streams: tuple[ConfiguredStream, ...]


def ordered_streams(catalog: ConfiguredCatalog) -> list[ConfiguredStream]:
    """Incremental streams first, then full-refresh, stable within each
    group (AbstractDbSource.java:135-140 ordering)."""
    inc = [s for s in catalog.streams if s.config.sync_mode == SyncMode.INCREMENTAL]
    full = [s for s in catalog.streams if s.config.sync_mode != SyncMode.INCREMENTAL]
    return inc + full


def stream_table(spark: SparkSession, lake_root: str, stream: str) -> LakeTable:
    return LakeTable(spark, os.path.join(lake_root, stream))


# ----------------------------------------------------------- state I/O


def _stream_state_blob(table: LakeTable, stream: str) -> dict:
    if not table.exists():
        return {"lsn_watermark": None, "n_epochs_committed": 0, "snapshot_version": None}
    blob = {
        "lsn_watermark": table.watermark(stream),
        "n_epochs_committed": len(table.committed_epochs(stream)),
        "snapshot_version": table.current_version(),
    }
    fc = file_mtime_cursor(table, stream)
    if isinstance(fc, datetime):  # pre-history commits: cursor only
        blob["file_mtime_cursor"] = fc.isoformat()
    elif fc is not None:
        blob["file_mtime_cursor"] = fc.cursor.isoformat()
        blob["file_history"] = sorted(fc.history)
    return blob


def catalog_state_message(
    spark: SparkSession,
    catalog: ConfiguredCatalog,
    lake_root: str,
    flavor: str = "PER_STREAM",
) -> dict:
    """The combined STATE document, derived ONLY from the durable
    commit logs. flavor="PER_STREAM" (default): one entry per catalog
    stream. flavor="GLOBAL": the protocol's other arm — log-based CDC
    keeps ONE offset for the whole WAL (CdcStateManager.java:13-33),
    so the blob is the MINIMUM watermark across every stream that has
    one (resuming a laggard from another stream's higher watermark
    would skip its events)."""
    blobs = {
        cs.config.stream: _stream_state_blob(
            stream_table(spark, lake_root, cs.config.stream), cs.config.stream
        )
        for cs in catalog.streams
    }
    if flavor == "GLOBAL":
        wms = [b["lsn_watermark"] for b in blobs.values() if b["lsn_watermark"] is not None]
        return {
            "type": "STATE",
            "state": {
                "state_type": "GLOBAL",
                "global": {
                    "lsn_watermark": min(wms) if wms else None,
                    "n_epochs_committed": sum(
                        b["n_epochs_committed"] for b in blobs.values()
                    ),
                    "snapshot_version": None,
                },
            },
        }
    return {
        "type": "STATE",
        "state": {
            "state_type": "PER_STREAM",
            "streams": [
                {"name": name, "state": blob} for name, blob in blobs.items()
            ],
        },
    }


def file_mtime_cursor(table: LakeTable, stream: str):
    """Durable state for a file-source stream: the max
    `file_mtime_cursor` recorded in committed epoch metadata (the
    commit log plays StateManager: state == what was durably applied),
    plus the union of the `file_history` sets recorded at that cursor
    (source-s3's same-mtime tie protection). Returns a
    sources.files.FileState, or None if no file epoch committed."""
    from airbyte_integrations_spark.sources.files import FileState

    if not table.exists():
        return None
    metas = [
        m
        for m in table.committed_epochs(stream).values()
        if isinstance(m, dict) and "file_mtime_cursor" in m
    ]
    if not metas:
        return None
    cursor = max(m["file_mtime_cursor"] for m in metas)
    at_cursor = [m for m in metas if m["file_mtime_cursor"] == cursor]
    if not any("file_history" in m for m in at_cursor):
        # table last synced by a pre-history engine: no record of WHICH
        # at-cursor files are in it, so keep the legacy strict-> rule
        # (returning an empty-history FileState would re-append them)
        return datetime.fromisoformat(cursor)
    hist: set[str] = set()
    for m in at_cursor:
        hist.update(m.get("file_history") or ())
    return FileState(
        cursor=datetime.fromisoformat(cursor), history=frozenset(hist)
    )


# Protocol/system columns that always ride with a record when present:
# the envelope ids (_airbyte_*) and the CDC metadata the winner rule and
# tombstone semantics depend on (DebeziumEventUtils.java:19-20 injects
# them regardless of the catalog's field list; the metadata injectors
# add _ab_cdc_lsn / _ab_cdc_log_file+pos per connector).
SYSTEM_FIELDS = (
    "_airbyte_ab_id",
    "_airbyte_emitted_at",
    "_airbyte_data",
    "_ab_cdc_lsn",
    "_ab_cdc_updated_at",
    "_ab_cdc_deleted_at",
    "_ab_cdc_log_file",
    "_ab_cdc_log_pos",
)


def select_fields(events: DataFrame, cfg: SyncConfig) -> DataFrame:
    """Catalog-driven field selection (AbstractDbSource.java:229-233):
    restrict the source frame to ``cfg.selected_fields`` plus the
    columns the sync itself needs — primary key, cursor, secondary
    ordering, and the protocol system columns above (whichever exist).

    Spark-first: this is ONE ``select`` on the declarative frame before
    epoch planning, so column pruning reaches the scan (parquet
    ReadSchema shrinks; the JDBC relation SELECTs the pruned list) —
    unlike the reference, which builds the narrowed SQL by hand per
    table, Catalyst derives it from the projection.

    A selected field missing from the source is an error (the
    reference silently intersects, AbstractDbSource.java:233 — but a
    typo silently dropping a column is exactly the failure mode field
    selection exists to prevent, so the engine rejects it); a missing
    primary-key or cursor column is always an error."""
    if not cfg.selected_fields:
        return events
    have = set(events.columns)
    unknown = [c for c in cfg.selected_fields if c not in have]
    if unknown:
        raise ValueError(
            f"stream {cfg.stream!r}: selected_fields not in source: "
            f"{unknown}; available: {sorted(have)}"
        )
    required = set(cfg.primary_key)
    if (
        cfg.sync_mode == SyncMode.INCREMENTAL
        or cfg.destination_sync_mode == DestinationSyncMode.APPEND_DEDUP
    ):
        # the cursor drives epoch planning / winner ordering in these
        # modes; a plain full-refresh overwrite/append needs no cursor
        required |= set(cfg.cursor_field)
    missing = sorted(required - have)
    if missing:
        raise ValueError(
            f"stream {cfg.stream!r}: primary key / cursor columns "
            f"missing from source: {missing}"
        )
    keep = (
        set(cfg.selected_fields)
        | required
        | {c for c in cfg.cursor_field if c in have}
        | {c for c in cfg.secondary_order if c in have}
        | {c for c in SYSTEM_FIELDS if c in have}
    )
    # preserve source column order for a deterministic landing schema
    return events.select(*[c for c in events.columns if c in keep])


def _seed_state(state: dict | None, stream: str):
    """Parse the incoming state document for a stream's seed values
    (used only when the destination table has no commits yet)."""
    lsn = resume_lsn(state, stream)
    mtime = None
    if state:
        s = state.get("state", state)
        try:
            for entry in s.get("streams", []):
                if entry.get("name") == stream:
                    mtime = entry.get("state", {}).get("file_mtime_cursor")
        except AttributeError:
            pass
    return lsn, mtime


# ------------------------------------------------------------ the loop


def _mongo_fields(spark: SparkSession, source: dict):
    """Resolve a mongo-flavored source document's field list: "fields"
    (embedded FieldInfo tuple), "value_schema" (DDL string — the
    JSON-CLI form), or "sample_path" (JSONL of example documents to
    run sampled discovery over)."""
    from airbyte_integrations_spark.sources.mongo import (
        discover_collection,
        fields_from_schema,
    )

    if "fields" in source:
        return source["fields"]
    if "value_schema" in source:
        return fields_from_schema(source["value_schema"])
    if "sample_path" in source:
        return discover_collection(spark, source["sample_path"])
    raise ValueError(
        "mongo source needs one of fields/value_schema/sample_path"
    )


def _read_stream_events(
    spark: SparkSession, cs: ConfiguredStream, table: LakeTable, state: dict | None
):
    """Produce (events DataFrame | None, epoch_key | None, epoch_meta)
    for one stream according to its source kind + sync mode. CDC/JDBC
    incremental return the full declarative frame (run_sync plans its
    own epochs above the durable watermark); file sources return one
    mtime-bounded batch with a deterministic epoch key."""
    kind = cs.source.get("kind", "cdc_log")
    cfg = cs.config
    if kind == "cdc_shared":
        # One member's view of the shared WAL (a pure source read —
        # the lock-step commit loop is sync_shared_log; here the slice
        # is just this member's routed events past the GLOBAL offset,
        # resume_lsn accepts the GLOBAL state arm directly).
        if "debezium_path" in cs.source:
            from airbyte_integrations_spark.sources.debezium import (
                shared_log_from_envelopes,
            )

            ev = shared_log_from_envelopes(
                spark,
                cs.source["debezium_path"],
                cs.source["value_schema"],
                cs.source.get("stream_col", "stream"),
                dialect=cs.source.get("dialect", "postgres"),
            )
        elif "mongo_path" in cs.source:
            # database-level change stream (db.watch()): one stream for
            # every collection, routed by ns.coll — sources/mongo.py
            from airbyte_integrations_spark.sources.mongo import (
                shared_change_stream,
            )

            ev = shared_change_stream(
                spark,
                cs.source["mongo_path"],
                _mongo_fields(spark, cs.source),
                cs.source.get("stream_col", "stream"),
            )
        else:
            ev = (
                cs.source["df"]
                if "df" in cs.source
                else spark.read.parquet(cs.source["path"])
            )
        stream_col = cs.source.get("stream_col", "stream")
        if stream_col not in ev.columns:
            raise ValueError(
                f"shared log has no stream-routing column {stream_col!r}"
            )
        ev = ev.filter(F.col(stream_col) == cfg.stream).drop(stream_col)
        if table.watermark(cfg.stream) is None:
            seed, _ = _seed_state(state, cfg.stream)
            if seed is not None:
                ev = ev.filter(F.col(cfg.cursor_field[0]) > F.lit(seed))
        return ev, None, {}
    if kind in ("dataframe", "cdc_log"):
        ev = (
            cs.source["df"]
            if kind == "dataframe"
            else spark.read.parquet(cs.source["path"])
        )
        if cfg.sync_mode == SyncMode.INCREMENTAL and table.watermark(cfg.stream) is None:
            # fresh destination + incoming state document: start past
            # the seeded watermark (the filter pushes to the scan)
            seed, _ = _seed_state(state, cfg.stream)
            if seed is not None:
                ev = ev.filter(F.col(cfg.cursor_field[0]) > F.lit(seed))
        return ev, None, {}
    if kind == "debezium":
        from airbyte_integrations_spark.sources.debezium import parse_debezium

        lines = spark.read.text(cs.source["path"]).filter(
            F.length(F.trim("value")) > 0
        )
        emitted = None
        if "emitted_at_millis" in cs.source:
            emitted = F.timestamp_millis(F.lit(int(cs.source["emitted_at_millis"])))
        ev = parse_debezium(
            lines,
            cs.source["value_schema"],
            emitted_at=emitted,
            dialect=cs.source.get("dialect", "postgres"),
        ).drop("_op")
        if cfg.sync_mode == SyncMode.INCREMENTAL and table.watermark(cfg.stream) is None:
            seed, _ = _seed_state(state, cfg.stream)
            if seed is not None:
                ev = ev.filter(F.col(cfg.cursor_field[0]) > F.lit(seed))
        return ev, None, {}
    if kind == "jdbc":
        from airbyte_integrations_spark.sources.jdbc import JdbcSource, as_change_events

        src = JdbcSource(spark, cs.source["config"])
        if cfg.sync_mode == SyncMode.INCREMENTAL:
            # Resume point: prefer the sink's durable watermark; fall
            # back to the incoming state document for a fresh table.
            cursor_col = cs.source["cursor_col"]
            wm = table.watermark(cfg.stream)
            if wm is None:
                wm, _ = _seed_state(state, cfg.stream)
            ev = as_change_events(
                # watermark filtering happens below in lsn space (after
                # as_change_events normalizes the cursor); the DB-side
                # pushdown of `cursor > ?` needs the raw cursor value,
                # which the lsn watermark does not round-trip for
                # timestamps — so filter the normalized frame; Catalyst
                # still pushes the comparison into the JDBC scan when
                # the cursor is numeric.
                src.read_full(),
                key_col=cs.source["key_col"],
                cursor_col=cursor_col,
                updated_at_col=cs.source.get("updated_at_col"),
                deleted_at_col=cs.source.get("deleted_at_col"),
            )
            if wm is not None:
                ev = ev.filter(F.col("_ab_cdc_lsn") > F.lit(wm))
            return ev, None, {}
        return src.read_full(), None, {}
    if kind == "mongo":
        # schemaless JSONL collection (sources/mongo.py — the
        # source-mongodb-v2 taxonomy: sampled field/type discovery with
        # the _aibyte_transform mixed-type rule, _id PK, strict-> cursor
        # incremental). `fields` may carry a pre-computed discovery
        # (tuple of FieldInfo); otherwise discover() runs on this read.
        from airbyte_integrations_spark.sources.mongo import (
            PRIMARY_KEY,
            discover_collection,
            mongo_change_events,
            read_collection,
        )

        fields = cs.source.get("fields") or discover_collection(
            spark, cs.source["path"], limit=cs.source.get("discover_limit", 10_000)
        )
        if cfg.sync_mode == SyncMode.INCREMENTAL:
            cursor_col = cs.source["cursor_col"]
            wm = table.watermark(cfg.stream)
            if wm is None:
                wm, _ = _seed_state(state, cfg.stream)
            ev = mongo_change_events(
                spark,
                cs.source["path"],
                fields,
                cursor_col=cursor_col,
                key_col=cs.source.get("key_col", PRIMARY_KEY),
            )
            if wm is not None:
                # same convention as jdbc: filter in normalized lsn
                # space (numeric cursors reach the scan via Catalyst)
                ev = ev.filter(F.col("_ab_cdc_lsn") > F.lit(wm))
            return ev, None, {}
        return read_collection(spark, cs.source["path"], fields), None, {}
    if kind == "mongo_cdc":
        # native change-stream tail (sources/mongo.py): BsonTimestamp
        # (t, i) folded to the engine position, key-only delete
        # tombstones, resume token riding as a payload column. The
        # durable offset is the lsn watermark; latest_resume_token()
        # recovers the opaque resumeAfter cursor from any batch.
        # Document shape: "fields" (embedded FieldInfo tuple),
        # "value_schema" (DDL string — the JSON-CLI form), or
        # "sample_path" (JSONL of example documents to discover from).
        from airbyte_integrations_spark.sources.mongo import (
            parse_change_stream,
        )

        mfields = _mongo_fields(spark, cs.source)
        lines = spark.read.text(cs.source["path"]).filter(
            F.length(F.trim("value")) > 0
        )
        ev = parse_change_stream(
            lines,
            mfields,
            update_description=bool(cs.source.get("update_description")),
            nested_updates=cs.source.get("nested_updates", "error"),
        ).drop("_op")
        if cfg.sync_mode == SyncMode.INCREMENTAL and table.watermark(cfg.stream) is None:
            seed, _ = _seed_state(state, cfg.stream)
            if seed is not None:
                ev = ev.filter(F.col(cfg.cursor_field[0]) > F.lit(seed))
        return ev, None, {}
    if kind == "http":
        # full-refresh HTTP read (incremental http streams are routed to
        # sync_http_incremental in read_catalog before reaching here):
        # optional "slices" fan the paginated read out across executors
        from airbyte_integrations_spark.sources.http import read_http_stream

        return (
            read_http_stream(
                spark, cs.source["config"], cs.source.get("slices"),
                cs.source["record_schema"],
            ),
            None,
            {},
        )
    if kind == "url_file":
        # URL-addressed single files (source-file HTTPS provider,
        # client.py:32-142) — inherently full-refresh: a URL names one
        # immutable payload, so each sync re-reads it whole (the
        # reference's source-file has no cursor either)
        from airbyte_integrations_spark.sources.url_file import read_url_files

        return (
            read_url_files(
                spark,
                cs.source["urls"],
                cs.source.get("format", "csv"),
                cs.source["record_schema"],
                header=cs.source.get("header", True),
                request_headers=cs.source.get("request_headers"),
                **cs.source.get("options", {}),
            ),
            None,
            {},
        )
    if kind == "declarative":
        # full-refresh declarative (low-code) manifest stream
        # (incremental declarative streams are routed to
        # DeclarativeSource.sync_incremental in read_catalog):
        from airbyte_integrations_spark.sources.declarative import (
            DeclarativeSource,
        )

        src = DeclarativeSource(cs.source["manifest"], cs.source["config"])
        return (
            src.streams[cs.source["stream"]].read(
                spark, cs.source.get("record_schema")
            ),
            None,
            {},
        )
    if kind == "wire":
        # another connector's JSONL output as the source (the
        # destination half of the protocol: RECORD envelopes in, typed
        # rows out). Schema comes from the stream config or — for
        # schemaless upstreams — from document sampling
        # (infer_record_schema, the MongoDB-discover contract).
        from airbyte_integrations_spark.sources.airbyte_wire import (
            infer_record_schema,
            read_messages,
            records_for_stream,
        )

        msgs = read_messages(spark, cs.source["path"])
        # the WIRE stream name may differ from the destination stream
        # when a namespacing mapper renamed the catalog entry (the
        # platform rewrites catalog + messages together; we read by the
        # original name and land at the mapped one — NamespacingMapper
        # semantics without touching record payloads)
        wire_name = cs.source.get("stream", cfg.stream)
        schema = cs.source.get("record_schema")
        if isinstance(schema, str):
            from pyspark.sql import types as T

            schema = T.StructType.fromDDL(schema)
        if schema is None:
            schema = infer_record_schema(
                spark, msgs, wire_name, cs.source.get("sample", 10_000)
            )
        return records_for_stream(msgs, wire_name, schema), None, {}
    if kind == "singer":
        # a Singer tap's JSONL output as the source: the adapter
        # (sources/singer.py) parses SCHEMA/RECORD/STATE/ACTIVATE_VERSION
        # lines into the same landing shape the wire kind uses, so the
        # typed projection and schema sampling below are shared with it
        # (reference: singer_helpers.py:239-265 does this translation
        # per record in Python).
        from airbyte_integrations_spark.sources.airbyte_wire import (
            infer_record_schema,
            records_for_stream,
        )
        from airbyte_integrations_spark.sources.singer import (
            read_singer_messages,
        )

        msgs = read_singer_messages(
            spark,
            cs.source["path"],
            default_emitted_at_millis=cs.source.get("emitted_at_millis", 0),
        )
        singer_name = cs.source.get("stream", cfg.stream)
        schema = cs.source.get("record_schema")
        if isinstance(schema, str):
            from pyspark.sql import types as T

            schema = T.StructType.fromDDL(schema)
        if schema is None:
            schema = infer_record_schema(
                spark, msgs, singer_name, cs.source.get("sample", 10_000)
            )
        return records_for_stream(msgs, singer_name, schema), None, {}
    if kind == "files":
        import hashlib

        from airbyte_integrations_spark.sources.files import read_files_incremental

        st = file_mtime_cursor(table, cfg.stream)
        if st is None:
            seeded = _seed_state(state, cfg.stream)[1]
            st = datetime.fromisoformat(seeded) if isinstance(seeded, str) else seeded
        df, new_state = read_files_incremental(
            spark,
            cs.source["root"],
            fmt=cs.source.get("format", "parquet"),
            state=st,
            suffix=cs.source.get("suffix", ""),
            path_pattern=cs.source.get("path_pattern"),
            **cs.source.get("options", {}),
        )
        if df is None:
            return None, None, {}
        iso = new_state.cursor.isoformat()
        # deterministic, collision-proof epoch key: re-running the same
        # file batch is a no-op (exactly-once for file syncs too). The
        # key hashes the BATCH (the at-cursor file set), not just the
        # cursor — with history semantics two distinct batches can share
        # a max mtime (a late same-mtime file), and a bare files:<iso>
        # key would silently swallow the second one.
        digest = hashlib.md5(
            "\n".join(sorted(new_state.history)).encode()
        ).hexdigest()[:12]
        return (
            df,
            f"files:{iso}:{digest}",
            {
                "file_mtime_cursor": iso,
                "file_history": sorted(new_state.history),
            },
        )
    raise ValueError(f"unknown source kind: {kind!r}")


def _sync_stream(
    spark: SparkSession,
    cs: ConfiguredStream,
    table: LakeTable,
    state: dict | None,
    max_events_per_epoch: int,
    extract_missing_text: bool,
) -> None:
    """Sync ONE configured stream to its table (every commit inside is
    epoch-keyed and idempotent — kill/re-run converges). Thread-safe:
    touches only this stream's table."""
    cfg = cs.config
    if cs.source.get("kind") == "partitioned_log":
        # Kafka-shaped log: vector {partition: offset} state — the
        # consume round manages its own epoch key + resume
        from airbyte_integrations_spark.sources.partitioned_log import (
            sync_partitioned_log,
        )

        ev = (
            cs.source["df"]
            if "df" in cs.source
            else spark.read.parquet(cs.source["path"])
        )
        sync_partitioned_log(
            spark, select_fields(ev, cfg), table, cfg,
            extract_missing_text=extract_missing_text,
        )
        return
    if cs.source.get("kind") == "http" and cfg.sync_mode == SyncMode.INCREMENTAL:
        # paginated API stream: cursor-window slices with their own
        # per-slice epoch commits + STATE cadence (sources/http.py)
        from airbyte_integrations_spark.sources.http import sync_http_incremental

        sync_http_incremental(
            spark,
            cs.source["config"],
            table,
            cfg,
            cs.source["record_schema"],
            key_col=cs.source["key_col"],
            cursor_col=cs.source["cursor_col"],
            to_lsn=cs.source["to_lsn"],
            slice_width=cs.source.get("slice_width", 1_000_000),
            since_param=cs.source.get("since_param", "since"),
            until_param=cs.source.get("until_param", "until"),
            updated_at_col=cs.source.get("updated_at_col"),
            deleted_at_col=cs.source.get("deleted_at_col"),
            seed_lsn=_seed_state(state, cfg.stream)[0],
        )
        return
    if (
        cs.source.get("kind") == "declarative"
        and cfg.sync_mode == SyncMode.INCREMENTAL
    ):
        # low-code manifest stream: datetime-window slices with
        # per-window epoch commits + the max-cursor-seen state rule
        # (sources/declarative.py sync_incremental)
        from airbyte_integrations_spark.sources.declarative import (
            DeclarativeSource,
        )

        src = DeclarativeSource(cs.source["manifest"], cs.source["config"])
        if cs.source.get("record_schema") is not None:
            # caller-pinned Spark schema (e.g. timestamp cursors)
            src.streams[cs.source["stream"]].spark_schema = (
                lambda s=cs.source["record_schema"]: s
            )
        src.sync_incremental(
            spark,
            cs.source["stream"],
            table,
            cfg,
            key_col=cs.source["key_col"],
            cursor_col=cs.source["cursor_col"],
            updated_at_col=cs.source.get("updated_at_col"),
            deleted_at_col=cs.source.get("deleted_at_col"),
        )
        return
    events, epoch_key, epoch_meta = _read_stream_events(spark, cs, table, state)
    if events is not None:
        # catalog field selection: projection first, so epoch planning,
        # dedup and MERGE all run over the pruned scan. (The http /
        # declarative incremental paths above declare their record
        # schema explicitly — their schema IS the field list.)
        events = select_fields(events, cfg)
        patch_cols = patch_mask_cols = None
        if cs.source.get("kind") == "mongo_cdc" and cs.source.get(
            "update_description"
        ):
            # partial-image apply: payload columns + their _w_ masks
            # from the decode feed the patch overlay (patch_apply.py)
            if cfg.selected_fields:
                raise ValueError(
                    f"stream {cfg.stream!r}: field selection would drop the "
                    "_w_ write masks a partial-image (update_description) "
                    "apply folds on; select fields at discovery instead"
                )
            names = [
                f.name
                for f in _mongo_fields(spark, cs.source)
                if f.name != "_id"
            ]
            patch_cols = tuple(names)
            patch_mask_cols = tuple("_w_" + n for n in names)
        if (
            cfg.sync_mode == SyncMode.INCREMENTAL
            and cfg.destination_sync_mode == DestinationSyncMode.APPEND_DEDUP
            and epoch_key is None
        ):
            # lsn-sliced exactly-once replay with resume
            run_sync(
                spark,
                events,
                table,
                cfg,
                max_events_per_epoch=max_events_per_epoch,
                extract_missing_text=extract_missing_text,
                patch_cols=patch_cols,
                patch_mask_cols=patch_mask_cols,
                # row-balanced epoch planning for bursty logs, opt-in
                # per stream (SyncConfig.properties)
                balanced=bool(cfg.properties.get("balanced_epochs")),
                # source's current WAL position (Debezium heartbeat):
                # advances the offset past quiet streams so re-reads
                # skip consumed history even when this table saw no
                # changes
                heartbeat_position=cs.source.get("heartbeat_position"),
            )
        else:
            # full refresh / append paths: one batch through the
            # (sync_mode, destination_sync_mode) matrix
            if (
                epoch_key is None
                and cfg.destination_sync_mode == DestinationSyncMode.OVERWRITE
            ):
                # overwrite truncates (create has no committed-skip),
                # so a constant key is safe; it marks the snapshot in
                # the fresh manifest's commit log for state reporting
                epoch_key = "full:0"
            if (
                epoch_key is None
                and cfg.sync_mode == SyncMode.INCREMENTAL
                and cfg.destination_sync_mode == DestinationSyncMode.APPEND
            ):
                # incremental+append from cdc_log/jdbc/dataframe
                # sources: WITHOUT a synthesized epoch the append has
                # no committed-epoch skip and never advances the
                # watermark, so every re-run (or crash-resume) would
                # re-append the whole source. Filter past the durable
                # watermark and commit under a deterministic
                # lsn-bounded epoch key carrying to_lsn — re-running
                # the same batch is then an epoch no-op and the
                # watermark advances exactly like the dedup path.
                if "_ab_cdc_lsn" not in events.columns:
                    raise ValueError(
                        f"stream {cfg.stream!r}: incremental+append needs an "
                        "_ab_cdc_lsn column to synthesize an idempotent epoch "
                        "(cdc_log/jdbc sources provide it; file sources use "
                        "their mtime epoch); use append_dedup or full_refresh "
                        "for sources without a total order"
                    )
                wm = table.watermark(cfg.stream)
                if wm is not None:
                    events = events.filter(F.col("_ab_cdc_lsn") > F.lit(wm))
                # bounded metadata collect: one (min, max) row
                lo, hi = events.agg(
                    F.min("_ab_cdc_lsn"), F.max("_ab_cdc_lsn")
                ).first()
                if hi is None:
                    events = None  # nothing past the watermark
                else:
                    epoch_key = f"incr:{int(hi)}"
                    epoch_meta = {
                        "from_lsn": int(lo),
                        "to_lsn": int(hi),
                        **(epoch_meta or {}),
                    }
            if events is not None:
                apply_batch(table, events, cfg, epoch=epoch_key, epoch_meta=epoch_meta)
    return


def sync_shared_log(
    spark: SparkSession,
    streams: list[ConfiguredStream],
    lake_root: str,
    state: dict | None = None,
    max_events_per_epoch: int = 1_000_000,
    extract_missing_text: bool = False,
    heartbeat_position: int | None = None,
    on_commit=None,
) -> list[dict]:
    """Shared-WAL multi-stream CDC sync with GLOBAL state — the
    Debezium-source shape the per-stream loop cannot express.

    Reference: a log-based CDC source tails ONE replication log for
    ALL of its streams and checkpoints ONE offset for the connection —
    `CdcStateManager` holds a single `CdcState` (the Debezium offset
    map) next to the per-stream cursors and every STATE emission
    carries it whole (source-postgres/.../PostgresCdcStateHandler.java:
    29-37 saveState; airbyte_protocol.py:260-266 AirbyteStateMessage's
    `global` arm). Committing per-stream offsets independently against
    a shared WAL is wrong in both directions: a laggard stream resumed
    from another stream's higher offset skips its events, and re-tailing
    from the lowest per-stream offset re-reads every other stream's
    history. This loop is the protocol's answer re-expressed over lake
    sinks:

    - `log` is the interleaved WAL: one DataFrame holding every member
      stream's change events, routed by a `stream` column, with one
      TOTAL lsn order across streams (WAL positions are global).
    - Epochs are planned ONCE over the interleaved tail
      (plan_epochs — deterministic in the global watermark), and each
      epoch applies to every member table under the SAME lsn-bounded
      epoch key `g<from>:<to>` before the next epoch starts. A member
      with no events in the slice still commits the (zero-row) epoch,
      so quiet streams never hold the shared offset back — the
      heartbeat problem solved structurally.
    - The durable GLOBAL offset is DERIVED, never stored: it is the
      minimum committed watermark across member tables (exactly
      catalog_state_message(flavor="GLOBAL")), so the commit logs
      remain the single source of truth and killing this loop anywhere
      converges on re-run.
    - Resume safety when members disagree (crash mid-epoch): replanning
      from the minimum watermark may slice the recovered tail at
      different boundaries than the crashed run, so epoch keys carry
      BOTH bounds (a shifted boundary is a new key, never a false
      committed-skip), and each member filters its slice to
      `lsn > its own starting watermark` so the ahead member re-applies
      nothing — it commits zero-row epochs until the laggard catches up.

    Returns one GLOBAL STATE document per fully-committed epoch (the
    state-after-commit cadence), plus one after a heartbeat advance.
    `on_commit(stream, epoch_key)` fires after each member's durable
    commit (crash-injection hook)."""
    from airbyte_integrations_spark.functions.extract import with_extracted_text
    from airbyte_integrations_spark.lakehouse.merge import merge_into
    from airbyte_integrations_spark.lineage import (
        compute_lineage,
        compute_lineage_bulk,
        write_lineage,
        write_lineage_rows,
    )
    from airbyte_integrations_spark.streaming.microbatch import plan_epochs

    if not streams:
        return []
    first = streams[0].source
    if "debezium_path" in first:
        # raw multi-table envelope JSONL (the literal Debezium shape):
        # decode + table-routing in one projection
        from airbyte_integrations_spark.sources.debezium import (
            shared_log_from_envelopes,
        )

        log = shared_log_from_envelopes(
            spark,
            first["debezium_path"],
            first["value_schema"],
            first.get("stream_col", "stream"),
            dialect=first.get("dialect", "postgres"),
        )
    elif "mongo_path" in first:
        # database-level change stream (db.watch()): every collection in
        # one stream, ns.coll routes — sources/mongo.py
        from airbyte_integrations_spark.sources.mongo import (
            shared_change_stream,
        )

        log = shared_change_stream(
            spark,
            first["mongo_path"],
            _mongo_fields(spark, first),
            first.get("stream_col", "stream"),
        )
    else:
        log = first["df"] if "df" in first else spark.read.parquet(first["path"])
    stream_col = first.get("stream_col", "stream")
    if stream_col not in log.columns:
        raise ValueError(f"shared log has no stream-routing column {stream_col!r}")
    lsn_col = streams[0].config.cursor_field[0]
    for cs in streams:
        cfg = cs.config
        if cfg.sync_mode != SyncMode.INCREMENTAL or (
            cfg.destination_sync_mode != DestinationSyncMode.APPEND_DEDUP
        ):
            raise ValueError(
                f"stream {cfg.stream!r}: a shared log is a CDC feed — members "
                "must be incremental/append_dedup"
            )
        if cfg.cursor_field[0] != lsn_col:
            raise ValueError(
                f"stream {cfg.stream!r}: members of one shared log share one "
                f"lsn order ({lsn_col!r}), got cursor {cfg.cursor_field[0]!r}"
            )
    names = [cs.config.stream for cs in streams]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate stream names in shared-log group: {names}")
    tables = {n: stream_table(spark, lake_root, n) for n in names}
    # Per-member floor: its own durable watermark, else the incoming
    # state document's seed (fresh destination), else unbounded.
    floor: dict[str, int | None] = {}
    for n in names:
        wm = tables[n].watermark(n)
        if wm is None:
            wm, _ = _seed_state(state, n)
        floor[n] = wm
    # Global resume point: the minimum member floor — a laggard must
    # never be resumed from another stream's higher offset. Any member
    # without a floor means the whole tail is unread for it.
    global_wm = (
        None
        if any(f is None for f in floor.values())
        else min(f for f in floor.values())
    )
    epochs = plan_epochs(log, global_wm, max_events_per_epoch, lsn_col)
    cat = ConfiguredCatalog(streams=tuple(streams))
    messages: list[dict] = []
    # Per-member bulk lineage (one tail scan per member, not one job
    # per (member, epoch) — the scheduler-storm guard run_sync uses).
    bulk: dict[str, tuple] = {}
    for cs in streams:
        n = cs.config.stream
        member_events = log.filter(F.col(stream_col) == n)
        if floor[n] is not None:
            member_events = member_events.filter(F.col(lsn_col) > F.lit(floor[n]))
        if any(
            not tables[n].is_epoch_committed(n, f"g{ep.from_lsn}:{ep.to_lsn}")
            for ep in epochs
        ):
            b = compute_lineage_bulk(member_events, n, epochs, lsn_col)
            if b is not None:  # plan_epochs plans are always uniform
                bulk[n] = b
    for ep in epochs:
        key = f"g{ep.from_lsn}:{ep.to_lsn}"
        meta = {"from_lsn": ep.from_lsn, "to_lsn": ep.to_lsn, "shared_log": True}
        for cs in streams:
            n = cs.config.stream
            cfg = cs.config
            table = tables[n]
            if table.is_epoch_committed(n, key):
                continue
            sl = log.filter(
                (F.col(lsn_col) > F.lit(ep.from_lsn))
                & (F.col(lsn_col) <= F.lit(ep.to_lsn))
                & (F.col(stream_col) == n)
            )
            if floor[n] is not None:
                # ahead-member guard on resume: never re-apply below
                # the member's own durable/seeded offset
                sl = sl.filter(F.col(lsn_col) > F.lit(floor[n]))
            sl = select_fields(sl.drop(stream_col), cfg)
            if n in bulk:
                pdf, pa_schema = bulk[n]
                rows = pdf[pdf["epoch"] == ep.epoch_id].drop(columns=["epoch"])
                write_lineage_rows(rows, pa_schema, table.root, ep.epoch_id)
            else:  # non-uniform plan fallback (unreachable for plan_epochs)
                write_lineage(
                    compute_lineage(sl, n, ep.epoch_id, lsn_col),
                    table.root,
                    ep.epoch_id,
                )
            transform = (
                with_extracted_text
                if extract_missing_text and "html" in sl.columns
                else None
            )
            merge_into(
                table,
                sl,
                stream=n,
                epoch=key,
                epoch_meta=meta,
                cursor=lsn_col,
                secondary=cfg.secondary_order,
                transform_winners=transform,
                mode=cfg.write_mode,
                dedup_impl=cfg.dedup_impl,
                key=cfg.primary_key,
                n_buckets=cfg.n_buckets,
            )
            if on_commit is not None:
                on_commit(n, key)
        # state-after-commit: the GLOBAL document is derived from the
        # member commit logs only after EVERY member committed the epoch
        messages.append(
            catalog_state_message(spark, cat, lake_root, flavor="GLOBAL")
        )
    if heartbeat_position is not None:
        advanced = False
        for n in names:
            table = tables[n]
            if not table.exists():
                continue
            final = table.watermark(n)
            if final is None or heartbeat_position > final:
                table.commit_marker_epoch(
                    n,
                    f"hb:{heartbeat_position}",
                    {
                        "from_lsn": final,
                        "to_lsn": heartbeat_position,
                        "heartbeat": True,
                    },
                )
                advanced = True
        if advanced:
            messages.append(
                catalog_state_message(spark, cat, lake_root, flavor="GLOBAL")
            )
    return messages


def read_catalog(
    spark: SparkSession,
    catalog: ConfiguredCatalog,
    lake_root: str,
    state: dict | None = None,
    max_events_per_epoch: int = 1_000_000,
    extract_missing_text: bool = False,
    on_stream_committed=None,
    max_concurrency: int = 1,
) -> list[dict]:
    """Sync every configured stream; returns the emitted STATE messages
    (one combined PER_STREAM document after each stream's commit).

    Killing this loop at ANY point and re-running converges: completed
    streams re-apply as epoch no-ops, the interrupted stream resumes
    from its durable watermark, and unstarted streams run fresh.
    `on_stream_committed(stream_name)` is a test hook fired after each
    stream's durable commit (crash injection).

    max_concurrency > 1 runs streams CONCURRENTLY in two waves —
    all incremental streams, then all full-refresh streams — preserving
    the reference's group-level ordering (AbstractDbSource.java:135-140)
    while letting independent streams' Spark jobs overlap in the
    scheduler (the reference worker is strictly serial; on a cluster,
    serial streams leave executors idle during each stream's planning
    and commit barriers). Each stream syncs into its OWN table, so
    streams share no commit log; each worker thread tags its jobs with
    a per-stream FAIR scheduler pool. STATE messages are still emitted
    one-per-commit, in commit order.

    Streams with source kind "cdc_shared" are grouped by their
    `source["group"]` tag and each group syncs through sync_shared_log
    (one interleaved WAL, one derived GLOBAL offset, lock-step epochs)
    BEFORE the per-stream loop — shared-log members are incremental by
    contract, so the incremental-first ordering is preserved. Their
    STATE documents are the GLOBAL arm; per-stream hooks fire once per
    member after the group commits."""
    shared: dict[str, list[ConfiguredStream]] = {}
    solo: list[ConfiguredStream] = []
    for cs in catalog.streams:
        if cs.source.get("kind") == "cdc_shared":
            shared.setdefault(cs.source.get("group", "wal"), []).append(cs)
        else:
            solo.append(cs)
    shared_messages: list[dict] = []
    for group in shared.values():
        shared_messages.extend(
            sync_shared_log(
                spark,
                group,
                lake_root,
                state=state,
                max_events_per_epoch=max_events_per_epoch,
                extract_missing_text=extract_missing_text,
                heartbeat_position=group[0].source.get("heartbeat_position"),
            )
        )
        if on_stream_committed is not None:
            for cs in group:
                on_stream_committed(cs.config.stream)
    if shared:
        catalog = ConfiguredCatalog(streams=tuple(solo))
    if max_concurrency <= 1:
        messages: list[dict] = shared_messages
        for cs in ordered_streams(catalog):
            table = stream_table(spark, lake_root, cs.config.stream)
            _sync_stream(
                spark, cs, table, state, max_events_per_epoch, extract_missing_text
            )
            messages.append(catalog_state_message(spark, catalog, lake_root))
            if on_stream_committed is not None:
                on_stream_committed(cs.config.stream)
        return messages

    import threading
    from concurrent.futures import ThreadPoolExecutor

    lock = threading.Lock()
    messages = shared_messages

    def run_one(cs: ConfiguredStream) -> None:
        # per-thread local property: jobs from this stream land in
        # their own FAIR pool (no-op under the default FIFO scheduler)
        spark.sparkContext.setLocalProperty(
            "spark.scheduler.pool", f"stream-{cs.config.stream}"
        )
        table = stream_table(spark, lake_root, cs.config.stream)
        _sync_stream(
            spark, cs, table, state, max_events_per_epoch, extract_missing_text
        )
        with lock:
            messages.append(catalog_state_message(spark, catalog, lake_root))
            if on_stream_committed is not None:
                on_stream_committed(cs.config.stream)

    inc = [s2 for s2 in catalog.streams if s2.config.sync_mode == SyncMode.INCREMENTAL]
    full = [s2 for s2 in catalog.streams if s2.config.sync_mode != SyncMode.INCREMENTAL]
    for wave in (inc, full):
        if not wave:
            continue
        with ThreadPoolExecutor(max_workers=max_concurrency) as pool:
            futures = [pool.submit(run_one, cs) for cs in wave]
            for f in futures:
                f.result()  # propagate the first failure
    return messages


def jdbc_streams_from_discovery(
    spark: SparkSession,
    url: str,
    driver: str | None = None,
    cursor_overrides: dict[str, str] | None = None,
    n_buckets: int = 8,
) -> list[ConfiguredStream]:
    """Build ConfiguredStreams from live DatabaseMetaData discovery
    (AbstractJdbcSource.discoverInternal -> ConfiguredAirbyteCatalog):
    source-defined primary key from getPrimaryKeys; streams with a
    cursor override become incremental/append_dedup, the rest
    full_refresh/overwrite."""
    from airbyte_integrations_spark.sources.jdbc import JdbcSourceConfig, discover_tables

    out = []
    for name, meta in discover_tables(spark, url, driver=driver).items():
        pk = tuple(meta.get("primary_key") or ())
        cols = tuple(meta.get("columns") or ())
        if not cols:
            raise ValueError(f"stream {name!r}: discovery returned no columns")
        # Full-refresh tables with no discovered PK: fall back to the
        # FIRST DISCOVERED COLUMN, not a domain-name default —
        # bucket_expr hashes the key columns, so the key MUST exist in
        # the table (a default like "url" fails at table.create for any
        # table without that column). Incremental streams are
        # normalized by as_change_events (key_col -> "url"), so "url"
        # is genuinely present there.
        missing = [k for k in pk if k not in cols]
        if missing:
            raise ValueError(f"stream {name!r}: key columns {missing} not in discovered columns")
        cursor = (cursor_overrides or {}).get(name)
        incremental = cursor is not None and bool(pk)
        cfg = SyncConfig(
            stream=name.replace(".", "_").lower(),
            primary_key=("url",) if incremental else (pk or (cols[0],)),
            sync_mode=SyncMode.INCREMENTAL if incremental else SyncMode.FULL_REFRESH,
            destination_sync_mode=(
                DestinationSyncMode.APPEND_DEDUP
                if incremental
                else DestinationSyncMode.OVERWRITE
            ),
            n_buckets=n_buckets,
        )
        source = {
            "kind": "jdbc",
            "config": JdbcSourceConfig(
                url=url, table=meta["table"] if not meta.get("schema") else f"{meta['schema']}.{meta['table']}", driver=driver
            ),
        }
        if incremental:
            source["key_col"] = pk[0]
            source["cursor_col"] = cursor
        out.append(ConfiguredStream(config=cfg, source=source))
    return out


def mongo_streams_from_discovery(
    spark: SparkSession,
    collections: dict[str, str],
    cursor_overrides: dict[str, str] | None = None,
    n_buckets: int = 8,
    discover_limit: int = 10_000,
) -> list[ConfiguredStream]:
    """Build ConfiguredStreams from schemaless-collection discovery —
    the mongo analogue of jdbc_streams_from_discovery (the reference's
    MongoDbSource.discoverInternal:115-131: every authorized collection
    becomes a stream, fields from sampling, primary key ALWAYS _id).

    `collections` maps stream name -> JSONL path. A collection with a
    cursor override becomes incremental/append_dedup (the cursor must
    be a discovered numeric field — the engine's position space);
    the rest are full_refresh/overwrite keyed on _id."""
    from airbyte_integrations_spark.sources.mongo import (
        PRIMARY_KEY,
        collection_schema,
        discover_collection,
    )

    out = []
    for name, path in sorted(collections.items()):
        fields = discover_collection(spark, path, limit=discover_limit)
        schema = collection_schema(fields)
        if PRIMARY_KEY not in schema.fieldNames():
            raise ValueError(f"collection {name!r}: no {PRIMARY_KEY} field discovered")
        cursor = (cursor_overrides or {}).get(name)
        if cursor is not None:
            if cursor not in schema.fieldNames():
                raise ValueError(
                    f"collection {name!r}: cursor {cursor!r} not discovered"
                )
            if not isinstance(schema[cursor].dataType, (T.LongType, T.TimestampType)):
                raise ValueError(
                    f"collection {name!r}: cursor {cursor!r} must be numeric/"
                    f"timestamp, got {schema[cursor].dataType.simpleString()}"
                )
        cfg = SyncConfig(
            stream=name.replace(".", "_").lower(),
            primary_key=("url",) if cursor else (PRIMARY_KEY,),
            sync_mode=SyncMode.INCREMENTAL if cursor else SyncMode.FULL_REFRESH,
            destination_sync_mode=(
                DestinationSyncMode.APPEND_DEDUP
                if cursor
                else DestinationSyncMode.OVERWRITE
            ),
            n_buckets=n_buckets,
        )
        source: dict = {"kind": "mongo", "path": path, "fields": fields}
        if cursor:
            source["cursor_col"] = cursor
        out.append(ConfiguredStream(config=cfg, source=source))
    return out


def emit_catalog(
    spark: SparkSession,
    catalog: ConfiguredCatalog,
    lake_root: str,
    out_dir: str,
    emitted_at_millis: int = 0,
    stream_status: bool = True,
) -> dict:
    """The lake as an Airbyte SOURCE: emit every catalog stream's live
    rows as RECORD JSONL (one directory per stream under `out_dir`)
    bracketed by STREAM_STATUS traces, with the combined PER_STREAM
    STATE document written once after every stream's records are
    durable (abstract_source.read emission order: records, then the
    state that covers them). Output parses back with read_messages /
    records_for_stream — the produce half of the wire roundtrip.

    Serialization is to_json over structs (distributed, codegen); the
    per-stream emission order on disk is Spark's file order, exactly
    like the reference's stdout interleaving is per-stream sequential."""
    import json as _json

    from airbyte_integrations_spark.sources.airbyte_wire import write_messages

    state = catalog_state_message(spark, catalog, lake_root)
    for cs in catalog.streams:
        table = stream_table(spark, lake_root, cs.config.stream)
        if not table.exists():
            continue
        write_messages(
            table.read_live(),
            os.path.join(out_dir, cs.config.stream),
            stream=cs.config.stream,
            emitted_at_millis=emitted_at_millis,
            namespace=(cs.config.properties or {}).get("namespace"),
            stream_status=stream_status,
            mode="overwrite",
        )
    with open(os.path.join(out_dir, "state.jsonl"), "w") as fh:
        fh.write(_json.dumps(state, sort_keys=True) + "\n")
    return state


def register_sql_views(
    spark: SparkSession,
    catalog: ConfiguredCatalog,
    lake_root: str,
    prefix: str = "",
    metadata: bool = False,
    asof_lsn: int | None = None,
) -> list[str]:
    """Serve the lake through plain ``spark.sql``: one temp view per
    existing catalog stream, backed by ``read_live()`` — merge-on-read
    deltas resolve and tombstones filter exactly as the DataFrame
    surface, and every Catalyst optimization (pushdown, pruning, AQE)
    applies to queries over the views unchanged.

    Views are SNAPSHOT-PINNED at registration (read_live lists files
    from the manifest eagerly), so concurrent syncs never make a
    half-applied epoch visible mid-query; re-register after a sync for
    fresh data — the same cadence the run_sync/stream_sync
    refresh_views hooks already model for marts. With `asof_lsn`, each
    view pins the stream's floor snapshot at that WAL position
    (version_asof), giving a transactionally CONSISTENT cross-view
    state for multi-table SQL. `metadata=True` additionally registers
    `<name>__files` / `<name>__history` (Iceberg metadata-table
    naming) for ops queries. Returns the registered view names."""
    names: list[str] = []
    for cs in catalog.streams:
        stream = cs.config.stream
        table = stream_table(spark, lake_root, stream)
        if not table.exists():
            continue
        version = None
        if asof_lsn is not None:
            version = table.version_asof(stream, asof_lsn)
            if version is None:
                continue  # no snapshot at or below the position yet
        name = f"{prefix}{stream}"
        table.read_live(version=version).createOrReplaceTempView(name)
        names.append(name)
        if metadata:
            table.meta_files(version=version).createOrReplaceTempView(
                f"{name}__files"
            )
            table.meta_history().createOrReplaceTempView(f"{name}__history")
            names += [f"{name}__files", f"{name}__history"]
    return names


def read_catalog_asof(
    spark: SparkSession,
    lake_root: str,
    streams: list[str],
    lsn: int,
) -> dict[str, DataFrame]:
    """Transaction-consistent multi-table read at one WAL position.

    In a CDC lake every stream's table advances independently (its own
    epoch cadence), so "the state of the database" is only well-defined
    AT a WAL position: for each stream resolve the largest snapshot
    whose committed watermark <= lsn (LakeTable.version_asof) and read
    it. No table in the result shows an effect of any event past `lsn`,
    so cross-table joins see a causally consistent world — the
    cross-topic transaction-consistency guarantee Debezium documents,
    expressed over lake snapshots. Streams with no qualifying snapshot
    (created after `lsn`) map to None.

    Metadata-only resolution (manifest walk per stream); the reads are
    ordinary pinned-snapshot reads — time travel addressed by WAL
    position instead of version number.
    """
    out: dict[str, DataFrame] = {}
    for s in streams:
        t = stream_table(spark, lake_root, s)
        if not t.exists():
            out[s] = None
            continue
        v = t.version_asof(s, lsn)
        out[s] = None if v is None else t.read_live(version=v)
    return out
