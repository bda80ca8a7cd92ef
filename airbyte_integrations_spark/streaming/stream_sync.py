"""Continuous CDC ingestion: Structured Streaming foreachBatch -> MERGE.

`run_sync` (microbatch.py) replays a BOUNDED log with deterministic
lsn-keyed epochs — the reference's bounded-sync loop (a sync fixes a
target position at start, CdcTargetPosition.java:16-20). `stream_sync`
is the UNBOUNDED complement: `spark.readStream` tails the log
directory and each micro-batch is MERGE-applied inside `foreachBatch`
under the same epoch-keyed idempotent commit, with the stream engine's
`batch_id` as the epoch. Exactly-once composes two guarantees:

- Structured Streaming re-runs an interrupted batch with the SAME
  batch_id after restart (offsets WAL'd in the checkpoint), and
- the lake's commit log makes re-applying a committed epoch a no-op,

which is exactly the "replayable source + idempotent sink" leg of
Spark's end-to-end exactly-once contract. Unlike run_sync's monotone
lsn slices, file arrival order is arbitrary here, so tombstones are
RETAINED as rows (keep_tombstones=True): a late pre-delete image loses
to the retained tombstone under the winner rule instead of
resurrecting the key; `read_live()` filters them out of the view.

Reference semantics: the CDK's continuous read loop + state cadence
(SURVEY §2.1/§2.10); Debezium's continuous WAL tail is the source-side
analogue (bases/debezium/.../AirbyteDebeziumHandler.java).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from airbyte_integrations_spark.config import SyncConfig
from airbyte_integrations_spark.functions.extract import with_extracted_text
from airbyte_integrations_spark.lakehouse.merge import merge_into
from airbyte_integrations_spark.lakehouse.table import LakeTable
from airbyte_integrations_spark.lineage import compute_lineage, write_lineage

# Commit-log epochs are string keys in the manifest; stream batches
# use the "stream:<batch_id>" prefix so they live in a disjoint key
# space from run_sync's lsn-keyed epochs. (A numeric offset like 2^44
# is NOT safe: Postgres LSNs are 64-bit WAL byte positions and exceed
# 2^44 on long-lived clusters — a collision would make run_sync's
# is_epoch_committed skip an uncommitted lsn slice.) Lineage keeps a
# numeric epoch column for metrics; stream batches label it
# STREAM_EPOCH_BASE + batch_id, which is display-only, never consulted
# for exactly-once.
STREAM_EPOCH_BASE = 2**44


def stream_epoch_key(batch_id: int) -> str:
    return f"stream:{int(batch_id)}"


def stream_sync(
    spark: SparkSession,
    log_dir: str,
    table: LakeTable,
    config: SyncConfig,
    checkpoint_dir: str,
    schema=None,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
    processing_time: str = "10 seconds",
    extract_missing_text: bool = False,
    compact_threshold: int | None = None,
    refresh_views: list | None = None,
    source_format: str = "parquet",
    value_schema=None,
    dialect: str = "postgres",
    fields=None,
    update_description: bool = False,
):
    """Start a continuous ingest query; returns the StreamingQuery.

    `refresh_views`: MaterializedAggViews (lakehouse/ivm.py) to fold
    the batch's change feed into after each commit — continuously-
    maintained marts as part of ingest. View refresh is versioned and
    idempotent, so it is re-attempted on checkpoint-replayed batches
    (a crash between table commit and view refresh self-heals on the
    next trigger rather than leaving the mart stale).

    With available_now=True the query drains the current log and stops
    (the bounded test/replay mode); otherwise it tails the directory at
    `processing_time` cadence. Safe to kill at any point and restart
    with the same checkpoint_dir — interrupted batches re-apply
    idempotently."""
    lsn_col = config.cursor_field[0]
    if update_description:
        # the patch arm folds per-column latest writes; it only exists
        # for the change-stream wire and bypasses transform/dedup_impl,
        # so reject incompatible knobs at entry instead of crashing (or
        # silently ignoring them) at the first trigger
        if source_format != "mongo_cdc" or fields is None:
            raise ValueError(
                "update_description=True needs source_format='mongo_cdc' "
                "with fields (partial images exist only on the "
                "change-stream wire)"
            )
        if extract_missing_text:
            raise ValueError(
                "update_description=True cannot combine with "
                "extract_missing_text: the patch apply merges partial "
                "column writes and never sees a full html image to "
                "extract from — extract on the read side instead"
            )
    if source_format == "debezium":
        # raw Debezium envelope JSONL tail (the embedded-engine wire):
        # decode rides INSIDE the streaming plan as the same one-
        # projection from_json the bounded path uses — per batch, the
        # stream engine tracks file offsets, the projection yields
        # change events, and the MERGE below is unchanged.
        from airbyte_integrations_spark.sources.debezium import parse_debezium

        if value_schema is None:
            raise ValueError("source_format='debezium' needs value_schema")
        reader = spark.readStream
        if max_files_per_trigger:
            reader = reader.option(
                "maxFilesPerTrigger", str(max_files_per_trigger)
            )
        events = parse_debezium(
            reader.text(log_dir), value_schema, dialect=dialect
        ).drop("_op")
    elif source_format == "mongo_cdc":
        # native change-stream tail: the one-projection decode (folded
        # BsonTimestamp positions, key-only delete tombstones) rides
        # inside the streaming plan; epochs/commit semantics unchanged.
        from airbyte_integrations_spark.sources.mongo import parse_change_stream

        if fields is None:
            raise ValueError("source_format='mongo_cdc' needs fields")
        reader = spark.readStream
        if max_files_per_trigger:
            reader = reader.option(
                "maxFilesPerTrigger", str(max_files_per_trigger)
            )
        events = parse_change_stream(
            reader.text(log_dir), fields, update_description=update_description
        ).drop("_op", "_resume_token")
    else:
        reader = spark.readStream.schema(
            schema if schema is not None else spark.read.parquet(log_dir).schema
        )
        if max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
        events = reader.parquet(log_dir)

    def _refresh_views() -> None:
        if refresh_views:
            for view in refresh_views:
                view.refresh(table)

    def apply_batch(batch, batch_id: int) -> None:
        epoch = stream_epoch_key(batch_id)
        if table.is_epoch_committed(config.stream, epoch):
            # checkpoint replay of an already-durable batch; views may
            # still lag it if the previous run died mid-refresh
            _refresh_views()
            return
        if batch.isEmpty():
            return
        transform = (
            with_extracted_text
            if extract_missing_text and "html" in batch.columns
            else None
        )
        lineage_epoch = STREAM_EPOCH_BASE + int(batch_id)  # metrics label only
        lineage = compute_lineage(batch, config.stream, lineage_epoch, lsn_col)
        write_lineage(lineage, table.root, lineage_epoch)
        if update_description:
            # partial-image tail: per-column latest writes overlay the
            # key's current row (lakehouse/patch_apply.py). PRECONDITION
            # (unlike the full-image arm's keep_tombstones defense):
            # the tail is totally ordered — exactly the change-stream
            # contract, where resume tokens define one server order and
            # files append in it. Per-trigger splits of an ordered tail
            # compose by the epoch-composition law; delivering batches
            # OUT of order is undetectably lossy for patches (an old
            # write would shadow a newer column), so disordered logs
            # belong to the bounded path's lsn-planned epochs instead.
            from airbyte_integrations_spark.lakehouse.patch_apply import (
                merge_patches_into,
            )

            names = tuple(f.name for f in fields if f.name != "_id")
            merge_patches_into(
                table,
                batch,
                names,
                stream=config.stream,
                epoch=epoch,
                epoch_meta={"stream_batch_id": int(batch_id)},
                cursor=lsn_col,
                secondary=config.secondary_order,
                mask_cols=tuple("_w_" + n for n in names),
                mode=config.write_mode,
                key=config.primary_key,
                n_buckets=config.n_buckets,
            )
            if compact_threshold is not None:
                table.compact(max_files_per_bucket=compact_threshold)
            _refresh_views()
            return
        merge_into(
            table,
            batch,
            stream=config.stream,
            epoch=epoch,
            epoch_meta={"stream_batch_id": int(batch_id)},
            cursor=lsn_col,
            secondary=config.secondary_order,
            transform_winners=transform,
            keep_tombstones=True,  # arbitrary arrival order: see module doc
            mode=config.write_mode,
            dedup_impl=config.dedup_impl,
            key=config.primary_key,
            n_buckets=config.n_buckets,
        )
        if compact_threshold is not None:
            table.compact(max_files_per_bucket=compact_threshold)
        _refresh_views()

    writer = events.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()
