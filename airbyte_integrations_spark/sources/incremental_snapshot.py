"""Chunked incremental snapshot interleaved with the WAL tail — the
DBLog watermark algorithm (Netflix DBLog paper, 2020; Debezium's
incremental-snapshot feature implements the same design publicly).

The reference runs a MONOLITHIC Debezium snapshot that must finish
before the engine may shut down (DebeziumRecordIterator.java:114-139
throws "snapshot has not finished" on early close;
SnapshotMetadata.java pins the TRUE/FALSE/LAST phases). At the
10^10-row point a single snapshot pass is operationally untenable: it
holds one long transaction, stalls the tail, and a crash restarts it
from zero. The incremental form reads the table in deterministic
PK-hash chunks BETWEEN log epochs, so the tail never stalls and a
crash loses at most one chunk.

Per chunk (DBLog §4.2, adapted to the lake sink):

1. ``lw``   = the applied WAL watermark (low watermark).
2. SELECT the chunk's live rows from the source (the select observes
   some position ``hw >= lw`` — concurrent writes keep landing).
3. ``hw``   = the position the select observed (high watermark).
4. Window dedup: DROP chunk rows whose key has a log event in
   ``(lw, hw]`` — that event is at least as fresh as the select and
   is applied through the normal WAL path anyway.
5. Stamp survivors with ``lsn = lw`` and MERGE them as their own
   string-keyed epoch (``chunk:<i>`` — disjoint from integer WAL
   epoch ids, the same namespacing rule stream_sync uses). Any later
   event (``lsn > lw``) still beats the chunk row at apply time, so
   ordering needs no coordination beyond the watermarks.

Correctness invariant (tests/test_incremental_snapshot.py): for every
interleaving of chunks and WAL slices — including deletes landing
mid-snapshot — the final table PAYLOAD per key equals the monolithic
``snapshot_then_tail`` replay. (Metadata differs by design: chunk
rows carry ``lsn = lw`` instead of the monolithic snapshot's 0.)

Scale shape: each chunk is O(|chunk|) work; the window-dedup key set
is only the events that arrived DURING one chunk's select, so the
anti-join side is metadata-sized and broadcast. Nothing rescans the
table; a 10^10-row snapshot is n_chunks independent bounded merges
interleaved with normal tail epochs, resumable at chunk granularity
via the epoch commit log.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airbyte_integrations_spark.config import SyncConfig
from airbyte_integrations_spark.functions.extract import with_extracted_text
from airbyte_integrations_spark.lakehouse.merge import merge_into
from airbyte_integrations_spark.lakehouse.table import LakeTable
from airbyte_integrations_spark.sources.cdc import LogTailSource
from airbyte_integrations_spark.streaming.microbatch import run_sync

# A chunk select returns (live rows at some observed position, that
# position). The rows carry the SOURCE shape (key + payload columns,
# no CDC metadata) — the loop stamps metadata itself.
ChunkSelect = Callable[[F.Column], tuple[DataFrame, int]]


def chunk_pred(key: str, i: int, n_chunks: int) -> F.Column:
    """Deterministic PK-hash chunk membership.

    DBLog chunks by ORDER BY pk LIMIT; a hash range gives the same
    disjoint-and-complete coverage without a global sort, and the
    predicate is stable across restarts (xxhash64 is a fixed JVM
    function of the key, not of partitioning)."""
    return F.pmod(F.xxhash64(F.col(key)), F.lit(n_chunks)) == F.lit(i)


def window_dedup(
    chunk_rows: DataFrame,
    log: LogTailSource,
    lw: int,
    hw: int,
    key: str,
) -> DataFrame:
    """Drop chunk rows whose key changed inside the (lw, hw] watermark
    window — step 4 of the algorithm. The window holds only the events
    that arrived during ONE chunk select, so the anti-join side is
    tiny and broadcast; no false drops (exact key match), no false
    keeps (every concurrent writer advances the log)."""
    if hw <= lw:
        return chunk_rows
    touched = (
        log.events.filter(
            (F.col(log.lsn_col) > F.lit(lw)) & (F.col(log.lsn_col) <= F.lit(hw))
        )
        .select(key)
        .distinct()
    )
    return chunk_rows.join(F.broadcast(touched), on=key, how="left_anti")


def stamp_chunk(chunk_rows: DataFrame, lw: int, key: str) -> DataFrame:
    """Stamp survivors as change events at the low watermark: any WAL
    event with lsn > lw wins over them at merge time, and every event
    with lsn <= lw is already reflected in the selected row — so
    lsn = lw is exactly the freshness the select guarantees."""
    ts = (
        F.col("warc_ts")
        if "warc_ts" in chunk_rows.columns
        else F.lit("2020-01-01 00:00:00").cast("timestamp")
    )
    return (
        chunk_rows.withColumn("_ab_cdc_lsn", F.lit(lw).cast("long"))
        .withColumn("_ab_cdc_updated_at", ts.cast("timestamp"))
        .withColumn("_ab_cdc_deleted_at", F.lit(None).cast("timestamp"))
        .withColumn(
            "_airbyte_ab_id", F.md5(F.concat(F.lit("chunk:"), F.col(key)))
        )
        .withColumn("_airbyte_emitted_at", F.col("_ab_cdc_updated_at"))
    )


def incremental_snapshot_sync(
    spark: SparkSession,
    select_chunk: ChunkSelect,
    log: LogTailSource,
    table: LakeTable,
    config: SyncConfig,
    n_chunks: int = 8,
    wal_step_events: int = 10_000,
    max_chunks: int | None = None,
    extract_missing_text: bool = True,
    drain: bool = True,
) -> list[str]:
    """Run the interleaved loop: one bounded WAL step, then one chunk,
    until all chunks are committed; then (optionally) drain the tail.

    - `select_chunk(pred) -> (rows, observed_lsn)` is the live-source
      read; `observed_lsn` is the WAL position the select saw (>= the
      watermark it started at) and becomes the window's high mark.
    - `max_chunks` bounds work for crash simulation; re-running resumes
      exactly (committed chunk epochs no-op via the commit log, the
      WAL watermark carries its own resume point).

    Returns the chunk epoch ids committed by THIS call.
    """
    key = config.primary_key[0]
    committed: list[str] = []
    done = 0
    for i in range(n_chunks):
        # Keep the tail moving between chunks (the snapshot must never
        # stall replication — the whole point of the incremental form).
        run_sync(
            spark,
            log.events,
            table,
            config,
            max_events_per_epoch=wal_step_events,
            max_epochs=1,
            extract_missing_text=extract_missing_text,
        )
        epoch_id = f"chunk:{i}"
        if table.is_epoch_committed(config.stream, epoch_id):
            continue
        if max_chunks is not None and done >= max_chunks:
            break
        lw = table.watermark(config.stream) or 0
        rows, hw = select_chunk(chunk_pred(key, i, n_chunks))
        survivors = window_dedup(rows, log, lw, hw, key)
        stamped = stamp_chunk(survivors, lw, key)
        transform = (
            with_extracted_text
            if extract_missing_text and "html" in stamped.columns
            else None
        )
        merge_into(
            table,
            stamped,
            stream=config.stream,
            epoch=epoch_id,
            epoch_meta={"from_lsn": lw, "to_lsn": lw, "chunk": i, "hw": hw},
            cursor=config.cursor_field[0],
            secondary=config.secondary_order,
            transform_winners=transform,
            mode=config.write_mode,
            dedup_impl=config.dedup_impl,
            key=config.primary_key,
            n_buckets=config.n_buckets,
        )
        committed.append(epoch_id)
        done += 1
    if drain and (max_chunks is None or done < max_chunks):
        run_sync(
            spark,
            log.events,
            table,
            config,
            max_events_per_epoch=wal_step_events,
            extract_missing_text=extract_missing_text,
        )
    return committed
