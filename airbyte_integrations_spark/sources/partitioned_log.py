"""Partitioned-log source (Kafka-shaped): per-partition offset state.

Reference: source-kafka (connectors/source-kafka/src/main/java/.../
KafkaSource.java) — a consumer reads assigned topic partitions and its
resume state is a VECTOR of offsets, one per partition, not a scalar
cursor (KafkaStateManager commits {partition: offset}). The same state
shape serves Kinesis shards and Pulsar partitions. The engine's scalar
lsn watermark cannot express "partition 0 is at 900 while partition 1
is at 350" — this module adds the vector form on top of the same
epoch-keyed idempotent commit log.

Ordering contract (Kafka's own): total order exists only WITHIN a
partition. The winner rule stays correct because producers key-hash
records to partitions, so all versions of one primary key live in one
partition and the per-key order is the partition order. Records are
expected to carry `_ab_part` (int) and a per-partition-monotone cursor
in the configured cursor column (the offset).

Spark-first shape: the offsets vector is metadata-sized (thousands of
partitions at most) — it rides into the scan filter as an inlined
literal map, so the "give me everything past my offsets" predicate is
a narrow `offset > offsets[part]` projection pushed at the scan; no
join, no shuffle beyond the MERGE itself.
"""

from __future__ import annotations

import hashlib
import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airbyte_integrations_spark.config import SyncConfig
from airbyte_integrations_spark.functions.extract import with_extracted_text
from airbyte_integrations_spark.lakehouse.merge import merge_into
from airbyte_integrations_spark.lakehouse.table import LakeTable
from airbyte_integrations_spark.lineage import compute_lineage, write_lineage

PART_COL = "_ab_part"

# Numeric lineage label space for plog rounds, disjoint from run_sync's
# lsn epochs and stream_sync's 2**44 base (same display-only role as
# STREAM_EPOCH_BASE — exactly-once is keyed by the string epoch key)
PLOG_EPOCH_BASE = 2**45


def committed_offsets(table: LakeTable, stream: str) -> dict[int, int]:
    """Durable per-partition offsets: the element-wise max over every
    committed epoch's `part_offsets` meta (the commit log plays the
    consumer group's offset store)."""
    out: dict[int, int] = {}
    if not table.exists():
        return out
    for meta in table.committed_epochs(stream).values():
        if not isinstance(meta, dict):
            continue
        for p, off in (meta.get("part_offsets") or {}).items():
            p = int(p)
            out[p] = max(out.get(p, -1), int(off))
    return out


def _past_offsets(
    events: DataFrame, offsets: dict[int, int], cursor: str
) -> DataFrame:
    """offset > offsets[part] as a narrow scan predicate; partitions
    with no committed offset pass whole."""
    if not offsets:
        return events
    m = F.create_map(
        *[
            x
            for p, off in sorted(offsets.items())
            for x in (F.lit(int(p)), F.lit(int(off)))
        ]
    )
    floor = F.coalesce(m[F.col(PART_COL)], F.lit(-1))
    return events.filter(F.col(cursor) > floor)


def sync_partitioned_log(
    spark: SparkSession,
    events: DataFrame,
    table: LakeTable,
    config: SyncConfig,
    extract_missing_text: bool = False,
    compact_threshold: int | None = 8,
) -> dict[int, int] | None:
    """One bounded consume round: everything past the committed offsets
    vector applies as ONE epoch whose key is derived from the new
    vector — deterministic in (source, durable state), so a crash/
    re-run of the same round is a committed-epoch no-op and the state
    advances only with the data (exactly-once, the same contract as
    run_sync's lsn epochs).

    Returns the offsets vector committed this round, or None if the
    log held nothing new."""
    cursor = config.cursor_field[0]
    if PART_COL not in events.columns:
        raise ValueError(f"partitioned log events need an {PART_COL} column")
    offsets = committed_offsets(table, config.stream)
    batch = _past_offsets(events, offsets, cursor)
    highs = {
        int(r[PART_COL]): int(r["mx"])
        for r in batch.groupBy(PART_COL).agg(F.max(cursor).alias("mx")).collect()
    }
    if not highs:
        return None
    new_offsets = dict(offsets)
    new_offsets.update(highs)
    vec = {str(p): new_offsets[p] for p in sorted(new_offsets)}
    digest = hashlib.md5(
        json.dumps(vec, sort_keys=True).encode()
    ).hexdigest()[:12]
    epoch_key = f"plog:{digest}"
    if table.is_epoch_committed(config.stream, epoch_key):
        return None
    transform = (
        with_extracted_text
        if extract_missing_text and "html" in batch.columns
        else None
    )
    n_rounds = sum(
        1
        for k in (
            table.committed_epochs(config.stream) if table.exists() else ()
        )
        if str(k).startswith("plog:")
    )
    lineage_epoch = PLOG_EPOCH_BASE + n_rounds
    lineage = compute_lineage(batch, config.stream, lineage_epoch, cursor)
    write_lineage(lineage, table.root, lineage_epoch)
    merge_into(
        table,
        batch.drop(PART_COL),
        stream=config.stream,
        epoch=epoch_key,
        epoch_meta={"part_offsets": vec},
        cursor=cursor,
        secondary=config.secondary_order,
        transform_winners=transform,
        # arrival order across partitions is arbitrary (exactly the
        # stream_sync situation): retain tombstones so a late
        # pre-delete image from a slow partition cannot resurrect a
        # key deleted by a fast one
        keep_tombstones=True,
        mode=config.write_mode,
        dedup_impl=config.dedup_impl,
        key=config.primary_key,
        n_buckets=config.n_buckets,
    )
    if compact_threshold is not None:
        table.compact(max_files_per_bucket=compact_threshold)
    return {int(p): o for p, o in vec.items()}
