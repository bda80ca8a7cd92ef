"""Sync-mode dispatcher — the reference's (sync_mode,
destination_sync_mode) matrix (airbyte_protocol.yaml:278-289) over a
LakeTable sink.

| source mode   | dest mode     | apply                                   |
|---------------|---------------|-----------------------------------------|
| full_refresh  | overwrite     | atomic replace (truncate+copy in one tx,|
|               |               | JdbcBufferedConsumerFactory.java:173)   |
| full_refresh/ | append        | add files only                          |
| incremental   |               |                                         |
| incremental   | append_dedup  | winner-rule MERGE (SCD type 1 final)    |
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from airbyte_integrations_spark.config import DestinationSyncMode, SyncConfig
from airbyte_integrations_spark.lakehouse.merge import merge_into
from airbyte_integrations_spark.lakehouse.table import LakeTable


def apply_batch(
    table: LakeTable,
    batch: DataFrame,
    config: SyncConfig,
    epoch: int | None = None,
    epoch_meta: dict | None = None,
) -> int:
    mode = config.destination_sync_mode
    if mode == DestinationSyncMode.OVERWRITE:
        return table.create(
            batch, config.primary_key, config.n_buckets, config.stream, epoch, epoch_meta
        )
    if mode == DestinationSyncMode.APPEND:
        return table.append(
            batch, config.stream, epoch, epoch_meta,
            key=config.primary_key, n_buckets=config.n_buckets,
        )
    if mode == DestinationSyncMode.APPEND_DEDUP:
        return merge_into(
            table,
            batch,
            stream=config.stream,
            epoch=epoch,
            epoch_meta=epoch_meta,
            cursor=config.cursor_field[0],
            secondary=config.secondary_order,
            key=config.primary_key,
            n_buckets=config.n_buckets,
        )
    raise ValueError(f"unknown destination sync mode: {mode}")
