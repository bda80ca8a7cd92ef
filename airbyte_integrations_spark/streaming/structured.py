"""Structured Streaming ingest: readStream -> foreachBatch -> MERGE.

The batch loop in microbatch.py plans its own lsn epochs (the
Debezium-style bounded sync). This module is the continuous form: Spark
Structured Streaming tails a growing event-log directory
(`spark.readStream.schema(...).parquet`) and every micro-batch is
applied through the same dedup->MERGE->commit path inside
`foreachBatch`.

Exactly-once composition: Structured Streaming's checkpointLocation
gives at-least-once re-delivery of a failed batch (same batch_id); the
LakeTable epoch commit log keyed by batch_id turns the re-delivery into
a no-op — the same (state-after-commit + idempotent re-apply) pairing
as BufferedStreamConsumer.java:39-57/175-193. No watermark is used:
late lsns are resolved by the winner rule at apply time (SURVEY §2.10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from airbyte_integrations_spark.config import SyncConfig
from airbyte_integrations_spark.functions.extract import with_extracted_text
from airbyte_integrations_spark.lakehouse.merge import merge_into
from airbyte_integrations_spark.lakehouse.table import LakeTable
from airbyte_integrations_spark.lineage import compute_lineage, write_lineage


def start_stream(
    spark: SparkSession,
    log_dir: str,
    schema,
    table: LakeTable,
    config: SyncConfig,
    checkpoint_dir: str,
    available_now: bool = True,
    extract_missing_text: bool = True,
):
    """Start (and for available_now=True, run to completion) a streaming
    sync over a parquet event-log directory. Returns the query handle.
    """
    lsn_col = config.cursor_field[0]

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        if table.is_epoch_committed(config.stream, batch_id):
            return  # redelivered batch after a sink-side commit: no-op
        transform = (
            with_extracted_text
            if extract_missing_text and "html" in batch.columns
            else None
        )
        lineage = compute_lineage(batch, config.stream, batch_id, lsn_col)
        write_lineage(lineage, table.root, batch_id)
        merge_into(
            table,
            batch,
            stream=config.stream,
            epoch=batch_id,
            cursor=lsn_col,
            secondary=config.secondary_order,
            transform_winners=transform,
            key=config.primary_key,
            n_buckets=config.n_buckets,
        )

    reader = spark.readStream.schema(schema).parquet(log_dir)
    writer = (
        reader.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.trigger(processingTime="5 seconds").start()
