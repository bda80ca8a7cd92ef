"""Outbound replication: lake table -> downstream change feed.

The inbound half of the engine tails someone else's log into a lake
table; this is the OUTBOUND half — publish the table's own row-level
changes to a partitioned log so downstream consumers (another lake,
a search index, a cache) can tail US. Reference context: this is the
destination-kafka shape (KafkaRecordConsumer.java:57-96 — records to a
per-stream topic keyed by PK) fed by a Delta-CDF/Iceberg-changelog
diff instead of a source connector, i.e. the "outbox" a platform
operator builds by chaining source-<lake> -> destination-kafka.

Exactly-once per version range, with NO new state: the publisher's
durable cursor IS the destination's idempotent-producer epoch log
(destinations/partitioned_log.producer_epochs) — each publish commits
under the epoch key ``cdf:<from_version>:<to_version>``, the next run
resumes from the highest published ``to_version``, and a crash-retry
of the same range is a recorded-epoch no-op. Killing this anywhere
converges on re-run.

Wire shape per event: every table payload column (deletes carry the
BEFORE image — the same rule Debezium applies,
DebeziumEventUtils.java:46-65), ``_change_type``
(insert/update_postimage/delete), and a synthesized total order:
``_ab_cdc_lsn`` = the publication's to_version (a key changes at most
once per published range, so per-key the publication version IS the
change order), deterministic version-clock timestamps, md5 ab_id over
(key, version). A downstream `sources/partitioned_log` consumer feeds
these straight into `run_sync`'s winner rule.

Scale shape: `table.changes` prunes both sides to the buckets whose
file lists differ (metadata-only) before one key-hash join; the
append is one job with a per-partition sequence window. First publish
(no recorded epochs) emits the full live table as inserts — the
baseline snapshot every replication fan-out starts with.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airbyte_integrations_spark.destinations.partitioned_log import (
    producer_epochs,
    resolve_topic,
    write_partitioned_log,
)
from airbyte_integrations_spark.lakehouse.table import LakeTable

_EPOCH_PREFIX = "cdf:"
_PUB_KEY = "_pub_key"


def published_version(log_root: str, topic: str) -> int:
    """Highest to_version this topic has durably recorded (-1 = never
    published — the next publish emits the baseline snapshot; lake
    version numbering starts at 0, so 0 is a REAL publishable head)."""
    out = -1
    for k in producer_epochs(log_root, topic):
        if k.startswith(_EPOCH_PREFIX):
            out = max(out, int(k.split(":")[2]))
    return out


def publish_changes(
    spark: SparkSession,
    table: LakeTable,
    log_root: str,
    stream: str,
    namespace: str | None = None,
    topic_pattern: str = "{namespace}.{stream}",
    n_partitions: int = 4,
) -> dict[int, int] | None:
    """Publish everything between the last published version and the
    table head; returns the new per-partition high offsets, or None if
    the head is already published. Idempotent per version range.

    Requires the manifests of both versions to still exist: if
    retention (expire_snapshots) dropped the last published version's
    manifest, this raises rather than silently re-baselining — a
    re-baseline without downstream knowledge would miss deletes, so
    the operator must either keep manifests >= the publish cadence or
    reset the topic explicitly.
    """
    topic = resolve_topic(topic_pattern, namespace, stream)
    frm = published_version(log_root, topic)
    head = table.current_version()
    if head <= frm:
        return None
    key = table.key_cols()
    if frm < 0:
        df = table.read_live().withColumn("_change_type", F.lit("insert"))
    else:
        df = table.changes(frm, head)
    clock = F.timestamp_seconds(F.lit(int(head)))
    is_del = F.col("_change_type") == F.lit("delete")
    pub_key = F.concat_ws("\x1f", *[F.col(k).cast("string") for k in key])
    events = (
        df.withColumn(_PUB_KEY, pub_key)
        .withColumn("_ab_cdc_lsn", F.lit(int(head)).cast("long"))
        .withColumn("_ab_cdc_updated_at", clock)
        .withColumn("_ab_cdc_deleted_at", F.when(is_del, clock))
        .withColumn(
            "_airbyte_ab_id",
            F.md5(F.concat_ws(":", pub_key, F.lit(str(head)))),
        )
        .withColumn("_airbyte_emitted_at", clock)
    )
    return write_partitioned_log(
        events,
        log_root,
        stream,
        namespace=namespace,
        topic_pattern=topic_pattern,
        key_col=_PUB_KEY,
        n_partitions=n_partitions,
        order_by=("_ab_cdc_lsn", _PUB_KEY),
        producer_epoch=f"{_EPOCH_PREFIX}{frm}:{head}",
    )


def consume_published(df: DataFrame) -> DataFrame:
    """Adapter for the consumer side: drop the publisher's internal
    partitioner key so the frame feeds `sync_partitioned_log` /
    `run_sync` with the table's own columns."""
    return df.drop(_PUB_KEY, "_change_type")
