"""Partitioned-log destination (Kafka producer shape).

Reference: destination-kafka — KafkaRecordConsumer.java:57-96 resolves
a per-stream topic from the configured pattern (``{namespace}`` /
``{stream}`` placeholders, KafkaRecordConsumer.java:85-90), wraps each
record in the (_airbyte_ab_id, _airbyte_stream, _airbyte_emitted_at,
_airbyte_data) envelope and hands ``ProducerRecord(topic, key, value)``
to the producer; the broker assigns ``hash(key) % n_partitions`` and a
dense per-partition offset. Delivery is at-least-once
(KafkaRecordConsumer.java:92-99 logs-and-raises on send failure; no
transactional producer) — consumers dedup, exactly as the engine's
partitioned-log SOURCE does via its winner rule.

Spark-first mapping: one append = one job. Partition assignment is a
narrow ``pmod(xxhash64(key), n)`` projection; offset assignment is a
per-partition ``row_number`` over the caller's order — one task per
partition, which is not a skew accident but the semantics: a Kafka
partition IS a serial log, and parallelism scales with n_partitions
exactly as it does on a broker. Per-partition highs live in an
atomically-replaced sidecar so appends resume densely.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from airbyte_integrations_spark.sources.partitioned_log import PART_COL

OFFSET_COL = "_ab_offset"


def resolve_topic(pattern: str, namespace: str | None, stream: str) -> str:
    """{namespace}/{stream} placeholder resolution + identifier
    normalization (KafkaRecordConsumer.java:85-90 uses the
    StandardNameTransformer on the filled pattern)."""
    out = pattern.replace("{namespace}", namespace or "").replace(
        "{stream}", stream
    )
    out = "".join(c if (c.isalnum() or c in "._-") else "_" for c in out)
    return out.strip("._") or "default"


def _topic_dir(root: str, topic: str) -> str:
    return os.path.join(root, topic)


def log_offsets(root: str, topic: str) -> dict[int, int]:
    """Current high offset per partition (−1 base: next append starts
    at high+1)."""
    p = os.path.join(_topic_dir(root, topic), "_offsets.json")
    if not os.path.exists(p):
        return {}
    with open(p) as fh:
        return {int(k): int(v) for k, v in json.load(fh).items()}


def producer_epochs(root: str, topic: str) -> dict[str, dict[int, int]]:
    """Recorded idempotent-producer epochs: {epoch_key: highs-after}."""
    p = os.path.join(_topic_dir(root, topic), "_producer_epochs.json")
    if not os.path.exists(p):
        return {}
    with open(p) as fh:
        return {
            k: {int(pp): int(h) for pp, h in v.items()}
            for k, v in json.load(fh).items()
        }


def write_partitioned_log(
    df: DataFrame,
    root: str,
    stream: str,
    namespace: str | None = None,
    topic_pattern: str = "{namespace}.{stream}",
    key_col: str = "url",
    n_partitions: int = 4,
    order_by: tuple[str, ...] = ("_ab_cdc_lsn",),
    producer_epoch: str | int | None = None,
) -> dict[int, int]:
    """Append df to the topic's partitioned log; returns the new
    per-partition high offsets. Records gain `_ab_part` (producer
    key-hash partitioner) and `_ab_offset` (dense per-partition
    sequence continuing from the sidecar highs) — the exact shape
    sources/partitioned_log consumes. order_by fixes the within-
    partition emission order (a real producer serializes sends; a
    batch writer must say what that order is to be reproducible).

    `producer_epoch` upgrades delivery from at-least-once to
    exactly-once (Kafka's idempotent/transactional producer:
    enable.idempotence + epoch fencing): a re-run carrying an
    already-recorded epoch key is a no-op returning the highs recorded
    at its first commit, so crash-retry loops never double-append.
    (A crash BETWEEN the record append and the epoch record re-appends
    on retry — the same at-least-once window a non-transactional Kafka
    producer has; the engine's consumer-side winner rule absorbs it,
    and the lake's epoch-keyed MERGE stays exactly-once regardless.)"""
    topic = resolve_topic(topic_pattern, namespace, stream)
    tdir = _topic_dir(root, topic)
    os.makedirs(tdir, exist_ok=True)
    if producer_epoch is not None:
        done = producer_epochs(root, topic)
        if str(producer_epoch) in done:
            return done[str(producer_epoch)]
    highs = log_offsets(root, topic)
    part = F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_partitions)).cast("int")
    base = F.create_map(
        *[
            x
            for p, h in sorted(highs.items())
            for x in (F.lit(int(p)), F.lit(int(h)))
        ]
    ) if highs else None
    w = Window.partitionBy(PART_COL).orderBy(
        *[F.col(c).asc() for c in order_by]
    )
    out = df.withColumn(PART_COL, part)
    floor = (
        F.coalesce(base[F.col(PART_COL)], F.lit(-1))
        if base is not None
        else F.lit(-1)
    )
    out = out.withColumn(
        OFFSET_COL, (F.row_number().over(w) + floor).cast("long")
    )
    out.write.mode("append").parquet(os.path.join(tdir, "log"))
    new_highs = dict(highs)
    for r in (
        out.groupBy(PART_COL).agg(F.max(OFFSET_COL).alias("mx")).collect()
    ):
        new_highs[int(r[PART_COL])] = int(r.mx)
    tmp = os.path.join(tdir, f"_offsets.json.tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as fh:
        json.dump({str(p): h for p, h in sorted(new_highs.items())}, fh)
    os.replace(tmp, os.path.join(tdir, "_offsets.json"))
    if producer_epoch is not None:
        done = producer_epochs(root, topic)
        done[str(producer_epoch)] = new_highs
        tmp2 = os.path.join(tdir, f"_pe.json.tmp-{uuid.uuid4().hex}")
        with open(tmp2, "w") as fh:
            json.dump(
                {
                    k: {str(p): h for p, h in v.items()}
                    for k, v in done.items()
                },
                fh,
            )
        os.replace(tmp2, os.path.join(tdir, "_producer_epochs.json"))
    return new_highs


def read_topic(spark, root: str, topic: str) -> DataFrame:
    return spark.read.parquet(os.path.join(_topic_dir(root, topic), "log"))
