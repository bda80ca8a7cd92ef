"""Kafka-producer-shaped destination (destination-kafka
KafkaRecordConsumer parity): topic pattern resolution, key-hash
partition assignment, dense per-partition offsets, append resume — and
the produce→consume roundtrip through the partitioned-log source."""

import pyspark.sql.functions as F

from airbyte_integrations_spark.config import SyncConfig
from airbyte_integrations_spark.destinations.partitioned_log import (
    OFFSET_COL,
    log_offsets,
    read_topic,
    resolve_topic,
    write_partitioned_log,
)
from airbyte_integrations_spark.gen import gen_change_events
from airbyte_integrations_spark.lakehouse.table import LakeTable
from airbyte_integrations_spark.operators.dedup import winner_window
from airbyte_integrations_spark.sources.partitioned_log import (
    PART_COL,
    sync_partitioned_log,
)

COLS = [
    "url",
    "text",
    "lang",
    "_ab_cdc_lsn",
    "_ab_cdc_updated_at",
    "_ab_cdc_deleted_at",
    "_airbyte_ab_id",
    "_airbyte_emitted_at",
]


def test_topic_pattern_resolution():
    assert resolve_topic("{namespace}.{stream}", "Public", "users") == "Public.users"
    assert resolve_topic("{namespace}.{stream}", None, "users") == "users"
    assert resolve_topic("app {stream}!", None, "u s") == "app_u_s"


def test_dense_offsets_and_append_resume(spark, tmp_path):
    ev = gen_change_events(spark, 600, n_urls=40).select(*COLS)
    root = str(tmp_path / "bus")
    h1 = write_partitioned_log(
        ev.filter(F.col("_ab_cdc_lsn") <= 300), root, "pages"
    )
    assert h1 == log_offsets(root, "pages")
    log1 = read_topic(spark, root, "pages")
    # dense per-partition sequence 0..high
    for p, hi in h1.items():
        part = log1.filter(F.col(PART_COL) == p)
        assert part.count() == hi + 1
        assert part.agg(F.min(OFFSET_COL)).collect()[0][0] == 0
        assert part.agg(F.max(OFFSET_COL)).collect()[0][0] == hi
    # second append continues the sequence (no overlap, no gap)
    h2 = write_partitioned_log(
        ev.filter(F.col("_ab_cdc_lsn") > 300), root, "pages"
    )
    log2 = read_topic(spark, root, "pages")
    for p, hi in h2.items():
        part = log2.filter(F.col(PART_COL) == p)
        assert part.count() == hi + 1
        assert part.select(OFFSET_COL).distinct().count() == hi + 1


def test_keyed_records_stay_in_one_partition(spark, tmp_path):
    ev = gen_change_events(spark, 500, n_urls=25).select(*COLS)
    root = str(tmp_path / "bus")
    write_partitioned_log(ev, root, "pages")
    log = read_topic(spark, root, "pages")
    multi = (
        log.groupBy("url")
        .agg(F.countDistinct(PART_COL).alias("nparts"))
        .filter(F.col("nparts") > 1)
        .count()
    )
    assert multi == 0  # producer keying contract


def test_produce_consume_roundtrip(spark, tmp_path):
    """write_partitioned_log -> sync_partitioned_log == plain winner
    replay (the bus is invisible to the final state)."""
    ev = gen_change_events(spark, 800, n_urls=60).select(*COLS)
    root = str(tmp_path / "bus")
    write_partitioned_log(ev.filter(F.col("_ab_cdc_lsn") <= 400), root, "pages")
    write_partitioned_log(ev.filter(F.col("_ab_cdc_lsn") > 400), root, "pages")
    t = LakeTable(spark, str(tmp_path / "lake"))
    cfg = SyncConfig(
        stream="pages", cursor_field=("_ab_offset",), n_buckets=8
    )
    sync_partitioned_log(
        spark, read_topic(spark, root, "pages"), t, cfg, compact_threshold=None
    )
    expect = winner_window(ev, drop_tombstones=True).select("url", "_ab_cdc_lsn")
    got = t.read_live().select("url", "_ab_cdc_lsn")
    assert got.count() == expect.count()
    assert got.exceptAll(expect).count() == 0


def test_idempotent_producer_epoch(spark, tmp_path):
    """Kafka idempotent-producer analogue: re-sending a committed
    producer epoch is a no-op returning the recorded highs — the
    crash-retry loop never double-appends."""
    ev = gen_change_events(spark, 300, n_urls=20).select(*COLS)
    root = str(tmp_path / "bus")
    h1 = write_partitioned_log(ev, root, "pages", producer_epoch="sync:1")
    n1 = read_topic(spark, root, "pages").count()
    # retry of the same epoch: no new records, same highs back
    h2 = write_partitioned_log(ev, root, "pages", producer_epoch="sync:1")
    assert h2 == h1
    assert read_topic(spark, root, "pages").count() == n1 == 300
    # a NEW epoch appends
    h3 = write_partitioned_log(ev, root, "pages", producer_epoch="sync:2")
    assert read_topic(spark, root, "pages").count() == 600
    assert all(h3[p] >= h1.get(p, -1) for p in h3)
