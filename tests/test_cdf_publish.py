"""Outbound replication: lake table -> partitioned-log change feed
(destinations/cdf_publish), consumed back into a second lake table —
the destination-kafka-fed-by-changelog fan-out, exactly-once per
version range."""

import pyspark.sql.functions as F

from airbyte_integrations_spark.config import SyncConfig
from airbyte_integrations_spark.destinations.cdf_publish import (
    consume_published,
    publish_changes,
    published_version,
)
from airbyte_integrations_spark.destinations.partitioned_log import (
    read_topic,
    resolve_topic,
)
from airbyte_integrations_spark.gen import gen_change_events
from airbyte_integrations_spark.lakehouse.table import LakeTable
from airbyte_integrations_spark.sources.partitioned_log import (
    sync_partitioned_log,
)
from airbyte_integrations_spark.streaming.microbatch import run_sync

COLS = [
    "url", "text", "lang", "_ab_cdc_lsn", "_ab_cdc_updated_at",
    "_ab_cdc_deleted_at", "_airbyte_ab_id", "_airbyte_emitted_at",
]


def _ingest(spark, table, lo, hi, **kw):
    ev = gen_change_events(spark, hi, n_urls=60, seed="cdfpub").select(*COLS)
    run_sync(
        spark,
        ev.filter(
            (F.col("_ab_cdc_lsn") > lo) & (F.col("_ab_cdc_lsn") <= hi)
        ),
        table,
        SyncConfig(stream="pages", n_buckets=4),
        max_events_per_epoch=250,
        extract_missing_text=False,
        compact_threshold=None,
        **kw,
    )


def test_publish_then_consume_converges(spark, tmp_path):
    a = LakeTable(spark, str(tmp_path / "a"))
    log = str(tmp_path / "feed")

    # hop 1: baseline snapshot publish after the first ingest window
    _ingest(spark, a, 0, 500)
    offs1 = publish_changes(spark, a, log, "pages", namespace="crawl")
    assert offs1 is not None
    topic = resolve_topic("{namespace}.{stream}", "crawl", "pages")
    v1 = published_version(log, topic)
    assert v1 == a.current_version()
    # already-published head: no-op, cursor unchanged
    assert publish_changes(spark, a, log, "pages", namespace="crawl") is None

    # hop 2: more source changes (updates + deletes), delta publish
    _ingest(spark, a, 500, 900)
    offs2 = publish_changes(spark, a, log, "pages", namespace="crawl")
    assert offs2 is not None and published_version(log, topic) > v1
    # delta rows carry a HIGHER feed position than the baseline
    feed = read_topic(spark, log, topic)
    assert feed.select(F.max("_ab_cdc_lsn")).first()[0] == a.current_version()
    # deletes ride as tombstones with the key's before image
    assert feed.filter(F.col("_ab_cdc_deleted_at").isNotNull()).count() > 0

    # downstream: consume the whole topic into table B
    b = LakeTable(spark, str(tmp_path / "b"))
    cfg = SyncConfig(stream="pages", n_buckets=4, secondary_order=())
    got = sync_partitioned_log(
        spark, consume_published(feed), b, cfg, compact_threshold=None
    )
    assert got is not None
    live_a = a.read_live().select("url", "text", "lang")
    live_b = b.read_live().select("url", "text", "lang")
    assert live_a.count() == live_b.count()
    assert live_b.exceptAll(live_a).count() == 0
    # replayed consume round: no-op
    assert (
        sync_partitioned_log(
            spark, consume_published(feed), b, cfg, compact_threshold=None
        )
        is None
    )


def test_publish_delta_is_change_rows_only(spark, tmp_path):
    a = LakeTable(spark, str(tmp_path / "a"))
    log = str(tmp_path / "feed")
    _ingest(spark, a, 0, 600)
    publish_changes(spark, a, log, "pages")
    topic = resolve_topic("{namespace}.{stream}", None, "pages")
    n_base = read_topic(spark, log, topic).count()
    assert n_base == a.read_live().count()
    _ingest(spark, a, 600, 700)
    publish_changes(spark, a, log, "pages")
    n_total = read_topic(spark, log, topic).count()
    delta = n_total - n_base
    # the delta window touched at most 100 events' worth of keys —
    # a full re-snapshot would re-emit every live row
    assert 0 < delta <= 100
    # crash-retry of the same range: recorded epoch, no double append
    assert publish_changes(spark, a, log, "pages") is None
    assert read_topic(spark, log, topic).count() == n_total


def test_single_epoch_table_publishes_baseline(spark, tmp_path):
    """Lake versions start at 0 — a table whose whole history is one
    epoch (current_version == 0) must still baseline-publish."""
    a = LakeTable(spark, str(tmp_path / "a"))
    ev = gen_change_events(spark, 200, n_urls=30, seed="v0").select(*COLS)
    run_sync(
        spark, ev, a, SyncConfig(stream="pages", n_buckets=2),
        max_events_per_epoch=10_000, extract_missing_text=False,
        compact_threshold=None,
    )
    assert a.current_version() == 0
    log = str(tmp_path / "feed")
    assert publish_changes(spark, a, log, "pages") is not None
    topic = resolve_topic("{namespace}.{stream}", None, "pages")
    assert published_version(log, topic) == 0
    assert read_topic(spark, log, topic).count() == a.read_live().count() > 0
    assert publish_changes(spark, a, log, "pages") is None


def test_feed_renders_as_debezium_wire(spark, tmp_path):
    """The published feed composes with the envelope emitters: a
    downstream Kafka consumer can be handed Debezium JSONL of the
    feed, and the parse inverse recovers the same per-key state."""
    from airbyte_integrations_spark.sources.debezium import (
        emit_debezium,
        parse_debezium,
    )

    a = LakeTable(spark, str(tmp_path / "a"))
    _ingest(spark, a, 0, 500)
    log = str(tmp_path / "feed")
    publish_changes(spark, a, log, "pages")
    _ingest(spark, a, 500, 700)
    publish_changes(spark, a, log, "pages")
    topic = resolve_topic("{namespace}.{stream}", None, "pages")
    feed = consume_published(read_topic(spark, log, topic))
    wire = emit_debezium(feed, ["url", "text", "lang"])
    back = parse_debezium(wire, "url string, text string, lang string")
    pick = lambda df: {  # noqa: E731
        (r["url"], r["_ab_cdc_lsn"]): (
            r["text"], r["lang"], r["_ab_cdc_deleted_at"] is not None
        )
        for r in df.select(
            "url", "_ab_cdc_lsn", "text", "lang", "_ab_cdc_deleted_at"
        ).collect()
    }
    assert pick(back) == pick(feed) and len(pick(feed)) > 0
