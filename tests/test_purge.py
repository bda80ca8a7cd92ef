"""GDPR hard delete: purge_key physically removes every version of a
primary key — current, historical deltas, tombstones — rewriting only
the zone-map candidate files in the key's bucket, and (by default)
expires history so no retained byte still carries the value."""

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from airbyte_integrations_spark.config import SyncConfig
from airbyte_integrations_spark.gen import gen_change_events
from airbyte_integrations_spark.lakehouse.table import LakeTable
from airbyte_integrations_spark.streaming.microbatch import run_sync
from tests.util import assert_frames_equal

COLS = [
    "url", "warc_ts", "text", "lang",
    "_ab_cdc_lsn", "_ab_cdc_updated_at", "_ab_cdc_deleted_at",
    "_airbyte_ab_id", "_airbyte_emitted_at",
]


@pytest.fixture()
def events(spark):
    return gen_change_events(spark, 2000, n_urls=60, skew_alpha=2.5).select(*COLS)


def _mor(spark, tmp_path, events):
    table = LakeTable(spark, str(tmp_path / "t"))
    cfg = SyncConfig(stream="pages", n_buckets=4, write_mode="mor")
    run_sync(spark, events, table, cfg, max_events_per_epoch=500,
             extract_missing_text=False, compact_threshold=None)
    return table


def _hot_url(events):
    return (
        events.groupBy("url").count().orderBy(F.desc("count"), "url").first()["url"]
    )


def _value_on_disk(table, url):
    """True iff any retained data file still carries the url."""
    for dirpath, _d, files in os.walk(os.path.join(table.root, "data")):
        for fn in files:
            if not fn.endswith(".parquet"):
                continue
            t = pq.read_table(os.path.join(dirpath, fn), columns=["url"])
            if url in set(t.column("url").to_pylist()):
                return True
    return False


def test_purge_removes_every_version_and_byte(spark, tmp_path, events):
    table = _mor(spark, tmp_path, events)
    url = _hot_url(events)
    # MoR stores per-epoch winners, not every event: the physical rows
    # carrying the key are base + delta rows, and purge must remove
    # exactly those.
    n_stored = (
        table.read().unionByName(table.read_deltas())
        .filter(F.col("url") == url).count()
    )
    assert n_stored > 1  # multiple epochs touched the hot url
    others_before = (
        table.read_live().filter(F.col("url") != url).toPandas()
        .sort_values("url").reset_index(drop=True)
    )
    res = table.purge_key(url)  # erase_history=True default
    assert res["rows_removed"] == n_stored
    assert res["files_rewritten"] > 0
    assert table.read_live().filter(F.col("url") == url).count() == 0
    assert table.read_key(url).count() == 0
    # untouched keys byte-identical through the purge
    others_after = (
        table.read_live().toPandas().sort_values("url").reset_index(drop=True)
    )
    assert_frames_equal(others_after, others_before)
    # PHYSICAL erasure: no retained parquet file carries the value,
    # and no pre-purge snapshot remains to time-travel into
    assert not _value_on_disk(table, url)
    assert table.manifest()["version"] == table.current_version()
    with pytest.raises(FileNotFoundError):
        table.manifest(res["version"] - 1)


def test_purge_without_erase_keeps_history_until_expire(spark, tmp_path, events):
    table = _mor(spark, tmp_path, events)
    url = _hot_url(events)
    v_before = table.current_version()
    table.purge_key(url, erase_history=False)
    # logically gone now, but the old snapshot still reads the value
    assert table.read_live().filter(F.col("url") == url).count() == 0
    assert (
        table.read_live(version=v_before).filter(F.col("url") == url).count() > 0
    )
    assert _value_on_disk(table, url)  # bytes still present pre-expiry
    table.expire_snapshots(keep_last=1)
    assert not _value_on_disk(table, url)


def test_purge_absent_key_is_a_noop(spark, tmp_path, events):
    table = _mor(spark, tmp_path, events)
    v = table.current_version()
    res = table.purge_key("https://never-crawled.example/nope")
    assert res["rows_removed"] == 0 and res["files_rewritten"] == 0
    assert table.current_version() == v  # no empty commit


def test_purge_then_merge_continues_normally(spark, tmp_path, events):
    from airbyte_integrations_spark.lakehouse.merge import merge_into

    table = _mor(spark, tmp_path, events)
    url = _hot_url(events)
    table.purge_key(url)
    hi = int(events.agg(F.max("_ab_cdc_lsn")).first()[0])
    batch = events.filter(F.col("url") == url).limit(1).withColumn(
        "_ab_cdc_lsn", F.lit(hi + 1)
    ).withColumn("_ab_cdc_deleted_at", F.lit(None).cast("timestamp"))
    merge_into(table, batch, stream="pages", epoch=hi + 1, mode="mor")
    # the key can come back through normal ingest (purge is not a ban)
    assert table.read_live().filter(F.col("url") == url).count() == 1
