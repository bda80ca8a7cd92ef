"""Partition evolution: rebucket() rewrites the table into a new hash
bucket count while preserving content, time travel, the epoch commit
log (exactly-once), and subsequent MERGE behavior."""

import pytest
from pyspark.sql import functions as F

from airbyte_integrations_spark.config import SyncConfig
from airbyte_integrations_spark.gen import gen_change_events
from airbyte_integrations_spark.lakehouse.merge import merge_into
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
    return gen_change_events(spark, 1500, n_urls=50, skew_alpha=2.5).select(*COLS)


def _mor_table(spark, tmp_path, events, n_buckets=4):
    table = LakeTable(spark, str(tmp_path / "t"))
    cfg = SyncConfig(stream="pages", n_buckets=n_buckets, write_mode="mor")
    run_sync(spark, events, table, cfg, max_events_per_epoch=500,
             extract_missing_text=False, compact_threshold=None)
    return table


def test_rebucket_preserves_content_and_history(spark, tmp_path, events):
    table = _mor_table(spark, tmp_path, events)
    before = table.read_live().toPandas()
    v_old = table.current_version()
    epochs_before = set(table.committed_epochs("pages"))

    v_new = table.rebucket(16)
    assert v_new == v_old + 1
    assert table.n_buckets == 16
    # content identical through the layout change
    assert_frames_equal(table.read_live().toPandas(), before)
    # deltas folded into the new base
    assert not any(table.manifest().get("deltas", {}).values())
    # more than the old 4 buckets actually materialized
    assert len(table.manifest()["files"]) > 4
    # time travel: the pre-migration snapshot still reads its own layout
    assert_frames_equal(table.read_live(version=v_old).toPandas(), before)
    # the epoch commit log carried forward: exactly-once resume survives
    assert set(table.committed_epochs("pages")) == epochs_before
    wm = table.watermark("pages")
    assert wm is not None


def test_merge_after_rebucket_uses_new_layout(spark, tmp_path, events):
    table = _mor_table(spark, tmp_path, events)
    table.rebucket(16)
    wm = table.watermark("pages")
    # a post-migration batch: update every url with a newer lsn
    batch = (
        table.read_live()
        .withColumn("_ab_cdc_lsn", F.col("_ab_cdc_lsn") + 10_000)
        .withColumn("text", F.lit("after-migration"))
    )
    merge_into(table, batch, stream="pages", epoch=wm + 10_000, mode="mor")
    live = table.read_live()
    assert live.filter(F.col("text") != "after-migration").count() == 0
    assert table.n_buckets == 16
    # replaying an already-committed pre-migration epoch is still a no-op
    v = table.current_version()
    eid = int(next(iter(table.committed_epochs("pages"))))
    merge_into(table, batch.limit(1), stream="pages", epoch=eid, mode="mor")
    assert table.current_version() == v


def test_rebucket_noop_and_validation(spark, tmp_path, events):
    table = _mor_table(spark, tmp_path, events)
    v = table.current_version()
    assert table.rebucket(4) == v  # same count: no new snapshot
    with pytest.raises(ValueError):
        table.rebucket(0)
    with pytest.raises(ValueError):
        LakeTable(spark, str(tmp_path / "missing")).rebucket(8)


def test_rebucket_retains_tombstones_when_kept(spark, tmp_path, events):
    table = LakeTable(spark, str(tmp_path / "kt"))
    table.want_props(keep_tombstones=True)
    merge_into(table, events, stream="pages", epoch=1, mode="mor",
               keep_tombstones=True, n_buckets=4)
    dead_before = table.read_resolved().filter(
        F.col("_ab_cdc_deleted_at").isNotNull()
    ).count()
    assert dead_before > 0
    table.rebucket(8)
    dead_after = table.read(None).filter(
        F.col("_ab_cdc_deleted_at").isNotNull()
    ).count()
    assert dead_after == dead_before  # physically retained through rewrite
