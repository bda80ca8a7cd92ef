"""Sync-mode matrix (airbyte_protocol.yaml:283-289) over the lake sink."""

import datetime as dt

from airbyte_integrations_spark.config import DestinationSyncMode, SyncConfig
from airbyte_integrations_spark.lakehouse.table import LakeTable
from airbyte_integrations_spark.pipeline import apply_batch

TS = dt.datetime(2021, 6, 1)
SCHEMA = (
    "url string, text string, _ab_cdc_lsn long, _ab_cdc_updated_at timestamp, "
    "_ab_cdc_deleted_at timestamp, _airbyte_ab_id string, _airbyte_emitted_at timestamp"
)


def _batch(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_full_refresh_overwrite_replaces_atomically(spark, tmp_path):
    cfg = SyncConfig(stream="s", destination_sync_mode=DestinationSyncMode.OVERWRITE)
    t = LakeTable(spark, str(tmp_path / "t"))
    apply_batch(t, _batch(spark, [("a", "1", 1, TS, None, "x", TS)] * 3), cfg, epoch=1)
    assert t.read().count() == 3
    v = t.current_version()
    apply_batch(t, _batch(spark, [("b", "2", 2, TS, None, "y", TS)]), cfg, epoch=2)
    assert t.read().count() == 1
    assert t.read().collect()[0]["url"] == "b"
    # old snapshot manifest retained (time travel)
    assert t.manifest(v)["files"]
    assert t.current_version() == v + 1


def test_incremental_append_unions(spark, tmp_path):
    cfg = SyncConfig(stream="s", destination_sync_mode=DestinationSyncMode.APPEND)
    t = LakeTable(spark, str(tmp_path / "t"))
    apply_batch(t, _batch(spark, [("a", "1", 1, TS, None, "x", TS)]), cfg, epoch=1)
    apply_batch(t, _batch(spark, [("a", "2", 2, TS, None, "y", TS)]), cfg, epoch=2)
    assert t.read().count() == 2  # append keeps both versions
    # idempotence: re-applying a committed epoch is a no-op
    apply_batch(t, _batch(spark, [("a", "2", 2, TS, None, "y", TS)]), cfg, epoch=2)
    assert t.read().count() == 2


def test_append_dedup_keeps_latest(spark, tmp_path):
    cfg = SyncConfig(stream="s", destination_sync_mode=DestinationSyncMode.APPEND_DEDUP)
    t = LakeTable(spark, str(tmp_path / "t"))
    apply_batch(t, _batch(spark, [("a", "1", 1, TS, None, "x", TS)]), cfg, epoch=1)
    apply_batch(t, _batch(spark, [("a", "2", 2, TS, None, "y", TS)]), cfg, epoch=2)
    rows = t.read().collect()
    assert len(rows) == 1 and rows[0]["text"] == "2"
