"""CDC heartbeat: the source offset advances past the last tracked-table
change (Debezium heartbeat.interval.ms — without it a low-traffic table
pins WAL retention on the source forever). Engine mapping: run_sync's
`heartbeat_position` commits a zero-row `hb:<pos>` marker epoch whose
to_lsn advances watermark(), so the next sync plans strictly above it."""

import pyspark.sql.functions as F
import pytest

from airbyte_integrations_spark.config import SyncConfig
from airbyte_integrations_spark.gen import gen_change_events
from airbyte_integrations_spark.lakehouse.table import LakeTable
from airbyte_integrations_spark.streaming.microbatch import run_sync

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


def _events(spark, n=600):
    return gen_change_events(spark, n, n_urls=40).select(*COLS)


def test_heartbeat_advances_watermark_with_zero_events(spark, tmp_path):
    ev = _events(spark)
    cfg = SyncConfig(stream="pages")
    t = LakeTable(spark, str(tmp_path / "t"))
    run_sync(spark, ev, t, cfg, extract_missing_text=False)
    assert t.watermark("pages") == 600
    rows = t.read().count()
    v = t.current_version()

    # WAL moved (other tables' traffic) but nothing for this stream
    empty = ev.filter(F.lit(False))
    run_sync(spark, empty, t, cfg, heartbeat_position=5000,
             extract_missing_text=False, compact_threshold=None)
    assert t.watermark("pages") == 5000
    assert t.read().count() == rows          # zero data change
    assert t.current_version() == v + 1      # one marker commit

    # idempotent: same position again is a no-op (no new version)
    run_sync(spark, empty, t, cfg, heartbeat_position=5000,
             extract_missing_text=False, compact_threshold=None)
    assert t.current_version() == v + 1

    # stale events at or below the heartbeat are already-consumed
    # (the offset contract): re-running the original log plans nothing
    assert run_sync(spark, ev, t, cfg, extract_missing_text=False) == []
    assert t.watermark("pages") == 5000


def test_heartbeat_tops_up_after_real_epochs(spark, tmp_path):
    ev = _events(spark)
    cfg = SyncConfig(stream="pages")
    t = LakeTable(spark, str(tmp_path / "t"))
    eps = run_sync(spark, ev, t, cfg, max_events_per_epoch=250,
                   heartbeat_position=900, extract_missing_text=False)
    assert len(eps) == 3
    assert t.watermark("pages") == 900
    meta = t.committed_epochs("pages")["hb:900"]
    assert meta == {"from_lsn": 600, "to_lsn": 900, "heartbeat": True}


def test_heartbeat_skipped_on_truncated_plan(spark, tmp_path):
    """max_epochs truncation (simulated crash / bounded run) means the
    sync did NOT consume up to the source position — advancing the
    watermark there would drop the unapplied epochs' events."""
    ev = _events(spark)
    cfg = SyncConfig(stream="pages")
    t = LakeTable(spark, str(tmp_path / "t"))
    run_sync(spark, ev, t, cfg, max_events_per_epoch=250, max_epochs=1,
             heartbeat_position=900, extract_missing_text=False)
    assert t.watermark("pages") == 250
    assert "hb:900" not in t.committed_epochs("pages")
    # resume applies the rest, then the heartbeat lands
    run_sync(spark, ev, t, cfg, max_events_per_epoch=250,
             heartbeat_position=900, extract_missing_text=False)
    assert t.watermark("pages") == 900


def test_heartbeat_behind_watermark_is_noop(spark, tmp_path):
    ev = _events(spark)
    cfg = SyncConfig(stream="pages")
    t = LakeTable(spark, str(tmp_path / "t"))
    run_sync(spark, ev, t, cfg, extract_missing_text=False)
    v = t.current_version()
    run_sync(spark, ev.filter(F.lit(False)), t, cfg, heartbeat_position=10,
             extract_missing_text=False, compact_threshold=None)
    assert t.watermark("pages") == 600 and t.current_version() == v


def test_marker_epoch_requires_existing_table(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "none"))
    with pytest.raises(ValueError, match="existing table"):
        t.commit_marker_epoch("pages", "hb:5")


def test_heartbeat_through_read_catalog(spark, tmp_path):
    """A cdc_log stream in a configured catalog carries the source's
    WAL position: the quiet stream's watermark advances via the marker
    epoch and the next catalog pass replans above it."""
    from airbyte_integrations_spark.catalog_sync import (
        ConfiguredCatalog,
        ConfiguredStream,
        read_catalog,
        stream_table,
    )
    from airbyte_integrations_spark.config import DestinationSyncMode, SyncMode

    ev = _events(spark, 400)
    log = str(tmp_path / "log")
    ev.write.parquet(log)
    cs = ConfiguredStream(
        config=SyncConfig(
            stream="pages",
            sync_mode=SyncMode.INCREMENTAL,
            destination_sync_mode=DestinationSyncMode.APPEND_DEDUP,
            n_buckets=4,
        ),
        source={"kind": "cdc_log", "path": log, "heartbeat_position": 4000},
    )
    lake = str(tmp_path / "lake")
    read_catalog(spark, ConfiguredCatalog(streams=(cs,)), lake)
    t = stream_table(spark, lake, "pages")
    assert t.watermark("pages") == 4000
    v = t.current_version()
    # converged: the second pass plans nothing and commits nothing
    read_catalog(spark, ConfiguredCatalog(streams=(cs,)), lake)
    assert t.current_version() == v
