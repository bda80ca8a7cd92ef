"""Snapshot rollback (Iceberg rollback_to_snapshot analogue): restores
data AND the committed-epoch log (watermark) in one metadata-only
commit; re-syncing after a rollback re-applies the undone range."""

import pytest
from pyspark.sql import functions as F

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


def _rows(df):
    return {tuple(r) for r in df.select("url", "_ab_cdc_lsn").collect()}


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_rollback_restores_state_and_resync_converges(spark, tmp_path, mode):
    ev = gen_change_events(spark, 1500, n_urls=80).select(*COLS)
    hi = int(ev.agg(F.max("_ab_cdc_lsn")).collect()[0][0])
    mid = hi // 2
    cfg = SyncConfig(stream="pages", write_mode=mode)
    t = LakeTable(spark, str(tmp_path / f"t_{mode}"))
    run_sync(spark, ev.filter(F.col("_ab_cdc_lsn") <= mid), t, cfg,
             extract_missing_text=False, compact_threshold=None)
    v_mid = t.current_version()
    wm_mid = t.watermark("pages")
    half_state = _rows(t.read_live())
    run_sync(spark, ev, t, cfg, extract_missing_text=False,
             compact_threshold=None)
    full_state = _rows(t.read_live())
    assert full_state != half_state

    v_rb = t.rollback(v_mid)
    # metadata-only commit: new version, restored live state + watermark
    assert v_rb == t.current_version() > v_mid
    assert _rows(t.read_live()) == half_state
    assert t.watermark("pages") == wm_mid
    assert t.manifest()["rollback_of"] == v_mid
    # the undone versions remain time-travelable
    assert _rows(t.read_live(version=v_rb - 1)) == full_state

    # re-sync re-applies the undone range (epochs re-commit, no false
    # epoch-skip) and converges to the full replay
    eps = run_sync(spark, ev, t, cfg, extract_missing_text=False,
                   compact_threshold=None)
    assert eps, "resync after rollback applied nothing"
    assert _rows(t.read_live()) == full_state


def test_rollback_to_current_is_noop(spark, tmp_path):
    ev = gen_change_events(spark, 300, n_urls=20).select(*COLS)
    t = LakeTable(spark, str(tmp_path / "t"))
    run_sync(spark, ev, t, SyncConfig(stream="pages"),
             extract_missing_text=False, compact_threshold=None)
    v = t.current_version()
    assert t.rollback(v) == v
    assert t.current_version() == v


def test_rollback_to_expired_snapshot_raises(spark, tmp_path):
    ev = gen_change_events(spark, 600, n_urls=30).select(*COLS)
    hi = int(ev.agg(F.max("_ab_cdc_lsn")).collect()[0][0])
    cfg = SyncConfig(stream="pages")
    t = LakeTable(spark, str(tmp_path / "t"))
    run_sync(spark, ev.filter(F.col("_ab_cdc_lsn") <= hi // 2), t, cfg,
             extract_missing_text=False, compact_threshold=None)
    v0 = t.current_version()
    run_sync(spark, ev, t, cfg, extract_missing_text=False,
             compact_threshold=None)
    t.expire_snapshots(keep_last=1)
    with pytest.raises(FileNotFoundError):
        t.rollback(v0)


def test_rollback_then_ivm_refresh_stays_exact(spark, tmp_path):
    """The view-maintenance feed handles a rollback like any other
    version pair (deletes flow for rows that vanish)."""
    from airbyte_integrations_spark.lakehouse.ivm import MaterializedAggView

    ev = gen_change_events(spark, 900, n_urls=50).select(*COLS)
    hi = int(ev.agg(F.max("_ab_cdc_lsn")).collect()[0][0])
    cfg = SyncConfig(stream="pages")
    t = LakeTable(spark, str(tmp_path / "t"))
    run_sync(spark, ev.filter(F.col("_ab_cdc_lsn") <= hi // 2), t, cfg,
             extract_missing_text=False, compact_threshold=None)
    v_mid = t.current_version()
    run_sync(spark, ev, t, cfg, extract_missing_text=False,
             compact_threshold=None)
    view = MaterializedAggView(spark, str(tmp_path / "v"), dims=("lang",))
    view.refresh(t)
    t.rollback(v_mid)
    view.refresh(t)
    want = {
        tuple(r)
        for r in t.read_live()
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .collect()
    }
    assert {tuple(r) for r in view.read().collect()} == want
