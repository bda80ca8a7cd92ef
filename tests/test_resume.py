"""Checkpoint/resume + exactly-once (CdcSourceTest
testRecordsProducedDuringAndAfterSync :366-435 analogue and
BufferedStreamConsumer idempotence :39-57)."""

from airbyte_integrations_spark.config import SyncConfig
from airbyte_integrations_spark.gen import gen_change_events
from airbyte_integrations_spark.lakehouse.table import LakeTable
from airbyte_integrations_spark.streaming.microbatch import run_sync
from tests.util import assert_frames_equal

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


def _events(spark, n=1500):
    return gen_change_events(spark, n, n_urls=50).select(*COLS)


def test_kill_and_resume_converges(spark, tmp_path):
    ev = _events(spark)
    cfg = SyncConfig(stream="pages")

    crashed = LakeTable(spark, str(tmp_path / "crashed"))
    # "crash" after 2 epochs...
    run_sync(spark, ev, crashed, cfg, max_events_per_epoch=400, max_epochs=2,
             extract_missing_text=False)
    assert crashed.watermark("pages") == 800
    # ...then restart from the checkpoint
    run_sync(spark, ev, crashed, cfg, max_events_per_epoch=400, extract_missing_text=False)

    clean = LakeTable(spark, str(tmp_path / "clean"))
    run_sync(spark, ev, clean, cfg, max_events_per_epoch=400, extract_missing_text=False)

    assert_frames_equal(crashed.read().toPandas(), clean.read().toPandas())


def test_recommit_epoch_is_noop(spark, tmp_path):
    ev = _events(spark, 900)
    cfg = SyncConfig(stream="pages")
    table = LakeTable(spark, str(tmp_path / "t"))
    run_sync(spark, ev, table, cfg, max_events_per_epoch=300, extract_missing_text=False)
    v = table.current_version()
    before = table.read().toPandas()
    # full re-run over the same log: all epochs already committed
    applied = run_sync(spark, ev, table, cfg, max_events_per_epoch=300,
                       extract_missing_text=False)
    assert applied == []  # watermark filters everything
    assert table.current_version() == v
    assert_frames_equal(table.read().toPandas(), before)


def test_late_events_after_sync_are_picked_up(spark, tmp_path):
    cfg = SyncConfig(stream="pages")
    table = LakeTable(spark, str(tmp_path / "t"))
    ev1 = _events(spark, 600)
    run_sync(spark, ev1, table, cfg, max_events_per_epoch=200, extract_missing_text=False)
    # new tail arrives (lsn continues)
    ev2 = gen_change_events(spark, 400, n_urls=50, lsn_start=601, seed="cdc2").select(*COLS)
    both = ev1.unionByName(ev2)
    run_sync(spark, both, table, cfg, max_events_per_epoch=200, extract_missing_text=False)

    clean = LakeTable(spark, str(tmp_path / "clean"))
    run_sync(spark, both, clean, cfg, max_events_per_epoch=200, extract_missing_text=False)
    assert_frames_equal(table.read().toPandas(), clean.read().toPandas())
