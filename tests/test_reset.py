"""reset(): the platform RESET_CONNECTION job as one metadata commit.

Reference semantics (DefaultJobCreator.java:93-118): wipe destination
data and connection state; the next sync re-syncs from scratch and
converges to the same final state. Pins the epoch-log interplay (reset
clears the watermark so epochs RE-commit), time travel across the
reset, and GC of the orphaned pre-reset files.
"""

import datetime as dt

from pyspark.sql import functions as F

from airbyte_integrations_spark.config import SyncConfig
from airbyte_integrations_spark.lakehouse.table import LakeTable
from airbyte_integrations_spark.streaming.microbatch import run_sync

SCHEMA = (
    "url string, text string, _ab_cdc_lsn long, _ab_cdc_updated_at timestamp, "
    "_ab_cdc_deleted_at timestamp, _airbyte_ab_id string, _airbyte_emitted_at timestamp"
)
TS = dt.datetime(2021, 6, 1)


def _events(spark, n=40, n_urls=9):
    rows = [
        (
            f"u{i % n_urls}",
            f"t{i}",
            i + 1,
            TS,
            TS if i % 7 == 0 else None,
            f"id{i}",
            TS,
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, SCHEMA)


def _state(table):
    return sorted(
        (r["url"], r["text"], r["_ab_cdc_lsn"])
        for r in table.read_live().collect()
    )


def test_reset_then_resync_converges(spark, tmp_path):
    for mode in ("cow", "mor"):
        ev = _events(spark)
        cfg = SyncConfig(stream="pages", n_buckets=4, write_mode=mode)
        table = LakeTable(spark, str(tmp_path / f"lake_{mode}"))
        run_sync(spark, ev, table, cfg, max_events_per_epoch=10)
        before = _state(table)
        assert before
        v_pre = table.current_version()

        v_reset = table.reset()
        assert v_reset == v_pre + 1
        assert table.read_live().count() == 0
        assert table.watermark("pages") is None
        # schema + layout survive the wipe
        assert table.n_buckets == 4
        assert "url" in [f.name for f in table.schema.fields]
        # time travel: the pre-reset snapshot still reads
        assert table.read_live(version=v_pre).count() == len(before)

        # resync: epochs RE-commit (keys were cleared) and converge
        eps = run_sync(spark, ev, table, cfg, max_events_per_epoch=10)
        assert eps, "reset must clear the epoch log so the sync re-applies"
        assert _state(table) == before


def test_reset_orphans_reclaimed_by_expiry(spark, tmp_path):
    ev = _events(spark)
    cfg = SyncConfig(stream="pages", n_buckets=4)
    table = LakeTable(spark, str(tmp_path / "lake"))
    run_sync(spark, ev, table, cfg, max_events_per_epoch=20)
    table.reset()
    stats = table.expire_snapshots(keep_last=1)
    assert stats["data_files_removed"] > 0
    # the post-reset head still works and a resync still converges
    run_sync(spark, ev, table, cfg, max_events_per_epoch=20)
    assert table.read_live().count() > 0


def test_reset_requires_existing_table(spark, tmp_path):
    table = LakeTable(spark, str(tmp_path / "nope"))
    try:
        table.reset()
        raise AssertionError("reset on a non-existent table must raise")
    except FileNotFoundError:
        pass
