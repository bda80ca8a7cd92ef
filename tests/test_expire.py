"""Snapshot expiry + orphan-file cleanup (Iceberg expire_snapshots /
remove_orphan_files analogue) — mandatory maintenance at the
one-snapshot-per-epoch cadence of the 10^10-event design point."""

import os

import pytest

from airbyte_integrations_spark.config import SyncConfig
from airbyte_integrations_spark.gen import gen_change_events
from airbyte_integrations_spark.lakehouse.table import LakeTable
from airbyte_integrations_spark.streaming.microbatch import run_sync

COLS = [
    "url", "text", "lang",
    "_ab_cdc_lsn", "_ab_cdc_updated_at", "_ab_cdc_deleted_at",
    "_airbyte_ab_id", "_airbyte_emitted_at",
]


def _files_on_disk(root):
    data = os.path.join(root, "data")
    return {
        os.path.relpath(os.path.join(dp, f), root)
        for dp, _, fs in os.walk(data)
        for f in fs
    }


def _referenced(table):
    m = table.manifest()
    refs = {p for ps in m["files"].values() for p in ps}
    refs |= {p for ps in m.get("deltas", {}).values() for p in ps}
    return refs


def test_expire_keeps_live_state_and_frees_superseded_files(spark, tmp_path):
    ev = gen_change_events(spark, 4000, n_urls=200).select(*COLS)
    table = LakeTable(spark, str(tmp_path / "t"))
    cfg = SyncConfig(stream="pages", n_buckets=8, write_mode="cow")
    run_sync(spark, ev, table, cfg, max_events_per_epoch=1000,
             extract_missing_text=False)
    assert table.current_version() >= 3  # several COW rewrites happened

    before = table.read_live().orderBy("url").collect()
    on_disk_before = _files_on_disk(table.root)
    assert on_disk_before > _referenced(table)  # superseded files exist

    # a Spark success-marker sidecar must be swept but NOT counted as a
    # data file (it would inflate data_files_removed/bytes_removed)
    sidecar = os.path.join(table.root, "data", "_SUCCESS")
    with open(sidecar, "w"):
        pass

    stats = table.expire_snapshots(keep_last=2)
    assert stats["data_files_removed"] > 0
    assert stats["bytes_removed"] > 0
    assert stats["manifests_removed"] > 0
    # swept alongside Spark's own _SUCCESS/.crc markers, none of which
    # may count as data files
    assert stats["sidecars_removed"] >= 1 and not os.path.exists(sidecar)

    # live state byte-identical
    assert table.read_live().orderBy("url").collect() == before
    # disk now holds exactly the retained manifests' references
    retained_refs = set()
    cur = table.current_version()
    for v in (cur - 1, cur):
        m = table.manifest(v)
        retained_refs |= {p for ps in m["files"].values() for p in ps}
        retained_refs |= {p for ps in m.get("deltas", {}).values() for p in ps}
    assert _files_on_disk(table.root) == retained_refs

    # time travel: retained parent still readable, expired one gone
    table.read(version=cur - 1).count()
    with pytest.raises(FileNotFoundError):
        table.manifest(0)
    # history skips expired versions instead of failing
    assert [h["version"] for h in table.history()] == [cur - 1, cur]

    # idempotent
    stats2 = table.expire_snapshots(keep_last=2)
    assert stats2["data_files_removed"] == 0
    assert stats2["manifests_removed"] == 0


def test_expire_sweeps_crash_orphans_and_preserves_resume(spark, tmp_path):
    ev = gen_change_events(spark, 3000, n_urls=150).select(*COLS)
    table = LakeTable(spark, str(tmp_path / "t"))
    cfg = SyncConfig(stream="pages", n_buckets=8, write_mode="mor")
    # crash after 2 epochs
    run_sync(spark, ev, table, cfg, max_events_per_epoch=1000,
             extract_missing_text=False, max_epochs=2, compact_threshold=None)

    # a writer died mid-job: orphan parquet under data/, never committed
    orphan_dir = os.path.join(table.root, "data", "deadbeef", "_bucket=0")
    os.makedirs(orphan_dir)
    orphan = os.path.join(orphan_dir, "part-zzz.parquet")
    with open(orphan, "wb") as f:
        f.write(b"not really parquet")

    stats = table.expire_snapshots(keep_last=1)
    assert not os.path.exists(orphan)
    assert stats["data_files_removed"] >= 1

    # resume still works after expiry (watermark lives in the manifest)
    wm = table.watermark("pages")
    run_sync(spark, ev, table, cfg, max_events_per_epoch=1000,
             extract_missing_text=False, compact_threshold=None)
    assert table.watermark("pages") > wm
    # final state equals a fresh full replay
    fresh = LakeTable(spark, str(tmp_path / "fresh"))
    run_sync(spark, ev, fresh, cfg, max_events_per_epoch=1000,
             extract_missing_text=False, compact_threshold=None)
    a = table.read_live().orderBy("url").collect()
    b = fresh.read_live().orderBy("url").collect()
    assert a == b
