"""Metadata tables + AS-OF-TIMESTAMP travel (Iceberg `files` /
`history` metadata tables, snapshot timestamp-ms addressing)."""

import time

from airbyte_integrations_spark.config import SyncConfig
from airbyte_integrations_spark.lakehouse.table import LakeTable
from airbyte_integrations_spark.streaming.microbatch import run_sync
from tests.test_reset import _events


def test_meta_files_lists_base_and_delta(spark, tmp_path):
    ev = _events(spark)
    cfg = SyncConfig(stream="pages", n_buckets=4, write_mode="mor")
    table = LakeTable(spark, str(tmp_path / "lake"))
    run_sync(spark, ev, table, cfg, max_events_per_epoch=15,
             compact_threshold=None)
    mf = table.meta_files().collect()
    kinds = {r["kind"] for r in mf}
    assert kinds == {"base", "delta"}
    assert all(0 <= r["bucket"] < 4 for r in mf)
    # zone-map stats ride along for the cursor column
    assert any("_ab_cdc_lsn" in r["stats"] for r in mf)
    # pinned snapshot: version 0 has no deltas yet
    v0 = table.meta_files(version=0).collect()
    assert {r["kind"] for r in v0} == {"base"}


def test_meta_history_and_asof_ts(spark, tmp_path):
    ev = _events(spark)
    cfg = SyncConfig(stream="pages", n_buckets=4)
    table = LakeTable(spark, str(tmp_path / "lake"))
    run_sync(spark, ev.filter("_ab_cdc_lsn <= 20"), table, cfg,
             compact_threshold=None)
    v_mid = table.current_version()
    t_mid = time.time_ns() // 1000
    time.sleep(0.01)
    run_sync(spark, ev, table, cfg, compact_threshold=None)

    hist = {r["version"]: r for r in table.meta_history().collect()}
    assert set(hist) == set(range(table.current_version() + 1))
    stamps = [hist[v]["committed_at_us"] for v in sorted(hist)]
    assert stamps == sorted(stamps) and stamps[0] > 0
    assert hist[table.current_version()]["epochs_per_stream"]["pages"] >= 1

    # timestamp between the two syncs resolves to the mid snapshot
    assert table.version_asof_ts(t_mid) == v_mid
    assert table.version_asof_ts(time.time_ns() // 1000) == table.current_version()
    assert table.read_live(version=table.version_asof_ts(t_mid)).count() > 0
    # a timestamp before the table existed matches nothing
    assert table.version_asof_ts(stamps[0] - 1) is None


def test_expire_age_cutoff_widens_retention(spark, tmp_path):
    """older_than_us retains young snapshots beyond keep_last (Iceberg
    expireSnapshots(olderThan) composition: knobs only widen)."""
    ev = _events(spark)
    cfg = SyncConfig(stream="pages", n_buckets=4)
    table = LakeTable(spark, str(tmp_path / "lake"))
    run_sync(spark, ev.filter("_ab_cdc_lsn <= 15"), table, cfg,
             compact_threshold=None)
    t_cut = time.time_ns() // 1000
    time.sleep(0.01)
    run_sync(spark, ev.filter("_ab_cdc_lsn <= 30"), table, cfg,
             compact_threshold=None)
    run_sync(spark, ev, table, cfg, compact_threshold=None)
    cur = table.current_version()
    # keep_last=1 alone would expire everything below cur; the age
    # cutoff keeps every snapshot committed after t_cut
    table.expire_snapshots(keep_last=1, older_than_us=t_cut)
    retained = {r["version"] for r in table.meta_history().collect()}
    assert cur in retained
    assert all(
        table.manifest(v)["committed_at_us"] >= t_cut
        for v in retained if v != cur
    )
    assert len(retained) >= 2, "young snapshots must survive keep_last=1"
    # pre-cutoff snapshots are gone
    assert 0 not in retained


def test_tags_pin_snapshots_and_retention(spark, tmp_path):
    """Iceberg TAG refs: immutable named snapshots that expire must
    retain beyond keep_last until dropped."""
    import pytest

    from airbyte_integrations_spark.config import SyncConfig
    from airbyte_integrations_spark.gen import gen_change_events
    from airbyte_integrations_spark.lakehouse.table import LakeTable
    from airbyte_integrations_spark.streaming.microbatch import run_sync

    table = LakeTable(spark, str(tmp_path / "t"))
    ev = gen_change_events(spark, 600, n_urls=40)
    run_sync(spark, ev.filter("_ab_cdc_lsn <= 200"), table,
             SyncConfig(stream="pages", n_buckets=2),
             extract_missing_text=False, max_events_per_epoch=100)
    v_ship = table.current_version()
    table.tag("shipped")
    n_ship = table.read_live().count()
    run_sync(spark, ev, table, SyncConfig(stream="pages", n_buckets=2),
             extract_missing_text=False, max_events_per_epoch=100)
    assert table.current_version() > v_ship

    # duplicate tag refused; unknown drop refused; expired target raises
    with pytest.raises(ValueError, match="immutable"):
        table.tag("shipped")
    with pytest.raises(ValueError, match="no tag"):
        table.drop_tag("nope")

    # expiry keeps the tagged snapshot beyond keep_last=1
    table.expire_snapshots(keep_last=1)
    assert table.read_live(version=v_ship).count() == n_ship
    assert table.tags() == {"shipped": v_ship}

    # drop the tag: the next expiry reclaims it
    table.drop_tag("shipped")
    table.expire_snapshots(keep_last=1)
    with pytest.raises(FileNotFoundError):
        table.manifest(v_ship)
    # tagging an expired version refused
    with pytest.raises(FileNotFoundError):
        table.tag("late", version=v_ship)
