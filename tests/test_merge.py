"""MERGE-apply end-to-end: epoch-sliced replay converges to the same
final state as a single-shot replay and as the DuckDB oracle
(FIXTURES.md F4 matrix core)."""

import pytest
from pyspark.sql import functions as F

from airbyte_integrations_spark.config import SyncConfig
from airbyte_integrations_spark.gen import gen_change_events
from airbyte_integrations_spark.lakehouse.merge import merge_into
from airbyte_integrations_spark.lakehouse.table import LakeTable
from airbyte_integrations_spark.operators.dedup import winner_window
from airbyte_integrations_spark.streaming.microbatch import run_sync
from tests.util import assert_frames_equal, duckdb_winners

COLS = [
    "url",
    "warc_ts",
    "text",
    "lang",
    "_ab_cdc_lsn",
    "_ab_cdc_updated_at",
    "_ab_cdc_deleted_at",
    "_airbyte_ab_id",
    "_airbyte_emitted_at",
]


@pytest.fixture()
def events(spark):
    return gen_change_events(spark, 2500, n_urls=60, skew_alpha=2.5).select(*COLS)


def test_epoch_replay_matches_oracle(spark, tmp_path, events):
    table = LakeTable(spark, str(tmp_path / "t"))
    cfg = SyncConfig(stream="pages")
    run_sync(spark, events, table, cfg, max_events_per_epoch=500, extract_missing_text=False)
    got = table.read().toPandas()
    want = duckdb_winners(events.toPandas())
    assert_frames_equal(got, want)


def test_single_epoch_equals_many_epochs(spark, tmp_path, events):
    cfg = SyncConfig(stream="pages")
    t1 = LakeTable(spark, str(tmp_path / "one"))
    run_sync(spark, events, t1, cfg, max_events_per_epoch=10**9, extract_missing_text=False)
    t2 = LakeTable(spark, str(tmp_path / "many"))
    run_sync(spark, events, t2, cfg, max_events_per_epoch=300, extract_missing_text=False)
    assert_frames_equal(t1.read().toPandas(), t2.read().toPandas())


def test_tombstone_removes_key(spark, tmp_path, events):
    table = LakeTable(spark, str(tmp_path / "t"))
    cfg = SyncConfig(stream="pages")
    run_sync(spark, events, table, cfg, max_events_per_epoch=1000, extract_missing_text=False)
    final = table.read()
    # every url whose winning event is a tombstone must be absent
    w = winner_window(events)
    dead = set(
        r["url"] for r in w.filter(F.col("_ab_cdc_deleted_at").isNotNull()).collect()
    )
    live = set(r["url"] for r in final.select("url").collect())
    assert dead and not (dead & live)
    # and exactly one row per surviving url
    assert final.count() == final.select("url").distinct().count()


def test_out_of_order_lsn_update_loses(spark, tmp_path):
    """An update with a lower lsn arriving in a later epoch must NOT
    overwrite (the s.lsn > t.lsn monotone guard)."""
    import datetime as dt

    ts = dt.datetime(2021, 6, 1)
    schema = (
        "url string, _ab_cdc_lsn long, _ab_cdc_updated_at timestamp, "
        "_ab_cdc_deleted_at timestamp, _airbyte_ab_id string, "
        "_airbyte_emitted_at timestamp, text string"
    )
    table = LakeTable(spark, str(tmp_path / "t"))
    b1 = spark.createDataFrame([("u", 10, ts, None, "a", ts, "new")], schema)
    merge_into(table, b1, epoch=1)
    b2 = spark.createDataFrame([("u", 5, ts, None, "b", ts, "old")], schema)
    merge_into(table, b2, epoch=2)
    rows = table.read().collect()
    assert len(rows) == 1 and rows[0]["text"] == "new" and rows[0]["_ab_cdc_lsn"] == 10


def test_empty_batch_still_commits_epoch(spark, tmp_path):
    """testNoData/testNoDataOnSecondSync: an empty sync still records
    its checkpoint (state emitted), with no data change."""
    import datetime as dt

    ts = dt.datetime(2021, 6, 1)
    schema = (
        "url string, _ab_cdc_lsn long, _ab_cdc_updated_at timestamp, "
        "_ab_cdc_deleted_at timestamp, _airbyte_ab_id string, _airbyte_emitted_at timestamp"
    )
    t = LakeTable(spark, str(tmp_path / "t"))
    merge_into(t, spark.createDataFrame([("u", 1, ts, None, "a", ts)], schema), epoch=1)
    merge_into(t, spark.createDataFrame([], schema), epoch=2)
    assert t.is_epoch_committed("pages", 2)
    assert t.read().count() == 1


def test_tombstone_for_absent_key_does_not_insert(spark, tmp_path):
    import datetime as dt

    ts = dt.datetime(2021, 6, 1)
    schema = (
        "url string, _ab_cdc_lsn long, _ab_cdc_updated_at timestamp, "
        "_ab_cdc_deleted_at timestamp, _airbyte_ab_id string, _airbyte_emitted_at timestamp"
    )
    t = LakeTable(spark, str(tmp_path / "t"))
    merge_into(t, spark.createDataFrame([("u", 1, ts, None, "a", ts)], schema), epoch=1)
    merge_into(t, spark.createDataFrame([("zzz", 5, ts, ts, "b", ts)], schema), epoch=2)
    assert [r["url"] for r in t.read().collect()] == ["u"]


def test_shuffled_key_join_matches_broadcast(spark, tmp_path, events):
    """broadcast_keys=False (the forced-shuffle path a 10^8-winner epoch
    auto-degrades to) must produce the identical final state."""
    half = events.filter("_ab_cdc_lsn <= 1250")
    rest = events.filter("_ab_cdc_lsn > 1250")
    t1 = LakeTable(spark, str(tmp_path / "bc"))
    merge_into(t1, half, epoch=1, broadcast_keys=True)
    merge_into(t1, rest, epoch=2, broadcast_keys=True)
    t2 = LakeTable(spark, str(tmp_path / "sh"))
    merge_into(t2, half, epoch=1, broadcast_keys=False)
    merge_into(t2, rest, epoch=2, broadcast_keys=False)
    assert_frames_equal(t1.read().toPandas(), t2.read().toPandas())
