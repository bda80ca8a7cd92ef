"""Consistent cross-stream reads at a WAL position (version_asof /
read_catalog_asof) + history() with mixed int/string epoch ids."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from airbyte_integrations_spark.catalog_sync import read_catalog_asof, stream_table
from airbyte_integrations_spark.config import SyncConfig
from airbyte_integrations_spark.gen import gen_change_events
from airbyte_integrations_spark.lakehouse.merge import merge_into
from airbyte_integrations_spark.lakehouse.table import LakeTable
from airbyte_integrations_spark.operators.dedup import winner_window
from airbyte_integrations_spark.streaming.microbatch import run_sync

N = 2400


@pytest.fixture(scope="module")
def world(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("asof") / "lake")
    ev = gen_change_events(spark, N, n_urls=200, seed="asof", delete_pct=10).cache()
    a = ev.filter(F.xxhash64("url") % 2 == 0)
    b = ev.filter(F.xxhash64("url") % 2 != 0)
    # different epoch cadences: the tables advance at different paces
    run_sync(spark, a, stream_table(spark, root, "alpha"),
             SyncConfig(stream="alpha", n_buckets=4), max_events_per_epoch=150)
    run_sync(spark, b, stream_table(spark, root, "beta"),
             SyncConfig(stream="beta", n_buckets=4, write_mode="mor"),
             max_events_per_epoch=400)
    return root, ev, a, b


def replay_to(ev, lsn):
    return winner_window(
        ev.filter(F.col("_ab_cdc_lsn") <= F.lit(lsn)), drop_tombstones=True
    ).select("url", "_ab_cdc_lsn")


def test_asof_floor_is_exact_replay(spark, world):
    root, ev, a, b = world
    X = N // 2
    views = read_catalog_asof(spark, root, ["alpha", "beta"], X)
    for stream, sub in (("alpha", a), ("beta", b)):
        t = stream_table(spark, root, stream)
        v = t.version_asof(stream, X)
        assert v is not None
        wm = max(
            int(e["to_lsn"])
            for e in t.manifest(v)["committed"][stream].values()
            if "to_lsn" in e
        )
        assert wm <= X
        got = views[stream].select("url", "_ab_cdc_lsn")
        want = replay_to(sub, wm)
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0
        # causal bound: nothing past the requested position
        assert views[stream].filter(F.col("_ab_cdc_lsn") > X).count() == 0


def test_asof_at_head_equals_current(spark, world):
    root, ev, a, b = world
    views = read_catalog_asof(spark, root, ["alpha", "beta"], N)
    for stream in ("alpha", "beta"):
        t = stream_table(spark, root, stream)
        cur = t.read_live().select("url", "_ab_cdc_lsn")
        got = views[stream].select("url", "_ab_cdc_lsn")
        assert got.exceptAll(cur).count() == 0 and cur.exceptAll(got).count() == 0


def test_asof_monotone_in_lsn(spark, world):
    root, ev, a, b = world
    t = stream_table(spark, root, "alpha")
    first_wm = min(
        int(e["to_lsn"])
        for e in t.manifest()["committed"]["alpha"].values()
        if "to_lsn" in e
    )
    vs = [t.version_asof("alpha", x) for x in (first_wm, 900, 1800, N)]
    assert all(x is not None for x in vs)
    assert vs == sorted(vs)


def test_stream_younger_than_position_is_none(spark, world, tmp_path):
    root, ev, a, b = world
    # a stream that does not exist yet
    views = read_catalog_asof(spark, root, ["gamma"], 100)
    assert views["gamma"] is None
    # a stream whose first epoch ends past the position
    t = stream_table(spark, root, "alpha")
    first_wm = min(
        int(e["to_lsn"])
        for e in t.manifest()["committed"]["alpha"].values()
        if "to_lsn" in e
    )
    assert t.version_asof("alpha", first_wm - 1) is None


def test_history_with_string_epochs(spark, tmp_path):
    ev = gen_change_events(spark, 300, n_urls=50, seed="hist")
    t = LakeTable(spark, str(tmp_path / "h"))
    cfg = SyncConfig(stream="pages", n_buckets=2)
    run_sync(spark, ev, t, cfg, max_events_per_epoch=150)
    merge_into(
        t, ev.limit(10), stream="pages", epoch="chunk:0",
        epoch_meta={"from_lsn": 0, "to_lsn": 0, "chunk": 0},
        key=("url",), n_buckets=2,
    )
    h = t.history()  # must not raise on mixed int/string epoch ids
    last = h[-1]["committed"]["pages"]
    assert "chunk:0" in last
    # numeric ids first (numeric order), string ids after
    nums = [e for e in last if e.lstrip("-").isdigit()]
    assert last == nums + [e for e in last if not e.lstrip("-").isdigit()]
    assert nums == sorted(nums, key=int)
