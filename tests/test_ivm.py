"""Incremental materialized-view maintenance (lakehouse/ivm.py):
the maintained aggregate must equal a full recompute at every refresh,
across layouts, deletes, multi-sync histories, and schema evolution."""

import pyspark.sql.functions as F
import pytest

from airbyte_integrations_spark.config import SyncConfig
from airbyte_integrations_spark.gen import gen_change_events
from airbyte_integrations_spark.lakehouse.ivm import MaterializedAggView
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


def _recompute(table, dims, sums):
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(F.col(c).cast("long")).alias(f"sum_{c}") for c in sums
    ]
    return table.read_live().groupBy(*dims).agg(*aggs)


def _assert_view_equals_recompute(view, table, dims, sums):
    got = {tuple(r) for r in view.read().collect()}
    want = {tuple(r) for r in _recompute(table, dims, sums).collect()}
    assert got == want


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_ivm_tracks_recompute_across_syncs(spark, tmp_path, mode):
    ev = gen_change_events(spark, 3000, n_urls=150).select(*COLS).withColumn(
        "n_chars", F.length("text").cast("long")
    )
    hi = int(ev.agg(F.max("_ab_cdc_lsn")).collect()[0][0])
    cfg = SyncConfig(stream="pages", write_mode=mode)
    t = LakeTable(spark, str(tmp_path / f"t_{mode}"))
    view = MaterializedAggView(
        spark, str(tmp_path / f"v_{mode}"), dims=("lang",), sums=("n_chars",)
    )
    cuts = [hi // 3, 2 * hi // 3, hi]
    for cut in cuts:
        run_sync(spark, ev.filter(F.col("_ab_cdc_lsn") <= cut), t, cfg,
                 extract_missing_text=False, compact_threshold=None)
        view.refresh(t)
        assert view.base_version() == t.current_version()
        _assert_view_equals_recompute(view, t, ("lang",), ("n_chars",))


def test_ivm_refresh_is_idempotent(spark, tmp_path):
    ev = gen_change_events(spark, 600, n_urls=40).select(*COLS)
    cfg = SyncConfig(stream="pages")
    t = LakeTable(spark, str(tmp_path / "t"))
    run_sync(spark, ev, t, cfg, extract_missing_text=False,
             compact_threshold=None)
    view = MaterializedAggView(spark, str(tmp_path / "v"), dims=("lang",))
    v1 = view.refresh(t)
    v2 = view.refresh(t)  # table unchanged -> no new view version
    assert v1 == v2 == view.current_version()
    _assert_view_equals_recompute(view, t, ("lang",), ())


def test_ivm_deletes_remove_zero_groups(spark, tmp_path):
    """Deleting every row of a group drops the group from the view."""
    rows = [
        ("u1", "aa", 1, None),
        ("u2", "aa", 2, None),
        ("u3", "bb", 3, None),
    ]
    later = [
        ("u1", "aa", 10, 1),  # tombstone u1
        ("u2", "aa", 11, 1),  # tombstone u2 -> group 'aa' now empty
    ]

    def mk(data):
        return spark.createDataFrame(
            [
                (
                    u,
                    "t",
                    lang,
                    lsn,
                    None,
                    ("2024-01-01 00:00:00" if dele else None),
                    f"id{u}{lsn}",
                    "2024-01-01 00:00:00",
                )
                for (u, lang, lsn, dele) in data
            ],
            "url string, text string, lang string, _ab_cdc_lsn long, "
            "_ab_cdc_updated_at timestamp, _ab_cdc_deleted_at string, "
            "_airbyte_ab_id string, _airbyte_emitted_at string",
        ).select(
            "url", "text", "lang", "_ab_cdc_lsn",
            F.col("_ab_cdc_updated_at"),
            F.col("_ab_cdc_deleted_at").cast("timestamp"),
            "_airbyte_ab_id",
            F.col("_airbyte_emitted_at").cast("timestamp"),
        )

    cfg = SyncConfig(stream="pages")
    t = LakeTable(spark, str(tmp_path / "t"))
    run_sync(spark, mk(rows), t, cfg, extract_missing_text=False,
             compact_threshold=None)
    view = MaterializedAggView(spark, str(tmp_path / "v"), dims=("lang",))
    view.refresh(t)
    assert {r.lang: r.n_rows for r in view.read().collect()} == {
        "aa": 2, "bb": 1,
    }
    run_sync(spark, mk(rows + later), t, cfg, extract_missing_text=False,
             compact_threshold=None)
    view.refresh(t)
    assert {r.lang: r.n_rows for r in view.read().collect()} == {"bb": 1}
    _assert_view_equals_recompute(view, t, ("lang",), ())


def test_ivm_null_dim_group(spark, tmp_path):
    """NULL is a valid group: maintained via the null-safe merge join."""
    ev = gen_change_events(spark, 800, n_urls=60).select(*COLS).withColumn(
        "lang", F.when(F.col("_ab_cdc_lsn") % 3 == 0, F.col("lang"))
    )
    hi = int(ev.agg(F.max("_ab_cdc_lsn")).collect()[0][0])
    cfg = SyncConfig(stream="pages")
    t = LakeTable(spark, str(tmp_path / "t"))
    view = MaterializedAggView(spark, str(tmp_path / "v"), dims=("lang",))
    for cut in [hi // 2, hi]:
        run_sync(spark, ev.filter(F.col("_ab_cdc_lsn") <= cut), t, cfg,
                 extract_missing_text=False, compact_threshold=None)
        view.refresh(t)
        _assert_view_equals_recompute(view, t, ("lang",), ())
    assert view.read().filter(F.col("lang").isNull()).count() == 1


def test_ivm_schema_evolution_adds_group(spark, tmp_path):
    """A dim column that appears mid-history: old rows null-backfill
    (conform), so refresh after the widening stays exact."""
    ev = gen_change_events(spark, 1000, n_urls=80).select(*COLS)
    hi = int(ev.agg(F.max("_ab_cdc_lsn")).collect()[0][0])
    cfg = SyncConfig(stream="pages")
    t = LakeTable(spark, str(tmp_path / "t"))
    run_sync(spark, ev.filter(F.col("_ab_cdc_lsn") <= hi // 2).drop("lang"),
             t, cfg, extract_missing_text=False, compact_threshold=None)
    # view over a dim the table does not have yet would fail -> create
    # after the column exists; here we evolve first, then refresh twice.
    run_sync(spark, ev.filter(F.col("_ab_cdc_lsn") <= 3 * hi // 4), t, cfg,
             extract_missing_text=False, compact_threshold=None)
    view = MaterializedAggView(spark, str(tmp_path / "v"), dims=("lang",))
    view.refresh(t)
    run_sync(spark, ev, t, cfg, extract_missing_text=False,
             compact_threshold=None)
    view.refresh(t)
    _assert_view_equals_recompute(view, t, ("lang",), ())


def test_ivm_wired_into_run_sync(spark, tmp_path):
    """run_sync(refresh_views=[...]) keeps marts fresh per SYNC: after
    each bounded sync the view equals the recompute without any manual
    refresh call."""
    ev = gen_change_events(spark, 1200, n_urls=80).select(*COLS)
    hi = int(ev.agg(F.max("_ab_cdc_lsn")).collect()[0][0])
    cfg = SyncConfig(stream="pages")
    t = LakeTable(spark, str(tmp_path / "t"))
    view = MaterializedAggView(spark, str(tmp_path / "v"), dims=("lang",))
    for cut in [hi // 2, hi]:
        run_sync(spark, ev.filter(F.col("_ab_cdc_lsn") <= cut), t, cfg,
                 extract_missing_text=False, compact_threshold=None,
                 refresh_views=[view])
        assert view.base_version() == t.current_version()
        _assert_view_equals_recompute(view, t, ("lang",), ())
    # an idle sync (nothing to apply) leaves the view version alone
    v = view.current_version()
    run_sync(spark, ev, t, cfg, extract_missing_text=False,
             compact_threshold=None, refresh_views=[view])
    assert view.current_version() == v


def test_ivm_wired_into_stream_sync(spark, tmp_path):
    """stream_sync(refresh_views=[...]): the mart is fresh after the
    availableNow drain, and a restart over the same checkpoint
    (replayed batches) leaves it exact and idempotent."""
    import os
    import time

    from airbyte_integrations_spark.streaming.stream_sync import stream_sync

    ev = gen_change_events(spark, 600, n_urls=40).select(*COLS)
    log = str(tmp_path / "log")
    ev.coalesce(2).write.parquet(log)
    for n in os.listdir(log):
        if n.endswith(".parquet"):
            os.utime(os.path.join(log, n), (time.time() - 30,) * 2)
    t = LakeTable(spark, str(tmp_path / "t"))
    cfg = SyncConfig(stream="pages", n_buckets=4)
    view = MaterializedAggView(spark, str(tmp_path / "v"), dims=("lang",))
    q = stream_sync(spark, log, t, cfg, str(tmp_path / "ck"),
                    refresh_views=[view])
    q.awaitTermination()
    _assert_view_equals_recompute(view, t, ("lang",), ())
    v_view, v_tbl = view.current_version(), t.current_version()
    # restart over the same checkpoint: batches replay as no-ops and
    # the view stays exact with no new version
    q2 = stream_sync(spark, log, t, cfg, str(tmp_path / "ck"),
                     refresh_views=[view])
    q2.awaitTermination()
    assert (view.current_version(), t.current_version()) == (v_view, v_tbl)
    _assert_view_equals_recompute(view, t, ("lang",), ())
