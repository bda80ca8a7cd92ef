"""Sort-order clustering + zone-map range reads: compact(sort_by=...)
is Iceberg's rewrite-with-sort-order; read_range prunes files on any
stats column and must equal the unpruned filter exactly."""

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


def _mk_table(spark, tmp_path, mode="cow", n=4000, n_urls=300,
              events_per_epoch=1_000_000):
    ev = gen_change_events(spark, n, n_urls=n_urls).select(*COLS)
    cfg = SyncConfig(stream="pages", write_mode=mode, n_buckets=4)
    t = LakeTable(spark, str(tmp_path / f"t_{mode}"))
    run_sync(spark, ev, t, cfg, extract_missing_text=False,
             compact_threshold=None, max_events_per_epoch=events_per_epoch)
    return t


def test_sorted_compact_prunes_and_matches_unpruned(spark, tmp_path):
    t = _mk_table(spark, tmp_path, n=4000, n_urls=2000)
    t.compact(sort_by="_ab_cdc_lsn", target_file_rows=64)
    assert t.props().get("sort_order") == ["_ab_cdc_lsn"]
    lo, hi = 1000, 1400
    kept, total = t.range_prune_counts("_ab_cdc_lsn", lo, hi)
    assert total > 16, "need multiple files per bucket for the test to bite"
    assert kept < total, "clustered range read should skip files"
    got = {tuple(r) for r in t.read_range("_ab_cdc_lsn", lo, hi)
           .select("url", "_ab_cdc_lsn").collect()}
    want = {tuple(r) for r in t.read_live()
            .filter((F.col("_ab_cdc_lsn") >= lo) & (F.col("_ab_cdc_lsn") <= hi))
            .select("url", "_ab_cdc_lsn").collect()}
    assert got == want and got


def test_read_range_half_open_bounds(spark, tmp_path):
    t = _mk_table(spark, tmp_path, n=1500, n_urls=100)
    t.compact(sort_by="_ab_cdc_lsn", target_file_rows=40)
    live = t.read_live()
    for lo, hi in [(None, 500), (900, None), (None, None)]:
        got = t.read_range("_ab_cdc_lsn", lo, hi).count()
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col("_ab_cdc_lsn") >= lo)
        if hi is not None:
            cond = cond & (F.col("_ab_cdc_lsn") <= hi)
        assert got == live.filter(cond).count()


def test_read_range_rejects_uncompacted_mor(spark, tmp_path):
    """Deltas can hold older versions of a key than the base —
    read_range must refuse rather than resurrect stale images."""
    t = _mk_table(spark, tmp_path, mode="mor", events_per_epoch=1000)
    assert any(ps for ps in t.manifest().get("deltas", {}).values())
    with pytest.raises(ValueError, match="compacted"):
        t.read_range("_ab_cdc_lsn", 0, 10)
    # after compaction (deltas folded) the same read works and is exact
    t.compact(sort_by="_ab_cdc_lsn", target_file_rows=50)
    got = t.read_range("_ab_cdc_lsn", 500, 900).count()
    want = t.read_live().filter(
        (F.col("_ab_cdc_lsn") >= 500) & (F.col("_ab_cdc_lsn") <= 900)
    ).count()
    assert got == want > 0


def test_sorted_compact_preserves_live_state(spark, tmp_path):
    """Re-clustering is a maintenance op: the live answer must not
    move, and later MERGEs keep working on the re-clustered table."""
    ev = gen_change_events(spark, 3000, n_urls=200).select(*COLS)
    hi = int(ev.agg(F.max("_ab_cdc_lsn")).collect()[0][0])
    cfg = SyncConfig(stream="pages", n_buckets=4)
    t = LakeTable(spark, str(tmp_path / "t"))
    run_sync(spark, ev.filter(F.col("_ab_cdc_lsn") <= hi // 2), t, cfg,
             extract_missing_text=False, compact_threshold=None)
    before = {tuple(r) for r in t.read_live()
              .select("url", "_ab_cdc_lsn").collect()}
    t.compact(sort_by="_ab_cdc_lsn", target_file_rows=64)
    after = {tuple(r) for r in t.read_live()
             .select("url", "_ab_cdc_lsn").collect()}
    assert before == after
    # sync the rest onto the clustered table; winner replay still exact
    run_sync(spark, ev, t, cfg, extract_missing_text=False,
             compact_threshold=None)
    from airbyte_integrations_spark.operators.dedup import winner_agg

    want = {
        tuple(r)
        for r in winner_agg(ev, ("url",), "_ab_cdc_lsn",
                            ("_ab_cdc_updated_at", "_airbyte_emitted_at"),
                            "_airbyte_ab_id", drop_tombstones=True)
        .select("url", "_ab_cdc_lsn").collect()
    }
    got = {tuple(r) for r in t.read_live()
           .select("url", "_ab_cdc_lsn").collect()}
    assert got == want


def test_sort_by_unknown_column_rejected(spark, tmp_path):
    t = _mk_table(spark, tmp_path, n=400, n_urls=30)
    with pytest.raises(ValueError, match="not in schema"):
        t.compact(sort_by="nope")
