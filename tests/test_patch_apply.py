"""Partial-image apply: mask-aware folds (explicit-null $unset writes
win), the patch-overlay MERGE (lakehouse/patch_apply.py), and its
epoch-composition law — split at any boundary == whole-log fold."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airbyte_integrations_spark.config import SyncConfig
from airbyte_integrations_spark.gen import gen_change_events
from airbyte_integrations_spark.lakehouse.patch_apply import merge_patches_into
from airbyte_integrations_spark.lakehouse.table import LakeTable
from airbyte_integrations_spark.operators.patch import (
    coalesce_patches,
    coalesce_patches_window,
)
from airbyte_integrations_spark.streaming.microbatch import run_sync
from tests.util import assert_frames_equal


def _masked_events(spark, n=3000, seed="maskfuzz"):
    """Sparse writes PLUS explicit-null writes: wa/wb mark 'this event
    wrote the column'; on ~1 in 7 written b's the write is an explicit
    null ($unset) — the case a value-is-not-null fold gets wrong."""
    ce = gen_change_events(spark, n, n_urls=250, seed=seed, delete_pct=12)
    lsn = F.col("_ab_cdc_lsn")
    live = F.col("_ab_cdc_deleted_at").isNull()
    wa = live & (lsn % 3 != 0)
    wb = live & (lsn % 2 != 0)
    unset_b = wb & (lsn % 7 == 0)
    return (
        ce.withColumn("wa", wa)
        .withColumn("wb", wb)
        .withColumn("a", F.when(wa, F.col("lang")))
        .withColumn("b", F.when(wb & ~unset_b, F.length("text").cast("long")))
        .drop("html", "text", "lang", "warc_ts")
    )


def _proj(df):
    return df.select("url", "_ab_cdc_lsn", "a", "b").toPandas()


def test_masked_agg_equals_masked_window(spark):
    ev = _masked_events(spark)
    agg = coalesce_patches(ev, patch_cols=("a", "b"), mask_cols=("wa", "wb"))
    win = coalesce_patches_window(
        ev, patch_cols=("a", "b"), mask_cols=("wa", "wb")
    )
    assert_frames_equal(_proj(agg), _proj(win))


def test_explicit_null_write_wins(spark):
    ev = _masked_events(spark)
    masked = coalesce_patches(ev, patch_cols=("a", "b"), mask_cols=("wa", "wb"))
    naive = coalesce_patches(ev, patch_cols=("a", "b"))
    # at least one key's final b is null under masks (a later $unset)
    # while the naive non-null fold resurrects an older value
    m = {r["url"]: r["b"] for r in masked.collect()}
    n = {r["url"]: r["b"] for r in naive.collect()}
    resurrected = [u for u in m if m[u] is None and n[u] is not None]
    assert resurrected, "fixture produced no $unset-after-set key"


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_epoch_composition_matches_whole_log_fold(spark, tmp_path, mode):
    ev = _masked_events(spark, n=2500, seed="patchapply")
    cfg = SyncConfig(
        stream="docs", primary_key=("url",), n_buckets=4, write_mode=mode
    )
    table = LakeTable(spark, str(tmp_path / mode))
    run_sync(
        spark, ev, table, cfg,
        max_events_per_epoch=300, extract_missing_text=False,
        compact_threshold=None,
        patch_cols=("a", "b"), patch_mask_cols=("wa", "wb"),
    )
    got = table.read_live().select("url", "_ab_cdc_lsn", "a", "b").toPandas()
    want = _proj(
        coalesce_patches(ev, patch_cols=("a", "b"), mask_cols=("wa", "wb"))
    )
    assert_frames_equal(got, want)
    # idempotent re-run: every epoch already committed, version pinned
    v = table.current_version()
    run_sync(
        spark, ev, table, cfg,
        max_events_per_epoch=300, extract_missing_text=False,
        compact_threshold=None,
        patch_cols=("a", "b"), patch_mask_cols=("wa", "wb"),
    )
    assert table.current_version() == v


def test_uncovered_payload_column_rejected(spark, tmp_path):
    """Patching a table whose payload has columns outside patch_cols
    would null them on the COW rewrite — must reject loudly."""
    ev = _masked_events(spark, n=200, seed="guard")
    table = LakeTable(spark, str(tmp_path / "g"))
    merge_patches_into(
        table, ev, ("a", "b"), stream="docs", epoch=0,
        mask_cols=("wa", "wb"), key=("url",), n_buckets=2,
    )
    with pytest.raises(ValueError, match="not in patch_cols"):
        merge_patches_into(
            table, ev, ("a",), stream="docs", epoch=1, mask_cols=("wa",)
        )


def test_cross_epoch_delete_reset(spark, tmp_path):
    """A value written in epoch 1 must NOT leak past a delete applied
    in epoch 2, even when the key is re-created in epoch 3."""
    import datetime as dt

    TS = dt.datetime(2021, 1, 1)
    rows = [
        # (url, lsn, upd, emit, ab, del, a, b, wa, wb)
        ("k", 1, TS, TS, "i1", None, "a1", 10, True, True),
        ("k", 2, TS, TS, "i2", TS, None, None, False, False),
        ("k", 3, TS, TS, "i3", None, None, 99, False, True),
    ]
    schema = (
        "url string, _ab_cdc_lsn long, _ab_cdc_updated_at timestamp, "
        "_airbyte_emitted_at timestamp, _airbyte_ab_id string, "
        "_ab_cdc_deleted_at timestamp, a string, b long, "
        "wa boolean, wb boolean"
    )
    ev = spark.createDataFrame(rows, schema)
    table = LakeTable(spark, str(tmp_path / "reset"))
    for i, (lo, hi) in enumerate([(0, 1), (1, 2), (2, 3)]):
        merge_patches_into(
            table,
            ev.filter((F.col("_ab_cdc_lsn") > lo) & (F.col("_ab_cdc_lsn") <= hi)),
            ("a", "b"),
            stream="docs", epoch=i, mask_cols=("wa", "wb"),
            key=("url",), n_buckets=2,
        )
    got = table.read_live().select("url", "a", "b").collect()
    assert [(r["url"], r["a"], r["b"]) for r in got] == [("k", None, 99)]
    # winner-is-tombstone at the end deletes the row entirely
    ev2 = spark.createDataFrame([("k", 4, TS, TS, "i4", TS, None, None, False, False)], schema)
    merge_patches_into(
        table, ev2, ("a", "b"), stream="docs", epoch=3,
        mask_cols=("wa", "wb"),
    )
    assert table.read_live().count() == 0


def test_additive_patch_column_widens_schema(spark, tmp_path):
    """A patch column the table does not know yet is additive schema
    evolution: current rows read null, merge widens the table, and the
    new field folds per-column like any other (SURVEY §2.9)."""
    import datetime as dt

    TS = dt.datetime(2021, 1, 1)
    base_schema = (
        "url string, _ab_cdc_lsn long, _ab_cdc_updated_at timestamp, "
        "_airbyte_emitted_at timestamp, _airbyte_ab_id string, "
        "_ab_cdc_deleted_at timestamp, a string, wa boolean"
    )
    table = LakeTable(spark, str(tmp_path / "w"))
    merge_patches_into(
        table,
        spark.createDataFrame(
            [("k1", 1, TS, TS, "i1", None, "a1", True),
             ("k2", 2, TS, TS, "i2", None, "a2", True)],
            base_schema,
        ),
        ("a",), stream="docs", epoch=0, mask_cols=("wa",),
        key=("url",), n_buckets=2,
    )
    # epoch 1 declares a NEW column b: k1 writes it, k2 untouched
    wide = spark.createDataFrame(
        [("k1", 3, TS, TS, "i3", None, None, False, 7, True)],
        base_schema + ", b long, wb boolean",
    )
    merge_patches_into(
        table, wide, ("a", "b"), stream="docs", epoch=1,
        mask_cols=("wa", "wb"),
    )
    rows = {r["url"]: r for r in table.read_live().collect()}
    assert set(rows) == {"k1", "k2"}
    assert rows["k1"]["a"] == "a1" and rows["k1"]["b"] == 7
    assert rows["k2"]["a"] == "a2" and rows["k2"]["b"] is None
