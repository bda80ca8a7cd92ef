"""Regressions for the core-review hardening batch: unreadable-widening
rewrites, mixed-lifecycle watermarks, honored SyncConfig layout, sparse
LSN epoch planning, and missing-PK batches."""

import pytest
from pyspark.sql import functions as F

from airbyte_integrations_spark.config import SyncConfig
from airbyte_integrations_spark.gen import gen_change_events
from airbyte_integrations_spark.lakehouse.merge import merge_into
from airbyte_integrations_spark.lakehouse.table import LakeTable
from airbyte_integrations_spark.streaming.microbatch import plan_epochs, run_sync

COLS = [
    "url", "warc_ts", "text", "lang",
    "_ab_cdc_lsn", "_ab_cdc_updated_at", "_ab_cdc_deleted_at",
    "_airbyte_ab_id", "_airbyte_emitted_at",
]


def test_incompatible_widening_forces_full_rewrite(spark, tmp_path):
    """A widening the parquet reader can't serve over old files
    (long -> string here) must rewrite EVERY bucket in the same commit;
    the committed table stays fully readable, including buckets the
    batch never touched."""
    ev = gen_change_events(spark, 400, n_urls=40).select(*COLS).withColumn(
        "value_m", (F.col("_ab_cdc_lsn") % 97).cast("long")
    )
    table = LakeTable(spark, str(tmp_path / "t"))
    merge_into(table, ev.filter("_ab_cdc_lsn <= 300"), stream="s", epoch=0,
               n_buckets=8)
    assert dict(table.schema["value_m"].jsonValue().items())["type"] == "long"

    # second epoch flips value_m to string AND touches only a few keys
    drift = (
        ev.filter("_ab_cdc_lsn > 300")
        .withColumn("value_m", F.concat(F.lit("v"), F.col("value_m").cast("string")))
    )
    merge_into(table, drift, stream="s", epoch=1, n_buckets=8)
    assert dict(table.schema["value_m"].jsonValue().items())["type"] == "string"

    # the whole table — including buckets only the FIRST epoch wrote —
    # must scan under the widened schema
    rows = table.read_live().select("url", "value_m").collect()
    assert len(rows) == table.read_live().count() > 0
    assert all(r["value_m"] is None or isinstance(r["value_m"], str) for r in rows)


def test_mor_incompatible_widening_routes_through_cow(spark, tmp_path):
    ev = gen_change_events(spark, 300, n_urls=30).select(*COLS).withColumn(
        "k", F.lit(1).cast("long")
    )
    table = LakeTable(spark, str(tmp_path / "t"))
    merge_into(table, ev.filter("_ab_cdc_lsn <= 200"), stream="s", epoch=0,
               mode="mor", n_buckets=4)
    drift = ev.filter("_ab_cdc_lsn > 200").withColumn("k", F.lit("x"))
    # mor mode + unreadable widening: epoch applies via the COW rewrite
    merge_into(table, drift, stream="s", epoch=1, mode="mor", n_buckets=4)
    assert table.read_live().count() > 0
    assert dict(table.schema["k"].jsonValue().items())["type"] == "string"
    # deltas were folded by the rewrite
    assert not table.manifest().get("deltas")


def test_mixed_lifecycle_watermark_survives_stream_epochs(spark, tmp_path):
    """stream_sync commits epochs without to_lsn; run_sync must still
    resume from the lsn watermark instead of raising KeyError."""
    import os
    import time

    from airbyte_integrations_spark.streaming.stream_sync import stream_sync

    ev = gen_change_events(spark, 400, n_urls=20).select(*COLS)
    table = LakeTable(spark, str(tmp_path / "t"))
    cfg = SyncConfig(stream="pages", n_buckets=4)
    run_sync(spark, ev.filter("_ab_cdc_lsn <= 200"), table, cfg,
             max_events_per_epoch=200, extract_missing_text=False)
    assert table.watermark("pages") == 200

    log = str(tmp_path / "log")
    ev.filter("_ab_cdc_lsn > 200 AND _ab_cdc_lsn <= 300").coalesce(1).write.parquet(log)
    for n in os.listdir(log):
        if n.endswith(".parquet"):
            os.utime(os.path.join(log, n), (time.time() - 30,) * 2)
    q = stream_sync(spark, log, table, cfg, str(tmp_path / "ck"))
    q.awaitTermination()

    # lsn watermark unchanged by batch-id epochs; resume does not raise
    assert table.watermark("pages") == 200
    eps = run_sync(spark, ev, table, cfg, max_events_per_epoch=200,
                   extract_missing_text=False)
    assert eps and table.watermark("pages") == 400


def test_sync_config_key_and_buckets_honored(spark, tmp_path):
    ev = (
        gen_change_events(spark, 200, n_urls=10)
        .select(*COLS)
        .withColumn("page_id", F.concat(F.lit("k"), F.col("url")))
        .drop("url")
    )
    table = LakeTable(spark, str(tmp_path / "t"))
    cfg = SyncConfig(stream="pages", primary_key=("page_id",), n_buckets=7)
    run_sync(spark, ev, table, cfg, max_events_per_epoch=100,
             extract_missing_text=False)
    assert table.key_cols() == ("page_id",)
    assert table.n_buckets == 7
    assert table.read_live().select("page_id").distinct().count() == 10


def test_missing_pk_batch_raises_not_collapses(spark, tmp_path):
    ev = gen_change_events(spark, 100, n_urls=10).select(*COLS)
    table = LakeTable(spark, str(tmp_path / "t"))
    merge_into(table, ev, stream="s", epoch=0, n_buckets=4)
    with pytest.raises(ValueError, match="primary-key"):
        merge_into(table, ev.drop("url"), stream="s", epoch=1)
    # creation path validates too
    t2 = LakeTable(spark, str(tmp_path / "t2"))
    with pytest.raises(ValueError, match="primary-key"):
        merge_into(t2, ev.drop("url"), stream="s", epoch=0)


def test_plan_epochs_sparse_lsn_gap_stays_bounded(spark):
    """A huge WAL gap above the watermark must not explode into
    millions of empty epochs: epoch count tracks the EVENT count."""
    dense = spark.range(1, 1001).select(F.col("id").alias("_ab_cdc_lsn"))
    sparse = dense.withColumn(
        "_ab_cdc_lsn", F.col("_ab_cdc_lsn") + F.lit(10**12)
    )
    events = dense.unionByName(sparse)
    eps = plan_epochs(events, from_lsn=1000, max_events_per_epoch=500)
    # 1000 unread events (the sparse half) -> ~2 epochs, NOT ~2*10^9
    assert 1 <= len(eps) <= 4
    assert eps[-1].to_lsn == 10**12 + 1000
    # dense planning identical to the fixed-width scheme
    eps_dense = plan_epochs(dense, from_lsn=None, max_events_per_epoch=500)
    assert [(e.from_lsn, e.to_lsn) for e in eps_dense] == [(0, 500), (500, 1000)]
