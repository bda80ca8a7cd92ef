"""DBLog-style chunked incremental snapshot: watermark-window dedup,
convergence to the monolithic snapshot_then_tail replay under
interleaved updates/deletes, chunk-granular crash resume."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from airbyte_integrations_spark.config import SyncConfig
from airbyte_integrations_spark.gen import gen_change_events, gen_pages
from airbyte_integrations_spark.lakehouse.table import LakeTable
from airbyte_integrations_spark.operators.dedup import winner_window
from airbyte_integrations_spark.sources.cdc import LogTailSource
from airbyte_integrations_spark.sources.incremental_snapshot import (
    chunk_pred,
    incremental_snapshot_sync,
    window_dedup,
)
from airbyte_integrations_spark.streaming.microbatch import run_sync

PAYLOAD = ["url", "html", "text", "lang"]
N_PAGES, N_EVENTS = 400, 1600


@pytest.fixture(scope="module")
def world(spark, tmp_path_factory):
    pages = gen_pages(spark, N_PAGES, seed="isnap").cache()
    events = gen_change_events(
        spark, N_EVENTS, n_urls=N_PAGES, seed="isnapcdc", delete_pct=12
    ).cache()
    log_dir = str(tmp_path_factory.mktemp("isnap") / "log")
    events.write.parquet(log_dir)
    return pages, LogTailSource.from_parquet(spark, log_dir)


def make_db(spark, pages, log, table, advance=150):
    """Simulated live source: a SELECT observes the state at the applied
    watermark plus `advance` more events that land during the read —
    the concurrent-writer scenario the watermark window exists for."""

    def live_payload(pos: int):
        src = LogTailSource(
            log.events.filter(F.col("_ab_cdc_lsn") <= F.lit(pos))
        )
        full = src.snapshot_then_tail(pages)
        return winner_window(full, drop_tombstones=True).select(*PAYLOAD)

    def select_chunk(pred):
        lw = table.watermark("pages") or 0
        seen = min(lw + advance, N_EVENTS)
        return live_payload(seen).filter(pred), seen

    return select_chunk


def reference_final(spark, pages, log):
    full = log.snapshot_then_tail(pages)
    return winner_window(full, drop_tombstones=True).select(*PAYLOAD)


def payload_equal(a, b) -> bool:
    return (
        a.count() == b.count()
        and a.exceptAll(b).count() == 0
        and b.exceptAll(a).count() == 0
    )


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_converges_to_monolithic_replay(spark, tmp_path, mode, world):
    pages, log = world
    table = LakeTable(spark, str(tmp_path / f"lake_{mode}"))
    cfg = SyncConfig(stream="pages", n_buckets=4, write_mode=mode)
    committed = incremental_snapshot_sync(
        spark,
        make_db(spark, pages, log, table),
        log,
        table,
        cfg,
        n_chunks=5,
        wal_step_events=200,
    )
    assert committed == [f"chunk:{i}" for i in range(5)]
    got = table.read_live().select(*PAYLOAD)
    assert payload_equal(got, reference_final(spark, pages, log))
    # the tail fully drained
    assert table.watermark("pages") == N_EVENTS


def test_no_resurrection_of_mid_snapshot_deletes(spark, tmp_path, world):
    """A key deleted while its chunk is in flight must stay deleted:
    either the select no longer sees it, or the watermark window drops
    the stale image before it is ever merged."""
    pages, log = world
    table = LakeTable(spark, str(tmp_path / "lake_del"))
    cfg = SyncConfig(stream="pages", n_buckets=4)
    incremental_snapshot_sync(
        spark,
        make_db(spark, pages, log, table, advance=400),
        log,
        table,
        cfg,
        n_chunks=3,
        wal_step_events=150,
    )
    final = table.read_live()
    deleted_urls = (
        winner_window(log.snapshot_then_tail(pages))
        .filter(F.col("_ab_cdc_deleted_at").isNotNull())
        .select("url")
    )
    assert deleted_urls.count() > 0  # the scenario is actually exercised
    assert final.join(deleted_urls, "url").count() == 0


def test_window_dedup_drops_exactly_the_touched_keys(spark, world):
    pages, log = world
    rows = pages.select(*PAYLOAD)
    lw, hw = 100, 300
    touched = (
        log.events.filter(
            (F.col("_ab_cdc_lsn") > lw) & (F.col("_ab_cdc_lsn") <= hw)
        )
        .select("url")
        .distinct()
    )
    kept = window_dedup(rows, log, lw, hw, "url")
    assert kept.join(touched, "url").count() == 0
    assert kept.count() == rows.join(touched, "url", "left_anti").count()
    # empty window is the static-log fast path: identity
    assert window_dedup(rows, log, 100, 100, "url") is rows


def test_chunk_pred_partitions_completely(spark, world):
    pages, _ = world
    n = pages.count()
    covered = sum(
        pages.filter(chunk_pred("url", i, 4)).count() for i in range(4)
    )
    assert covered == n


def test_crash_after_k_chunks_resumes_exactly(spark, tmp_path, world):
    pages, log = world
    table = LakeTable(spark, str(tmp_path / "lake_crash"))
    cfg = SyncConfig(stream="pages", n_buckets=4)
    db = make_db(spark, pages, log, table)
    first = incremental_snapshot_sync(
        spark, db, log, table, cfg, n_chunks=5, wal_step_events=200,
        max_chunks=2, drain=False,
    )
    assert first == ["chunk:0", "chunk:1"]
    mid_versions = table.current_version()
    second = incremental_snapshot_sync(
        spark, db, log, table, cfg, n_chunks=5, wal_step_events=200
    )
    # only the remaining chunks run; committed ones no-op
    assert second == ["chunk:2", "chunk:3", "chunk:4"]
    assert table.current_version() > mid_versions
    got = table.read_live().select(*PAYLOAD)
    assert payload_equal(got, reference_final(spark, pages, log))
    # a third run is a full no-op for chunks
    assert incremental_snapshot_sync(
        spark, db, log, table, cfg, n_chunks=5, wal_step_events=200
    ) == []
