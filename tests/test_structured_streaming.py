"""Structured Streaming path: stream replay == batch replay; new files
picked up by a second run; checkpoint redelivery is a no-op."""

import os

from airbyte_integrations_spark.config import SyncConfig
from airbyte_integrations_spark.gen import gen_change_events
from airbyte_integrations_spark.lakehouse.table import LakeTable
from airbyte_integrations_spark.streaming.microbatch import run_sync
from airbyte_integrations_spark.streaming.structured import start_stream
from tests.util import assert_frames_equal

COLS = [
    "url", "text", "lang",
    "_ab_cdc_lsn", "_ab_cdc_updated_at", "_ab_cdc_deleted_at",
    "_airbyte_ab_id", "_airbyte_emitted_at",
]


def test_stream_matches_batch_replay(spark, tmp_path):
    ev = gen_change_events(spark, 1200, n_urls=60).select(*COLS)
    log = str(tmp_path / "log")
    # three files arriving over time
    ev.filter("_ab_cdc_lsn <= 400").write.mode("append").parquet(log)
    ev.filter("_ab_cdc_lsn > 400 AND _ab_cdc_lsn <= 800").write.mode("append").parquet(log)

    cfg = SyncConfig(stream="pages")
    table = LakeTable(spark, str(tmp_path / "t"))
    schema = spark.read.parquet(log).schema
    start_stream(
        spark, log, schema, table, cfg, str(tmp_path / "ckpt"),
        extract_missing_text=False,
    )
    assert table.read().count() > 0

    # more events arrive; a second availableNow run picks up only them
    ev.filter("_ab_cdc_lsn > 800").write.mode("append").parquet(log)
    start_stream(
        spark, log, schema, table, cfg, str(tmp_path / "ckpt"),
        extract_missing_text=False,
    )

    batch_table = LakeTable(spark, str(tmp_path / "batch"))
    run_sync(spark, ev, batch_table, cfg, max_events_per_epoch=500,
             extract_missing_text=False)
    assert_frames_equal(table.read().toPandas(), batch_table.read().toPandas())


def test_stream_restart_from_checkpoint_is_noop(spark, tmp_path):
    ev = gen_change_events(spark, 500, n_urls=40).select(*COLS)
    log = str(tmp_path / "log")
    ev.write.mode("append").parquet(log)
    cfg = SyncConfig(stream="pages")
    table = LakeTable(spark, str(tmp_path / "t"))
    schema = spark.read.parquet(log).schema
    start_stream(spark, log, schema, table, cfg, str(tmp_path / "ckpt"),
                 extract_missing_text=False)
    v = table.current_version()
    before = table.read().toPandas()
    # restart with the same checkpoint: no new files => no new state
    start_stream(spark, log, schema, table, cfg, str(tmp_path / "ckpt"),
                 extract_missing_text=False)
    assert table.current_version() == v
    assert_frames_equal(table.read().toPandas(), before)
