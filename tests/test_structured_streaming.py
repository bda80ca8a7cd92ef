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


def test_hopping_rates_stream_matches_batch(spark, tmp_path):
    """The SAME hopping_rates definition runs bounded and unbounded:
    a complete-mode memory sink over availableNow must equal the batch
    result exactly (window membership, counts, exact cents sums)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from airbyte_integrations_spark.operators.sessionize import hopping_rates

    rows = [
        (dt.datetime(2024, 1, 1, 0, 0, 7, 179575), "view", 1.234),
        (dt.datetime(2024, 1, 1, 0, 14, 59, 999999), "view", 2.5),
        (dt.datetime(2024, 1, 1, 0, 15, 0), "click", 0.01),
        (dt.datetime(2024, 1, 1, 1, 2, 3), "view", 9.99),
        (dt.datetime(2024, 1, 1, 3, 30, 0), "click", 5.0),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    src = str(tmp_path / "ev")
    df.repartition(2).write.parquet(src)

    batch = hopping_rates(
        spark.read.parquet(src), value_col="value"
    ).toPandas()

    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        hopping_rates(stream, value_col="value", watermark="2 hours")
        .writeStream.format("memory")
        .queryName("hop_rates")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM hop_rates").toPandas()

    key = ["window_start", "window_end", "event_type"]
    a = batch.sort_values(key).reset_index(drop=True)
    b = got.sort_values(key).reset_index(drop=True)
    assert a[key + ["n_events", "value_cents"]].equals(
        b[key + ["n_events", "value_cents"]]
    )
    # every event lands in exactly size/slide = 4 windows
    assert int(a["n_events"].sum()) == 4 * len(rows)


def test_interval_join_stream_matches_batch(spark, tmp_path):
    """Watermarked stream-stream interval join == the batch join with
    the same predicate (inner arm; all data well inside the watermark)."""
    import datetime as dt

    from airbyte_integrations_spark.streaming.join_stream import interval_join

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ts(mins):
        return t0 + dt.timedelta(minutes=mins)

    views = [(1, ts(0), "v0"), (1, ts(90), "v1"), (2, ts(10), "v2")]
    clicks = [(1, ts(30), "c0"), (1, ts(95), "c1"), (2, ts(40), "c2"), (3, ts(5), "c3")]
    vdf = spark.createDataFrame(views, "user_id long, vts timestamp, view_id string")
    cdf = spark.createDataFrame(clicks, "user_id long, cts timestamp, click_id string")
    vsrc, csrc = str(tmp_path / "v"), str(tmp_path / "c")
    vdf.write.parquet(vsrc)
    cdf.write.parquet(csrc)

    batch = interval_join(
        spark.read.parquet(vsrc), spark.read.parquet(csrc),
        key="user_id", left_ts="vts", right_ts="cts", upper="1 hour",
    ).toPandas()
    # sanity on the fixture: v0 matches c0 only; v1 matches c1; v2 matches c2
    assert len(batch) == 3

    q = (
        interval_join(
            spark.readStream.schema(vdf.schema).parquet(vsrc),
            spark.readStream.schema(cdf.schema).parquet(csrc),
            key="user_id", left_ts="vts", right_ts="cts", upper="1 hour",
        )
        .writeStream.format("memory")
        .queryName("ij")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM ij").toPandas()

    key = ["user_id", "view_id", "click_id"]
    a = batch.sort_values(key).reset_index(drop=True)
    b = got.sort_values(key).reset_index(drop=True)
    assert a[key + ["vts", "cts"]].equals(b[key + ["vts", "cts"]])


def test_interval_join_rejects_unbounded(spark):
    import pytest as _pytest

    from airbyte_integrations_spark.streaming.join_stream import interval_join

    with _pytest.raises(ValueError):
        interval_join(None, None, key="k", left_ts="a", right_ts="b", how="fullOuter")


def test_interval_join_left_outer_emits_unmatched(spark, tmp_path):
    """leftOuter arm: unmatched left rows appear with NULL right side
    (batch mode; the streaming arm shares the identical plan modulo
    watermark-delayed emission)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from airbyte_integrations_spark.streaming.join_stream import interval_join

    t0 = dt.datetime(2024, 1, 1)
    vdf = spark.createDataFrame(
        [(1, t0, "v0"), (9, t0, "v_lonely")],
        "user_id long, vts timestamp, view_id string",
    )
    cdf = spark.createDataFrame(
        [(1, t0 + dt.timedelta(minutes=5), "c0")],
        "user_id long, cts timestamp, click_id string",
    )
    out = interval_join(
        vdf, cdf, key="user_id", left_ts="vts", right_ts="cts",
        upper="1 hour", how="leftOuter",
    ).toPandas()
    assert len(out) == 2
    lonely = out[out.view_id == "v_lonely"]
    assert lonely.click_id.isna().all()
