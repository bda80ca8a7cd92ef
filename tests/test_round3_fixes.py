"""Round-3 hardening: pins for the round-2 ADVICE items.

- cursor_literal backslash rejection (MySQL NO_BACKSLASH_ESCAPES off)
- timestamp cursors keep microsecond order in as_change_events
- stream_sync epoch keys are namespace-disjoint from lsn epochs
- COW carried/contested split is null-safe on the key
"""

import pytest
from pyspark.sql import functions as F

from airbyte_integrations_spark.gen import gen_change_events
from airbyte_integrations_spark.lakehouse.merge import merge_into
from airbyte_integrations_spark.lakehouse.table import LakeTable
from airbyte_integrations_spark.sources.jdbc import as_change_events, cursor_literal
from airbyte_integrations_spark.streaming.stream_sync import (
    STREAM_EPOCH_BASE,
    stream_epoch_key,
)

COLS = [
    "url", "warc_ts", "text", "lang", "_ab_cdc_lsn",
    "_ab_cdc_updated_at", "_ab_cdc_deleted_at",
    "_airbyte_ab_id", "_airbyte_emitted_at",
]


def test_cursor_literal_rejects_backslash():
    # A value ending in a backslash would escape the closing quote
    # under MySQL's default escape handling; no portable rendering
    # exists, so it must raise rather than reach the database.
    for t in ("VARCHAR", "TIMESTAMP", "DATE", "CHAR"):
        with pytest.raises(ValueError):
            cursor_literal("a\\' OR 1=1 --", t)
    with pytest.raises(ValueError):
        cursor_literal("2024-01-02\\", "DATE")


def test_cursor_literal_temporal_charset_strict():
    # Temporal literals have a closed character set; quotes or SQL
    # metacharacters can never appear in a valid value.
    assert cursor_literal("2024-01-02 03:04:05.123456", "TIMESTAMP") == (
        "{ts '2024-01-02 03:04:05.123456'}"
    )
    with pytest.raises(ValueError):
        cursor_literal("2024-01-02' OR '1'='1", "TIMESTAMP")
    # Plain strings still escape quotes by doubling (unchanged).
    assert cursor_literal("o'brien", "VARCHAR") == "'o''brien'"


def test_as_change_events_timestamp_cursor_keeps_microseconds(spark):
    # Two updates of one key in the same wall-clock second: the long
    # cast would tie them (arbitrary md5 winner); unix_micros keeps
    # the database's order, so the genuinely newer row must win.
    df = spark.createDataFrame(
        [
            ("k1", "2024-05-01 10:00:00.000001", "old"),
            ("k1", "2024-05-01 10:00:00.000002", "new"),
        ],
        "id string, updated string, payload string",
    ).withColumn("updated", F.col("updated").cast("timestamp"))
    ev = as_change_events(df, key_col="id", cursor_col="updated")
    rows = {r["_ab_cdc_lsn"]: r["payload"] for r in ev.collect()}
    assert len(rows) == 2  # distinct lsns — no same-second collapse
    assert rows[max(rows)] == "new"


def test_as_change_events_integer_cursor_unchanged(spark):
    df = spark.createDataFrame([("k1", 7, "x")], "id string, v long, payload string")
    ev = as_change_events(df, key_col="id", cursor_col="v")
    assert ev.collect()[0]["_ab_cdc_lsn"] == 7


def test_stream_epoch_keys_disjoint_from_lsn_epochs(spark, tmp_path):
    """A WAL position numerically equal to STREAM_EPOCH_BASE+batch_id
    must NOT be considered committed just because the stream batch was:
    Postgres LSNs are 64-bit byte positions and do exceed 2^44."""
    ev = gen_change_events(spark, 50, n_urls=5).select(*COLS)
    table = LakeTable(spark, str(tmp_path / "t"))
    merge_into(table, ev, stream="pages", epoch=stream_epoch_key(0), n_buckets=4)
    assert table.is_epoch_committed("pages", stream_epoch_key(0))
    # the numeric alias is NOT committed — no cross-namespace collision
    assert not table.is_epoch_committed("pages", STREAM_EPOCH_BASE + 0)
    # and an lsn-keyed epoch at that position still applies
    v0 = table.current_version()
    merge_into(table, ev, stream="pages", epoch=STREAM_EPOCH_BASE + 0, n_buckets=4)
    assert table.current_version() > v0


def test_null_key_merge_keeps_single_row(spark, tmp_path):
    """NULL-key groups: the carried/contested split must be null-safe,
    or the old NULL-key row survives the anti-join while the new winner
    is also written — two live rows for one key group."""
    base = spark.createDataFrame(
        [(None, 1, "v1"), ("u1", 1, "a")],
        "url string, _ab_cdc_lsn long, text string",
    ).withColumn("_ab_cdc_updated_at", F.lit(None).cast("timestamp")) \
     .withColumn("_ab_cdc_deleted_at", F.lit(None).cast("timestamp")) \
     .withColumn("_airbyte_ab_id", F.md5(F.concat_ws("~", "url", "_ab_cdc_lsn"))) \
     .withColumn("_airbyte_emitted_at", F.lit(None).cast("timestamp"))
    upd = spark.createDataFrame(
        [(None, 2, "v2")],
        "url string, _ab_cdc_lsn long, text string",
    ).withColumn("_ab_cdc_updated_at", F.lit(None).cast("timestamp")) \
     .withColumn("_ab_cdc_deleted_at", F.lit(None).cast("timestamp")) \
     .withColumn("_airbyte_ab_id", F.md5(F.concat_ws("~", "url", "_ab_cdc_lsn"))) \
     .withColumn("_airbyte_emitted_at", F.lit(None).cast("timestamp"))
    table = LakeTable(spark, str(tmp_path / "t"))
    merge_into(table, base, stream="pages", epoch=1, n_buckets=4)
    merge_into(table, upd, stream="pages", epoch=2, n_buckets=4)
    rows = table.read().collect()
    null_rows = [r for r in rows if r["url"] is None]
    assert len(null_rows) == 1
    assert null_rows[0]["text"] == "v2"
    assert len(rows) == 2  # u1 untouched
