"""Catalog-driven field selection: only the configured catalog's fields
reach the destination, with the projection pushed into the source scan.

Reference: AbstractDbSource.java:229-233 — the JDBC read SELECTs only
the top-level field names present in the configured catalog's schema
(CatalogHelpers.getTopLevelFieldNames), so deselected columns are never
queried. The CDC metadata injectors add their system columns regardless
of the field list (DebeziumEventUtils.java:19-20), so system columns
always ride here too.
"""

import pytest
from pyspark.sql import functions as F

from airbyte_integrations_spark.catalog_sync import (
    ConfiguredCatalog,
    ConfiguredStream,
    read_catalog,
    select_fields,
    stream_table,
)
from airbyte_integrations_spark.config import DestinationSyncMode, SyncConfig, SyncMode
from airbyte_integrations_spark.gen import gen_change_events
from tests.util import duckdb_winners

COLS = [
    "url", "warc_ts", "text", "lang",
    "_ab_cdc_lsn", "_ab_cdc_updated_at", "_ab_cdc_deleted_at",
    "_airbyte_ab_id", "_airbyte_emitted_at",
]


@pytest.fixture(scope="module")
def events(spark):
    return gen_change_events(spark, 600, n_urls=30).select(*COLS)


def _sync(spark, events_df, lake, cfg):
    cat = ConfiguredCatalog(
        streams=(ConfiguredStream(config=cfg, source={"kind": "dataframe", "df": events_df}),)
    )
    read_catalog(spark, cat, lake, max_events_per_epoch=200)
    return stream_table(spark, lake, cfg.stream)


def test_deselected_payload_columns_never_land(spark, tmp_path, events):
    cfg = SyncConfig(stream="pages", selected_fields=("text",), n_buckets=4)
    t = _sync(spark, events, str(tmp_path / "lake"), cfg)
    live = t.read_live()
    assert "text" in live.columns
    assert "lang" not in live.columns and "warc_ts" not in live.columns
    # the kept column's values are the true winners' values
    want = duckdb_winners(events.toPandas())[["url", "text"]]
    got = live.select("url", "text").toPandas()
    assert (
        got.sort_values("url").reset_index(drop=True)
        .equals(want.sort_values("url").reset_index(drop=True))
    )


def test_key_cursor_and_system_columns_always_ride(spark, tmp_path, events):
    # selection names ONLY a payload column — pk/cursor/system still land
    cfg = SyncConfig(stream="pages", selected_fields=("lang",), n_buckets=4)
    t = _sync(spark, events, str(tmp_path / "lake"), cfg)
    cols = set(t.read_live().columns)
    for c in ("url", "_ab_cdc_lsn", "_ab_cdc_updated_at", "_ab_cdc_deleted_at",
              "_airbyte_ab_id", "_airbyte_emitted_at", "lang"):
        assert c in cols, c
    assert "text" not in cols and "warc_ts" not in cols


def test_unknown_selected_field_rejected(spark, tmp_path, events):
    cfg = SyncConfig(stream="pages", selected_fields=("nope",))
    with pytest.raises(ValueError, match="selected_fields not in source"):
        _sync(spark, events, str(tmp_path / "lake"), cfg)


def test_missing_key_rejected(spark, events):
    cfg = SyncConfig(
        stream="pages", primary_key=("absent_key",), selected_fields=("text",)
    )
    with pytest.raises(ValueError, match="primary key / cursor"):
        select_fields(events, cfg)


def test_full_refresh_overwrite_needs_no_cursor(spark, tmp_path, events):
    # a full-refresh overwrite stream whose frame lacks the (default)
    # cursor column: selection must not demand _ab_cdc_lsn
    plain = events.select("url", "text", "lang", "warc_ts")
    cfg = SyncConfig(
        stream="snap",
        sync_mode=SyncMode.FULL_REFRESH,
        destination_sync_mode=DestinationSyncMode.OVERWRITE,
        selected_fields=("text",),
        n_buckets=4,
    )
    t = _sync(spark, plain, str(tmp_path / "lake"), cfg)
    cols = set(t.read_live().columns)
    assert "text" in cols and "lang" not in cols and "warc_ts" not in cols


def test_projection_pushes_to_parquet_scan(spark, tmp_path, events):
    # the point of doing selection on the declarative frame: ReadSchema
    # shrinks — deselected columns are never READ, not read-then-dropped
    p = str(tmp_path / "log")
    events.write.parquet(p)
    cfg = SyncConfig(stream="pages", selected_fields=("text",))
    pruned = select_fields(spark.read.parquet(p), cfg)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema, plan
    assert "lang" not in read_schema[0] and "warc_ts" not in read_schema[0]
    assert "text" in read_schema[0] and "url" in read_schema[0]


def test_rerun_is_epoch_noop_with_selection(spark, tmp_path, events):
    cfg = SyncConfig(stream="pages", selected_fields=("text",), n_buckets=4)
    lake = str(tmp_path / "lake")
    t = _sync(spark, events, lake, cfg)
    v1 = t.current_version()
    n1 = t.read_live().count()
    t2 = _sync(spark, events, lake, cfg)
    assert t2.current_version() == v1  # all epochs skip: no new commit
    assert t2.read_live().count() == n1


def test_empty_selection_means_all_fields(spark, events):
    assert select_fields(events, SyncConfig(stream="pages")).columns == events.columns
