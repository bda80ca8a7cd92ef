"""Catalog layer: JSON-Schema -> Spark types, name normalization with
collision suffixing (multiple_column_names_conflicts stream), nested
unnesting, multi-stream sync ordering."""

import datetime as dt

from pyspark.sql import types as T

from airbyte_integrations_spark.catalog import (
    ConfiguredStream,
    json_schema_to_spark,
    normalize_name,
    normalize_names,
    run_catalog_sync,
    stream_struct,
)
from airbyte_integrations_spark.config import DestinationSyncMode, SyncConfig, SyncMode
from airbyte_integrations_spark.lakehouse.table import LakeTable
from airbyte_integrations_spark.operators.unnest import unnest_stream


def test_json_schema_lattice():
    assert json_schema_to_spark({"type": "integer"}) == T.LongType()
    assert json_schema_to_spark({"type": "number"}) == T.DoubleType()
    assert json_schema_to_spark({"type": ["null", "boolean"]}) == T.BooleanType()
    assert json_schema_to_spark({"type": ["integer", "number"]}) == T.DoubleType()
    assert json_schema_to_spark({"type": "string", "format": "date"}) == T.DateType()
    assert (
        json_schema_to_spark({"type": "string", "format": "date-time"})
        == T.TimestampType()
    )
    assert json_schema_to_spark({"type": "object"}) == T.StringType()  # opaque blob
    assert json_schema_to_spark(
        {"type": "array", "items": {"type": "integer"}}
    ) == T.ArrayType(T.LongType())
    assert json_schema_to_spark({"type": "weird"}) == T.StringType()


def test_stream_struct_exchange_rate_shape():
    """The dedup_exchange_rate schema (catalog.json:48-90 shape)."""
    js = {
        "type": "object",
        "properties": {
            "id": {"type": "integer"},
            "currency": {"type": "string"},
            "date": {"type": "string", "format": "date"},
            "timestamp_col": {"type": "string", "format": "date-time"},
            "HKD@spéçiäl & characters": {"type": "number"},
            "NZD": {"type": "number"},
            "USD": {"type": "number"},
        },
    }
    st = stream_struct(js)
    d = {f.name: f.dataType for f in st.fields}
    assert d["id"] == T.LongType()
    assert d["date"] == T.DateType()
    assert d["timestamp_col"] == T.TimestampType()
    assert d["HKD@spéçiäl & characters"] == T.DoubleType()


def test_name_normalization_collisions():
    """multiple_column_names_conflicts (messages.txt): User Id, user_id,
    User id, user id, UserId all normalize to user_id + suffixes."""
    names = ["id", "User Id", "user_id", "User id", "user id", "UserId"]
    m = normalize_names(names)
    assert m["id"] == "id"
    assert m["User Id"] == "user_id"
    assert m["user_id"] == "user_id_1"
    assert m["User id"] == "user_id_2"
    assert m["user id"] == "user_id_3"
    assert m["UserId"] == "userid"
    assert normalize_name("1_prefix_startwith_number") == "_1_prefix_startwith_number"
    assert normalize_name('column`_\'with"_quotes') == "column___with__quotes"


def test_unnest_nested_stream(spark):
    schema = T.StructType(
        [
            T.StructField("_airbyte_ab_id", T.StringType()),
            T.StructField(
                "address",
                T.StructType(
                    [
                        T.StructField("city", T.StringType()),
                        T.StructField("zip", T.StringType()),
                    ]
                ),
            ),
            T.StructField("tags", T.ArrayType(T.StringType())),
            T.StructField(
                "orders",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("sku", T.StringType()),
                            T.StructField("qty", T.LongType()),
                        ]
                    )
                ),
            ),
        ]
    )
    rows = [
        ("a", ("berlin", "10115"), ["x", "y"], [("s1", 2), ("s2", 1)]),
        ("b", ("paris", "75001"), [], None),
    ]
    df = spark.createDataFrame(rows, schema)
    kids = unnest_stream(df)
    assert set(kids) == {"address", "tags", "orders"}
    addr = {r["_airbyte_parent_id"]: r["city"] for r in kids["address"].collect()}
    assert addr == {"a": "berlin", "b": "paris"}
    tags = kids["tags"].collect()
    assert {(r["_airbyte_parent_id"], r["_airbyte_index"], r["tags"]) for r in tags} >= {
        ("a", 0, "x"),
        ("a", 1, "y"),
    }
    orders = {(r["_airbyte_parent_id"], r["sku"]): r["qty"] for r in kids["orders"].collect()}
    assert orders[("a", "s1")] == 2


def test_run_catalog_sync_cdc_and_full_refresh_mix(spark, tmp_path):
    """CdcSourceTest.testCdcAndFullRefreshInSameSync analogue: one sync,
    one incremental append_dedup stream + one full-refresh overwrite
    stream; incremental runs first."""
    ts = dt.datetime(2021, 6, 1)
    cdc_schema = (
        "url string, text string, _ab_cdc_lsn long, _ab_cdc_updated_at timestamp, "
        "_ab_cdc_deleted_at timestamp, _airbyte_ab_id string, _airbyte_emitted_at timestamp"
    )
    cdc = spark.createDataFrame(
        [("u1", "old", 1, ts, None, "a", ts), ("u1", "new", 2, ts, None, "b", ts)],
        cdc_schema,
    )
    full = spark.createDataFrame([("r1", 1.0), ("r2", 2.0)], "k string, v double")
    streams = [
        (
            ConfiguredStream(
                SyncConfig(
                    stream="rates",
                    primary_key=("k",),
                    sync_mode=SyncMode.FULL_REFRESH,
                    destination_sync_mode=DestinationSyncMode.OVERWRITE,
                )
            ),
            full,
        ),
        (ConfiguredStream(SyncConfig(stream="pages")), cdc),
    ]
    versions = run_catalog_sync(spark, streams, str(tmp_path / "lake"), epoch=1)
    assert set(versions) == {"rates", "pages"}
    pages = LakeTable(spark, str(tmp_path / "lake/pages")).read().collect()
    assert len(pages) == 1 and pages[0]["text"] == "new"
    rates = LakeTable(spark, str(tmp_path / "lake/rates")).read()
    assert rates.count() == 2
