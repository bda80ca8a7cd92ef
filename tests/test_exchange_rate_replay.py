"""Full replay of the reference's dedup_exchange_rate corpus through
wire -> catalog -> incremental SCD (FIXTURES.md F3.3/F3.4/F3.5).

Row-count oracles from the reference dbt data tests:
  run 1 (messages.txt, 12 records):        scd 12, final 6
  run 2 (messages_incremental.txt, 6):     scd 16 cumulative, final 7
  run 3 (messages_schema_change.txt, 4,
         id widens int->number, new_column added,
         HKD_special___characters dropped): scd 20, final 11
(simple_streams_{first,second}_run_row_counts.sql and
dbt_data_tests_tmp_schema_change; catalog diff catalog.json:48-90 vs
catalog_schema_change.json.)

Composite PK [id, currency, NZD] (includes a float — the fixture
README's noted edge case), cursor `date` with empty-string and missing
values (null cursor sorts last), unicode + quoted column names.
"""

import json

import pytest

from airbyte_integrations_spark.catalog import stream_struct
from airbyte_integrations_spark.lakehouse.scd_apply import apply_scd_batch, final_view
from airbyte_integrations_spark.lakehouse.table import LakeTable
from airbyte_integrations_spark.sources.airbyte_wire import (
    read_messages,
    records_for_stream,
)

BASE = {
    "HKD_special___characters": "column name collision?",
    "column`_'with\"_quotes": "ma\"z`d'a",
}


def rec(emitted, **data):
    d = dict(BASE)
    d.update(data)
    return {
        "type": "RECORD",
        "record": {"stream": "dedup_exchange_rate", "emitted_at": emitted, "data": d},
    }


H = "HKD@spéçiäl & characters"

RUN1 = [
    rec(1602637589000, id=1, currency="USD", date="2020-08-29", timestamp_col="2020-08-29T00:00:00.000000-0000", NZD=1.14, **{H: 2.13}),
    rec(1602637689100, id=1, currency="USD", date="2020-08-30", timestamp_col="2020-08-30T00:00:00.000-00", NZD=1.14, **{H: 7.15}),
    rec(1602637789200, id=2, currency="EUR", date="2020-08-31", timestamp_col="2020-08-31T00:00:00+00", NZD=3.89, **{H: 7.12}, USD=10.16),
    rec(1602637889300, id=2, currency="EUR", date="2020-08-31", timestamp_col="2020-08-31T00:00:00+0000", NZD=1.14, **{H: 7.99}, USD=10.99),
    rec(1602637989400, id=2, currency="EUR", date="2020-09-01", timestamp_col="2020-09-01T00:00:00Z", NZD=2.43, **{H: 8}, USD=10.16),
    rec(1602637990700, id=1, currency="USD", date="2020-09-01", timestamp_col="2020-09-01T00:00:00Z", NZD=1.14, **{H: 10.5}),
    rec(1602637990800, id=2, currency="EUR", date="2020-09-01", timestamp_col="2020-09-01T00:00:00Z", NZD=2.43, **{H: 5.4}),
    rec(1602637990800, id=2, currency="EUR", date="", timestamp_col="", NZD=2.43, **{H: 5.4}),
    rec(1602637990900, id=3, currency="GBP", NZD=3.14, **{H: 9.2}),
    rec(1602637991000, id=2, currency="EUR", NZD=3.89, **{H: 7.02}),
    rec(1602637991100, id=5, currency="USD", NZD=0.01, **{H: 8.12}),
    rec(1602637991200, id=5, currency="USD", NZD=0.01, **{H: 9.23}),
]

RUN2 = [
    rec(1602637990800, id=2, currency="EUR", date="", timestamp_col="", NZD=2.43, **{H: 5.4}),
    rec(1602637990900, id=3, currency="GBP", NZD=3.14, **{H: 9.2}),
    rec(1602650000000, id=2, currency="EUR", NZD=3.89, **{H: 14.05}),
    rec(1602650010000, id=4, currency="HKD", NZD=1.19, **{H: 0.01}),
    rec(1602650011000, id=1, currency="USD", date="2020-10-14", timestamp_col="2020-10-14T00:00:00.000-00", NZD=1.14, **{H: 9.5}),
    rec(1602650012000, id=5, currency="USD", NZD=0.01, **{H: 6.39}),
]

# run 3 (schema change): id is now a number, new_column appears,
# HKD_special___characters is gone
def rec3(emitted, **data):
    d = {"column`_'with\"_quotes": "ma\"z`d'a"}
    d.update(data)
    return {
        "type": "RECORD",
        "record": {"stream": "dedup_exchange_rate", "emitted_at": emitted, "data": d},
    }


RUN3 = [
    rec3(1602661281900, id=3.14, currency="EUR", new_column=2.1, date="2020-11-01", timestamp_col="2020-11-01T00:00:00Z", NZD=2.43, **{H: 2.12}, USD=7),
    rec3(1602661291900, id=0.12, currency="GBP", new_column=3.81, date="2020-11-01", timestamp_col="2020-11-01T00:00:00Z", NZD=3.14, **{H: 3.01}, USD=11),
    rec3(1602661381900, id=4.22, currency="EUR", new_column=89.1, date="2020-11-01", timestamp_col="2020-11-01T00:00:00Z", NZD=3.89, **{H: 8.88}, USD=10),
    rec3(1602661481900, id=1, currency="HKD", new_column=91.11, date="2020-11-01", timestamp_col="2020-11-01T00:00:00Z", NZD=1.19, **{H: 99.1}, USD=10),
]

SCHEMA_V1 = stream_struct(
    {
        "properties": {
            "id": {"type": "integer"},
            "currency": {"type": "string"},
            "date": {"type": "string", "format": "date"},
            "timestamp_col": {"type": "string", "format": "date-time"},
            H: {"type": "number"},
            "HKD_special___characters": {"type": "string"},
            "NZD": {"type": "number"},
            "USD": {"type": "number"},
        }
    }
)
SCHEMA_V3 = stream_struct(
    {
        "properties": {
            "id": {"type": "number"},
            "currency": {"type": "string"},
            "new_column": {"type": "number"},
            "date": {"type": "string", "format": "date"},
            "timestamp_col": {"type": "string", "format": "date-time"},
            H: {"type": "number"},
            "NZD": {"type": "number"},
            "USD": {"type": "integer"},
        }
    }
)

KW = dict(
    key=("id", "currency", "NZD"),
    cursor="date",
    secondary=("_airbyte_emitted_at",),
    stream="dedup_exchange_rate",
)


def _batch(spark, tmp_path, msgs, schema, name):
    p = tmp_path / f"{name}.jsonl"
    p.write_text("\n".join(json.dumps(m, ensure_ascii=False) for m in msgs))
    return records_for_stream(
        read_messages(spark, str(p)), "dedup_exchange_rate", schema
    )


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "scd"))
    apply_scd_batch(t, _batch(spark, tmp_path, RUN1, SCHEMA_V1, "r1"), epoch=1, **KW)
    return t


def test_run1_counts(spark, table):
    assert table.read().count() == 12
    assert final_view(table).count() == 6


def test_run2_counts(spark, tmp_path, table):
    apply_scd_batch(table, _batch(spark, tmp_path, RUN2, SCHEMA_V1, "r2"), epoch=2, **KW)
    assert table.read().count() == 16  # 18 raw, 2 exact dups collapsed
    assert final_view(table).count() == 7  # + id 4 HKD


def test_run3_schema_change_counts(spark, tmp_path, table):
    apply_scd_batch(table, _batch(spark, tmp_path, RUN2, SCHEMA_V1, "r2"), epoch=2, **KW)
    apply_scd_batch(table, _batch(spark, tmp_path, RUN3, SCHEMA_V3, "r3"), epoch=3, **KW)
    scd = table.read()
    assert scd.count() == 20
    assert final_view(table).count() == 11
    d = dict(scd.dtypes)
    assert d["id"] == "double"  # widened int -> number
    assert "new_column" in d  # additive
    assert d["USD"] == "double"  # stored type stays wide (old rows exist)
    # old rows null-backfilled on the new column
    assert scd.filter("new_column IS NULL").count() == 16
    # the dropped column survives on old rows, null on new ones
    assert scd.filter("HKD_special___characters IS NULL").count() == 4


def test_exchange_rate_overwrite_stream(spark, tmp_path):
    """F3.4: same corpus, incremental/OVERWRITE destination — the
    table is replaced per sync: 12 -> 6 -> 4 rows."""
    from airbyte_integrations_spark.config import DestinationSyncMode, SyncConfig
    from airbyte_integrations_spark.pipeline import apply_batch

    cfg = SyncConfig(
        stream="exchange_rate",
        primary_key=("id", "currency", "NZD"),
        destination_sync_mode=DestinationSyncMode.OVERWRITE,
    )
    t = LakeTable(spark, str(tmp_path / "xr"))
    for i, (msgs, schema, n) in enumerate(
        [(RUN1, SCHEMA_V1, 12), (RUN2, SCHEMA_V1, 6), (RUN3, SCHEMA_V3, 4)], start=1
    ):
        batch = _batch(spark, tmp_path, msgs, schema, f"xr{i}")
        apply_batch(t, batch, cfg, epoch=i)
        assert t.read().count() == n, f"run {i}"
    assert dict(t.read().dtypes)["id"] == "double"  # run-3 schema wins
