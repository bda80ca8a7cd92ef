"""Mid-stream schema change (FIXTURES.md F3.5 / SURVEY §2.9): additive
columns null-backfilled, widening casts resolved before apply."""

import datetime as dt

from pyspark.sql import types as T

from airbyte_integrations_spark.lakehouse.merge import merge_into
from airbyte_integrations_spark.lakehouse.table import LakeTable
from airbyte_integrations_spark.schema import merge_schemas, widen

TS = dt.datetime(2021, 6, 1)
BASE = (
    "url string, _ab_cdc_lsn long, _ab_cdc_updated_at timestamp, "
    "_ab_cdc_deleted_at timestamp, _airbyte_ab_id string, "
    "_airbyte_emitted_at timestamp"
)


def test_widen_lattice():
    assert widen(T.IntegerType(), T.LongType()) == T.LongType()
    assert widen(T.LongType(), T.DoubleType()) == T.DoubleType()
    assert widen(T.BooleanType(), T.IntegerType()) == T.IntegerType()
    assert widen(T.DoubleType(), T.StringType()) == T.StringType()
    assert widen(T.TimestampType(), T.LongType()) == T.StringType()


def test_merge_schemas_additive_and_widening():
    old = T.StructType(
        [T.StructField("a", T.IntegerType()), T.StructField("b", T.StringType())]
    )
    new = T.StructType(
        [T.StructField("a", T.DoubleType()), T.StructField("c", T.LongType())]
    )
    m = merge_schemas(old, new)
    assert [f.name for f in m.fields] == ["a", "b", "c"]
    assert dict((f.name, f.dataType) for f in m.fields)["a"] == T.DoubleType()


def test_merge_into_with_new_column_and_widened_type(spark, tmp_path):
    table = LakeTable(spark, str(tmp_path / "t"))
    b1 = spark.createDataFrame(
        [("u1", 1, TS, None, "a", TS, 10), ("u2", 2, TS, None, "b", TS, 20)],
        BASE + ", score int",
    )
    merge_into(table, b1, epoch=1)
    # batch 2: score widens int->double, adds new_col
    b2 = spark.createDataFrame(
        [("u2", 3, TS, None, "c", TS, 2.5, "x"), ("u3", 4, TS, None, "d", TS, 3.5, "y")],
        BASE + ", score double, new_col string",
    )
    merge_into(table, b2, epoch=2)
    rows = {r["url"]: r for r in table.read().collect()}
    assert set(rows) == {"u1", "u2", "u3"}
    assert rows["u1"]["score"] == 10.0 and rows["u1"]["new_col"] is None  # backfill
    assert rows["u2"]["score"] == 2.5 and rows["u2"]["new_col"] == "x"
    assert dict(table.read().dtypes)["score"] == "double"
