"""Order-independent checksum reconciliation: equal tables agree,
a single corrupted/missing/extra row flags exactly its bucket,
checksums are partitioning-invariant, and the plan is one hash agg.
Role model: pt-table-checksum; the reference's acceptance tests
compare full record sets (DestinationAcceptanceTest.retrieveRecords),
which this replaces with an O(1)-output aggregate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airbyte_integrations_spark.functions.checksum import (
    reconcile,
    row_hash60,
    table_checksum,
)


@pytest.fixture(scope="module")
def tbl(spark):
    df = spark.range(0, 500).select(
        F.concat(F.lit("k"), F.col("id")).alias("url"),
        (F.col("id") * 7 % 101).alias("v"),
        F.concat(F.lit("p"), (F.col("id") % 13)).alias("s"),
    )
    df.persist().count()
    return df


def test_equal_tables_reconcile_empty(spark, tbl):
    assert reconcile(tbl, tbl.orderBy(F.rand(7)), ["url"]).count() == 0


def test_single_corrupt_row_flags_one_bucket(spark, tbl):
    bad = tbl.withColumn(
        "v", F.when(F.col("url") == "k123", F.col("v") + 1).otherwise(F.col("v"))
    )
    diff = reconcile(tbl, bad, ["url"]).collect()
    assert len(diff) == 1
    # same row count, different content hash
    assert diff[0].src_rows == diff[0].rep_rows
    assert diff[0].src_hash != diff[0].rep_hash
    # and the flagged bucket is the corrupted key's bucket
    want = tbl.filter(F.col("url") == "k123").select(
        (F.conv(F.substring(F.md5("url"), 1, 8), 16, 10).cast("long") % 16)
    ).first()[0]
    assert diff[0].bucket == want


def test_missing_row_flags_count_mismatch(spark, tbl):
    diff = reconcile(tbl, tbl.filter(F.col("url") != "k321"), ["url"]).collect()
    assert len(diff) == 1 and diff[0].src_rows == diff[0].rep_rows + 1


def test_partitioning_invariance(spark, tbl):
    a = table_checksum(tbl.repartition(1), ["url"]).collect()
    b = table_checksum(tbl.repartition(17, "s"), ["url"]).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_value_cols_subset_ignores_other_columns(spark, tbl):
    noisy = tbl.withColumn("s", F.lit("zzz"))
    assert reconcile(tbl, noisy, ["url"], value_cols=["v"]).count() == 0
    assert reconcile(tbl, noisy, ["url"]).count() > 0


def test_hash_is_portable_vs_duckdb(spark):
    import duckdb

    df = spark.range(0, 50).select(
        F.concat(F.lit("u"), F.col("id")).alias("url"),
        (F.col("id") % 7).alias("v"),
    )
    got = {r.url: r.h for r in df.select("url", row_hash60(["url", "v"]).alias("h")).collect()}
    want = {
        u: h
        for u, h in duckdb.sql(
            "SELECT 'u'||i, ('0x'||substr(md5('u'||i||'~'||(i%7)),1,15))::BIGINT "
            "FROM range(50) t(i)"
        ).fetchall()
    }
    assert got == want


def test_plan_is_single_hash_agg_no_sort(spark, tbl):
    plan = table_checksum(tbl, ["url"])._jdf.queryExecution().executedPlan().toString()
    assert "Sort" not in plan
    # partial + final hash aggregate around one exchange
    assert plan.count("HashAggregate") >= 2


def test_null_position_is_distinguished(spark):
    """('a', NULL, 'b') must NOT hash like ('a', 'b', NULL): a value
    shifting between adjacent nullable columns is a real divergence
    (bare concat_ws would collapse the two)."""
    a = spark.createDataFrame([("k", "a", None, "b")], "url string, x string, y string, z string")
    b = spark.createDataFrame([("k", "a", "b", None)], "url string, x string, y string, z string")
    assert reconcile(a, b, ["url"]).count() == 1
    # NULL vs empty string is a divergence too
    c = spark.createDataFrame([("k", "a", "", "b")], "url string, x string, y string, z string")
    assert reconcile(a, c, ["url"]).count() == 1


def test_hash_is_portable_vs_duckdb_with_nulls(spark):
    import duckdb

    df = spark.createDataFrame(
        [("u1", None), ("u2", "v")], "url string, v string"
    )
    got = {r.url: r.h for r in df.select("url", row_hash60(["url", "v"]).alias("h")).collect()}
    want = {
        u: h
        for u, h in duckdb.sql(
            "SELECT url, ('0x'||substr(md5(url||'~'||coalesce(v, chr(0))),1,15))::BIGINT "
            "FROM (VALUES ('u1', NULL), ('u2', 'v')) t(url, v)"
        ).fetchall()
    }
    assert got == want
