"""Partial-image (patch) CDC fold: per-key per-column latest non-null,
delete as hard reset, agg == window equivalence, map-side-combine plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from airbyte_integrations_spark.operators.patch import (
    coalesce_patches,
    coalesce_patches_window,
)

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("_ab_cdc_lsn", T.LongType()),
        T.StructField("_ab_cdc_updated_at", T.TimestampType()),
        T.StructField("_airbyte_emitted_at", T.TimestampType()),
        T.StructField("_airbyte_ab_id", T.StringType()),
        T.StructField("_ab_cdc_deleted_at", T.TimestampType()),
        T.StructField("a", T.StringType()),
        T.StructField("b", T.LongType()),
    ]
)

import datetime as dt

TS = dt.datetime(2021, 1, 1)
DEL = dt.datetime(2021, 6, 1)


def ev(url, lsn, a=None, b=None, deleted=False, ab=None):
    return (url, lsn, TS, TS, ab or f"id{lsn}", DEL if deleted else None, a, b)


@pytest.fixture(scope="module")
def simple(spark):
    rows = [
        # k1: interleaved sparse writes; final a from lsn 3, b from lsn 4
        ev("k1", 1, a="a1", b=10),
        ev("k1", 2, b=20),
        ev("k1", 3, a="a3"),
        ev("k1", 4, b=40),
        # k2: delete resets; post-delete re-insert only writes b
        ev("k2", 1, a="x", b=1),
        ev("k2", 2, deleted=True),
        ev("k2", 3, b=99),
        # k3: latest event is the delete -> key drops
        ev("k3", 1, a="gone", b=7),
        ev("k3", 2, deleted=True),
        # k4: never wrote a
        ev("k4", 5, b=50),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_latest_non_null_per_column(spark, simple):
    out = coalesce_patches(simple, patch_cols=("a", "b"))
    got = {r["url"]: (r["a"], r["b"], r["_ab_cdc_lsn"]) for r in out.collect()}
    assert got["k1"] == ("a3", 40, 4)
    assert got["k4"] == (None, 50, 5)


def test_delete_is_a_hard_reset(spark, simple):
    out = coalesce_patches(simple, patch_cols=("a", "b"))
    got = {r["url"]: (r["a"], r["b"]) for r in out.collect()}
    # k2's pre-delete a='x' must NOT leak into the re-inserted state
    assert got["k2"] == (None, 99)
    # k3's winner is the tombstone -> dropped
    assert "k3" not in got


def test_agg_equals_window_on_fuzz(spark):
    from airbyte_integrations_spark.gen import gen_change_events

    ce = gen_change_events(spark, 4000, n_urls=300, seed="patchfuzz", delete_pct=15)
    # sparsify two payload columns deterministically
    sparse = ce.withColumn(
        "lang", F.when(F.col("_ab_cdc_lsn") % 3 != 0, F.col("lang"))
    ).withColumn(
        "text", F.when(F.col("_ab_cdc_lsn") % 2 != 0, F.col("text"))
    )
    a = coalesce_patches(sparse, patch_cols=("lang", "text"))
    b = coalesce_patches_window(sparse, patch_cols=("lang", "text"))
    cols = ["url", "_ab_cdc_lsn", "lang", "text"]
    assert a.select(*cols).exceptAll(b.select(*cols)).count() == 0
    assert b.select(*cols).exceptAll(a.select(*cols)).count() == 0
    assert a.count() == b.count() > 0


def test_plan_has_mapside_partial_agg(spark, simple):
    # the associative max-by-ordering terms must partially aggregate
    # BELOW the key exchange (map-side combine — hot-key safety), the
    # same property capture_plans.py pins for winner_agg
    out = coalesce_patches(simple, patch_cols=("a", "b"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    ex = plan.find("Exchange hashpartitioning(url")
    pm = plan.rfind("partial_max(")
    assert ex != -1 and pm != -1 and pm > ex, plan
    # and exactly one key exchange: all terms share one aggregation
    assert plan.count("Exchange hashpartitioning(url") == 1, plan


def test_requires_patch_cols(spark, simple):
    with pytest.raises(ValueError):
        coalesce_patches(simple)
