"""Z-order clustering (lakehouse/zorder.py + compact(zorder_by=...)):
multi-dimension file skipping that a 1-D sort order cannot give,
read_range equality with the unpruned filter on BOTH dimensions, and
the interleave/normalize primitives."""

import pytest
from pyspark.sql import functions as F

from airbyte_integrations_spark.config import SyncConfig
from airbyte_integrations_spark.gen import gen_change_events
from airbyte_integrations_spark.lakehouse.table import LakeTable
from airbyte_integrations_spark.lakehouse.zorder import (
    interleave_bits,
    normalize_rank,
)
from airbyte_integrations_spark.streaming.microbatch import run_sync


def test_interleave_bits_morton_order(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (3, 3)], "x long, y long"
    )
    z = df.select(
        "x", "y", interleave_bits([F.col("x"), F.col("y")], bits=2).alias("z")
    )
    got = {(r["x"], r["y"]): r["z"] for r in z.collect()}
    # bit b of col i -> position b*2+i: (x,y)=(1,0)->1, (0,1)->2, (1,1)->3,
    # (2,0)->4, (3,3)->15 — the textbook Morton codes
    assert got == {(0, 0): 0, (1, 0): 1, (0, 1): 2, (1, 1): 3, (2, 0): 4, (3, 3): 15}


def test_normalize_rank_bounds_and_degenerate(spark):
    df = spark.createDataFrame([(0,), (50,), (100,)], "v long")
    r = df.select(normalize_rank(F.col("v"), 0, 100, bits=8).alias("r")).collect()
    assert [x["r"] for x in r] == [0, 127, 255]
    # constant column (lo == hi) maps to 0, never errors
    r0 = df.select(normalize_rank(F.col("v"), 7, 7, bits=8).alias("r")).collect()
    assert all(x["r"] == 0 for x in r0)


@pytest.fixture(scope="module")
def zordered(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("zorder") / "t")
    ev = gen_change_events(spark, 6000, n_urls=3000).withColumn(
        "value_m", F.pmod(F.xxhash64("url"), F.lit(100000))
    )
    table = LakeTable(spark, root)
    run_sync(spark, ev, table, SyncConfig(stream="pages", n_buckets=4),
             extract_missing_text=False, compact_threshold=None)
    n = table.read_live().count()
    table.compact(
        zorder_by=("_ab_cdc_lsn", "value_m"),
        target_file_rows=max(n // (4 * 8), 8),
    )
    return table


def test_zorder_prunes_both_dimensions(spark, zordered):
    table = zordered
    live = table.read_live()
    lmax = live.agg(F.max("_ab_cdc_lsn")).collect()[0][0]
    vmax = live.agg(F.max("value_m")).collect()[0][0]
    for col, hi in (("_ab_cdc_lsn", lmax), ("value_m", vmax)):
        lo_b, hi_b = hi // 4, hi // 2
        kept, total = table.range_prune_counts(col, lo_b, hi_b)
        assert kept < total, (col, kept, total)
        got = sorted(
            r["url"] for r in table.read_range(col, lo_b, hi_b).collect()
        )
        want = sorted(
            r["url"]
            for r in live.filter(
                (F.col(col) >= lo_b) & (F.col(col) <= hi_b)
            ).collect()
        )
        assert got == want, col


def test_one_d_sort_does_not_prune_second_dimension(spark, tmp_path):
    """The contrast case z-order exists for: sort_by=lsn leaves
    value_m's per-file ranges bucket-wide."""
    root = str(tmp_path / "t1d")
    ev = gen_change_events(spark, 6000, n_urls=3000).withColumn(
        "value_m", F.pmod(F.xxhash64("url"), F.lit(100000))
    )
    table = LakeTable(spark, root)
    run_sync(spark, ev, table, SyncConfig(stream="pages", n_buckets=4),
             extract_missing_text=False, compact_threshold=None)
    n = table.read_live().count()
    table.compact(sort_by="_ab_cdc_lsn", target_file_rows=max(n // (4 * 8), 8))
    vmax = table.read_live().agg(F.max("value_m")).collect()[0][0]
    # value_m isn't in the stats set under sort_by=lsn — and even if it
    # were, each file's range would span the bucket. Either way: no
    # pruning on the second dimension.
    kept, total = table.range_prune_counts("value_m", vmax // 4, vmax // 2)
    assert kept == total


def test_zorder_rejects_non_numeric_and_both_strategies(spark, zordered):
    with pytest.raises(ValueError, match="non-numeric"):
        zordered.compact(zorder_by=("url", "_ab_cdc_lsn"))
    with pytest.raises(ValueError, match="not both"):
        zordered.compact(sort_by="value_m", zorder_by=("_ab_cdc_lsn", "value_m"))


def test_zorder_budget_validated_before_pending_props(spark, tmp_path):
    """A single-column zorder_by or an over-budget bits*n must fail
    BEFORE want_props mutates pending table props — otherwise the
    rejected clustering claim silently attaches to the next unrelated
    commit."""
    ev = gen_change_events(spark, 400, n_urls=200).withColumn(
        "value_m", F.pmod(F.xxhash64("url"), F.lit(1000))
    )
    table = LakeTable(spark, str(tmp_path / "t"))
    run_sync(spark, ev, table, SyncConfig(stream="pages", n_buckets=2),
             extract_missing_text=False, compact_threshold=None)
    with pytest.raises(ValueError, match="at least 2"):
        table.compact(zorder_by=("_ab_cdc_lsn",))
    assert not table._pending_props
    with pytest.raises(ValueError, match="62-bit"):
        table.compact(zorder_by=("_ab_cdc_lsn", "value_m"), zorder_bits=32)
    assert not table._pending_props
