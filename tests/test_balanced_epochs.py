"""Row-balanced epoch planner (plan_epochs_balanced): exact
order-statistics boundaries — every epoch carries ~target events on a
bursty log where uniform lsn-width slicing is badly unbalanced; plans
are deterministic, resume-stable, and converge through run_sync."""

import pytest
from pyspark.sql import functions as F

from airbyte_integrations_spark.config import SyncConfig
from airbyte_integrations_spark.gen import gen_change_events
from airbyte_integrations_spark.lakehouse.table import LakeTable
from airbyte_integrations_spark.streaming.microbatch import (
    plan_epochs,
    plan_epochs_balanced,
    run_sync,
)
from tests.util import duckdb_winners

N = 3000


@pytest.fixture(scope="module")
def bursty(spark):
    """Strictly increasing, unique lsns; first half dense (1..1500),
    second half sparse (every 997th position) — a hot hour followed by
    a quiet day, the shape that wrecks uniform lsn-width slicing."""
    ev = gen_change_events(spark, N, n_urls=300)
    half = N // 2
    return ev.withColumn(
        "_ab_cdc_lsn",
        F.when(F.col("_ab_cdc_lsn") <= half, F.col("_ab_cdc_lsn")).otherwise(
            (F.col("_ab_cdc_lsn") - half) * 997 + half
        ),
    ).cache()


def _counts(df, epochs):
    return [
        df.filter(
            (F.col("_ab_cdc_lsn") > ep.from_lsn)
            & (F.col("_ab_cdc_lsn") <= ep.to_lsn)
        ).count()
        for ep in epochs
    ]


def test_balanced_epochs_hold_exactly_target(spark, bursty):
    eps = plan_epochs_balanced(bursty, None, 500)
    counts = _counts(bursty, eps)
    assert counts[:-1] == [500] * (len(counts) - 1), counts
    assert 0 < counts[-1] <= 500
    assert sum(counts) == N


def test_uniform_planner_is_unbalanced_here(spark, bursty):
    # the motivating contrast: same target, uniform lsn-width slicing
    eps = plan_epochs(bursty, None, 500)
    counts = [c for c in _counts(bursty, eps) if c > 0]
    assert max(counts) > 2 * 500, counts  # dense region overshoots 2x+


def test_plan_is_contiguous_monotone_and_covers(spark, bursty):
    eps = plan_epochs_balanced(bursty, None, 500)
    hi = bursty.agg(F.max("_ab_cdc_lsn")).collect()[0][0]
    assert eps[0].from_lsn == 0  # min lsn is 1 -> start = 0
    assert eps[-1].to_lsn == hi
    for a, b in zip(eps, eps[1:]):
        assert a.to_lsn == b.from_lsn and a.from_lsn < a.to_lsn


def test_replan_is_deterministic(spark, bursty):
    assert plan_epochs_balanced(bursty, None, 500) == plan_epochs_balanced(
        bursty, None, 500
    )


def test_resume_replans_the_identical_suffix(spark, bursty):
    full = plan_epochs_balanced(bursty, None, 500)
    # after J epochs commit, the watermark is epoch J-1's to_lsn; the
    # re-plan over the remaining tail must equal the original suffix
    for j in (1, 3):
        wm = full[j - 1].to_lsn
        assert plan_epochs_balanced(bursty, wm, 500) == full[j:]


def test_single_epoch_and_empty_tail(spark, bursty):
    hi = bursty.agg(F.max("_ab_cdc_lsn")).collect()[0][0]
    eps = plan_epochs_balanced(bursty, None, N + 1)
    assert len(eps) == 1 and eps[0].to_lsn == hi
    assert plan_epochs_balanced(bursty, hi, 500) == []


def test_run_sync_balanced_converges_and_resumes(spark, tmp_path, bursty):
    cfg = SyncConfig(stream="pages", n_buckets=4)
    t = LakeTable(spark, str(tmp_path / "t"))
    eps1 = run_sync(
        spark, bursty, t, cfg, max_events_per_epoch=500, balanced=True,
        extract_missing_text=False, max_epochs=2,
    )
    assert len(eps1) == 2
    run_sync(
        spark, bursty, t, cfg, max_events_per_epoch=500, balanced=True,
        extract_missing_text=False,
    )
    got = (
        t.read_live()
        .select("url", "_ab_cdc_lsn")
        .toPandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    want = (
        duckdb_winners(bursty.toPandas())[["url", "_ab_cdc_lsn"]]
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert got.equals(want)
    # idempotent third run: nothing to plan above the watermark
    assert (
        run_sync(
            spark, bursty, t, cfg, max_events_per_epoch=500, balanced=True,
            extract_missing_text=False,
        )
        == []
    )


def test_balanced_and_tx_are_mutually_exclusive(spark, tmp_path, bursty):
    t = LakeTable(spark, str(tmp_path / "t2"))
    with pytest.raises(ValueError, match="mutually exclusive"):
        run_sync(
            spark, bursty, t, SyncConfig(stream="pages"), balanced=True,
            tx_col="_airbyte_ab_id",
        )


def test_balanced_bulk_lineage_equals_per_epoch(spark, bursty):
    from airbyte_integrations_spark.lineage import (
        compute_lineage,
        compute_lineage_bulk,
        lineage_balanced_frame,
    )

    eps = plan_epochs_balanced(bursty, None, 500)
    lin = lineage_balanced_frame(bursty, "pages", eps, target=500)
    got = {
        (r["epoch"],): (r["from"], r["to"], r["n"], r["d"])
        for r in lin.groupBy("epoch")
        .agg(
            F.min("from_lsn").alias("from"),
            F.max("to_lsn").alias("to"),
            F.sum("n_events").alias("n"),
            F.sum("n_deletes").alias("d"),
        )
        .collect()
    }
    for ep in eps:
        batch = bursty.filter(
            (F.col("_ab_cdc_lsn") > ep.from_lsn)
            & (F.col("_ab_cdc_lsn") <= ep.to_lsn)
        )
        ref = (
            compute_lineage(batch, "pages", ep.epoch_id)
            .groupBy("epoch")
            .agg(
                F.min("from_lsn").alias("from"),
                F.max("to_lsn").alias("to"),
                F.sum("n_events").alias("n"),
                F.sum("n_deletes").alias("d"),
            )
            .collect()[0]
        )
        assert got[(ep.epoch_id,)] == (ref["from"], ref["to"], ref["n"], ref["d"])
    # dispatch: compute_lineage_bulk routes balanced plans when told
    assert compute_lineage_bulk(bursty, "pages", eps) is None  # non-uniform
    pdf, _ = compute_lineage_bulk(bursty, "pages", eps, balanced_target=500)
    assert int(pdf["n_events"].sum()) == N
    assert set(pdf["epoch"]) == {e.epoch_id for e in eps}


def test_run_sync_balanced_writes_full_lineage(spark, tmp_path, bursty):
    from airbyte_integrations_spark.lineage import read_lineage

    cfg = SyncConfig(stream="pages", n_buckets=4)
    t = LakeTable(spark, str(tmp_path / "tl"))
    eps = run_sync(
        spark, bursty, t, cfg, max_events_per_epoch=500, balanced=True,
        extract_missing_text=False,
    )
    lin = read_lineage(spark, t.root)
    assert lin.agg(F.sum("n_events")).collect()[0][0] == N
    assert set(
        r["epoch"] for r in lin.select("epoch").distinct().collect()
    ) == {e.epoch_id for e in eps}


def test_catalog_property_routes_balanced_planner(spark, tmp_path, bursty):
    from airbyte_integrations_spark.catalog_sync import (
        ConfiguredCatalog,
        ConfiguredStream,
        read_catalog,
        stream_table,
    )

    cfg = SyncConfig(
        stream="pages", n_buckets=4, properties={"balanced_epochs": True}
    )
    cat = ConfiguredCatalog(
        streams=(
            ConfiguredStream(config=cfg, source={"kind": "dataframe", "df": bursty}),
        )
    )
    lake = str(tmp_path / "lake")
    read_catalog(spark, cat, lake, max_events_per_epoch=500)
    t = stream_table(spark, lake, "pages")
    want = {str(e.epoch_id) for e in plan_epochs_balanced(bursty, None, 500)}
    assert set(t.committed_epochs("pages")) == want
