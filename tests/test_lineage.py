"""Lineage/metrics invariants: per-partition offset ranges cover the
epoch, counts reconcile with the raw slice."""

from airbyte_integrations_spark.config import SyncConfig
from airbyte_integrations_spark.gen import gen_change_events
from airbyte_integrations_spark.lakehouse.table import LakeTable
from airbyte_integrations_spark.lineage import read_lineage
from airbyte_integrations_spark.streaming.microbatch import run_sync


def test_lineage_counts_reconcile(spark, tmp_path):
    ev = gen_change_events(spark, 1000, n_urls=50).drop("html")
    cfg = SyncConfig(stream="pages")
    table = LakeTable(spark, str(tmp_path / "t"))
    run_sync(spark, ev, table, cfg, max_events_per_epoch=250, extract_missing_text=False)

    lin = read_lineage(spark, table.root)
    agg = lin.groupBy("epoch").sum("n_events", "n_deletes").collect()
    per_epoch = {r["epoch"]: r["sum(n_events)"] for r in agg}
    assert sum(per_epoch.values()) == 1000
    assert set(per_epoch) == {0, 250, 500, 750}
    n_deletes = sum(r["sum(n_deletes)"] for r in agg)
    assert n_deletes == ev.filter("_ab_cdc_deleted_at IS NOT NULL").count()
    # offset ranges stay within the epoch bounds
    for r in lin.collect():
        assert r["epoch"] < r["from_lsn"] <= r["to_lsn"] <= r["epoch"] + 250


def test_bulk_lineage_matches_per_epoch_scans(spark):
    """compute_lineage_bulk (one tail scan, arithmetic epoch
    assignment) must agree with per-epoch compute_lineage on every
    epoch's aggregate: counts, deletes, offset range."""
    from airbyte_integrations_spark.lineage import compute_lineage, compute_lineage_bulk
    from airbyte_integrations_spark.streaming.microbatch import plan_epochs
    from pyspark.sql import functions as F

    ev = gen_change_events(spark, 900, n_urls=40).drop("html")
    epochs = plan_epochs(ev, None, 200)
    pdf, _schema = compute_lineage_bulk(ev, "pages", epochs)
    assert set(pdf["epoch"]) == {e.epoch_id for e in epochs}
    for ep in epochs:
        got = pdf[pdf["epoch"] == ep.epoch_id]
        batch = ev.filter(
            (F.col("_ab_cdc_lsn") > ep.from_lsn) & (F.col("_ab_cdc_lsn") <= ep.to_lsn)
        )
        want = compute_lineage(batch, "pages", ep.epoch_id).toPandas()
        assert int(got["n_events"].sum()) == int(want["n_events"].sum())
        assert int(got["n_deletes"].sum()) == int(want["n_deletes"].sum())
        assert int(got["from_lsn"].min()) == int(want["from_lsn"].min())
        assert int(got["to_lsn"].max()) == int(want["to_lsn"].max())


def test_bulk_lineage_rejects_nonuniform_plans(spark):
    """Tx-aligned (non-uniform) plans fall back to per-epoch scans."""
    from airbyte_integrations_spark.lineage import compute_lineage_bulk
    from airbyte_integrations_spark.streaming.microbatch import Epoch

    ev = gen_change_events(spark, 100, n_urls=10).drop("html")
    bad = [Epoch(0, 0, 40), Epoch(40, 40, 100)]  # widths 40 vs 60
    assert compute_lineage_bulk(ev, "pages", bad) is None
    gap = [Epoch(0, 0, 40), Epoch(50, 50, 90)]  # non-contiguous
    assert compute_lineage_bulk(ev, "pages", gap) is None


def test_tx_aligned_sync_still_writes_lineage(spark, tmp_path):
    """run_sync with tx_col (non-uniform boundaries) takes the
    per-epoch fallback; lineage still reconciles."""
    from pyspark.sql import functions as F

    ev = (
        gen_change_events(spark, 600, n_urls=30)
        .drop("html")
        .withColumn("txid", (F.col("_ab_cdc_lsn") / 7).cast("long"))
    )
    cfg = SyncConfig(stream="pages")
    table = LakeTable(spark, str(tmp_path / "t"))
    eps = run_sync(spark, ev, table, cfg, max_events_per_epoch=150,
                   extract_missing_text=False, tx_col="txid")
    assert len(eps) >= 2
    lin = read_lineage(spark, table.root)
    assert lin.agg({"n_events": "sum"}).collect()[0][0] == 600
