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
