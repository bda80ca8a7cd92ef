"""Transaction-aligned epoch planning: no commit boundary ever splits
a source transaction (Debezium transaction-metadata contract)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airbyte_integrations_spark.config import SyncConfig
from airbyte_integrations_spark.gen import gen_change_events
from airbyte_integrations_spark.lakehouse.table import LakeTable
from airbyte_integrations_spark.streaming.microbatch import (
    plan_epochs,
    plan_epochs_tx,
    run_sync,
)

@pytest.fixture(scope="module")
def events(spark):
    ev = gen_change_events(spark, 3000, n_urls=300, seed="txcdc")
    tx = (F.col("_ab_cdc_lsn") - 1) / 7
    return ev.withColumn("txid", F.floor(tx).cast("long")).cache()


def tx_spans(events):
    return events.groupBy("txid").agg(
        F.min("_ab_cdc_lsn").alias("lo"), F.max("_ab_cdc_lsn").alias("hi")
    )


def test_no_epoch_splits_a_transaction(spark, events):
    eps = plan_epochs_tx(events, None, 400, "txid")
    assert len(eps) >= 5
    spans = tx_spans(events).collect()
    for s in spans:
        owners = [
            e for e in eps
            if e.from_lsn < s["lo"] <= e.to_lsn or e.from_lsn < s["hi"] <= e.to_lsn
        ]
        assert len({(o.from_lsn, o.to_lsn) for o in owners}) == 1, (
            f"tx {s['txid']} split across {owners}"
        )


def test_boundaries_are_tx_ends_and_cover_the_tail(spark, events):
    eps = plan_epochs_tx(events, None, 400, "txid")
    ends = {r["hi"] for r in tx_spans(events).collect()}
    assert all(e.to_lsn in ends for e in eps)
    # contiguous, monotone, ending at the max lsn
    for a, b in zip(eps, eps[1:]):
        assert a.to_lsn == b.from_lsn
    assert eps[-1].to_lsn == 3000


def test_one_event_per_tx_matches_plain_planner(spark, events):
    solo = events.withColumn("txid", F.col("_ab_cdc_lsn"))
    a = plan_epochs_tx(solo, None, 400, "txid")
    b = plan_epochs(events, None, 400)
    assert [(e.from_lsn, e.to_lsn) for e in a] == [
        (e.from_lsn, e.to_lsn) for e in b
    ]


def test_oversized_transaction_owns_its_epoch(spark):
    # one 900-event tx inside a 1200-event log, width ~200
    ev = gen_change_events(spark, 1200, n_urls=100, seed="bigtx").withColumn(
        "txid",
        F.when(F.col("_ab_cdc_lsn").between(101, 1000), F.lit(0)).otherwise(
            F.col("_ab_cdc_lsn")
        ),
    )
    eps = plan_epochs_tx(ev, None, 200, "txid")
    big = [e for e in eps if e.from_lsn < 500 <= e.to_lsn]
    assert len(big) == 1 and big[0].from_lsn <= 100 and big[0].to_lsn >= 1000


def test_replan_at_same_watermark_is_identical(spark, events):
    a = plan_epochs_tx(events, 500, 300, "txid")
    b = plan_epochs_tx(events, 500, 300, "txid")
    assert a == b and all(e.from_lsn >= 500 for e in a)


def test_run_sync_tx_aligned_converges(spark, tmp_path, events):
    t1 = LakeTable(spark, str(tmp_path / "tx"))
    t2 = LakeTable(spark, str(tmp_path / "plain"))
    cfg = SyncConfig(stream="pages", n_buckets=4)
    eps = run_sync(spark, events, t1, cfg, max_events_per_epoch=500, tx_col="txid")
    run_sync(spark, events, t2, cfg, max_events_per_epoch=500)
    assert len(eps) >= 2
    a = t1.read().select("url", "_ab_cdc_lsn")
    b = t2.read().select("url", "_ab_cdc_lsn")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # every committed watermark is a transaction end
    ends = {r["hi"] for r in tx_spans(events).collect()}
    assert all(e.to_lsn in ends for e in eps)


def test_interleaved_concurrent_transactions_never_split(spark):
    # Two concurrent txs per 20-lsn block, lsns INTERLEAVED within the
    # block (tx = 2*block + lsn%2) — the normal Postgres WAL shape where
    # concurrent transactions' change lsns interleave. Any boundary
    # snapped merely to "some tx's max lsn" can land inside the sibling
    # tx's span; the planner must extend past it.
    ev = gen_change_events(spark, 2000, n_urls=200, seed="ilv").withColumn(
        "txid",
        (F.floor((F.col("_ab_cdc_lsn") - 1) / 20) * 2 + F.col("_ab_cdc_lsn") % 2),
    )
    eps = plan_epochs_tx(ev, None, 250, "txid")
    assert len(eps) >= 4  # local interleaving must NOT collapse the plan
    spans = tx_spans(ev).collect()
    for s in spans:
        assert not any(
            e.from_lsn < s["lo"] <= e.to_lsn < s["hi"] for e in eps
        ), f"tx {s['txid']} ({s['lo']}..{s['hi']}) split by an epoch boundary"
    for a, b in zip(eps, eps[1:]):
        assert a.to_lsn == b.from_lsn
    assert eps[-1].to_lsn == 2000


def test_fully_interleaved_region_owns_one_epoch(spark):
    # txid = lsn % 5 spreads every tx across the whole tail: NO interior
    # boundary is safe, so the only correct plan is one epoch
    ev = gen_change_events(spark, 600, n_urls=60, seed="ilv2").withColumn(
        "txid", F.col("_ab_cdc_lsn") % 5
    )
    eps = plan_epochs_tx(ev, None, 100, "txid")
    assert [(e.from_lsn, e.to_lsn) for e in eps] == [(0, 600)]
