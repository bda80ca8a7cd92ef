"""Partitioned-log (Kafka-shaped) source: vector offset state, one
epoch per consume round, per-partition resume (source-kafka's
{partition: offset} state shape over the engine's commit log)."""

import pyspark.sql.functions as F

from airbyte_integrations_spark.config import SyncConfig
from airbyte_integrations_spark.gen import gen_change_events
from airbyte_integrations_spark.lakehouse.table import LakeTable
from airbyte_integrations_spark.operators.dedup import winner_window
from airbyte_integrations_spark.sources.partitioned_log import (
    PART_COL,
    committed_offsets,
    sync_partitioned_log,
)

COLS = [
    "url",
    "text",
    "lang",
    "_ab_cdc_lsn",
    "_ab_cdc_updated_at",
    "_ab_cdc_deleted_at",
    "_airbyte_ab_id",
    "_airbyte_emitted_at",
]

N_PARTS = 4


def _plog(spark, n=1000, n_urls=50):
    """Key-hash partitioned log: every url lives in exactly one
    partition (the Kafka producer keying contract); offsets reuse the
    globally-unique lsn, monotone within each partition."""
    ev = gen_change_events(spark, n, n_urls=n_urls).select(*COLS)
    return ev.withColumn(
        PART_COL, F.pmod(F.xxhash64("url"), F.lit(N_PARTS)).cast("int")
    )


def test_consume_rounds_and_vector_state(spark, tmp_path):
    ev = _plog(spark)
    cfg = SyncConfig(stream="pages", n_buckets=8)
    t = LakeTable(spark, str(tmp_path / "t"))

    # round 1: only events with lsn <= 400 have arrived
    got = sync_partitioned_log(
        spark, ev.filter(F.col("_ab_cdc_lsn") <= 400), t, cfg,
        compact_threshold=None,
    )
    offs1 = committed_offsets(t, "pages")
    assert got == offs1 and set(offs1) <= set(range(N_PARTS))
    assert all(o <= 400 for o in offs1.values())

    # round 2: the rest arrives; vector advances per partition
    sync_partitioned_log(spark, ev, t, cfg, compact_threshold=None)
    offs2 = committed_offsets(t, "pages")
    assert all(offs2[p] >= offs1.get(p, -1) for p in offs2)

    # converged: equals the plain winner replay
    expect = winner_window(ev.drop(PART_COL), drop_tombstones=True)
    final = t.read_live().select(*expect.columns)
    assert final.count() == expect.count()
    assert final.exceptAll(expect).count() == 0

    # nothing new -> no-op round
    assert sync_partitioned_log(spark, ev, t, cfg, compact_threshold=None) is None


def test_partition_lag_only_fast_partition_applies(spark, tmp_path):
    """One partition races ahead: the others' offsets stay put and
    their late events still apply next round (scalar watermarks cannot
    express this)."""
    ev = _plog(spark)
    cfg = SyncConfig(stream="pages", n_buckets=8)
    t = LakeTable(spark, str(tmp_path / "t"))
    fast = ev.filter(
        (F.col(PART_COL) == 0) | (F.col("_ab_cdc_lsn") <= 200)
    )
    sync_partitioned_log(spark, fast, t, cfg, compact_threshold=None)
    offs = committed_offsets(t, "pages")
    mx = {
        int(r[PART_COL]): int(r.mx)
        for r in ev.groupBy(PART_COL).agg(F.max("_ab_cdc_lsn").alias("mx")).collect()
    }
    assert offs[0] == mx[0]
    assert all(offs[p] <= 200 for p in offs if p != 0)
    # the laggards deliver: convergence
    sync_partitioned_log(spark, ev, t, cfg, compact_threshold=None)
    expect = winner_window(ev.drop(PART_COL), drop_tombstones=True)
    assert t.read_live().count() == expect.count()


def test_rerun_same_round_is_noop(spark, tmp_path):
    """Crash-after-commit replay: the same source state derives the
    same epoch key, so the round skips (exactly-once)."""
    ev = _plog(spark, n=400, n_urls=30)
    cfg = SyncConfig(stream="pages", n_buckets=8)
    t = LakeTable(spark, str(tmp_path / "t"))
    sync_partitioned_log(spark, ev, t, cfg, compact_threshold=None)
    v = t.current_version()
    # same log, same durable state -> same vector -> committed skip
    assert sync_partitioned_log(spark, ev, t, cfg, compact_threshold=None) is None
    assert t.current_version() == v


def test_late_cross_partition_delete_does_not_resurrect(spark, tmp_path):
    """Tombstones are retained (arrival order across partitions is
    arbitrary): re-delivering an old pre-delete image cannot
    resurrect the key."""
    import datetime as dt

    ts = dt.datetime(2021, 1, 1)
    schema = (
        f"url string, _ab_cdc_lsn long, _ab_cdc_updated_at timestamp, "
        f"_ab_cdc_deleted_at timestamp, _airbyte_ab_id string, "
        f"_airbyte_emitted_at timestamp, {PART_COL} int"
    )
    cfg = SyncConfig(stream="pages", n_buckets=4)
    t = LakeTable(spark, str(tmp_path / "t"))
    first = spark.createDataFrame(
        [("u", 1, ts, None, "a", ts, 0), ("u", 2, ts, ts, "b", ts, 0)], schema
    )
    sync_partitioned_log(spark, first, t, cfg, compact_threshold=None)
    assert t.read_live().count() == 0
    # the old insert image replays alone (offset 1 < committed 2: filtered)
    replay = spark.createDataFrame([("u", 1, ts, None, "a", ts, 0)], schema)
    assert sync_partitioned_log(spark, replay, t, cfg, compact_threshold=None) is None
    assert t.read_live().count() == 0


def test_missing_part_col_rejected(spark, tmp_path):
    ev = gen_change_events(spark, 50, n_urls=10).select(*COLS)
    t = LakeTable(spark, str(tmp_path / "t"))
    import pytest

    with pytest.raises(ValueError, match="_ab_part"):
        sync_partitioned_log(spark, ev, t, SyncConfig(stream="pages"))


def test_partitioned_log_through_read_catalog(spark, tmp_path):
    """A partitioned_log stream flows through the multi-stream loop;
    re-runs converge on the vector state."""
    from airbyte_integrations_spark.catalog_sync import (
        ConfiguredCatalog,
        ConfiguredStream,
        read_catalog,
        stream_table,
    )
    from airbyte_integrations_spark.config import DestinationSyncMode, SyncMode

    ev = _plog(spark, n=400, n_urls=30)
    log = str(tmp_path / "plog")
    ev.write.parquet(log)
    cs = ConfiguredStream(
        config=SyncConfig(
            stream="pages",
            sync_mode=SyncMode.INCREMENTAL,
            destination_sync_mode=DestinationSyncMode.APPEND_DEDUP,
            n_buckets=4,
        ),
        source={"kind": "partitioned_log", "path": log},
    )
    lake = str(tmp_path / "lake")
    read_catalog(spark, ConfiguredCatalog(streams=(cs,)), lake)
    t = stream_table(spark, lake, "pages")
    offs = committed_offsets(t, "pages")
    assert offs and len(offs) <= N_PARTS
    expect = winner_window(ev.drop(PART_COL), drop_tombstones=True)
    assert t.read_live().count() == expect.count()
    v = t.current_version()
    read_catalog(spark, ConfiguredCatalog(streams=(cs,)), lake)
    assert t.current_version() == v
