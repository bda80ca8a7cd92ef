"""Shared-WAL multi-stream sync with GLOBAL state
(catalog_sync.sync_shared_log).

Reference: a Debezium-based source tails ONE replication log for all
streams and checkpoints ONE offset for the connection —
PostgresCdcStateHandler.java:29-37 saveState (a single CdcState next to
the per-stream cursors), airbyte_protocol.py:260-266 (AirbyteStateMessage
`global` arm). The lock-step epoch loop here must: apply each epoch to
every member before the next, commit zero-row epochs for quiet members
(the shared offset never waits on a quiet stream), resume from the
MINIMUM member watermark after a mid-epoch crash without the ahead
member re-applying anything, and emit the GLOBAL state document only
after every member's durable commit."""

import pytest
from pyspark.sql import functions as F

from airbyte_integrations_spark.catalog_sync import (
    ConfiguredCatalog,
    ConfiguredStream,
    read_catalog,
    stream_table,
    sync_shared_log,
)
from airbyte_integrations_spark.config import (
    DestinationSyncMode,
    SyncConfig,
    SyncMode,
)
from airbyte_integrations_spark.gen import gen_change_events
from tests.util import assert_frames_equal, duckdb_winners

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


def _shared_log(spark, n_a=900, n_b=450, b_lsn=lambda c: 2 * c + 1):
    """Interleaved two-stream WAL: member a on even global lsns, member
    b on odd — one total lsn order, events genuinely interleaved."""
    a = (
        gen_change_events(spark, n_a, n_urls=40, seed="wal_a")
        .select(*COLS)
        .withColumn("_ab_cdc_lsn", 2 * F.col("_ab_cdc_lsn"))
        .withColumn("stream", F.lit("pages_a"))
    )
    b = (
        gen_change_events(spark, n_b, n_urls=25, seed="wal_b")
        .select(*COLS)
        .withColumn("_ab_cdc_lsn", b_lsn(F.col("_ab_cdc_lsn")))
        .withColumn("stream", F.lit("pages_b"))
    )
    return a.unionByName(b)


def _members(mode="cow"):
    return [
        ConfiguredStream(
            config=SyncConfig(stream=n, n_buckets=4, write_mode=mode),
            source={"kind": "cdc_shared", "group": "wal"},
        )
        for n in ("pages_a", "pages_b")
    ]


def _attach(members, log):
    return [
        ConfiguredStream(config=cs.config, source={**cs.source, "df": log})
        for cs in members
    ]


def _oracle(log_pdf, stream):
    member = log_pdf[log_pdf["stream"] == stream].drop(columns=["stream"])
    return duckdb_winners(member)


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_shared_sync_converges_and_emits_global_state(spark, tmp_path, mode):
    log = _shared_log(spark)
    streams = _attach(_members(mode), log)
    msgs = sync_shared_log(spark, streams, str(tmp_path), max_events_per_epoch=400)

    log_pdf = log.toPandas()
    hi = int(log_pdf["_ab_cdc_lsn"].max())
    for name in ("pages_a", "pages_b"):
        t = stream_table(spark, str(tmp_path), name)
        assert_frames_equal(t.read_live().toPandas(), _oracle(log_pdf, name))
        # lock-step epochs: both members committed the same epoch keys
        assert t.watermark(name) == hi
    keys_a = set(stream_table(spark, str(tmp_path), "pages_a").committed_epochs("pages_a"))
    keys_b = set(stream_table(spark, str(tmp_path), "pages_b").committed_epochs("pages_b"))
    assert keys_a == keys_b and all(k.startswith("g") for k in keys_a)
    # one GLOBAL document per epoch, derived offset == max lsn at the end
    assert len(msgs) == len(keys_a) >= 2
    last = msgs[-1]["state"]
    assert last["state_type"] == "GLOBAL"
    assert last["global"]["lsn_watermark"] == hi
    # intermediate documents are monotone in the derived offset
    offsets = [m["state"]["global"]["lsn_watermark"] for m in msgs]
    assert offsets == sorted(offsets)


def test_quiet_member_commits_zero_row_epochs(spark, tmp_path):
    # member b's events all live in the LOW half of the lsn space: the
    # later epochs are quiet for b, yet its offset must ride along
    log = _shared_log(spark, n_a=800, n_b=100, b_lsn=lambda c: 2 * c + 1)
    streams = _attach(_members(), log)
    sync_shared_log(spark, streams, str(tmp_path), max_events_per_epoch=300)
    hi = log.agg(F.max("_ab_cdc_lsn")).collect()[0][0]  # an a-event (even)
    tb = stream_table(spark, str(tmp_path), "pages_b")
    assert tb.watermark("pages_b") == hi  # advanced past its own max (201)
    log_pdf = log.toPandas()
    assert_frames_equal(tb.read_live().toPandas(), _oracle(log_pdf, "pages_b"))
    # zero-row epochs really committed (not skipped): same keys as a
    ta = stream_table(spark, str(tmp_path), "pages_a")
    assert set(tb.committed_epochs("pages_b")) == set(ta.committed_epochs("pages_a"))


def test_crash_mid_epoch_resume_converges(spark, tmp_path):
    log = _shared_log(spark)
    log_pdf = log.toPandas()

    class Boom(RuntimeError):
        pass

    seen = []

    def crash_after_second_a_commit(stream, key):
        seen.append((stream, key))
        # pages_a has committed epoch 2 but pages_b has not: members
        # disagree by one full epoch at the crash point
        if stream == "pages_a" and len({k for s, k in seen if s == "pages_a"}) == 2:
            raise Boom()

    streams = _attach(_members(), log)
    with pytest.raises(Boom):
        sync_shared_log(
            spark, streams, str(tmp_path), max_events_per_epoch=300,
            on_commit=crash_after_second_a_commit,
        )
    ta = stream_table(spark, str(tmp_path), "pages_a")
    tb = stream_table(spark, str(tmp_path), "pages_b")
    assert len(ta.committed_epochs("pages_a")) == len(tb.committed_epochs("pages_b")) + 1

    # resume: must converge to the oracle for BOTH members, with no
    # duplicate keys (the ahead member re-applies nothing)
    sync_shared_log(spark, streams, str(tmp_path), max_events_per_epoch=300)
    for name, t in (("pages_a", ta), ("pages_b", tb)):
        live = t.read_live().toPandas()
        assert live["url"].is_unique
        assert_frames_equal(live, _oracle(log_pdf, name))
        assert t.watermark(name) == int(log_pdf["_ab_cdc_lsn"].max())


def test_rerun_is_noop(spark, tmp_path):
    log = _shared_log(spark, n_a=400, n_b=200)
    streams = _attach(_members(), log)
    sync_shared_log(spark, streams, str(tmp_path), max_events_per_epoch=200)
    versions = {
        n: stream_table(spark, str(tmp_path), n).current_version()
        for n in ("pages_a", "pages_b")
    }
    msgs = sync_shared_log(spark, streams, str(tmp_path), max_events_per_epoch=200)
    assert msgs == []  # nothing past the derived global offset
    for n, v in versions.items():
        assert stream_table(spark, str(tmp_path), n).current_version() == v


def test_heartbeat_advances_every_member(spark, tmp_path):
    log = _shared_log(spark, n_a=300, n_b=150)
    hi = log.agg(F.max("_ab_cdc_lsn")).collect()[0][0]
    streams = _attach(_members(), log)
    msgs = sync_shared_log(
        spark, streams, str(tmp_path), max_events_per_epoch=200,
        heartbeat_position=hi + 5000,
    )
    assert msgs[-1]["state"]["global"]["lsn_watermark"] == hi + 5000
    for n in ("pages_a", "pages_b"):
        assert stream_table(spark, str(tmp_path), n).watermark(n) == hi + 5000
    # the advanced offset is durable: re-running plans nothing
    assert sync_shared_log(spark, streams, str(tmp_path), max_events_per_epoch=200) == []


def test_global_state_document_seeds_fresh_members(spark, tmp_path):
    log = _shared_log(spark, n_a=400, n_b=200)
    mid = 400  # exclusive floor: drop the low half of the WAL
    state = {
        "type": "STATE",
        "state": {"state_type": "GLOBAL", "global": {"lsn_watermark": mid}},
    }
    streams = _attach(_members(), log)
    sync_shared_log(spark, streams, str(tmp_path), state=state, max_events_per_epoch=200)
    log_pdf = log.toPandas()
    tail = log_pdf[log_pdf["_ab_cdc_lsn"] > mid]
    for name in ("pages_a", "pages_b"):
        t = stream_table(spark, str(tmp_path), name)
        assert_frames_equal(t.read_live().toPandas(), _oracle(tail, name))
        assert int(t.read_live().agg(F.min("_ab_cdc_lsn")).collect()[0][0]) > mid


def test_read_catalog_routes_shared_group(spark, tmp_path):
    log = _shared_log(spark, n_a=400, n_b=200)
    snap = gen_change_events(spark, 100, n_urls=20, seed="snap").select(*COLS)
    cat = ConfiguredCatalog(
        streams=(
            ConfiguredStream(  # ordinary solo stream rides along
                config=SyncConfig(
                    stream="snap",
                    sync_mode=SyncMode.FULL_REFRESH,
                    destination_sync_mode=DestinationSyncMode.OVERWRITE,
                    n_buckets=4,
                ),
                source={"kind": "dataframe", "df": snap},
            ),
            *_attach(_members(), log),
        )
    )
    committed = []
    msgs = read_catalog(
        spark, cat, str(tmp_path), max_events_per_epoch=300,
        on_stream_committed=committed.append,
    )
    # shared group first (incremental-first ordering), then the solo
    assert committed[:2] == ["pages_a", "pages_b"] and committed[-1] == "snap"
    kinds = [m["state"]["state_type"] for m in msgs]
    assert "GLOBAL" in kinds and kinds[-1] == "PER_STREAM"
    log_pdf = log.toPandas()
    for name in ("pages_a", "pages_b"):
        t = stream_table(spark, str(tmp_path), name)
        assert_frames_equal(t.read_live().toPandas(), _oracle(log_pdf, name))
    assert stream_table(spark, str(tmp_path), "snap").read().count() == 100


def test_member_validation(spark, tmp_path):
    log = _shared_log(spark, n_a=50, n_b=25)
    bad_mode = [
        ConfiguredStream(
            config=SyncConfig(stream="pages_a", sync_mode=SyncMode.FULL_REFRESH),
            source={"kind": "cdc_shared", "df": log},
        )
    ]
    with pytest.raises(ValueError, match="incremental/append_dedup"):
        sync_shared_log(spark, bad_mode, str(tmp_path))
    bad_cursor = [
        ConfiguredStream(
            config=SyncConfig(stream="pages_a", cursor_field=("_ab_cdc_log_pos",)),
            source={"kind": "cdc_shared", "df": log},
        ),
        ConfiguredStream(
            config=SyncConfig(stream="pages_b"),
            source={"kind": "cdc_shared", "df": log},
        ),
    ]
    with pytest.raises(ValueError, match="one shared"):
        sync_shared_log(spark, bad_cursor, str(tmp_path))
    with pytest.raises(ValueError, match="stream-routing"):
        sync_shared_log(
            spark,
            [
                ConfiguredStream(
                    config=SyncConfig(stream="pages_a"),
                    source={"kind": "cdc_shared", "df": log.drop("stream")},
                )
            ],
            str(tmp_path),
        )
