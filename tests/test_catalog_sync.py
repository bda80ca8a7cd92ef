"""Multi-stream catalog orchestration (AbstractSource.read parity):
incremental-before-full-refresh ordering, combined PER_STREAM state
after each durable commit, kill-and-resume mid-catalog, and a live
JDBC-discovered stream in the mix."""

import os
import time

import pytest
from pyspark.sql import functions as F

from airbyte_integrations_spark.catalog_sync import (
    ConfiguredCatalog,
    ConfiguredStream,
    catalog_state_message,
    file_mtime_cursor,
    jdbc_streams_from_discovery,
    ordered_streams,
    read_catalog,
    stream_table,
)
from airbyte_integrations_spark.config import DestinationSyncMode, SyncConfig, SyncMode
from airbyte_integrations_spark.gen import gen_change_events
from tests.util import duckdb_winners

COLS = [
    "url", "warc_ts", "text", "lang",
    "_ab_cdc_lsn", "_ab_cdc_updated_at", "_ab_cdc_deleted_at",
    "_airbyte_ab_id", "_airbyte_emitted_at",
]

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_db(spark, tmp_path_factory):
    db = str(tmp_path_factory.mktemp("derby-cat") / "catdb")
    url = f"jdbc:derby:{db};create=true"
    jvm = spark._jvm
    jvm.java.lang.Class.forName(DERBY_DRIVER)
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.execute(
        "CREATE TABLE accounts (id BIGINT NOT NULL, name VARCHAR(50), "
        "ver BIGINT, PRIMARY KEY (id))"
    )
    ins = conn.prepareStatement("INSERT INTO accounts VALUES (?, ?, ?)")
    for i in range(1, 51):
        ins.setLong(1, i)
        ins.setString(2, f"acct{i}")
        ins.setLong(3, i)
        ins.executeUpdate()
    st.close()
    conn.close()
    return f"jdbc:derby:{db}"


def _cdc_log(spark, tmp_path, name, n=600, n_urls=30):
    ev = gen_change_events(spark, n, n_urls=n_urls).select(*COLS)
    path = str(tmp_path / f"log_{name}")
    ev.write.parquet(path)
    return ev, path


def _files_root(spark, tmp_path, name):
    root = str(tmp_path / f"files_{name}")
    df = spark.range(20).select(
        F.concat(F.lit("r"), F.col("id")).alias("rid"), F.col("id").alias("v")
    )
    df.coalesce(1).write.parquet(root)
    t = time.time() - 120
    for fn in os.listdir(root):
        if fn.endswith(".parquet"):
            os.utime(os.path.join(root, fn), (t, t))
    return root


def _catalog(spark, tmp_path, derby_url, log_path, files_root):
    cdc = ConfiguredStream(
        config=SyncConfig(stream="pages", n_buckets=4),
        source={"kind": "cdc_log", "path": log_path},
    )
    (jdbc,) = jdbc_streams_from_discovery(
        spark, derby_url, driver=DERBY_DRIVER,
        cursor_overrides={"APP.ACCOUNTS": "VER"}, n_buckets=4,
    )
    files = ConfiguredStream(
        config=SyncConfig(
            stream="drops",
            primary_key=("rid",),
            sync_mode=SyncMode.INCREMENTAL,
            destination_sync_mode=DestinationSyncMode.APPEND,
            n_buckets=4,
        ),
        source={"kind": "files", "root": files_root, "format": "parquet"},
    )
    snap = ConfiguredStream(
        config=SyncConfig(
            stream="pages_snapshot",
            sync_mode=SyncMode.FULL_REFRESH,
            destination_sync_mode=DestinationSyncMode.OVERWRITE,
            n_buckets=4,
        ),
        source={"kind": "cdc_log", "path": log_path},
    )
    return ConfiguredCatalog(streams=(snap, cdc, jdbc, files))


def test_ordering_incremental_before_full_refresh(spark, tmp_path, derby_db):
    _ev, log = _cdc_log(spark, tmp_path, "ord")
    root = _files_root(spark, tmp_path, "ord")
    cat = _catalog(spark, tmp_path, derby_db, log, root)
    names = [s.config.stream for s in ordered_streams(cat)]
    # full-refresh snapshot was FIRST in the catalog but runs LAST
    # (AbstractDbSource.java:135-140); incrementals keep catalog order
    assert names == ["pages", "app_accounts", "drops", "pages_snapshot"]


def test_catalog_sync_four_streams_mixed_modes(spark, tmp_path, derby_db):
    ev, log = _cdc_log(spark, tmp_path, "mix")
    root = _files_root(spark, tmp_path, "mix")
    cat = _catalog(spark, tmp_path, derby_db, log, root)
    lake = str(tmp_path / "lake")

    msgs = read_catalog(spark, cat, lake, max_events_per_epoch=300)
    # one combined STATE per stream, each carrying ALL catalog streams
    assert len(msgs) == 4
    for m in msgs:
        assert m["state"]["state_type"] == "PER_STREAM"
        assert {e["name"] for e in m["state"]["streams"]} == {
            "pages", "pages_snapshot", "app_accounts", "drops"
        }
    # state is cumulative: the last message has every stream committed
    final = {e["name"]: e["state"] for e in msgs[-1]["state"]["streams"]}
    assert all(s["n_epochs_committed"] >= 1 for s in final.values())

    # stream 1: CDC append_dedup == winner oracle
    got = stream_table(spark, lake, "pages").read().toPandas()
    want = duckdb_winners(ev.toPandas())
    assert sorted(got["url"]) == sorted(want["url"])

    # stream 2: JDBC incremental — all 50 rows landed, keyed by id
    acct = stream_table(spark, lake, "app_accounts").read().toPandas()
    assert len(acct) == 50
    assert final["app_accounts"]["lsn_watermark"] == 50  # max(ver)

    # stream 3: file append — all 20 rows + the file cursor in state
    drops = stream_table(spark, lake, "drops").read().toPandas()
    assert len(drops) == 20
    assert final["drops"]["file_mtime_cursor"] is not None

    # stream 4: full-refresh overwrite snapshot
    snap = stream_table(spark, lake, "pages_snapshot").read().toPandas()
    assert len(snap) == ev.count()


def test_catalog_resync_is_incremental_noop(spark, tmp_path, derby_db):
    _ev, log = _cdc_log(spark, tmp_path, "noop")
    root = _files_root(spark, tmp_path, "noop")
    cat = _catalog(spark, tmp_path, derby_db, log, root)
    lake = str(tmp_path / "lake")
    read_catalog(spark, cat, lake, max_events_per_epoch=300)

    versions = {
        s.config.stream: stream_table(spark, lake, s.config.stream).current_version()
        for s in cat.streams
    }
    read_catalog(spark, cat, lake, max_events_per_epoch=300)
    for s in cat.streams:
        t = stream_table(spark, lake, s.config.stream)
        if s.config.sync_mode == SyncMode.INCREMENTAL:
            # no new source data: nothing re-applied (exactly-once)
            assert t.current_version() == versions[s.config.stream], s.config.stream
        else:
            # full refresh always re-snapshots (reference semantics)
            assert t.current_version() > versions[s.config.stream]


def test_kill_and_resume_mid_catalog_converges(spark, tmp_path, derby_db):
    ev, log = _cdc_log(spark, tmp_path, "kill")
    root = _files_root(spark, tmp_path, "kill")
    cat = _catalog(spark, tmp_path, derby_db, log, root)
    lake = str(tmp_path / "lake")

    class Crash(Exception):
        pass

    def die_after_first(stream_name):
        if stream_name == "pages":
            raise Crash()

    with pytest.raises(Crash):
        read_catalog(spark, cat, lake, max_events_per_epoch=300,
                     on_stream_committed=die_after_first)

    # only the first incremental stream committed
    assert stream_table(spark, lake, "pages").exists()
    assert not stream_table(spark, lake, "app_accounts").exists()
    v_pages = stream_table(spark, lake, "pages").current_version()

    # resume: completed stream is a no-op, the rest run fresh
    msgs = read_catalog(spark, cat, lake, max_events_per_epoch=300)
    assert len(msgs) == 4
    assert stream_table(spark, lake, "pages").current_version() == v_pages
    got = stream_table(spark, lake, "pages").read().toPandas()
    want = duckdb_winners(ev.toPandas())
    assert sorted(got["url"]) == sorted(want["url"])
    assert stream_table(spark, lake, "app_accounts").read().count() == 50
    assert stream_table(spark, lake, "drops").read().count() == 20


def test_jdbc_stream_picks_up_new_rows_only(spark, tmp_path, derby_db):
    _ev, log = _cdc_log(spark, tmp_path, "jd")
    root = _files_root(spark, tmp_path, "jd")
    cat = _catalog(spark, tmp_path, derby_db, log, root)
    lake = str(tmp_path / "lake")
    read_catalog(spark, cat, lake, max_events_per_epoch=300)

    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(derby_db)
    st = conn.createStatement()
    # one new row and one update (higher ver) — both must land; the
    # update must replace, not duplicate (append_dedup winner rule)
    st.executeUpdate("INSERT INTO accounts VALUES (51, 'acct51', 60)")
    st.executeUpdate("UPDATE accounts SET name='acct7-v2', ver=61 WHERE id=7")
    st.close()
    conn.close()

    read_catalog(spark, cat, lake, max_events_per_epoch=300)
    acct = stream_table(spark, lake, "app_accounts").read().toPandas()
    assert len(acct) == 51
    assert acct.set_index("url").loc["7", "NAME"] == "acct7-v2"


def test_file_stream_mtime_cursor_durable(spark, tmp_path, derby_db):
    _ev, log = _cdc_log(spark, tmp_path, "fc")
    root = _files_root(spark, tmp_path, "fc")
    cat = _catalog(spark, tmp_path, derby_db, log, root)
    lake = str(tmp_path / "lake")
    read_catalog(spark, cat, lake, max_events_per_epoch=300)
    t = stream_table(spark, lake, "drops")
    c1 = file_mtime_cursor(t, "drops")
    assert c1 is not None

    # a NEW file arrives (newer mtime): only its rows append
    df = spark.range(100, 105).select(
        F.concat(F.lit("r"), F.col("id")).alias("rid"), F.col("id").alias("v")
    )
    extra = str(tmp_path / "extra")
    df.coalesce(1).write.parquet(extra)
    for fn in os.listdir(extra):
        if fn.endswith(".parquet"):
            os.rename(os.path.join(extra, fn), os.path.join(root, "late_" + fn))
    read_catalog(spark, cat, lake, max_events_per_epoch=300)
    assert t.read().count() == 25
    assert file_mtime_cursor(t, "drops").cursor > c1.cursor
    # re-running with nothing new: cursor unchanged, no new rows
    read_catalog(spark, cat, lake, max_events_per_epoch=300)
    assert t.read().count() == 25


def test_state_seeding_fresh_lake(spark, tmp_path, derby_db):
    """A state document from another deployment seeds a FRESH lake:
    streams resume past the seeded watermark instead of re-reading."""
    ev, log = _cdc_log(spark, tmp_path, "seed")
    root = _files_root(spark, tmp_path, "seed")
    cat = _catalog(spark, tmp_path, derby_db, log, root)
    lake1 = str(tmp_path / "lake1")
    read_catalog(spark, cat, lake1, max_events_per_epoch=300)
    state = catalog_state_message(spark, cat, lake1)

    lake2 = str(tmp_path / "lake2")
    read_catalog(spark, cat, lake2, state=state, max_events_per_epoch=300)
    # the CDC stream in lake2 skipped everything at-or-below lake1's
    # watermark: nothing to apply => table never created
    wm = next(
        e["state"]["lsn_watermark"]
        for e in state["state"]["streams"] if e["name"] == "pages"
    )
    t2 = stream_table(spark, lake2, "pages")
    if t2.exists():
        assert t2.read().agg(F.min("_ab_cdc_lsn")).first()[0] > wm
    # file stream honored the seeded mtime cursor the same way
    assert not stream_table(spark, lake2, "drops").exists()


def test_global_state_flavor_min_watermark(spark, tmp_path, derby_db):
    """GLOBAL arm: one shared offset for the whole WAL — the MINIMUM
    watermark across streams (CdcStateManager.java:13-33 single
    CdcState; resuming a laggard from a higher shared offset would
    skip its events)."""
    _ev, log = _cdc_log(spark, tmp_path, "gl")
    root = _files_root(spark, tmp_path, "gl")
    cat = _catalog(spark, tmp_path, derby_db, log, root)
    lake = str(tmp_path / "lake")
    read_catalog(spark, cat, lake, max_events_per_epoch=300)
    g = catalog_state_message(spark, cat, lake, flavor="GLOBAL")
    assert g["state"]["state_type"] == "GLOBAL"
    per = catalog_state_message(spark, cat, lake)
    wms = [
        e["state"]["lsn_watermark"]
        for e in per["state"]["streams"]
        if e["state"]["lsn_watermark"] is not None
    ]
    assert g["state"]["global"]["lsn_watermark"] == min(wms)
    assert g["state"]["global"]["n_epochs_committed"] == sum(
        e["state"]["n_epochs_committed"] for e in per["state"]["streams"]
    )


def test_concurrent_catalog_matches_serial(spark, tmp_path, derby_db):
    """max_concurrency > 1: streams sync concurrently in two waves
    (incremental, then full-refresh) and the final lake state is
    identical to a serial run — each stream owns its table, commits
    stay epoch-keyed idempotent, and one combined STATE per commit
    still goes out (commit order, not catalog order)."""
    ev, log = _cdc_log(spark, tmp_path, "conc")
    root = _files_root(spark, tmp_path, "conc")
    cat = _catalog(spark, tmp_path, derby_db, log, root)

    lake_ser = str(tmp_path / "lake_ser")
    lake_con = str(tmp_path / "lake_con")
    read_catalog(spark, cat, lake_ser, max_events_per_epoch=300)
    committed = []
    msgs = read_catalog(
        spark, cat, lake_con, max_events_per_epoch=300,
        max_concurrency=4, on_stream_committed=committed.append,
    )
    assert len(msgs) == 4
    # wave ordering: every incremental commit precedes every
    # full-refresh commit, whatever the within-wave interleaving
    assert committed[-1] == "pages_snapshot"
    assert set(committed[:3]) == {"pages", "app_accounts", "drops"}
    for name in ("pages", "pages_snapshot", "app_accounts", "drops"):
        a = stream_table(spark, lake_ser, name).read().toPandas()
        b = stream_table(spark, lake_con, name).read().toPandas()
        cols = sorted(a.columns)
        pa = a[cols].sort_values(cols).reset_index(drop=True)
        pb = b[cols].sort_values(cols).reset_index(drop=True)
        assert pa.equals(pb), name

    # concurrent RE-RUN on the already-synced lake: epoch no-ops
    before = {
        n: stream_table(spark, lake_con, n).current_version()
        for n in ("pages", "app_accounts", "drops")
    }
    read_catalog(spark, cat, lake_con, max_events_per_epoch=300, max_concurrency=4)
    for n, v in before.items():
        assert stream_table(spark, lake_con, n).current_version() == v, n


def test_pre_history_file_epochs_keep_strict_cursor(spark, tmp_path, derby_db):
    """Migration edge: a table whose committed file epochs predate the
    history (no file_history key) must keep the legacy strictly->
    rule — an empty-history FileState would re-append the at-cursor
    files on the first post-upgrade sync."""
    import datetime as dt

    from airbyte_integrations_spark.sources.files import FileState

    _ev, log = _cdc_log(spark, tmp_path, "ph")
    root = _files_root(spark, tmp_path, "ph")
    cat = _catalog(spark, tmp_path, derby_db, log, root)
    lake = str(tmp_path / "lake")
    read_catalog(spark, cat, lake, max_events_per_epoch=300)
    t = stream_table(spark, lake, "drops")
    n1 = t.read().count()
    # rewrite the committed meta to the PRE-history shape (cursor only)
    m = t.manifest()
    for meta in m["committed"]["drops"].values():
        meta.pop("file_history", None)
    # commit protocol: pin parent to the version this rewrite derives
    # from (the manifest copy inherits ITS parent, one version back)
    m["parent"] = t.current_version()
    t._commit(m)
    st = file_mtime_cursor(t, "drops")
    assert isinstance(st, dt.datetime) and not isinstance(st, FileState)
    # re-run: nothing re-appends under the legacy strict-> rule
    read_catalog(spark, cat, lake, max_events_per_epoch=300)
    assert t.read().count() == n1


def test_wire_stream_through_read_catalog(spark, tmp_path):
    """A 'wire' stream (another connector's JSONL output) flows through
    the catalog loop; with no declared schema, discovery samples the
    documents (infer_record_schema)."""
    import json as _json

    from airbyte_integrations_spark.sources.airbyte_wire import write_messages

    df = spark.createDataFrame(
        [(1, "a", 0.5), (2, "b", 1.5), (2, "b2", 2.5)],
        "id long, name string, score double",
    )
    out = str(tmp_path / "wire_src")
    write_messages(df, out, stream="things", emitted_at_millis=1_600_000_000_000)

    cs = ConfiguredStream(
        config=SyncConfig(
            stream="things",
            primary_key=("id",),
            cursor_field=("score",),
            sync_mode=SyncMode.FULL_REFRESH,
            destination_sync_mode=DestinationSyncMode.OVERWRITE,
            n_buckets=4,
        ),
        source={"kind": "wire", "path": out},  # schema inferred
    )
    lake = str(tmp_path / "lake")
    read_catalog(spark, ConfiguredCatalog(streams=(cs,)), lake)
    t = stream_table(spark, lake, "things")
    got = {(r.id, r.name) for r in t.read().select("id", "name").collect()}
    assert got == {(1, "a"), (2, "b"), (2, "b2")}
    # re-run converges (overwrite refresh)
    read_catalog(spark, ConfiguredCatalog(streams=(cs,)), lake)
    assert t.read().count() == 3


def test_emit_catalog_roundtrip(spark, tmp_path):
    """Lake-as-source: emit_catalog writes each stream's live rows as
    wire RECORD messages + lifecycle traces + one trailing combined
    STATE; a second engine ingests the emitted wire and reproduces the
    tables (the produce->consume wire roundtrip at catalog scope)."""
    from airbyte_integrations_spark.catalog_sync import emit_catalog
    from airbyte_integrations_spark.sources.airbyte_wire import (
        read_messages,
        records_for_stream,
        stream_statuses,
    )

    ev, log = _cdc_log(spark, tmp_path, "emit", n=400, n_urls=25)
    cs = ConfiguredStream(
        config=SyncConfig(stream="pages", n_buckets=4),
        source={"kind": "cdc_log", "path": log},
    )
    cat = ConfiguredCatalog(streams=(cs,))
    lake = str(tmp_path / "lake")
    read_catalog(spark, cat, lake, max_events_per_epoch=200)
    t = stream_table(spark, lake, "pages")
    want = t.read_live()

    out = str(tmp_path / "wire_out")
    state = emit_catalog(spark, cat, lake, out, emitted_at_millis=1_600_000_000_000)
    assert state["state"]["state_type"] == "PER_STREAM"

    msgs = read_messages(spark, str(tmp_path / "wire_out" / "pages"))
    st = [(r.stream, r.status) for r in stream_statuses(msgs).collect()]
    assert st == [("pages", "STARTED"), ("pages", "COMPLETE")]
    back = records_for_stream(msgs, "pages", want.schema)
    assert back.count() == want.count()
    got = {(r.url, r._ab_cdc_lsn) for r in back.select("url", "_ab_cdc_lsn").collect()}
    exp = {(r.url, r._ab_cdc_lsn) for r in want.select("url", "_ab_cdc_lsn").collect()}
    assert got == exp
