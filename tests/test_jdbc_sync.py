"""Slice-planned incremental JDBC sync on live Derby: DB-side slice
predicates, one STATE checkpoint per slice, kill-and-resume from a
mid-slice checkpoint with no loss or duplication."""

import pytest
from pyspark.sql import functions as F

from airbyte_integrations_spark.config import SyncConfig
from airbyte_integrations_spark.lakehouse.table import LakeTable
from airbyte_integrations_spark.sources.jdbc import JdbcSource, JdbcSourceConfig
from airbyte_integrations_spark.sources.jdbc_sync import (
    plan_cursor_slices,
    sync_jdbc_incremental,
)

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture()
def derby(spark, tmp_path):
    db = str(tmp_path / "slicedb")
    url = f"jdbc:derby:{db};create=true"
    jvm = spark._jvm
    jvm.java.lang.Class.forName(DERBY_DRIVER)
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.execute(
        "CREATE TABLE items (id BIGINT NOT NULL, body VARCHAR(80), seq BIGINT)"
    )
    ins = conn.prepareStatement("INSERT INTO items VALUES (?, ?, ?)")
    # 400 rows, cursor seq = 1..400; ids cycle so later seqs UPDATE
    for s in range(1, 401):
        ins.setLong(1, (s - 1) % 120)
        ins.setString(2, f"body-{s}")
        ins.setLong(3, s)
        ins.executeUpdate()
    st.close()
    conn.close()
    return f"jdbc:derby:{db}"


def _src(spark, url):
    return JdbcSource(spark, JdbcSourceConfig(url=url, table="items", driver=DERBY_DRIVER))


def test_plan_slices_db_side(spark, derby):
    src = _src(spark, derby)
    slices = plan_cursor_slices(src, "SEQ", "BIGINT", None, rows_per_slice=100)
    # 400 rows / 100 per slice -> 4 slices covering (0, 400]
    assert len(slices) == 4
    assert slices[0][0] == 0 and slices[-1][1] == 400
    # disjoint, contiguous, monotone
    for (a, b), (c, d) in zip(slices, slices[1:]):
        assert b == c and a < b
    # above a watermark: only the tail is planned
    tail = plan_cursor_slices(src, "SEQ", "BIGINT", 300, rows_per_slice=100)
    assert tail and tail[0][0] == 300 and tail[-1][1] == 400


def test_sliced_sync_converges_with_per_slice_state(spark, derby, tmp_path):
    src = _src(spark, derby)
    table = LakeTable(spark, str(tmp_path / "lake"))
    cfg = SyncConfig(stream="items", n_buckets=4)
    msgs = sync_jdbc_incremental(
        spark, src, table, cfg, key_col="ID", cursor_col="SEQ",
        jdbc_type="BIGINT", rows_per_slice=100,
    )
    # one STATE per committed slice, watermark strictly advancing
    assert len(msgs) == 4
    wms = [m["state"]["streams"][0]["state"]["lsn_watermark"] for m in msgs]
    assert wms == sorted(wms) and wms[-1] == 400
    # final state: one row per id, winner = max seq
    got = table.read().toPandas()
    assert len(got) == 120
    assert int(got["_ab_cdc_lsn"].min()) >= 281  # last cycle wins
    assert got.loc[got["url"] == "0", "BODY"].iloc[0] == "body-361"


def test_kill_and_resume_mid_slice_checkpoint(spark, derby, tmp_path):
    """Stop after 2 of 4 slices (a killed sync); re-run must apply ONLY
    the remaining slices and converge to the same final state as an
    uninterrupted sync."""
    src = _src(spark, derby)
    table = LakeTable(spark, str(tmp_path / "lake"))
    cfg = SyncConfig(stream="items", n_buckets=4)
    first = sync_jdbc_incremental(
        spark, src, table, cfg, key_col="ID", cursor_col="SEQ",
        jdbc_type="BIGINT", rows_per_slice=100, max_slices=2,
    )
    assert len(first) == 2
    assert table.watermark("items") == 200
    v_mid = table.current_version()

    rest = sync_jdbc_incremental(
        spark, src, table, cfg, key_col="ID", cursor_col="SEQ",
        jdbc_type="BIGINT", rows_per_slice=100,
    )
    # resumed run planned only the unread tail
    assert len(rest) == 2
    assert table.watermark("items") == 400
    assert table.current_version() > v_mid

    # identical to an uninterrupted sync (no loss, no dup)
    ref = LakeTable(spark, str(tmp_path / "ref"))
    sync_jdbc_incremental(
        spark, src, ref, cfg, key_col="ID", cursor_col="SEQ",
        jdbc_type="BIGINT", rows_per_slice=100,
    )
    a = table.read().toPandas().sort_values("url").reset_index(drop=True)
    b = ref.read().toPandas().sort_values("url").reset_index(drop=True)
    assert list(a["_airbyte_ab_id"]) == list(b["_airbyte_ab_id"])

    # re-running with no new data: zero slices, zero commits
    v = table.current_version()
    assert sync_jdbc_incremental(
        spark, src, table, cfg, key_col="ID", cursor_col="SEQ",
        jdbc_type="BIGINT", rows_per_slice=100,
    ) == []
    assert table.current_version() == v


def test_new_rows_after_sync_resume_from_watermark(spark, derby, tmp_path):
    src = _src(spark, derby)
    table = LakeTable(spark, str(tmp_path / "lake"))
    cfg = SyncConfig(stream="items", n_buckets=4)
    sync_jdbc_incremental(spark, src, table, cfg, key_col="ID",
                          cursor_col="SEQ", jdbc_type="BIGINT",
                          rows_per_slice=100)
    conn = spark._jvm.java.sql.DriverManager.getConnection(derby)
    st = conn.createStatement()
    st.executeUpdate("INSERT INTO items VALUES (0, 'body-next', 500)")
    st.close()
    conn.close()
    msgs = sync_jdbc_incremental(spark, src, table, cfg, key_col="ID",
                                 cursor_col="SEQ", jdbc_type="BIGINT",
                                 rows_per_slice=100)
    assert len(msgs) == 1
    assert table.watermark("items") == 500
    got = table.read().toPandas()
    assert len(got) == 120  # update, not insert
    assert got.loc[got["url"] == "0", "BODY"].iloc[0] == "body-next"


def test_timestamp_cursor_slices_round_trip(spark, tmp_path):
    """TIMESTAMP cursors slice through microsecond lsn space and
    resume exactly (no same-second collapse)."""
    db = str(tmp_path / "tsdb")
    url = f"jdbc:derby:{db};create=true"
    jvm = spark._jvm
    jvm.java.lang.Class.forName(DERBY_DRIVER)
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.execute("CREATE TABLE logs (id BIGINT NOT NULL, ts TIMESTAMP)")
    ins = conn.prepareStatement("INSERT INTO logs VALUES (?, ?)")
    for i in range(10):
        ins.setLong(1, i)
        # same second, distinct microseconds
        ins.setTimestamp(2, jvm.java.sql.Timestamp.valueOf(
            f"2024-03-01 12:00:00.{i:06d}"))
        ins.executeUpdate()
    st.close()
    conn.close()
    src = JdbcSource(spark, JdbcSourceConfig(
        url=f"jdbc:derby:{db}", table="logs", driver=DERBY_DRIVER))
    table = LakeTable(spark, str(tmp_path / "lake"))
    cfg = SyncConfig(stream="logs", n_buckets=2)
    msgs = sync_jdbc_incremental(
        spark, src, table, cfg, key_col="ID", cursor_col="TS",
        jdbc_type="TIMESTAMP", rows_per_slice=1000,
    )
    assert msgs and table.read().count() == 10
    # microsecond watermark; re-sync is a no-op
    assert table.watermark("logs") % 1_000_000 == 9
    assert sync_jdbc_incremental(
        spark, src, table, cfg, key_col="ID", cursor_col="TS",
        jdbc_type="TIMESTAMP", rows_per_slice=1000,
    ) == []
