"""Debezium envelope codec: one-projection parse parity with
DebeziumEventUtils.java:22-65 (after-else-before base image, ts_ms
transaction stamp, delete => deleted_at), metadata-injector lsn
(PostgresCdcConnectorMetadataInjector.java:17-18), byte-exact
round-trip, real-envelope tolerance, and the catalog arm end-to-end."""

import json

from pyspark.sql import functions as F

from airbyte_integrations_spark.catalog_sync import (
    ConfiguredCatalog,
    ConfiguredStream,
    read_catalog,
    stream_table,
)
from airbyte_integrations_spark.config import SyncConfig
from airbyte_integrations_spark.gen import gen_change_events
from airbyte_integrations_spark.sources.debezium import (
    emit_debezium,
    mssql_lsn,
    parse_debezium,
)
from tests.util import assert_frames_equal, duckdb_winners

VALUE_DDL = "url string, text string, lang string"
VALUE_COLS = ["url", "text", "lang"]


def _events(spark, n=400, **kw):
    return gen_change_events(spark, n, n_urls=40, **kw).select(
        *VALUE_COLS,
        "_ab_cdc_lsn",
        "_ab_cdc_updated_at",
        "_ab_cdc_deleted_at",
        "_airbyte_ab_id",
        "_airbyte_emitted_at",
    )


def test_roundtrip_exact(spark):
    ev = _events(spark)
    lines = emit_debezium(ev, VALUE_COLS)
    back = parse_debezium(lines, VALUE_DDL)
    a = (
        ev.select(
            *VALUE_COLS,
            "_ab_cdc_lsn",
            F.unix_micros("_ab_cdc_updated_at").alias("upd_us"),
            F.unix_micros("_ab_cdc_deleted_at").alias("del_us"),
        )
        .toPandas()
    )
    b = (
        back.select(
            *VALUE_COLS,
            "_ab_cdc_lsn",
            F.unix_micros("_ab_cdc_updated_at").alias("upd_us"),
            F.unix_micros("_ab_cdc_deleted_at").alias("del_us"),
        )
        .toPandas()
    )
    assert_frames_equal(a, b, sort_cols=("_ab_cdc_lsn",))


def test_delete_carries_before_image_and_op(spark):
    ev = _events(spark, delete_pct=30)
    parsed = parse_debezium(emit_debezium(ev, VALUE_COLS), VALUE_DDL)
    dels = parsed.filter(F.col("_op") == "d")
    n_dels = ev.filter(F.col("_ab_cdc_deleted_at").isNotNull()).count()
    assert dels.count() == n_dels > 0
    # before image rides the delete (DebeziumEventUtils.java:50) and
    # deleted_at == the transaction stamp (:58-59)
    assert dels.filter(F.col("url").isNull() | F.col("text").isNull()).count() == 0
    assert (
        dels.filter(
            F.col("_ab_cdc_deleted_at") != F.col("_ab_cdc_updated_at")
        ).count()
        == 0
    )
    assert parsed.filter(F.col("_op") == "u").count() == parsed.count() - n_dels


def test_snapshot_rows_marked_read_op(spark):
    ev = _events(spark).withColumn(
        "_ab_cdc_lsn",
        F.when(F.col("_ab_cdc_lsn") <= 50, F.lit(0)).otherwise(
            F.col("_ab_cdc_lsn")
        ),
    ).filter(F.col("_ab_cdc_deleted_at").isNull())
    parsed = parse_debezium(
        emit_debezium(ev, VALUE_COLS, snapshot_lsn=0), VALUE_DDL
    )
    ops = {r["_op"] for r in parsed.select("_op").distinct().collect()}
    assert ops == {"r", "u"}
    assert (
        parsed.filter((F.col("_ab_cdc_lsn") == 0) & (F.col("_op") != "r")).count()
        == 0
    )


def test_real_envelope_shape_tolerated(spark):
    # a hand-written envelope with the extra source fields a live
    # Debezium connector emits, classic ts_ms-only precision, and an
    # unknown top-level key — all must parse (from_json ignores extras)
    env = {
        "before": None,
        "after": {"url": "https://x.example/1", "text": "hi", "lang": "en"},
        "source": {
            "version": "1.9.2.Final",
            "connector": "postgresql",
            "name": "wal",
            "ts_ms": 1700000000123,
            "snapshot": "false",
            "db": "crawl",
            "schema": "public",
            "table": "pages",
            "txId": 771,
            "lsn": 23783,
        },
        "op": "c",
        "ts_ms": 1700000000456,
        "transaction": None,
    }
    lines = spark.createDataFrame([(json.dumps(env),)], "value string")
    row = parse_debezium(lines, VALUE_DDL).collect()[0]
    assert row["url"] == "https://x.example/1"
    assert row["_ab_cdc_lsn"] == 23783
    assert row["_op"] == "c"
    # ts_ms-only => millisecond precision (classic Debezium)
    assert row["_ab_cdc_updated_at"].microsecond == 123000
    assert row["_ab_cdc_deleted_at"] is None


def test_catalog_debezium_kind_end_to_end(spark, tmp_path):
    ev = _events(spark, n=600)
    path = str(tmp_path / "dbz_jsonl")
    emit_debezium(ev, VALUE_COLS).write.text(path)
    cat = ConfiguredCatalog(
        streams=(
            ConfiguredStream(
                config=SyncConfig(stream="pages", n_buckets=4),
                source={
                    "kind": "debezium",
                    "path": path,
                    "value_schema": VALUE_DDL,
                },
            ),
        )
    )
    lake = str(tmp_path / "lake")
    read_catalog(spark, cat, lake, max_events_per_epoch=250)
    got = (
        stream_table(spark, lake, "pages")
        .read()
        .select(*VALUE_COLS, "_ab_cdc_lsn")
        .toPandas()
    )
    want = duckdb_winners(ev.toPandas())[VALUE_COLS + ["_ab_cdc_lsn"]]
    assert_frames_equal(got, want, sort_cols=("url",))
    # idempotent re-run: no new version
    t = stream_table(spark, lake, "pages")
    v = t.current_version()
    read_catalog(spark, cat, lake, max_events_per_epoch=250)
    assert stream_table(spark, lake, "pages").current_version() == v


def test_multi_table_envelope_log_global_state_sync(spark, tmp_path):
    """The literal Debezium connector shape: ONE envelope log carrying
    two tables' changes in one total lsn order, routed by source.table
    — decoded by shared_log_from_envelopes and synced lock-step with
    GLOBAL state through the cdc_shared machinery."""
    from airbyte_integrations_spark.sources.debezium import (
        shared_log_from_envelopes,
    )

    ev_a = _events(spark, n=500).withColumn(
        "_ab_cdc_lsn", 2 * F.col("_ab_cdc_lsn")
    ).withColumn("tbl", F.lit("pages_a"))
    ev_b = _events(spark, n=250).withColumn(
        "_ab_cdc_lsn", 2 * F.col("_ab_cdc_lsn") + 1
    ).withColumn("tbl", F.lit("pages_b"))
    wal = ev_a.unionByName(ev_b)
    path = str(tmp_path / "dbz_multi")
    emit_debezium(wal, VALUE_COLS, table_col="tbl").write.text(path)

    # decode routes on source.table
    log = shared_log_from_envelopes(spark, path, VALUE_DDL)
    assert set(
        r["stream"] for r in log.select("stream").distinct().collect()
    ) == {"pages_a", "pages_b"}

    members = tuple(
        ConfiguredStream(
            config=SyncConfig(stream=n, n_buckets=4),
            source={
                "kind": "cdc_shared",
                "group": "dbzwal",
                "debezium_path": path,
                "value_schema": VALUE_DDL,
            },
        )
        for n in ("pages_a", "pages_b")
    )
    lake = str(tmp_path / "lake")
    msgs = read_catalog(
        spark, ConfiguredCatalog(streams=members), lake,
        max_events_per_epoch=400,
    )
    assert msgs and all(m["state"]["state_type"] == "GLOBAL" for m in msgs)
    for name, src in (("pages_a", ev_a), ("pages_b", ev_b)):
        got = (
            stream_table(spark, lake, name)
            .read_live()
            .select(*VALUE_COLS, "_ab_cdc_lsn")
            .toPandas()
        )
        want = duckdb_winners(src.drop("tbl").toPandas())[
            VALUE_COLS + ["_ab_cdc_lsn"]
        ]
        assert_frames_equal(got, want, sort_cols=("url",))
    # idempotent re-run through the catalog arm
    assert (
        read_catalog(
            spark, ConfiguredCatalog(streams=members), lake,
            max_events_per_epoch=400,
        )
        == []
    )


# ---------------------------------------------------------------- MySQL
# dialect: composite (binlog file, pos) positions. The reference
# compares CDC positions file-name-first then byte offset
# (source-mysql/.../MySqlCdcTargetPosition.java:71-80) and injects the
# pair as _ab_cdc_log_file/_ab_cdc_log_pos
# (MySqlCdcConnectorMetadataInjector.java:17-20, MySqlSource.java:54-55).


def test_mysql_roundtrip_exact(spark):
    ev = _events(spark)
    lines = emit_debezium(ev, VALUE_COLS, dialect="mysql")
    back = parse_debezium(lines, VALUE_DDL, dialect="mysql")
    proj = lambda df: df.select(  # noqa: E731
        *VALUE_COLS,
        "_ab_cdc_lsn",
        F.unix_micros("_ab_cdc_updated_at").alias("upd_us"),
        F.unix_micros("_ab_cdc_deleted_at").alias("del_us"),
    ).toPandas()
    # default binlog_file_size = 2^40 => the re-parsed engine position
    # equals the input lsn exactly
    assert_frames_equal(proj(ev), proj(back), sort_cols=("_ab_cdc_lsn",))
    # injector-parity columns ride with the reference's exact names
    row = back.orderBy("_ab_cdc_lsn").limit(1).collect()[0]
    assert row["_ab_cdc_log_file"] == "mysql-bin.000000"
    assert row["_ab_cdc_log_pos"] == row["_ab_cdc_lsn"]


def test_mysql_rollover_preserves_order(spark):
    # small binlog_file_size forces many file rollovers; the folded
    # position must stay order-isomorphic to the source sequence
    ev = _events(spark, n=500).withColumn(
        "src_lsn", F.col("_ab_cdc_lsn")
    )
    lines = emit_debezium(
        ev, VALUE_COLS + ["src_lsn"], dialect="mysql", binlog_file_size=64
    )
    back = parse_debezium(
        lines, VALUE_DDL + ", src_lsn bigint", dialect="mysql"
    )
    assert back.select("_ab_cdc_log_file").distinct().count() > 3
    pdf = back.select("_ab_cdc_lsn", "src_lsn").toPandas()
    by_folded = pdf.sort_values("_ab_cdc_lsn")["src_lsn"].tolist()
    assert by_folded == sorted(by_folded)
    assert len(set(pdf["_ab_cdc_lsn"])) == len(pdf)


def test_mysql_file_then_pos_rule(spark):
    # an event early in a LATER binlog file outranks one late in an
    # EARLIER file — the composite rule, not pos alone
    def env(file, pos, text):
        return json.dumps(
            {
                "before": None,
                "after": {"url": "https://x.example/1", "text": text, "lang": "en"},
                "source": {
                    "version": "1.9.2.Final",
                    "connector": "mysql",
                    "name": "binlog",
                    "ts_ms": 1700000000123,
                    "snapshot": "false",
                    "db": "crawl",
                    "table": "pages",
                    "server_id": 223344,
                    "gtid": None,
                    "file": file,
                    "pos": pos,
                    "row": 0,
                    "thread": 7,
                    "query": None,
                },
                "op": "u",
                "ts_ms": 1700000000456,
            }
        )

    lines = spark.createDataFrame(
        [(env("mysql-bin.000003", 999_999, "old"),), (env("mysql-bin.000004", 4, "new"),)],
        "value string",
    )
    rows = {
        r["text"]: r
        for r in parse_debezium(lines, VALUE_DDL, dialect="mysql").collect()
    }
    assert rows["new"]["_ab_cdc_lsn"] > rows["old"]["_ab_cdc_lsn"]
    assert rows["old"]["_ab_cdc_log_file"] == "mysql-bin.000003"
    assert rows["old"]["_ab_cdc_log_pos"] == 999_999
    assert rows["new"]["_ab_cdc_lsn"] == 4 * (1 << 40) + 4


def test_mysql_delete_before_image(spark):
    env = {
        "before": {"url": "https://x.example/9", "text": "bye", "lang": "en"},
        "after": None,
        "source": {
            "ts_ms": 1700000000123,
            "ts_us": 1700000000123456,
            "file": "mysql-bin.000011",
            "pos": 52,
            "db": "crawl",
            "table": "pages",
        },
        "op": "d",
        "ts_ms": 1700000000456,
    }
    lines = spark.createDataFrame([(json.dumps(env),)], "value string")
    row = parse_debezium(lines, VALUE_DDL, dialect="mysql").collect()[0]
    assert row["url"] == "https://x.example/9"  # before image carried
    assert row["_ab_cdc_deleted_at"] is not None
    assert row["_ab_cdc_updated_at"].microsecond == 123456  # ts_us wins
    assert row["_ab_cdc_lsn"] == 11 * (1 << 40) + 52


def test_catalog_debezium_mysql_kind_end_to_end(spark, tmp_path):
    # rollover fixture (binlog_file_size=257): the synthesized position
    # differs from the source lsn but is order-isomorphic, so the final
    # table's payload winners must match the direct latest-wins replay
    ev = _events(spark, n=600)
    path = str(tmp_path / "dbz_mysql_jsonl")
    emit_debezium(ev, VALUE_COLS, dialect="mysql", binlog_file_size=257).write.text(path)
    cat = ConfiguredCatalog(
        streams=(
            ConfiguredStream(
                config=SyncConfig(stream="pages", n_buckets=4),
                source={
                    "kind": "debezium",
                    "path": path,
                    "value_schema": VALUE_DDL,
                    "dialect": "mysql",
                },
            ),
        )
    )
    lake = str(tmp_path / "lake")
    read_catalog(spark, cat, lake, max_events_per_epoch=250)
    got = (
        stream_table(spark, lake, "pages").read().select(*VALUE_COLS).toPandas()
    )
    want = duckdb_winners(ev.toPandas())[VALUE_COLS]
    assert_frames_equal(got, want, sort_cols=("url",))
    # idempotent re-run
    v = stream_table(spark, lake, "pages").current_version()
    read_catalog(spark, cat, lake, max_events_per_epoch=250)
    assert stream_table(spark, lake, "pages").current_version() == v


def test_malformed_line_policies(spark):
    """A corrupt WAL line must stop the sync by default ('error'),
    drop exactly itself under 'skip', and ride as an all-null row only
    under explicit 'permissive'."""
    import pytest

    ev = _events(spark, n=50)
    good = emit_debezium(ev, VALUE_COLS)
    bad = spark.createDataFrame(
        [("this is not json",), ('{"truncated": ',)], "value string"
    )
    lines = good.unionByName(bad)
    with pytest.raises(Exception, match="FAILFAST|Malformed"):
        parse_debezium(lines, VALUE_DDL).collect()
    skipped = parse_debezium(lines, VALUE_DDL, malformed="skip")
    assert skipped.count() == 50
    assert skipped.filter(F.col("url").isNull()).count() == 0
    kept = parse_debezium(lines, VALUE_DDL, malformed="permissive")
    assert kept.count() == 52
    assert kept.filter(F.col("url").isNull()).count() == 2
    with pytest.raises(ValueError, match="malformed"):
        parse_debezium(lines, VALUE_DDL, malformed="drop")


# ---------------------------------------------------------------- MSSQL
# dialect: 10-byte Lsn positions as colon-separated fixed-width hex.
# The reference compares them via io.debezium Lsn.compareTo
# (MssqlCdcTargetPosition.java:32-47) and injects the commit hex string
# as its _ab_cdc_lsn (MssqlCdcConnectorMetadataInjector.java:17-18,
# string-typed at MssqlSource.java:59,405).


def test_mssql_roundtrip_exact(spark):
    ev = _events(spark)
    lines = emit_debezium(ev, VALUE_COLS, dialect="mssql")
    back = parse_debezium(lines, VALUE_DDL, dialect="mssql")
    proj = lambda df: df.select(  # noqa: E731
        *VALUE_COLS,
        "_ab_cdc_lsn",
        F.unix_micros("_ab_cdc_updated_at").alias("upd_us"),
        F.unix_micros("_ab_cdc_deleted_at").alias("del_us"),
    ).toPandas()
    # hex inverse + fold are exact mutual inverses
    assert_frames_equal(proj(ev), proj(back), sort_cols=("_ab_cdc_lsn",))
    row = back.orderBy("_ab_cdc_lsn").limit(1).collect()[0]
    # autocommit fixture: commit == change; serial_no 1
    assert row["_ab_cdc_commit_lsn"].count(":") == 2
    assert row["_ab_cdc_event_serial_no"] == 1
    parts = row["_ab_cdc_commit_lsn"].split(":")
    assert (len(parts[0]), len(parts[1]), len(parts[2])) == (8, 8, 4)


def test_mssql_lsn_compare_rule(spark):
    """vlf-first, then block, then slot — a later VLF outranks any
    block/slot in an earlier one (Lsn.compareTo over the raw bytes)."""

    def env(commit, change, text):
        return json.dumps(
            {
                "before": None,
                "after": {"url": "https://x.example/1", "text": text, "lang": "en"},
                "source": {
                    "version": "1.9.6.Final", "connector": "sqlserver",
                    "name": "mssql", "ts_ms": 1700000000123,
                    "snapshot": "false", "db": "crawl", "schema": "dbo",
                    "table": "pages", "commit_lsn": commit,
                    "change_lsn": change, "event_serial_no": 1,
                },
                "op": "u",
                "ts_ms": 1700000000456,
            }
        )

    lines = spark.createDataFrame(
        [
            (env("00000025:00000448:0003", "00000025:00000448:0003", "old"),),
            (env("00000026:00000001:0001", "00000026:00000001:0001", "new"),),
            (env("00000025:00000448:0002", "00000025:00000448:0002", "older"),),
        ],
        "value string",
    )
    rows = {
        r["text"]: r
        for r in parse_debezium(lines, VALUE_DDL, dialect="mssql").collect()
    }
    assert rows["older"]["_ab_cdc_lsn"] < rows["old"]["_ab_cdc_lsn"]
    assert rows["old"]["_ab_cdc_lsn"] < rows["new"]["_ab_cdc_lsn"]
    assert rows["old"]["_ab_cdc_commit_lsn"] == "00000025:00000448:0003"
    assert rows["old"]["_ab_cdc_lsn"] == (0x25 << 36) + (0x448 << 10) + 3


def test_mssql_fold_budget_overflow_raises(spark):
    import pytest

    env = {
        "before": None,
        "after": {"url": "u", "text": "t", "lang": "en"},
        "source": {
            "ts_ms": 1, "commit_lsn": "10000000:00000000:0000",
            "change_lsn": "10000000:00000000:0000", "event_serial_no": 1,
            "table": "pages",
        },
        "op": "u", "ts_ms": 1,
    }
    lines = spark.createDataFrame([(json.dumps(env),)], "value string")
    with pytest.raises(Exception, match="fold budget"):
        parse_debezium(lines, VALUE_DDL, dialect="mssql").collect()


def test_mssql_commit_lsn_tx_alignment(spark):
    """commit_lsn groups a transaction's changes; the tx-aligned epoch
    planner over _ab_cdc_commit_lsn must never split one."""
    from airbyte_integrations_spark.streaming.microbatch import plan_epochs_tx

    ev = _events(spark, n=400).withColumn(
        "commit", (F.floor(F.col("_ab_cdc_lsn") / 7) + 1) * 7
    )
    lines = emit_debezium(ev, VALUE_COLS, dialect="mssql", commit_lsn_col="commit")
    back = parse_debezium(lines, VALUE_DDL, dialect="mssql")
    # commit hex >= change hex per row, equal only at tx end
    cmp = back.select(
        mssql_lsn("_ab_cdc_commit_lsn").alias("c"), F.col("_ab_cdc_lsn").alias("l")
    )
    assert cmp.filter(F.col("c") < F.col("l")).count() == 0
    epochs = plan_epochs_tx(back, None, 60, "_ab_cdc_commit_lsn")
    assert len(epochs) > 1
    spans = back.groupBy("_ab_cdc_commit_lsn").agg(
        F.min("_ab_cdc_lsn").alias("lo"), F.max("_ab_cdc_lsn").alias("hi")
    )
    for ep in epochs:
        split = spans.filter(
            (F.col("lo") <= F.lit(ep.to_lsn)) & (F.col("hi") > F.lit(ep.to_lsn))
        ).count()
        assert split == 0, (ep, "boundary splits a transaction")


def test_catalog_debezium_mssql_kind_end_to_end(spark, tmp_path):
    ev = _events(spark, n=600)
    path = str(tmp_path / "dbz_mssql_jsonl")
    emit_debezium(ev, VALUE_COLS, dialect="mssql").write.text(path)
    cat = ConfiguredCatalog(
        streams=(
            ConfiguredStream(
                config=SyncConfig(stream="pages", n_buckets=4),
                source={
                    "kind": "debezium",
                    "path": path,
                    "value_schema": VALUE_DDL,
                    "dialect": "mssql",
                },
            ),
        )
    )
    lake = str(tmp_path / "lake")
    read_catalog(spark, cat, lake, max_events_per_epoch=250)
    got = (
        stream_table(spark, lake, "pages").read().select(*VALUE_COLS).toPandas()
    )
    want = duckdb_winners(ev.toPandas())[VALUE_COLS]
    assert_frames_equal(got, want, sort_cols=("url",))
    v = stream_table(spark, lake, "pages").current_version()
    read_catalog(spark, cat, lake, max_events_per_epoch=250)
    assert stream_table(spark, lake, "pages").current_version() == v


def test_mssql_snapshot_null_change_lsn_coalesces_to_commit(spark):
    """Real SQL Server snapshot ('r') events carry change_lsn=null with
    only commit_lsn set (io.debezium SqlServer snapshot source block);
    the reference injects commit_lsn as its _ab_cdc_lsn
    (MssqlCdcConnectorMetadataInjector.java:17-18). The decode must
    coalesce to commit_lsn — never a silent null position that
    lsn-based epoch planning would drop or mis-order."""

    def env(commit, change, url, op):
        return json.dumps(
            {
                "before": None,
                "after": {"url": url, "text": "t", "lang": "en"},
                "source": {
                    "connector": "sqlserver", "ts_ms": 1700000000123,
                    "snapshot": "true" if op == "r" else "false",
                    "db": "crawl", "schema": "dbo", "table": "pages",
                    "commit_lsn": commit, "change_lsn": change,
                    "event_serial_no": 1,
                },
                "op": op,
                "ts_ms": 1700000000456,
            }
        )

    lines = spark.createDataFrame(
        [
            # snapshot read: change_lsn absent on the real wire
            (env("0000002a:00000100:0001", None, "https://x/1", "r"),),
            # streamed change after the snapshot
            (env("0000002b:00000010:0001", "0000002b:00000008:0002",
                 "https://x/2", "u"),),
        ],
        "value string",
    )
    rows = {
        r["url"]: r
        for r in parse_debezium(lines, VALUE_DDL, dialect="mssql").collect()
    }
    snap, streamed = rows["https://x/1"], rows["https://x/2"]
    assert snap["_ab_cdc_lsn"] == (0x2A << 36) + (0x100 << 10) + 1
    assert streamed["_ab_cdc_lsn"] == (0x2B << 36) + (0x8 << 10) + 2
    # the snapshot position (its commit) orders before the later change
    assert snap["_ab_cdc_lsn"] < streamed["_ab_cdc_lsn"]


def test_mssql_snapshot_coalesce_decoded_envelope_path(spark):
    """Mirror of the JSONL snapshot-coalesce test for envelopes that
    arrive ALREADY decoded as struct columns (the Avro/Kafka shape,
    events_from_decoded_envelopes): an MSSQL snapshot envelope with
    change_lsn=null must coalesce its position to commit_lsn — the
    'same rules' the docstring promises vs parse_debezium."""
    from airbyte_integrations_spark.sources.debezium import (
        events_from_decoded_envelopes,
    )

    schema = (
        "before struct<url:string,text:string,lang:string>, "
        "after struct<url:string,text:string,lang:string>, "
        "source struct<connector:string,ts_ms:long,ts_us:long,"
        "snapshot:string,db:string,`schema`:string,table:string,"
        "commit_lsn:string,change_lsn:string,event_serial_no:long>, "
        "op string, ts_ms long"
    )
    rows = [
        (  # snapshot read: change_lsn absent on the real wire
            None,
            ("https://x/1", "t", "en"),
            ("sqlserver", 1700000000123, None, "true", "crawl", "dbo",
             "pages", "0000002a:00000100:0001", None, 1),
            "r", 1700000000456,
        ),
        (  # streamed change after the snapshot
            None,
            ("https://x/2", "t", "en"),
            ("sqlserver", 1700000000123, None, "false", "crawl", "dbo",
             "pages", "0000002b:00000010:0001", "0000002b:00000008:0002", 1),
            "u", 1700000000456,
        ),
    ]
    decoded = spark.createDataFrame(rows, schema)
    out = {
        r["url"]: r
        for r in events_from_decoded_envelopes(decoded, dialect="mssql").collect()
    }
    snap, streamed = out["https://x/1"], out["https://x/2"]
    assert snap["_ab_cdc_lsn"] == (0x2A << 36) + (0x100 << 10) + 1
    assert streamed["_ab_cdc_lsn"] == (0x2B << 36) + (0x8 << 10) + 2
    assert snap["_ab_cdc_lsn"] < streamed["_ab_cdc_lsn"]


def test_mssql_hex_rendering_is_lowercase_wire_identical(spark):
    """Emitted hex must match io.debezium Lsn.toString byte-for-byte —
    lowercase fixed-width (8/8/4) — so fixtures are wire-identical to
    genuine logs, and the codec round-trips either case."""
    from airbyte_integrations_spark.sources.debezium import (
        mssql_lsn,
        mssql_lsn_hex,
    )

    val = (0xABC << 36) + (0xDEF << 10) + 0x3A
    df = spark.range(1).select(F.lit(val).alias("lsn"))
    rendered = df.select(mssql_lsn_hex("lsn").alias("h")).collect()[0]["h"]
    assert rendered == "00000abc:00000def:003a"
    for h in (rendered, rendered.upper()):
        back = (
            spark.range(1)
            .select(mssql_lsn(F.lit(h)).alias("l"))
            .collect()[0]["l"]
        )
        assert back == val
