"""CLI entrypoint contract: the reference's AirbyteEntrypoint argv +
stdout-JSONL protocol (airbyte-cdk entrypoint.py; base-java
IntegrationRunner): spec / check / discover / read subcommands, RECORD
+ STATE + STREAM_STATUS emission order, state-seeded incremental
resume, catalog validation."""

import io
import json

import pytest
from pyspark.sql import functions as F

from airbyte_integrations_spark.entrypoint import (
    configured_catalog_from_json,
    run,
)
from airbyte_integrations_spark.gen import gen_change_events


def _run(spark, argv):
    buf = io.StringIO()
    code = run(argv, spark=spark, out=buf)
    lines = [json.loads(ln) for ln in buf.getvalue().splitlines()]
    return code, lines


@pytest.fixture()
def log_dir(spark, tmp_path):
    p = str(tmp_path / "log")
    gen_change_events(spark, 300, n_urls=80).write.parquet(p)
    return p


def _cfg(tmp_path, log_dir):
    cfg = tmp_path / "config.json"
    cfg.write_text(json.dumps({"log_path": log_dir}))
    return str(cfg)


def test_spec_cli(spark):
    code, msgs = _run(spark, ["spec"])
    assert code == 0 and len(msgs) == 1
    assert msgs[0]["type"] == "SPEC"
    props = msgs[0]["spec"]["connectionSpecification"]["properties"]
    assert props["jdbc_password"]["airbyte_secret"] is True


def test_check_cli_succeeds_and_fails_as_message(spark, tmp_path, log_dir):
    code, msgs = _run(spark, ["check", "--config", _cfg(tmp_path, log_dir)])
    assert code == 0
    assert msgs[0] == {
        "type": "CONNECTION_STATUS",
        "connectionStatus": {"status": "SUCCEEDED"},
    }
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"log_path": "/nonexistent/nope"}))
    code, msgs = _run(spark, ["check", "--config", str(bad)])
    # a failed check is a FAILED message with exit 0, not a crash
    assert code == 0
    assert msgs[0]["connectionStatus"]["status"] == "FAILED"
    assert "nope" in msgs[0]["connectionStatus"]["message"]


def test_discover_cli(spark, tmp_path, log_dir):
    code, msgs = _run(spark, ["discover", "--config", _cfg(tmp_path, log_dir)])
    assert code == 0 and msgs[0]["type"] == "CATALOG"
    assert msgs[0]["catalog"]["streams"]


def _catalog_file(tmp_path, log_dir, name="pages"):
    doc = {
        "streams": [
            {
                "name": name,
                "sync_mode": "incremental",
                "destination_sync_mode": "append_dedup",
                "primary_key": ["url"],
                "cursor_field": ["_ab_cdc_lsn"],
                "source": {"kind": "cdc_log", "path": log_dir},
            }
        ]
    }
    cat = tmp_path / "catalog.json"
    cat.write_text(json.dumps(doc))
    return str(cat)


def test_read_cli_emission_order(spark, tmp_path, log_dir):
    code, msgs = _run(
        spark,
        ["read", "--config", _cfg(tmp_path, log_dir),
         "--catalog", _catalog_file(tmp_path, log_dir)],
    )
    assert code == 0
    kinds = [m["type"] for m in msgs]
    n_events = spark.read.parquet(log_dir).count()
    assert kinds.count("RECORD") == n_events
    # LOG framing (abstract_source.py:98/135 parity), then
    # STARTED ... records ... STATE, COMPLETE — state never precedes
    # the records it covers
    assert kinds[0] == "LOG" and kinds[-1] == "LOG"
    logs = [m["log"]["message"] for m in msgs if m["type"] == "LOG"]
    assert logs[0] == "Starting syncing"
    assert logs[-1] == "Finished syncing"
    assert "Syncing stream: pages" in logs
    assert f"Read {n_events} records from pages stream" in logs
    assert all(
        m["log"]["level"] == "INFO" for m in msgs if m["type"] == "LOG"
    )
    statuses = [
        m["trace"]["stream_status"]["status"]
        for m in msgs
        if m["type"] == "TRACE"
    ]
    assert statuses == ["STARTED", "COMPLETE"]
    assert kinds.index("STATE") > kinds.index("RECORD")
    state = next(m for m in msgs if m["type"] == "STATE")
    hi = spark.read.parquet(log_dir).agg(F.max("_ab_cdc_lsn")).collect()[0][0]
    assert state["state"]["streams"][0]["state"]["lsn_watermark"] == hi
    # a record round-trips the full row (explicit nulls kept)
    rec = next(m for m in msgs if m["type"] == "RECORD")
    assert rec["record"]["stream"] == "pages"
    assert "_ab_cdc_lsn" in rec["record"]["data"]
    assert "_ab_cdc_deleted_at" in rec["record"]["data"]


def test_read_cli_state_seeds_incremental(spark, tmp_path, log_dir):
    hi = spark.read.parquet(log_dir).agg(F.max("_ab_cdc_lsn")).collect()[0][0]
    mid = int(hi) // 2
    st = tmp_path / "state.json"
    st.write_text(json.dumps({
        "type": "STATE",
        "state": {
            "state_type": "PER_STREAM",
            "streams": [{"name": "pages", "state": {"lsn_watermark": mid}}],
        },
    }))
    code, msgs = _run(
        spark,
        ["read", "--config", _cfg(tmp_path, log_dir),
         "--catalog", _catalog_file(tmp_path, log_dir), "--state", str(st)],
    )
    assert code == 0
    want = (
        spark.read.parquet(log_dir)
        .filter(F.col("_ab_cdc_lsn") > mid)
        .count()
    )
    recs = [m for m in msgs if m["type"] == "RECORD"]
    assert len(recs) == want
    assert all(m["record"]["data"]["_ab_cdc_lsn"] > mid for m in recs)


def test_catalog_json_validation():
    with pytest.raises(ValueError, match="unsupported source kind"):
        configured_catalog_from_json(
            {"streams": [{"name": "x", "source": {"kind": "carrier_pigeon"}}]}
        )
    with pytest.raises(ValueError, match="no name"):
        configured_catalog_from_json({"streams": [{"source": {}}]})
    cat = configured_catalog_from_json(
        {"streams": [{"name": "y", "sync_mode": "full_refresh",
                      "source": {"kind": "cdc_log", "path": "/tmp/x"}}]}
    )
    assert cat.streams[0].config.stream == "y"
    assert cat.streams[0].config.sync_mode.value == "full_refresh"


def _wire_lines(stream, rows):
    return [
        json.dumps({"type": "RECORD", "record": {
            "stream": stream, "emitted_at": 0, "data": d}})
        for d in rows
    ]


# envelope concerns (_airbyte_ab_id, _airbyte_emitted_at) deliberately
# NOT in the data blob — read_messages derives them from the wire line
_CDC_ROWS = [
    {"url": "a", "_ab_cdc_lsn": 1, "_ab_cdc_updated_at": "2024-01-01T00:00:01",
     "_ab_cdc_deleted_at": None},
    {"url": "a", "_ab_cdc_lsn": 3, "_ab_cdc_updated_at": "2024-01-01T00:00:03",
     "_ab_cdc_deleted_at": None},
    {"url": "b", "_ab_cdc_lsn": 2, "_ab_cdc_updated_at": "2024-01-01T00:00:02",
     "_ab_cdc_deleted_at": None},
    {"url": "b", "_ab_cdc_lsn": 4, "_ab_cdc_updated_at": "2024-01-01T00:00:04",
     "_ab_cdc_deleted_at": "2024-01-01T00:00:04"},
]

_CDC_DDL = ("url string, _ab_cdc_lsn bigint, _ab_cdc_updated_at timestamp, "
            "_ab_cdc_deleted_at timestamp")


def _write_catalog(tmp_path, lake, name="pages"):
    cfg = tmp_path / "wcfg.json"
    cfg.write_text(json.dumps({"log_path": str(tmp_path), "lake_root": lake}))
    cat = tmp_path / "wcat.json"
    cat.write_text(json.dumps({"streams": [{
        "name": name,
        "sync_mode": "incremental",
        "destination_sync_mode": "append_dedup",
        "primary_key": ["url"],
        "cursor_field": ["_ab_cdc_lsn"],
        "n_buckets": 4,
        "record_schema": _CDC_DDL,
    }]}))
    return str(cfg), str(cat)


def test_write_cli_applies_winner_dedup(spark, tmp_path):
    """`write --config --catalog --input` consumes RECORD JSONL and
    MERGEs it into the lake: winner per PK, tombstone removed, STATE
    echoed only after the durable commit; a re-run of the same pipe
    converges (no duplicate application)."""
    from airbyte_integrations_spark.lakehouse.table import LakeTable

    msgs = tmp_path / "messages.jsonl"
    msgs.write_text("\n".join(_wire_lines("pages", _CDC_ROWS)) + "\n")
    lake = str(tmp_path / "lake")
    cfg, cat = _write_catalog(tmp_path, lake)
    code, out_msgs = _run(
        spark, ["write", "--config", cfg, "--catalog", cat,
                "--input", str(msgs)],
    )
    assert code == 0
    assert [m["type"] for m in out_msgs] == ["STATE"]
    tbl = LakeTable(spark, f"{lake}/pages")
    rows = {(r.url, r._ab_cdc_lsn) for r in tbl.read_live().collect()}
    assert rows == {("a", 3)}  # b's winner is the lsn-4 tombstone
    # re-running the same pipe is a no-op (idempotent epochs)
    v = tbl.current_version()
    code, _ = _run(
        spark, ["write", "--config", cfg, "--catalog", cat,
                "--input", str(msgs)],
    )
    assert code == 0
    assert {(r.url, r._ab_cdc_lsn) for r in tbl.read_live().collect()} == rows


def test_write_cli_reads_stdin(spark, tmp_path):
    """--input - spools the pipe (the reference's stdin contract)."""
    import io as _io

    from airbyte_integrations_spark.entrypoint import run as _entry_run
    from airbyte_integrations_spark.lakehouse.table import LakeTable

    lake = str(tmp_path / "lake2")
    cfg, cat = _write_catalog(tmp_path, lake)
    pipe = _io.StringIO("\n".join(_wire_lines("pages", _CDC_ROWS[:2])) + "\n")
    buf = _io.StringIO()
    code = _entry_run(
        ["write", "--config", cfg, "--catalog", cat, "--input", "-"],
        spark=spark, out=buf, stdin=pipe,
    )
    assert code == 0
    tbl = LakeTable(spark, f"{lake}/pages")
    assert {(r.url, r._ab_cdc_lsn) for r in tbl.read_live().collect()} == {
        ("a", 3)
    }


def test_config_validated_against_spec(spark, tmp_path):
    """Schema-invalid config fails as a message before any engine work
    (entrypoint.py:71 validate_config_against_spec parity): missing
    required property and wrong primitive type."""
    bad = tmp_path / "badtype.json"
    bad.write_text(json.dumps({"log_path": 7}))
    code, msgs = _run(spark, ["check", "--config", str(bad)])
    assert code == 0
    assert msgs[0]["connectionStatus"]["status"] == "FAILED"
    assert "must be string" in msgs[0]["connectionStatus"]["message"]
    empty = tmp_path / "empty.json"
    empty.write_text("{}")
    code, msgs = _run(spark, ["check", "--config", str(empty)])
    assert "missing required config property: log_path" in \
        msgs[0]["connectionStatus"]["message"]
    # read with invalid config exits nonzero after the FAILED message
    code, msgs = _run(
        spark, ["read", "--config", str(empty),
                "--catalog", str(empty)])
    assert code == 1 and msgs[0]["connectionStatus"]["status"] == "FAILED"


def test_read_cli_global_state_flavor(spark, tmp_path, log_dir):
    code, msgs = _run(
        spark,
        ["read", "--config", _cfg(tmp_path, log_dir),
         "--catalog", _catalog_file(tmp_path, log_dir),
         "--state-type", "GLOBAL"],
    )
    assert code == 0
    st = next(m for m in msgs if m["type"] == "STATE")["state"]
    hi = spark.read.parquet(log_dir).agg(F.max("_ab_cdc_lsn")).collect()[0][0]
    assert st["state_type"] == "GLOBAL"
    assert st["global"]["lsn_watermark"] == hi


def _shared_catalog_file(tmp_path, wal_dir):
    doc = {
        "streams": [
            {
                "name": n,
                "sync_mode": "incremental",
                "destination_sync_mode": "append_dedup",
                "primary_key": ["url"],
                "cursor_field": ["_ab_cdc_lsn"],
                "source": {"kind": "cdc_shared", "group": "wal",
                           "path": wal_dir},
            }
            for n in ("pages_a", "pages_b")
        ]
    }
    cat = tmp_path / "shared_catalog.json"
    cat.write_text(json.dumps(doc))
    return str(cat)


@pytest.fixture()
def wal_dir(spark, tmp_path):
    """Interleaved two-stream WAL on one total lsn order (a on even
    global positions, b on odd)."""
    a = (
        gen_change_events(spark, 240, n_urls=50, seed="wal_a")
        .withColumn("_ab_cdc_lsn", 2 * F.col("_ab_cdc_lsn"))
        .withColumn("stream", F.lit("pages_a"))
    )
    b = (
        gen_change_events(spark, 120, n_urls=30, seed="wal_b")
        .withColumn("_ab_cdc_lsn", 2 * F.col("_ab_cdc_lsn") + 1)
        .withColumn("stream", F.lit("pages_b"))
    )
    p = str(tmp_path / "wal")
    a.unionByName(b).write.parquet(p)
    return p


def test_read_cli_shared_wal_defaults_global(spark, tmp_path, wal_dir):
    """A cdc_shared catalog reads each member's routed slice of the one
    WAL and defaults the STATE flavor to GLOBAL (a shared log has one
    offset by contract — PostgresCdcStateHandler.java:29-37)."""
    code, msgs = _run(
        spark,
        ["read", "--config", _cfg(tmp_path, wal_dir),
         "--catalog", _shared_catalog_file(tmp_path, wal_dir)],
    )
    assert code == 0
    wal = spark.read.parquet(wal_dir)
    recs = [m for m in msgs if m["type"] == "RECORD"]
    by_stream = {}
    for m in recs:
        by_stream.setdefault(m["record"]["stream"], []).append(
            m["record"]["data"]
        )
    assert set(by_stream) == {"pages_a", "pages_b"}
    for n in by_stream:
        want = wal.filter(F.col("stream") == n).count()
        assert len(by_stream[n]) == want
        # the routing column never reaches the record payload
        assert all("stream" not in d for d in by_stream[n])
    # every STATE is the GLOBAL arm; the final offset is the MIN of the
    # member maxima (a-member max is the global max, b's is one less on
    # this parity layout => min rule visible, not vacuous)
    states = [m["state"] for m in msgs if m["type"] == "STATE"]
    assert states and all(s["state_type"] == "GLOBAL" for s in states)
    max_a = wal.filter(F.col("stream") == "pages_a").agg(
        F.max("_ab_cdc_lsn")).collect()[0][0]
    max_b = wal.filter(F.col("stream") == "pages_b").agg(
        F.max("_ab_cdc_lsn")).collect()[0][0]
    assert max_a != max_b
    assert states[-1]["global"]["lsn_watermark"] == min(max_a, max_b)


def test_read_cli_shared_wal_global_state_seed(spark, tmp_path, wal_dir):
    """A GLOBAL --state document trims EVERY member's slice to
    lsn > the shared offset (resume_lsn GLOBAL arm through the
    cdc_shared source read)."""
    wal = spark.read.parquet(wal_dir)
    hi = wal.agg(F.max("_ab_cdc_lsn")).collect()[0][0]
    mid = int(hi) // 2
    st = tmp_path / "gstate.json"
    st.write_text(json.dumps({
        "type": "STATE",
        "state": {"state_type": "GLOBAL",
                  "global": {"lsn_watermark": mid}},
    }))
    code, msgs = _run(
        spark,
        ["read", "--config", _cfg(tmp_path, wal_dir),
         "--catalog", _shared_catalog_file(tmp_path, wal_dir),
         "--state", str(st)],
    )
    assert code == 0
    recs = [m for m in msgs if m["type"] == "RECORD"]
    want = wal.filter(F.col("_ab_cdc_lsn") > mid).count()
    assert len(recs) == want
    assert all(m["record"]["data"]["_ab_cdc_lsn"] > mid for m in recs)


def test_read_cli_debezium_kind(spark, tmp_path, log_dir):
    """kind=debezium in a JSON catalog: envelope JSONL decodes through
    sources/debezium.parse_debezium and rides the same read loop —
    records carry the injected CDC columns and the STATE watermark is
    the max source.lsn."""
    from airbyte_integrations_spark.sources.debezium import emit_debezium

    ev = spark.read.parquet(log_dir)
    dbz = str(tmp_path / "dbz")
    emit_debezium(ev, ["url", "text", "lang"]).write.text(dbz)
    doc = {
        "streams": [
            {
                "name": "pages",
                "sync_mode": "incremental",
                "destination_sync_mode": "append_dedup",
                "primary_key": ["url"],
                "cursor_field": ["_ab_cdc_lsn"],
                "source": {
                    "kind": "debezium",
                    "path": dbz,
                    "value_schema": "url string, text string, lang string",
                },
            }
        ]
    }
    cat = tmp_path / "dbz_catalog.json"
    cat.write_text(json.dumps(doc))
    code, msgs = _run(
        spark,
        ["read", "--config", _cfg(tmp_path, log_dir), "--catalog", str(cat)],
    )
    assert code == 0
    recs = [m for m in msgs if m["type"] == "RECORD"]
    assert len(recs) == ev.count()
    assert all("_ab_cdc_lsn" in r["record"]["data"] for r in recs[:5])
    hi = ev.agg(F.max("_ab_cdc_lsn")).collect()[0][0]
    state = next(m for m in msgs if m["type"] == "STATE")
    assert state["state"]["streams"][0]["state"]["lsn_watermark"] == hi
