"""Connector lifecycle verbs (spec/check/discover), STATE retention,
sync metrics summary."""

import json

from airbyte_integrations_spark.config import SyncConfig
from airbyte_integrations_spark.connector import check, discover, spec
from airbyte_integrations_spark.gen import gen_change_events
from airbyte_integrations_spark.lakehouse.table import LakeTable
from airbyte_integrations_spark.lineage import sync_summary
from airbyte_integrations_spark.sources.airbyte_wire import latest_state, read_messages
from airbyte_integrations_spark.streaming.microbatch import run_sync


def test_spec_shape():
    s = spec()
    assert s["connectionSpecification"]["required"] == ["log_path"]


def test_check_and_discover(spark, tmp_path):
    assert check(spark, {"log_path": str(tmp_path / "nope")})["status"] == "FAILED"
    log = str(tmp_path / "log")
    gen_change_events(spark, 200, n_urls=30).write.parquet(log)
    assert check(spark, {"log_path": log})["status"] == "SUCCEEDED"
    cat = discover(spark, {"log_path": log})
    st = cat["streams"][0]
    assert st["default_cursor_field"] == ["_ab_cdc_lsn"]
    assert st["source_defined_primary_key"] == [["url"]]
    props = st["json_schema"]["properties"]
    assert props["_ab_cdc_lsn"]["type"] == ["null", "integer"]
    assert props["html"].get("contentEncoding") == "base64"
    assert props["warc_ts"]["format"] == "date-time"
    # missing CDC columns => FAILED
    gen_change_events(spark, 10, n_urls=5).drop("_ab_cdc_lsn").write.parquet(
        str(tmp_path / "bad")
    )
    assert "missing CDC" in check(spark, {"log_path": str(tmp_path / "bad")})["message"]


def test_latest_state(spark, tmp_path):
    p = tmp_path / "m.jsonl"
    p.write_text(
        "\n".join(
            [
                json.dumps({"type": "RECORD", "record": {"stream": "s", "emitted_at": 1, "data": {"a": 1}}}),
                json.dumps({"type": "STATE", "state": {"lsn": 10}}),
                json.dumps({"type": "RECORD", "record": {"stream": "s", "emitted_at": 2, "data": {"a": 2}}}),
                json.dumps({"type": "STATE", "state": {"lsn": 20}}),
            ]
        )
    )
    msgs = read_messages(spark, str(p))
    blob = latest_state(msgs)
    assert json.loads(blob) == {"lsn": 20}
    assert latest_state(msgs.filter("type = 'RECORD'")) is None


def test_sync_summary(spark, tmp_path):
    ev = gen_change_events(spark, 600, n_urls=40).drop("html")
    t = LakeTable(spark, str(tmp_path / "t"))
    run_sync(spark, ev, t, SyncConfig(stream="pages"), max_events_per_epoch=200,
             extract_missing_text=False)
    summ = sync_summary(spark, t)
    rows = {r["epoch"]: r for r in summ.collect()}
    assert len(rows) == 3
    assert all(r["committed"] for r in rows.values())
    assert sum(r["n_emitted"] for r in rows.values()) == 600
    assert rows[0]["from_lsn"] == 1 and rows[0]["to_lsn"] == 200


def test_state_message_round_trip(spark, tmp_path):
    """STATE emitted only from the commit log; feeding it back slices
    the log exactly where the sync stopped (state-after-commit +
    restore, BufferedStreamConsumer/CdcStateManager semantics)."""
    import json

    from airbyte_integrations_spark.config import SyncConfig
    from airbyte_integrations_spark.connector import resume_lsn, state_message
    from airbyte_integrations_spark.gen import gen_change_events
    from airbyte_integrations_spark.lakehouse.table import LakeTable
    from airbyte_integrations_spark.streaming.microbatch import run_sync

    cols = [
        "url", "text", "lang", "_ab_cdc_lsn", "_ab_cdc_updated_at",
        "_ab_cdc_deleted_at", "_airbyte_ab_id", "_airbyte_emitted_at",
    ]
    ev = gen_change_events(spark, 2000, n_urls=100).select(*cols)
    table = LakeTable(spark, str(tmp_path / "t"))
    cfg = SyncConfig(stream="pages")

    # partial sync (crash after 1 epoch)
    run_sync(spark, ev, table, cfg, max_events_per_epoch=800,
             extract_missing_text=False, max_epochs=1)
    msg = state_message(table, "pages")
    blob = json.dumps(msg)  # JSON-serializable wire form
    lo = resume_lsn(json.loads(blob))
    assert lo == table.watermark("pages") == 800

    # the restored bound slices the log exactly past the committed data
    remaining = ev.filter(f"_ab_cdc_lsn > {lo}")
    assert remaining.count() == 1200

    # finishing the sync advances the emitted state to the log head
    run_sync(spark, ev, table, cfg, max_events_per_epoch=800,
             extract_missing_text=False)
    msg2 = state_message(table, "pages")
    assert resume_lsn(msg2) == 2000
    # pinned reference wire shape (airbyte_protocol.yaml:71-108):
    # {state_type: PER_STREAM, streams: [{name, state}]}
    assert msg2["state"]["state_type"] == "PER_STREAM"
    (entry,) = msg2["state"]["streams"]
    assert entry["name"] == "pages"
    assert entry["state"]["n_epochs_committed"] == 3
    assert resume_lsn(msg2, stream="pages") == 2000
    assert resume_lsn(msg2, stream="other") is None

    # legacy round-1 checkpoint shape still restores
    legacy = {"state": {"stream": {"stream_state": {"lsn_watermark": 42}}}}
    assert resume_lsn(legacy) == 42

    # empty / malformed state => full read (None)
    assert resume_lsn(None) is None
    assert resume_lsn({"state": {}}) is None

    # GLOBAL flavor: one shared CDC offset for the whole WAL
    # (CdcStateManager holds a single CdcState)
    gmsg = state_message(table, "pages", flavor="GLOBAL")
    assert gmsg["state"]["state_type"] == "GLOBAL"
    assert "streams" not in gmsg["state"]
    assert resume_lsn(gmsg) == 2000

    # multi-stream table: the GLOBAL watermark is the MIN across
    # streams — resuming the shared WAL from one stream's higher
    # watermark would permanently skip the laggard's events
    ev_b = gen_change_events(spark, 1200, n_urls=60).select(*cols)
    run_sync(spark, ev_b, table, SyncConfig(stream="pages_b"),
             max_events_per_epoch=600, extract_missing_text=False, max_epochs=1)
    assert table.watermark("pages") == 2000 and table.watermark("pages_b") == 600
    gmsg2 = state_message(table, "pages", flavor="GLOBAL")
    assert resume_lsn(gmsg2) == 600

    # never-committed table (first sync crashed pre-commit): state is
    # still emitted, with a null watermark (CdcSourceTest.testNoData)
    from airbyte_integrations_spark.lakehouse.table import LakeTable as _LT
    empty_t = _LT(spark, str(tmp_path / "never_committed"))
    empty_msg = state_message(empty_t, "pages")
    assert empty_msg["state"]["streams"][0]["state"]["lsn_watermark"] is None
    assert resume_lsn(empty_msg) is None


def test_spec_marks_secrets_and_check_masks_them(spark, tmp_path):
    """airbyte_secret parity: credential properties are marked in the
    spec and a failed check() never echoes their values."""
    from airbyte_integrations_spark.connector import (
        check,
        mask_secrets,
        secret_properties,
        spec,
    )

    s = spec()
    props = s["connectionSpecification"]["properties"]
    assert props["jdbc_password"]["airbyte_secret"] is True
    assert secret_properties(s) == ["jdbc_password"]

    pw = "s3cret-hunter2"
    cfg = {
        "log_path": str(tmp_path / "missing"),
        # a url whose failure message would echo the password if unmasked
        "jdbc_url": f"jdbc:derby:/nonexistent/dir/db;password={pw}",
        "jdbc_user": "svc",
        "jdbc_password": pw,
    }
    out = check(spark, cfg)
    assert out["status"] == "FAILED"
    assert pw not in out["message"]

    assert mask_secrets(f"auth failed for {pw}", cfg) == "auth failed for *****"
