"""Singer-tap adapter (sources/singer.py): message translation parity
with singer_helpers.py:239-265, discover-catalog translation parity
with :69-141, selection rendering parity with :267-304, and the
kind="singer" arm of the configured-catalog loop."""

import json

from pyspark.sql import types as T

from airbyte_integrations_spark.catalog_sync import (
    ConfiguredCatalog,
    ConfiguredStream,
    read_catalog,
    stream_table,
)
from airbyte_integrations_spark.config import DestinationSyncMode, SyncConfig, SyncMode
from airbyte_integrations_spark.sources.airbyte_wire import (
    latest_state,
    records_for_stream,
)
from airbyte_integrations_spark.sources.singer import (
    read_singer_messages,
    render_selected_catalog,
    singer_catalog_to_streams,
)

TAP_LINES = [
    {"type": "SCHEMA", "stream": "users",
     "schema": {"properties": {"id": {"type": "integer"}}},
     "key_properties": ["id"]},
    {"type": "RECORD", "stream": "users",
     "record": {"id": 1, "name": "ada"},
     "time_extracted": "2021-01-01T00:00:05.000000Z"},
    {"type": "RECORD", "stream": "users", "record": {"id": 2, "name": "bo"}},
    {"type": "ACTIVATE_VERSION", "stream": "users", "version": 1},
    {"type": "STATE", "value": {"bookmarks": {"users": {"id": 1}}}},
    {"type": "RECORD", "stream": "orders",
     "record": {"oid": 10, "amount": 2.5, "user_id": 1}},
    {"type": "STATE", "value": {"bookmarks": {"users": {"id": 2}}}},
]


def _write_tap(tmp_path, lines=TAP_LINES, name="tap.jsonl"):
    p = tmp_path / name
    p.write_text("\n".join(json.dumps(x) for x in lines) + "\n")
    return str(p)


def test_schema_and_activate_version_dropped(spark, tmp_path):
    """SCHEMA and ACTIVATE_VERSION lines translate to nothing
    (singer_helpers.py:239-241 returns None for both); RECORD keeps its
    payload, STATE keeps its value blob."""
    msgs = read_singer_messages(spark, _write_tap(tmp_path)).cache()
    by_type = {r["type"] for r in msgs.select("type").distinct().collect()}
    assert by_type == {"RECORD", "STATE"}
    assert msgs.count() == 5  # 3 RECORD + 2 STATE of the 7 lines
    rec = msgs.filter("stream = 'orders'").collect()[0]
    assert json.loads(rec["_airbyte_data"]) == {
        "oid": 10, "amount": 2.5, "user_id": 1,
    }


def test_emitted_at_from_time_extracted_else_default(spark, tmp_path):
    """time_extracted stamps emitted_at when present; otherwise the
    caller-fixed constant (deterministic replacement for the
    reference's now() stamp, singer_helpers.py:252)."""
    msgs = read_singer_messages(
        spark, _write_tap(tmp_path), default_emitted_at_millis=1_600_000_000_000
    )
    rows = {
        json.loads(r["_airbyte_data"])["id"]: r["_airbyte_emitted_at"]
        for r in msgs.filter("stream = 'users'").collect()
    }
    assert rows[1].isoformat().startswith("2021-01-01T00:00:05")
    assert rows[2].isoformat().startswith("2020-09-13")  # 1.6e12 ms epoch


def test_wire_helpers_run_on_singer_landing(spark, tmp_path):
    """The adapter emits the wire landing shape, so the shared typed
    projection and state helpers run unchanged."""
    msgs = read_singer_messages(spark, _write_tap(tmp_path))
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("name", T.StringType())]
    )
    users = records_for_stream(msgs, "users", schema)
    got = {(r.id, r.name) for r in users.collect()}
    assert got == {(1, "ada"), (2, "bo")}
    # last STATE in file/line order wins
    assert json.loads(latest_state(msgs)) == {"bookmarks": {"users": {"id": 2}}}


SINGER_CATALOG = {
    "streams": [
        {
            "stream": "users",
            "schema": {"properties": {"id": {"type": "integer"},
                                      "updated_at": {"type": "string"}}},
            "key_properties": ["id"],
            "metadata": [
                {"breadcrumb": [],
                 "metadata": {"valid-replication-keys": ["updated_at", "id"]}},
                {"breadcrumb": ["properties", "id"], "metadata": {}},
            ],
        },
        {
            "stream": "orders",
            "schema": {"properties": {"oid": {"type": "integer"}}},
            "metadata": [
                {"breadcrumb": [],
                 "metadata": {"forced-replication-method":
                              {"replication-method": "INCREMENTAL"}}},
            ],
        },
        {
            "stream": "logs",
            "schema": {"properties": {"line": {"type": "string"}}},
            "metadata": [
                {"breadcrumb": [],
                 "metadata": {"forced-replication-method": "FULL_TABLE"}},
            ],
        },
    ]
}


def test_catalog_translation():
    """valid-replication-keys => incremental + deterministically-first
    sorted cursor (singer_helpers.py:74-79); forced-replication-method
    in both its string and dict spellings (:80-90); key_properties =>
    source-defined primary key (:137-138)."""
    streams = {s["name"]: s for s in singer_catalog_to_streams(SINGER_CATALOG)}
    u = streams["users"]
    assert u["supported_sync_modes"] == ["incremental"]
    assert u["source_defined_cursor"] is True
    assert u["default_cursor_field"] == ["id"]  # sorted()[0] of the two keys
    assert u["source_defined_primary_key"] == [["id"]]
    assert streams["orders"]["supported_sync_modes"] == ["incremental"]
    assert streams["orders"]["source_defined_primary_key"] is None
    lg = streams["logs"]
    assert lg["supported_sync_modes"] == ["full_refresh"]
    assert lg["source_defined_cursor"] is False


def test_catalog_overrides_and_exclusion():
    """Overrides REPLACE metadata-derived modes — and an override
    without source_defined_cursor means False (override_sync_modes
    :93-98); PK overrides beat key_properties; excluded streams are
    dropped before translation (:156-170)."""
    streams = {
        s["name"]: s
        for s in singer_catalog_to_streams(
            SINGER_CATALOG,
            sync_mode_overrides={
                "users": {"supported_sync_modes": ["full_refresh"]}
            },
            primary_key_overrides={"orders": ["oid", "user_id"]},
            excluded_streams=("logs",),
        )
    }
    assert set(streams) == {"users", "orders"}
    assert streams["users"]["supported_sync_modes"] == ["full_refresh"]
    assert streams["users"]["source_defined_cursor"] is False
    assert streams["orders"]["source_defined_primary_key"] == [["oid"], ["user_id"]]


def test_render_selected_catalog():
    """Selection rendering (singer_helpers.py:267-304): configured
    streams get schema.selected + per-entry selected, the stream-level
    entry gains replication method (+ replication-key for a configured
    incremental cursor), fieldExclusions de-select their field, and
    unconfigured streams pass through untouched."""
    discovered = {
        "streams": [
            {
                "stream": "users",
                "schema": {},
                "metadata": [
                    {"breadcrumb": [], "metadata": {}},
                    {"breadcrumb": ["properties", "id"],
                     "metadata": {"fieldExclusions": []}},
                    {"breadcrumb": ["properties", "secret"],
                     "metadata": {"fieldExclusions": [["properties", "id"]]}},
                ],
            },
            {"stream": "untouched", "schema": {}, "metadata": [
                {"breadcrumb": [], "metadata": {}}]},
        ]
    }
    out = render_selected_catalog(
        {"users": {"sync_mode": "incremental", "cursor_field": ["updated_at"]}},
        discovered,
    )
    users = out["streams"][0]
    assert users["schema"]["selected"] is True
    stream_md = users["metadata"][0]["metadata"]
    assert stream_md["forced-replication-method"] == "INCREMENTAL"
    assert stream_md["replication-method"] == "INCREMENTAL"
    assert stream_md["replication-key"] == "updated_at"
    assert users["metadata"][1]["metadata"]["selected"] is True
    assert users["metadata"][2]["metadata"]["selected"] is False
    untouched = out["streams"][1]
    assert "selected" not in untouched.get("schema", {})
    assert "selected" not in untouched["metadata"][0]["metadata"]
    # input not mutated
    assert "selected" not in discovered["streams"][0]["schema"]


def test_singer_stream_through_read_catalog(spark, tmp_path):
    """kind='singer' flows through the configured-catalog loop: the
    tap JSONL is the source, the schema is sampled from the records
    when undeclared, and rows land in the lake table."""
    tap = _write_tap(tmp_path)
    cs = ConfiguredStream(
        config=SyncConfig(
            stream="users",
            primary_key=("id",),
            cursor_field=("id",),
            sync_mode=SyncMode.FULL_REFRESH,
            destination_sync_mode=DestinationSyncMode.OVERWRITE,
            n_buckets=4,
        ),
        source={"kind": "singer", "path": tap},  # schema inferred
    )
    lake = str(tmp_path / "lake")
    read_catalog(spark, ConfiguredCatalog(streams=(cs,)), lake)
    t = stream_table(spark, lake, "users")
    got = {(r.id, r.name) for r in t.read().select("id", "name").collect()}
    assert got == {(1, "ada"), (2, "bo")}
    # re-run converges (overwrite refresh)
    read_catalog(spark, ConfiguredCatalog(streams=(cs,)), lake)
    assert t.read().count() == 2
