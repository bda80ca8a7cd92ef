"""Kafka single-record Avro wire format (Confluent framing: 0x00 magic
byte + 4-byte schema id + schemaless Avro body) over the vendored
codec: round-trip, multi-schema-id topics resolved reader/writer-style,
framing validation, and the Kafka-shaped end-to-end (wire decode ->
vector offset sync)."""

import pyspark.sql.functions as F
import pytest

from airbyte_integrations_spark.config import SyncConfig
from airbyte_integrations_spark.gen import gen_change_events
from airbyte_integrations_spark.lakehouse.table import LakeTable
from airbyte_integrations_spark.sources.avro_wire import (
    read_avro_wire,
    wire_header,
    wire_schema_id,
    write_avro_wire,
)
from tests.util import assert_frames_equal, duckdb_winners

V1 = {
    "type": "record",
    "name": "pages",
    "fields": [
        {"name": "url", "type": "string"},
        {"name": "seq", "type": "long"},
    ],
}
V2 = {
    "type": "record",
    "name": "pages",
    "fields": [
        {"name": "url", "type": "string"},
        {"name": "seq", "type": "long"},
        {"name": "lang", "type": ["null", "string"], "default": None},
        {"name": "score", "type": ["null", "double"], "default": None},
    ],
}


def _rows(spark):
    return spark.createDataFrame(
        [
            ("a", 1, "en", 0.5, 0, 10),
            ("b", 2, None, None, 0, 11),
            ("c", 3, "fr", -1.25, 1, 5),
        ],
        "url string, seq long, lang string, score double, _ab_part int, off long",
    )


def test_wire_roundtrip_with_passthrough(spark):
    df = _rows(spark)
    framed = write_avro_wire(df, V2, schema_id=9)
    assert set(framed.columns) == {"value", "_ab_part", "off"}
    back = read_avro_wire(framed, {9: V2})
    assert_frames_equal(
        df.toPandas(), back.select(*df.columns).toPandas(), sort_cols=("seq",)
    )
    # header bytes are the Confluent framing exactly
    raw = framed.limit(1).collect()[0]["value"]
    assert bytes(raw[:5]) == wire_header(9)
    assert wire_schema_id(bytes(raw)) == 9


def test_mixed_schema_ids_resolve_to_reader(spark):
    df = _rows(spark)
    old = write_avro_wire(df.filter("seq = 1").drop("lang", "score"), V1, 7)
    new = write_avro_wire(df.filter("seq > 1"), V2, 9)
    topic = old.unionByName(new)
    # default reader = highest id: v1 rows null-fill the added fields
    out = read_avro_wire(topic, {7: V1, 9: V2})
    rows = {r["seq"]: r for r in out.collect()}
    assert rows[1]["lang"] is None and rows[1]["score"] is None
    assert rows[3]["lang"] == "fr" and rows[3]["score"] == -1.25
    # explicit old reader: v2 rows project DOWN (extra fields dropped)
    down = read_avro_wire(topic, {7: V1, 9: V2}, reader_schema_id=7)
    assert set(down.columns) == {"url", "seq", "_ab_part", "off"}
    assert down.count() == 3


def test_framing_validation(spark):
    with pytest.raises(ValueError, match="magic"):
        wire_schema_id(b"\x01\x00\x00\x00\x07rest")
    with pytest.raises(ValueError, match="magic"):
        wire_schema_id(b"\x00\x00")
    with pytest.raises(ValueError, match="empty"):
        read_avro_wire(_rows(spark), {})
    with pytest.raises(ValueError, match="reader schema id"):
        read_avro_wire(_rows(spark), {7: V1}, reader_schema_id=9)
    # unknown writer id fails the job loudly (poisoned topic stops the
    # sync instead of dropping rows)
    framed = write_avro_wire(_rows(spark), V2, 9)
    with pytest.raises(Exception, match="not in registry"):
        read_avro_wire(framed, {7: V1}).collect()


EVENT_SCHEMA = {
    "type": "record",
    "name": "change",
    "fields": [
        {"name": "url", "type": "string"},
        {"name": "text", "type": ["null", "string"], "default": None},
        {"name": "lang", "type": ["null", "string"], "default": None},
        {"name": "_ab_cdc_lsn", "type": "long"},
        {"name": "_ab_cdc_deleted_at_us", "type": ["null", "long"], "default": None},
        {"name": "_airbyte_ab_id", "type": "string"},
    ],
}


def test_kafka_shaped_wire_sync_end_to_end(spark, tmp_path):
    """A topic dump (partition, offset, wire-framed value) decodes and
    feeds the vector-offset consume loop; final state equals the
    direct winner replay and a re-run is a no-op."""
    from airbyte_integrations_spark.sources.partitioned_log import (
        PART_COL,
        sync_partitioned_log,
    )

    ev = gen_change_events(spark, 1200, n_urls=60).select(
        "url",
        "text",
        "lang",
        "_ab_cdc_lsn",
        F.unix_micros("_ab_cdc_deleted_at").alias("_ab_cdc_deleted_at_us"),
        "_airbyte_ab_id",
        "_ab_cdc_updated_at",
        "_ab_cdc_deleted_at",
        "_airbyte_emitted_at",
    )
    framed = write_avro_wire(
        ev.withColumn(
            PART_COL, F.pmod(F.xxhash64("url"), F.lit(4)).cast("int")
        ).select(
            "url", "text", "lang", "_ab_cdc_lsn", "_ab_cdc_deleted_at_us",
            "_airbyte_ab_id", PART_COL,
        ),
        EVENT_SCHEMA,
        schema_id=3,
    )
    decoded = read_avro_wire(framed, {3: EVENT_SCHEMA}).select(
        "url",
        "text",
        "lang",
        "_ab_cdc_lsn",
        F.timestamp_micros("_ab_cdc_deleted_at_us").alias("_ab_cdc_deleted_at"),
        "_airbyte_ab_id",
        PART_COL,
    )
    t = LakeTable(spark, str(tmp_path / "t"))
    cfg = SyncConfig(
        stream="pages",
        secondary_order=(),
        n_buckets=8,
    )
    got = sync_partitioned_log(spark, decoded, t, cfg, compact_threshold=None)
    assert got is not None
    want = duckdb_winners(
        ev.drop("_ab_cdc_deleted_at_us").toPandas(), drop_tombstones=True
    )
    live = t.read_live().select("url", "text", "_ab_cdc_lsn").toPandas()
    assert_frames_equal(
        live, want[["url", "text", "_ab_cdc_lsn"]], sort_cols=("url",)
    )
    # nothing new => no-op round
    assert sync_partitioned_log(spark, decoded, t, cfg, compact_threshold=None) is None


def test_debezium_envelope_over_avro_wire(spark):
    """The production Kafka shape end-to-end: Debezium envelopes as
    registry-framed Avro (nested before/after/source records in
    null-unions) decode through the wire reader and convert to change
    events with the same rules as the JSONL path."""
    from airbyte_integrations_spark.sources.debezium import (
        events_from_decoded_envelopes,
    )

    def val_rec(name):
        return {
            "type": "record",
            "name": name,
            "fields": [
                {"name": "url", "type": "string"},
                {"name": "text", "type": ["null", "string"], "default": None},
                {"name": "lang", "type": ["null", "string"], "default": None},
            ],
        }

    env_schema = {
        "type": "record",
        "name": "envelope",
        "fields": [
            {"name": "before", "type": ["null", val_rec("val_b")], "default": None},
            {"name": "after", "type": ["null", val_rec("val_a")], "default": None},
            {
                "name": "source",
                "type": {
                    "type": "record",
                    "name": "src",
                    "fields": [
                        {"name": "ts_ms", "type": "long"},
                        {"name": "ts_us", "type": ["null", "long"], "default": None},
                        {"name": "lsn", "type": "long"},
                        {"name": "table", "type": "string"},
                    ],
                },
            },
            {"name": "op", "type": "string"},
        ],
    }
    ce = gen_change_events(spark, 600, n_urls=50)
    img = F.struct(F.col("url"), F.col("text"), F.col("lang"))
    us = F.unix_micros(F.col("_ab_cdc_updated_at"))
    is_del = F.col("_ab_cdc_deleted_at").isNotNull()
    env_df = ce.select(
        F.when(is_del, img).alias("before"),
        F.when(~is_del, img).alias("after"),
        F.struct(
            F.floor(us / 1000).cast("long").alias("ts_ms"),
            us.alias("ts_us"),
            F.col("_ab_cdc_lsn").cast("long").alias("lsn"),
            F.lit("pages").alias("table"),
        ).alias("source"),
        F.when(is_del, F.lit("d")).otherwise(F.lit("u")).alias("op"),
    )
    framed = write_avro_wire(env_df, env_schema, schema_id=5)
    decoded = read_avro_wire(framed, {5: env_schema})
    events = events_from_decoded_envelopes(decoded)
    a = ce.select(
        "url", "text", "_ab_cdc_lsn",
        F.unix_micros("_ab_cdc_updated_at").alias("u"),
        F.unix_micros("_ab_cdc_deleted_at").alias("d"),
    ).toPandas()
    b = events.select(
        "url", "text", "_ab_cdc_lsn",
        F.unix_micros("_ab_cdc_updated_at").alias("u"),
        F.unix_micros("_ab_cdc_deleted_at").alias("d"),
    ).toPandas()
    assert_frames_equal(a, b, sort_cols=("_ab_cdc_lsn",))
    ops = {r["_op"] for r in events.select("_op").distinct().collect()}
    assert ops == {"u", "d"}


def test_null_value_tombstone_policies(spark):
    """Kafka log-compaction tombstones (null message value — Debezium
    appends one after each delete envelope): error/skip/keep."""
    framed = write_avro_wire(_rows(spark), V2, 9)
    nulls = spark.createDataFrame(
        [(None, 3, 77)], "value binary, _ab_part int, off long"
    )
    topic = framed.unionByName(nulls)
    with pytest.raises(Exception, match="tombstone"):
        read_avro_wire(topic, {9: V2}).collect()
    skipped = read_avro_wire(topic, {9: V2}, null_value_policy="skip")
    assert skipped.count() == 3
    kept = read_avro_wire(topic, {9: V2}, null_value_policy="keep")
    assert kept.count() == 4
    row = kept.filter("off = 77").collect()[0]
    assert row["url"] is None and row["_ab_part"] == 3  # passthrough intact
    with pytest.raises(ValueError, match="null_value_policy"):
        read_avro_wire(topic, {9: V2}, null_value_policy="drop")
