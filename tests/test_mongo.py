"""Schemaless (MongoDB-style) source: sampled discovery parity with
MongoUtils.getUniqueFields:202-214 (field union, per-field type sets,
mixed-type -> <name>_aibyte_transform string, nested recursion), read-
side stringification (transformToStringIfMarked:138-147), strict->
cursor reads (MongoDbSource.queryTableIncremental:183-191), _id PK
(MongoDbSource.java:60), and the catalog arm end-to-end."""

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from airbyte_integrations_spark.catalog_sync import (
    ConfiguredCatalog,
    ConfiguredStream,
    read_catalog,
    stream_table,
)
from airbyte_integrations_spark.config import (
    DestinationSyncMode,
    SyncConfig,
    SyncMode,
)
from airbyte_integrations_spark.sources.mongo import (
    AIRBYTE_SUFFIX,
    collection_schema,
    discover_collection,
    mongo_change_events,
    read_collection,
)

DOCS = [
    {"_id": "a1", "n": 1, "tags": ["x", "y"], "meta": {"k": 1, "s": "v"}, "seq": 10},
    {"_id": "a2", "n": "two", "meta": {"k": 2, "t": True}, "seq": 11},
    {"_id": "a3", "n": 3, "f": 1.5, "nums": [1, 2], "seq": 12},
    {"_id": "a4", "empty": None, "seq": 13, "mixmeta": {"z": 1}},
    {"_id": "a5", "seq": 14, "mixmeta": [3], "deep": {"a": {"b": 7}}},
]


def _coll(spark, docs=DOCS):
    return spark.createDataFrame([(json.dumps(d),) for d in docs], "value string")


def _by_name(fields):
    return {f.name: f for f in fields}


def test_discovery_union_types_and_mixed_rule(spark):
    fields = _by_name(discover_collection(spark, _coll(spark)))
    # stable scalar fields keep their type
    assert isinstance(fields["_id"].dtype, T.StringType)
    assert isinstance(fields["seq"].dtype, T.LongType)
    assert isinstance(fields["f"].dtype, T.DoubleType)
    # int-vs-string => renamed + string (transformName:224-226)
    assert "n" not in fields and fields["n" + AIRBYTE_SUFFIX].mixed
    assert isinstance(fields["n" + AIRBYTE_SUFFIX].dtype, T.StringType)
    # only-null field: empty type set is "not exactly one" => same rule
    # (getUniqueType falls to STRING, transformName suffixes)
    assert "empty" + AIRBYTE_SUFFIX in fields
    # object-vs-array is mixed too
    assert "mixmeta" + AIRBYTE_SUFFIX in fields
    # single-typed object recurses into the UNION of subfields
    meta = fields["meta"]
    assert isinstance(meta.dtype, T.StructType)
    assert set(meta.dtype.fieldNames()) == {"k", "s", "t"}
    # two levels deep
    deep = fields["deep"].dtype
    assert deep["a"].dataType["b"].dataType == T.LongType()
    # arrays keep a stable element type
    assert fields["tags"].dtype == T.ArrayType(T.StringType(), True)
    assert fields["nums"].dtype == T.ArrayType(T.LongType(), True)


def test_discovery_respects_sample_limit(spark):
    # the drifted doc sits past the sample window => schema unchanged
    # (DISCOVER_LIMIT semantics, MongoUtils.java:59)
    docs = DOCS + [{"_id": "z9", "seq": "not-a-number"}]
    fields = _by_name(discover_collection(spark, _coll(spark, docs), limit=5))
    assert isinstance(fields["seq"].dtype, T.LongType)
    fields_all = _by_name(discover_collection(spark, _coll(spark, docs)))
    assert "seq" + AIRBYTE_SUFFIX in fields_all


def test_read_stringifies_mixed_and_keeps_typed(spark):
    fields = discover_collection(spark, _coll(spark))
    rows = {
        r["_id"]: r for r in read_collection(spark, _coll(spark), fields).collect()
    }
    # raw value stringified per transformToStringIfMarked — scalars as
    # text, containers as their JSON rendering
    assert rows["a1"]["n" + AIRBYTE_SUFFIX] == "1"
    assert rows["a2"]["n" + AIRBYTE_SUFFIX] == "two"
    assert json.loads(rows["a4"]["mixmeta" + AIRBYTE_SUFFIX]) == {"z": 1}
    assert json.loads(rows["a5"]["mixmeta" + AIRBYTE_SUFFIX]) == [3]
    # typed fields stay typed; missing => null
    assert rows["a3"]["f"] == 1.5
    assert rows["a1"]["f"] is None
    assert rows["a1"]["meta"].asDict() == {"k": 1, "s": "v", "t": None}
    assert rows["a3"]["meta"] is None
    assert rows["a3"]["nums"] == [1, 2]
    assert rows["a5"]["deep"]["a"]["b"] == 7


def test_read_cursor_strictly_greater(spark):
    fields = discover_collection(spark, _coll(spark))
    got = read_collection(
        spark, _coll(spark), fields, cursor_gt=("seq", 12)
    ).select("_id")
    assert {r["_id"] for r in got.collect()} == {"a4", "a5"}


def test_read_column_selection_keeps_pk(spark):
    fields = discover_collection(spark, _coll(spark))
    out = read_collection(spark, _coll(spark), fields, columns=["seq"])
    assert set(out.columns) == {"_id", "seq"}


def test_change_events_shape(spark):
    fields = discover_collection(spark, _coll(spark))
    ev = mongo_change_events(
        spark, _coll(spark), fields, cursor_col="seq", cursor_gt=11
    )
    assert {"url", "_ab_cdc_lsn", "_airbyte_ab_id"} <= set(ev.columns)
    assert ev.count() == 3
    assert ev.agg(F.min("_ab_cdc_lsn")).collect()[0][0] == 12


def _write_jsonl(spark, docs, path):
    spark.createDataFrame(
        [(json.dumps(d),) for d in docs], "value string"
    ).coalesce(1).write.mode("overwrite").text(path)


def test_catalog_mongo_incremental_end_to_end(spark, tmp_path):
    docs1 = [
        {"_id": f"d{i}", "rank": i % 3, "body": f"text {i}", "seq": i}
        for i in range(1, 41)
    ]
    path = str(tmp_path / "coll")
    _write_jsonl(spark, docs1, path)
    fields = discover_collection(spark, path)
    cat = ConfiguredCatalog(
        streams=(
            ConfiguredStream(
                config=SyncConfig(stream="coll", n_buckets=4),
                source={
                    "kind": "mongo",
                    "path": path,
                    "cursor_col": "seq",
                    "fields": fields,
                },
            ),
        )
    )
    lake = str(tmp_path / "lake")
    read_catalog(spark, cat, lake, max_events_per_epoch=25)
    t = stream_table(spark, lake, "coll")
    assert t.read().count() == 40
    assert t.watermark("coll") == 40

    # updated + new docs past the watermark; stale re-writes below it
    # must NOT be re-read (strictly greater, :183-191)
    docs2 = docs1 + [
        {"_id": "d1", "rank": 9, "body": "updated", "seq": 41},
        {"_id": "d99", "rank": 1, "body": "new", "seq": 42},
    ]
    _write_jsonl(spark, docs2, path)
    read_catalog(spark, cat, lake, max_events_per_epoch=25)
    t = stream_table(spark, lake, "coll")
    rows = {r["url"]: r for r in t.read().collect()}
    assert len(rows) == 41
    assert rows["d1"]["body"] == "updated" and rows["d1"]["rank"] == 9
    assert rows["d99"]["body"] == "new"
    assert t.watermark("coll") == 42
    # idempotent re-run: nothing past the watermark => no new version
    v = t.current_version()
    read_catalog(spark, cat, lake, max_events_per_epoch=25)
    assert stream_table(spark, lake, "coll").current_version() == v


def test_catalog_mongo_full_refresh(spark, tmp_path):
    docs = [{"_id": f"d{i}", "v": i} for i in range(10)]
    path = str(tmp_path / "coll_fr")
    _write_jsonl(spark, docs, path)
    cat = ConfiguredCatalog(
        streams=(
            ConfiguredStream(
                config=SyncConfig(
                    stream="coll_fr",
                    primary_key=("_id",),
                    cursor_field=("v",),
                    sync_mode=SyncMode.FULL_REFRESH,
                    destination_sync_mode=DestinationSyncMode.OVERWRITE,
                    n_buckets=2,
                ),
                source={"kind": "mongo", "path": path, "cursor_col": "v"},
            ),
        )
    )
    lake = str(tmp_path / "lake_fr")
    read_catalog(spark, cat, lake)
    t = stream_table(spark, lake, "coll_fr")
    assert t.read().count() == 10
    # overwrite semantics: a shrunken collection replaces the table
    _write_jsonl(spark, docs[:4], path)
    read_catalog(spark, cat, lake)
    assert stream_table(spark, lake, "coll_fr").read().count() == 4


def test_schema_render(spark):
    fields = discover_collection(spark, _coll(spark))
    s = collection_schema(fields)
    assert s["_id"].dataType == T.StringType()
    assert isinstance(s["meta"].dataType, T.StructType)


# ------------------------------------------------------- change streams
# (native server wire: resume tokens, BsonTimestamp (t,i) positions,
# key-only deletes — no before image)


def _stream_events(spark):
    # t=100 second batch with ordinals, then t=101; d2 deleted LAST
    evs = [
        {"_id": {"_data": "tok-1"}, "operationType": "insert",
         "clusterTime": {"$timestamp": {"t": 100, "i": 1}},
         "documentKey": {"_id": "d1"},
         "fullDocument": {"_id": "d1", "n": 5, "seq": 1}},
        {"_id": {"_data": "tok-2"}, "operationType": "update",
         "clusterTime": {"$timestamp": {"t": 100, "i": 2}},
         "documentKey": {"_id": "d1"},
         "fullDocument": {"_id": "d1", "n": "five", "seq": 2}},
        {"_id": {"_data": "tok-3"}, "operationType": "insert",
         "clusterTime": {"$timestamp": {"t": 100, "i": 3}},
         "documentKey": {"_id": "d2"},
         "fullDocument": {"_id": "d2", "n": 7, "seq": 3}},
        {"_id": {"_data": "tok-4"}, "operationType": "delete",
         "clusterTime": {"$timestamp": {"t": 101, "i": 1}},
         "documentKey": {"_id": "d2"}},
    ]
    return spark.createDataFrame(
        [(json.dumps(e),) for e in evs], "value string"
    )


def _doc_fields(spark):
    # discovery over the collection's own documents (mixed n)
    docs = [{"_id": "d1", "n": 5, "seq": 1}, {"_id": "d1", "n": "five", "seq": 2}]
    return discover_collection(spark, _coll(spark, docs))


def test_change_stream_decode(spark):
    from airbyte_integrations_spark.sources.mongo import parse_change_stream

    ev = parse_change_stream(_stream_events(spark), _doc_fields(spark))
    rows = sorted(ev.collect(), key=lambda r: r["_ab_cdc_lsn"])
    # BsonTimestamp fold: t<<32 | i — same-second ordinals stay ordered,
    # later seconds outrank every earlier ordinal
    lsns = [r["_ab_cdc_lsn"] for r in rows]
    assert lsns == sorted(lsns) and len(set(lsns)) == 4
    assert lsns[0] == (100 << 32) + 1 and lsns[3] == (101 << 32) + 1
    # mixed-typed payload field decodes under its suffixed name
    assert rows[0]["n" + AIRBYTE_SUFFIX] == "5"
    assert rows[1]["n" + AIRBYTE_SUFFIX] == "five"
    # key-only delete: key present, every payload column null
    d = rows[3]
    assert d["_id"] == "d2" and d["_ab_cdc_deleted_at"] is not None
    assert d["n" + AIRBYTE_SUFFIX] is None and d["seq"] is None
    assert d["_resume_token"] == "tok-4"


def test_change_stream_roundtrip_and_latest_token(spark):
    from airbyte_integrations_spark.sources.mongo import (
        emit_change_stream,
        latest_resume_token,
        parse_change_stream,
    )
    from airbyte_integrations_spark.gen import gen_change_events

    ce = gen_change_events(spark, 300, n_urls=40)
    lines = emit_change_stream(ce, ["text", "lang"])
    docs = [{"_id": "u", "text": "t", "lang": "en"}]
    fields = discover_collection(spark, _coll(spark, docs))
    back = parse_change_stream(lines, fields)
    a = ce.select(
        F.col("url").alias("_id"), "_ab_cdc_lsn",
        F.col("_ab_cdc_deleted_at").isNotNull().alias("is_del"),
    ).toPandas()
    b = back.select(
        "_id", "_ab_cdc_lsn",
        F.col("_ab_cdc_deleted_at").isNotNull().alias("is_del"),
    ).toPandas()
    import pandas as pd

    pd.testing.assert_frame_equal(
        a.sort_values("_ab_cdc_lsn").reset_index(drop=True),
        b.sort_values("_ab_cdc_lsn").reset_index(drop=True),
        check_dtype=False,
    )
    # live rows carry the payload; deletes are key-only
    live = back.filter(F.col("_ab_cdc_deleted_at").isNull())
    assert live.filter(F.col("text").isNull()).count() == 0
    dead = back.filter(F.col("_ab_cdc_deleted_at").isNotNull())
    assert dead.count() > 0 and dead.filter(F.col("text").isNotNull()).count() == 0
    # resumeAfter cursor = token at max position
    hi = back.agg(F.max("_ab_cdc_lsn")).collect()[0][0]
    tok = latest_resume_token(back)
    assert tok == back.filter(F.col("_ab_cdc_lsn") == hi).collect()[0]["_resume_token"]


def test_catalog_mongo_cdc_key_only_deletes_merge(spark, tmp_path):
    # the semantics that differ from WAL CDC: the tombstone has NO
    # before image, so the MERGE must delete by key alone
    path = str(tmp_path / "stream")
    _stream_events(spark).coalesce(1).write.text(path)
    fields = _doc_fields(spark)
    cat = ConfiguredCatalog(
        streams=(
            ConfiguredStream(
                config=SyncConfig(stream="coll", primary_key=("_id",), n_buckets=2),
                source={"kind": "mongo_cdc", "path": path, "fields": fields},
            ),
        )
    )
    lake = str(tmp_path / "lake")
    read_catalog(spark, cat, lake, max_events_per_epoch=2)
    t = stream_table(spark, lake, "coll")
    rows = {r["_id"]: r for r in t.read().collect()}
    # d2 was inserted then deleted by key only => absent; d1's winner is
    # the later update (string-typed n under the mixed rule)
    assert set(rows) == {"d1"}
    assert rows["d1"]["n" + AIRBYTE_SUFFIX] == "five"
    assert t.watermark("coll") == (101 << 32) + 1
    # idempotent re-run
    v = t.current_version()
    read_catalog(spark, cat, lake, max_events_per_epoch=2)
    assert stream_table(spark, lake, "coll").current_version() == v


def test_db_level_change_stream_routes_collections(spark):
    """db.watch() wire: one stream, every collection, ns.coll routes."""
    from airbyte_integrations_spark.gen import gen_change_events
    from airbyte_integrations_spark.sources.mongo import (
        emit_change_stream,
        fields_from_schema,
        shared_change_stream,
    )

    ce = gen_change_events(spark, 200, n_urls=30).withColumn(
        "coll", F.when(F.col("_ab_cdc_lsn") % 2 == 0, "pages_a").otherwise("pages_b")
    )
    lines = emit_change_stream(
        ce, ["text", "lang"], collection_col="coll", db_name="crawl"
    )
    # ns renders per-row
    one = json.loads(lines.first()["value"])
    assert one["ns"]["db"] == "crawl" and one["ns"]["coll"] in ("pages_a", "pages_b")
    log = shared_change_stream(
        spark, lines, fields_from_schema("text string, lang string")
    )
    got = {
        (r["stream"], r["_ab_cdc_lsn"] % 2)
        for r in log.select("stream", "_ab_cdc_lsn").collect()
    }
    assert got == {("pages_a", 0), ("pages_b", 1)}
    # resume tokens ride; positions are the global BsonTimestamp order
    assert log.filter(F.col("_resume_token").isNull()).count() == 0


def test_multi_collection_change_stream_global_state_sync(spark, tmp_path):
    """Two collections' changes in ONE database-level change stream,
    synced lock-step with GLOBAL state through the cdc_shared machinery
    — the Mongo analogue of the multi-table Debezium envelope log,
    key-only deletes included."""
    from airbyte_integrations_spark.gen import gen_change_events
    from airbyte_integrations_spark.sources.mongo import emit_change_stream
    from tests.util import assert_frames_equal, duckdb_winners

    cols = ["text", "lang"]
    ev_a = gen_change_events(spark, 360, n_urls=40).withColumn(
        "_ab_cdc_lsn", 2 * F.col("_ab_cdc_lsn")
    ).withColumn("coll", F.lit("pages_a"))
    ev_b = gen_change_events(spark, 180, n_urls=25, seed="cdc2").withColumn(
        "_ab_cdc_lsn", 2 * F.col("_ab_cdc_lsn") + 1
    ).withColumn("coll", F.lit("pages_b"))
    wal = ev_a.unionByName(ev_b)
    path = str(tmp_path / "dbwatch")
    emit_change_stream(wal, cols, collection_col="coll").coalesce(2).write.text(path)

    members = tuple(
        ConfiguredStream(
            config=SyncConfig(stream=n, primary_key=("_id",), n_buckets=4),
            source={
                "kind": "cdc_shared",
                "group": "dbwatch",
                "mongo_path": path,
                "value_schema": "text string, lang string",
            },
        )
        for n in ("pages_a", "pages_b")
    )
    lake = str(tmp_path / "lake")
    msgs = read_catalog(
        spark, ConfiguredCatalog(streams=members), lake, max_events_per_epoch=250
    )
    assert msgs and all(m["state"]["state_type"] == "GLOBAL" for m in msgs)
    for name, src in (("pages_a", ev_a), ("pages_b", ev_b)):
        got = (
            stream_table(spark, lake, name)
            .read_live()
            .select(F.col("_id").alias("url"), *cols, "_ab_cdc_lsn")
            .toPandas()
        )
        want = duckdb_winners(src.drop("coll").toPandas())[
            ["url"] + cols + ["_ab_cdc_lsn"]
        ]
        assert_frames_equal(got, want, sort_cols=("url",))
    # key-only deletes really removed rows
    assert (
        stream_table(spark, lake, "pages_a").read_live().count()
        < ev_a.select("url").distinct().count()
    )
    # idempotent re-run through the catalog arm
    assert (
        read_catalog(
            spark, ConfiguredCatalog(streams=members), lake, max_events_per_epoch=250
        )
        == []
    )


def _ud_events(spark):
    evs = [
        {"_id": {"_data": "u-1"}, "operationType": "insert",
         "clusterTime": {"$timestamp": {"t": 100, "i": 1}},
         "documentKey": {"_id": "d1"},
         "fullDocument": {"_id": "d1", "n": 5, "seq": 1}},
        {"_id": {"_data": "u-2"}, "operationType": "update",
         "clusterTime": {"$timestamp": {"t": 100, "i": 2}},
         "documentKey": {"_id": "d1"},
         "updateDescription": {"updatedFields": {"seq": 2},
                               "removedFields": []}},
        {"_id": {"_data": "u-3"}, "operationType": "update",
         "clusterTime": {"$timestamp": {"t": 100, "i": 3}},
         "documentKey": {"_id": "d1"},
         "updateDescription": {"updatedFields": {},
                               "removedFields": ["n"]}},
        {"_id": {"_data": "u-4"}, "operationType": "insert",
         "clusterTime": {"$timestamp": {"t": 100, "i": 4}},
         "documentKey": {"_id": "d2"},
         "fullDocument": {"_id": "d2", "n": 7, "seq": 3}},
        {"_id": {"_data": "u-5"}, "operationType": "delete",
         "clusterTime": {"$timestamp": {"t": 101, "i": 1}},
         "documentKey": {"_id": "d2"}},
    ]
    return spark.createDataFrame([(json.dumps(e),) for e in evs], "value string")


def test_update_description_decode_masks(spark):
    """The DEFAULT update wire (no updateLookup): updatedFields/$set,
    removedFields/$unset, and the _w_ write masks that let an explicit
    null win in the patch fold."""
    from airbyte_integrations_spark.sources.mongo import (
        fields_from_schema,
        parse_change_stream,
    )
    from airbyte_integrations_spark.operators.patch import coalesce_patches

    fields = fields_from_schema("n bigint, seq bigint")
    ev = parse_change_stream(_ud_events(spark), fields, update_description=True)
    rows = {r["_resume_token"]: r for r in ev.collect()}
    # insert: every field written
    assert rows["u-1"]["_w_n"] and rows["u-1"]["_w_seq"]
    assert rows["u-1"]["n"] == 5 and rows["u-1"]["seq"] == 1
    # $set seq only: n untouched (NOT written), value null
    assert rows["u-2"]["_w_seq"] and not rows["u-2"]["_w_n"]
    assert rows["u-2"]["seq"] == 2 and rows["u-2"]["n"] is None
    # $unset n: written with null
    assert rows["u-3"]["_w_n"] and rows["u-3"]["n"] is None
    assert not rows["u-3"]["_w_seq"]
    # delete: nothing written
    assert not rows["u-5"]["_w_n"] and not rows["u-5"]["_w_seq"]
    # fold: d1 ends at n=null (unset wins over the insert's 5), seq=2;
    # d2's winner is the tombstone -> dropped
    out = coalesce_patches(
        ev.withColumnRenamed("_id", "url"),
        patch_cols=("n", "seq"), mask_cols=("_w_n", "_w_seq"),
    )
    got = {r["url"]: (r["n"], r["seq"]) for r in out.collect()}
    assert got == {"d1": (None, 2)}


def test_update_description_nested_path_policy(spark):
    from airbyte_integrations_spark.sources.mongo import (
        fields_from_schema,
        parse_change_stream,
    )

    dotted = spark.createDataFrame(
        [(json.dumps({
            "_id": {"_data": "u-9"}, "operationType": "update",
            "clusterTime": {"$timestamp": {"t": 102, "i": 1}},
            "documentKey": {"_id": "d1"},
            "updateDescription": {"updatedFields": {"meta.k": 2},
                                  "removedFields": []},
        }),)],
        "value string",
    )
    fields = fields_from_schema("n bigint, seq bigint")
    with pytest.raises(Exception, match="nested"):
        parse_change_stream(
            dotted, fields, update_description=True
        ).collect()
    ok = parse_change_stream(
        dotted, fields, update_description=True, nested_updates="ignore"
    ).collect()
    assert len(ok) == 1 and not ok[0]["_w_n"] and not ok[0]["_w_seq"]


def test_catalog_mongo_update_description_end_to_end(spark, tmp_path):
    """Patch semantics through the whole loop: emit the default update
    wire from a generated op-typed log, sync via mongo_cdc with
    update_description, and converge to the mask-aware whole-log fold
    — epochs split mid-stream, idempotent re-run."""
    from pyspark.sql import Window
    from airbyte_integrations_spark.gen import gen_change_events
    from airbyte_integrations_spark.operators.patch import coalesce_patches
    from airbyte_integrations_spark.sources.mongo import (
        emit_change_stream,
        fields_from_schema,
        parse_change_stream,
    )

    ce = gen_change_events(spark, 900, n_urls=80, seed="mongoud")
    rn = F.row_number().over(
        Window.partitionBy("url").orderBy(F.col("_ab_cdc_lsn").asc())
    )
    lsn = F.col("_ab_cdc_lsn")
    ev = (
        ce.withColumn("rn", rn)
        .withColumn(
            "op",
            F.when(F.col("rn") == 1, "insert").otherwise("update"),
        )
        .withColumn(
            "removed",
            F.when(
                (F.col("op") == "update") & (lsn % 14 == 0),
                F.array(F.lit("lang")),
            ).otherwise(F.array().cast("array<string>")),
        )
        .withColumn(
            "text",
            F.when((F.col("op") == "insert") | (lsn % 3 != 0), F.col("text")),
        )
        .withColumn(
            "lang",
            F.when(
                (F.col("op") == "insert")
                | ((lsn % 2 != 0) & (lsn % 14 != 0)),
                F.col("lang"),
            ),
        )
    )
    path = str(tmp_path / "udstream")
    emit_change_stream(
        ev, ["text", "lang"], op_col="op", removed_col="removed"
    ).coalesce(1).write.text(path)

    fields = fields_from_schema("text string, lang string")
    parsed = parse_change_stream(
        spark.read.text(path), fields, update_description=True
    )
    want = (
        coalesce_patches(
            parsed.withColumnRenamed("_id", "url"),
            patch_cols=("text", "lang"),
            mask_cols=("_w_text", "_w_lang"),
        )
        .select("url", "_ab_cdc_lsn", "text", "lang")
        .toPandas()
    )
    # sanity: the wire really contains untouched-vs-unset distinctions
    assert parsed.filter(
        F.col("_w_lang") & F.col("lang").isNull()
        & F.col("_ab_cdc_deleted_at").isNull()
    ).count() > 0

    cat = ConfiguredCatalog(
        streams=(
            ConfiguredStream(
                config=SyncConfig(stream="coll", primary_key=("_id",), n_buckets=4),
                source={
                    "kind": "mongo_cdc",
                    "path": path,
                    "value_schema": "text string, lang string",
                    "update_description": True,
                },
            ),
        )
    )
    lake = str(tmp_path / "lake")
    read_catalog(spark, cat, lake, max_events_per_epoch=150)
    t = stream_table(spark, lake, "coll")
    got = (
        t.read_live()
        .select(F.col("_id").alias("url"), "_ab_cdc_lsn", "text", "lang")
        .toPandas()
    )
    from tests.util import assert_frames_equal

    assert_frames_equal(got, want, sort_cols=("url",))
    v = t.current_version()
    read_catalog(spark, cat, lake, max_events_per_epoch=150)
    assert stream_table(spark, lake, "coll").current_version() == v


# --------------------------------------------------- discovery -> catalog


def test_mongo_streams_from_discovery(spark, tmp_path):
    from airbyte_integrations_spark.catalog_sync import (
        mongo_streams_from_discovery,
    )

    p1 = str(tmp_path / "users")
    p2 = str(tmp_path / "pages")
    _write_jsonl(spark, [{"_id": f"u{i}", "age": i} for i in range(5)], p1)
    _write_jsonl(spark, [{"_id": f"p{i}", "seq": i, "t": "x"} for i in range(8)], p2)
    streams = mongo_streams_from_discovery(
        spark, {"users": p1, "pages": p2}, cursor_overrides={"pages": "seq"}
    )
    by = {s.config.stream: s for s in streams}
    # every collection becomes a stream; _id is ALWAYS the discovered pk
    assert set(by) == {"users", "pages"}
    assert by["users"].config.sync_mode == SyncMode.FULL_REFRESH
    assert by["users"].config.primary_key == ("_id",)
    assert by["pages"].config.sync_mode == SyncMode.INCREMENTAL
    assert by["pages"].source["cursor_col"] == "seq"
    # the catalog is runnable as-is
    lake = str(tmp_path / "lake_disc")
    read_catalog(spark, ConfiguredCatalog(streams=tuple(streams)), lake)
    assert stream_table(spark, lake, "pages").read().count() == 8
    assert stream_table(spark, lake, "users").read().count() == 5
    # a non-numeric cursor is rejected at catalog-build time
    with pytest.raises(ValueError, match="numeric"):
        mongo_streams_from_discovery(
            spark, {"pages": p2}, cursor_overrides={"pages": "t"}
        )


def test_json_cli_mongo_kinds(spark, tmp_path):
    import io

    from airbyte_integrations_spark.entrypoint import run

    coll = str(tmp_path / "coll")
    _write_jsonl(
        spark,
        [{"_id": f"d{i}", "n": i if i % 2 else str(i), "seq": i} for i in range(6)],
        coll,
    )
    stream_path = str(tmp_path / "stream")
    _stream_events(spark).coalesce(1).write.text(stream_path)
    cfg = tmp_path / "config.json"
    cfg.write_text(json.dumps({"log_path": coll}))
    cat = tmp_path / "catalog.json"
    cat.write_text(
        json.dumps(
            {
                "streams": [
                    {
                        "name": "coll",
                        "sync_mode": "incremental",
                        "destination_sync_mode": "append_dedup",
                        "primary_key": ["url"],
                        "source": {
                            "kind": "mongo",
                            "path": coll,
                            "cursor_col": "seq",
                        },
                    },
                    {
                        "name": "cs",
                        "sync_mode": "incremental",
                        "destination_sync_mode": "append_dedup",
                        "primary_key": ["_id"],
                        "source": {
                            "kind": "mongo_cdc",
                            "path": stream_path,
                            "value_schema": (
                                "_id string, n_aibyte_transform string, seq bigint"
                            ),
                        },
                    },
                ]
            }
        )
    )
    buf = io.StringIO()
    code = run(
        ["read", "--config", str(cfg), "--catalog", str(cat)],
        spark=spark,
        out=buf,
    )
    assert code == 0
    msgs = [json.loads(ln) for ln in buf.getvalue().splitlines()]
    recs = [m for m in msgs if m["type"] == "RECORD"]
    by_stream = {}
    for m in recs:
        by_stream.setdefault(m["record"]["stream"], []).append(m["record"]["data"])
    assert len(by_stream["coll"]) == 6
    # mixed rule surfaced through the CLI (declared via value_schema on
    # the cdc stream, discovered on the collection stream); the cursor
    # rides normalized as _ab_cdc_lsn
    assert {"n_aibyte_transform", "_ab_cdc_lsn"} <= set(by_stream["coll"][0])
    assert len(by_stream["cs"]) == 4
    deletes = [d for d in by_stream["cs"] if d["_ab_cdc_deleted_at"] is not None]
    assert len(deletes) == 1 and deletes[0]["_id"] == "d2"
    assert deletes[0]["n_aibyte_transform"] is None  # key-only tombstone
    states = [m for m in msgs if m["type"] == "STATE"]
    assert states, "state documents emitted"


def test_mongo_incremental_snapshot_with_change_stream_tail(spark, tmp_path):
    """DBLog-style chunked initial sync of a collection interleaved
    with the change-stream tail — the generic incremental-snapshot
    loop composed over the mongo wire (key-only deletes included):
    final state must equal the monolithic snapshot_then_tail replay,
    and a crash after K chunks resumes exactly."""
    from airbyte_integrations_spark.gen import gen_change_events, gen_pages
    from airbyte_integrations_spark.lakehouse.table import LakeTable
    from airbyte_integrations_spark.operators.dedup import winner_window
    from airbyte_integrations_spark.sources.cdc import LogTailSource
    from airbyte_integrations_spark.sources.incremental_snapshot import (
        incremental_snapshot_sync,
    )
    from airbyte_integrations_spark.sources.mongo import (
        discover_collection,
        emit_change_stream,
        parse_change_stream,
    )

    n_docs, n_events = 150, 600
    pages = (
        gen_pages(spark, n_docs, seed="msnap")
        .select(F.col("url").alias("_id"), "text", "lang")
        .cache()
    )
    ce = gen_change_events(
        spark, n_events, n_urls=n_docs, seed="msnapcdc", delete_pct=12
    ).cache()
    stream_path = str(tmp_path / "stream")
    emit_change_stream(ce, ["text", "lang"]).coalesce(2).write.text(stream_path)
    fields = discover_collection(
        spark,
        spark.createDataFrame(
            [(json.dumps({"_id": "u", "text": "t", "lang": "en"}),)],
            "value string",
        ),
    )
    events = parse_change_stream(spark.read.text(stream_path), fields).drop(
        "_op", "_resume_token"
    )
    log = LogTailSource(events)
    hi = log.target_position()
    payload = ["_id", "text", "lang"]

    snap = (
        pages.withColumn("_ab_cdc_lsn", F.lit(0).cast("long"))
        .withColumn(
            "_ab_cdc_updated_at", F.lit("2020-01-01 00:00:00").cast("timestamp")
        )
        .withColumn("_ab_cdc_deleted_at", F.lit(None).cast("timestamp"))
        .withColumn(
            "_airbyte_ab_id", F.md5(F.concat(F.lit("snap:"), F.col("_id")))
        )
        .withColumn("_airbyte_emitted_at", F.col("_ab_cdc_updated_at"))
    )

    def live_payload(pos):
        full = snap.unionByName(
            events.filter(F.col("_ab_cdc_lsn") <= F.lit(pos)),
            allowMissingColumns=True,
        )
        return winner_window(full, key=("_id",), drop_tombstones=True).select(
            *payload
        )

    def make_select(table):
        def select_chunk(pred):
            lw = table.watermark("coll") or 0
            # ~80 more events land during each chunk's select
            seen = min(lw + 80 * (1 << 32), hi)
            return live_payload(seen).filter(pred), seen

        return select_chunk

    cfg = SyncConfig(stream="coll", primary_key=("_id",), n_buckets=4)
    table = LakeTable(spark, str(tmp_path / "lake"))
    committed = incremental_snapshot_sync(
        spark,
        make_select(table),
        log,
        table,
        cfg,
        n_chunks=4,
        wal_step_events=150 * (1 << 32),
        extract_missing_text=False,
    )
    assert committed == [f"chunk:{i}" for i in range(4)]
    want = live_payload(hi)
    got = table.read_live().select(*payload)
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
    assert table.watermark("coll") == hi

    # crash after 2 chunks, then resume from scratch state
    table2 = LakeTable(spark, str(tmp_path / "lake2"))
    first = incremental_snapshot_sync(
        spark, make_select(table2), log, table2, cfg,
        n_chunks=4, wal_step_events=150 * (1 << 32),
        max_chunks=2, extract_missing_text=False, drain=False,
    )
    assert len(first) == 2
    rest = incremental_snapshot_sync(
        spark, make_select(table2), log, table2, cfg,
        n_chunks=4, wal_step_events=150 * (1 << 32),
        extract_missing_text=False,
    )
    assert [f"chunk:{i}" for i in range(4)] == sorted(first + rest)
    got2 = table2.read_live().select(*payload)
    assert got2.exceptAll(want).count() == 0 and want.exceptAll(got2).count() == 0


def test_change_stream_malformed_policies(spark):
    from airbyte_integrations_spark.sources.mongo import parse_change_stream

    good = _stream_events(spark)
    bad = spark.createDataFrame([("%%%garbage%%%",)], "value string")
    lines = good.unionByName(bad)
    fields = _doc_fields(spark)
    with pytest.raises(Exception, match="FAILFAST|Malformed"):
        parse_change_stream(lines, fields).collect()
    assert parse_change_stream(lines, fields, malformed="skip").count() == 4


def test_json_cli_db_watch_and_update_description(spark, tmp_path):
    """The two newest mongo arms through the JSON CLI: a db.watch()
    shared stream routed by ns.coll with GLOBAL state, and an
    update-description read whose records carry the _w_ write masks."""
    import io

    from airbyte_integrations_spark.entrypoint import run
    from airbyte_integrations_spark.gen import gen_change_events
    from airbyte_integrations_spark.sources.mongo import emit_change_stream

    ce = gen_change_events(spark, 300, n_urls=40).withColumn(
        "coll",
        F.when(F.col("_ab_cdc_lsn") % 2 == 0, "pages_a").otherwise("pages_b"),
    )
    watch = str(tmp_path / "dbwatch")
    emit_change_stream(
        ce, ["text", "lang"], collection_col="coll"
    ).coalesce(1).write.text(watch)
    ud = str(tmp_path / "ud")
    _ud_events(spark).coalesce(1).write.text(ud)

    cfg = tmp_path / "config.json"
    cfg.write_text(json.dumps({"log_path": watch}))
    cat = tmp_path / "catalog.json"
    cat.write_text(
        json.dumps(
            {
                "streams": [
                    *(
                        {
                            "name": n,
                            "sync_mode": "incremental",
                            "destination_sync_mode": "append_dedup",
                            "primary_key": ["_id"],
                            "source": {
                                "kind": "cdc_shared",
                                "group": "dbwatch",
                                "mongo_path": watch,
                                "value_schema": "text string, lang string",
                            },
                        }
                        for n in ("pages_a", "pages_b")
                    ),
                    {
                        "name": "ud",
                        "sync_mode": "incremental",
                        "destination_sync_mode": "append_dedup",
                        "primary_key": ["_id"],
                        "source": {
                            "kind": "mongo_cdc",
                            "path": ud,
                            "value_schema": "n bigint, seq bigint",
                            "update_description": True,
                        },
                    },
                ]
            }
        )
    )
    buf = io.StringIO()
    code = run(
        ["read", "--config", str(cfg), "--catalog", str(cat)],
        spark=spark,
        out=buf,
    )
    assert code == 0
    msgs = [json.loads(ln) for ln in buf.getvalue().splitlines()]
    by_stream = {}
    for m in msgs:
        if m["type"] == "RECORD":
            by_stream.setdefault(m["record"]["stream"], []).append(
                m["record"]["data"]
            )
    # db.watch routing: both collections, counts match the parity split
    n_a = ce.filter("_ab_cdc_lsn % 2 = 0").count()
    assert len(by_stream["pages_a"]) == n_a
    assert len(by_stream["pages_b"]) == ce.count() - n_a
    # GLOBAL state for the shared group
    states = [m["state"] for m in msgs if m["type"] == "STATE"]
    assert any(s.get("state_type") == "GLOBAL" for s in states)
    # update-description records surface the write masks: the $set-seq
    # event wrote seq but NOT n
    ud_recs = {d["_resume_token"]: d for d in by_stream["ud"]}
    assert ud_recs["u-2"]["_w_seq"] and not ud_recs["u-2"]["_w_n"]
    assert ud_recs["u-3"]["_w_n"] and ud_recs["u-3"]["n"] is None


def test_discovery_and_read_arbitrary_field_names(spark):
    """Keys with dots, spaces, brackets and quotes extract as LITERAL
    fields (bracket-notation variant paths), never as nested lookups —
    the reference handles arbitrary Mongo field names
    (MongoUtils.getUniqueFields unions raw document keys)."""
    docs = [
        {"_id": "d1", "a.b": 1, "c d": 2, "e'f": 3, 'g"h': 4,
         "i[j]": 5, "seq": 1, "obj.x": {"k": 9}, "arr.y": [1, 2]},
        {"_id": "d2", "a.b": 10, "seq": 2},
    ]
    lines = spark.createDataFrame(
        [(json.dumps(d),) for d in docs], "value string"
    )
    fields = discover_collection(spark, lines.select("value"))
    by_name = {f.name: f for f in fields}
    for k in ("a.b", "c d", "e'f", 'g"h', "i[j]"):
        assert k in by_name, k
    # dotted object key recurses into a real struct; dotted array key
    # types its elements
    assert isinstance(by_name["obj.x"].dtype, T.StructType)
    assert isinstance(by_name["arr.y"].dtype, T.ArrayType)
    assert isinstance(by_name["arr.y"].dtype.elementType, T.LongType)
    out = {
        r["_id"]: r
        for r in read_collection(spark, lines.select("value"), fields).collect()
    }
    r1 = out["d1"]
    assert r1["a.b"] == 1 and r1["c d"] == 2 and r1["e'f"] == 3
    assert r1['g"h'] == 4 and r1["i[j]"] == 5
    assert r1["obj.x"]["k"] == 9 and list(r1["arr.y"]) == [1, 2]
    r2 = out["d2"]
    assert r2["a.b"] == 10 and r2["c d"] is None


def test_both_quote_chars_field_name_fails_loudly(spark):
    from airbyte_integrations_spark.sources.mongo import _path_seg

    with pytest.raises(ValueError, match="both quote"):
        _path_seg("""a'b"c""")
