"""Continuous ingestion (Structured Streaming foreachBatch -> MERGE):
exactly-once across restarts, convergence to the batch winner rule,
and tombstone retention under arbitrary arrival order."""

import os
import time

from pyspark.sql import functions as F

from airbyte_integrations_spark.config import SyncConfig
from airbyte_integrations_spark.gen import gen_change_events
from airbyte_integrations_spark.lakehouse.table import LakeTable
from airbyte_integrations_spark.streaming.stream_sync import stream_sync
from tests.util import duckdb_winners

COLS = [
    "url", "warc_ts", "text", "lang",
    "_ab_cdc_lsn", "_ab_cdc_updated_at", "_ab_cdc_deleted_at",
    "_airbyte_ab_id", "_airbyte_emitted_at",
]


def _one_file_slices(df, log_dir, slices):
    for i, cond in enumerate(slices):
        df.filter(cond).coalesce(1).write.mode("append").parquet(log_dir)
        t = time.time() - 60 + i * 10
        for name in os.listdir(log_dir):
            p = os.path.join(log_dir, name)
            if name.endswith(".parquet") and os.path.getmtime(p) > t:
                os.utime(p, (t, t))


def test_stream_sync_converges_and_is_exactly_once(spark, tmp_path):
    ev = gen_change_events(spark, 2000, n_urls=80).select(*COLS)
    log = str(tmp_path / "log")
    _one_file_slices(
        ev, log,
        ["_ab_cdc_lsn <= 700",
         "_ab_cdc_lsn > 700 AND _ab_cdc_lsn <= 1400",
         "_ab_cdc_lsn > 1400"],
    )
    table = LakeTable(spark, str(tmp_path / "lake"))
    cfg = SyncConfig(stream="pages", n_buckets=4)

    q = stream_sync(
        spark, log, table, cfg, str(tmp_path / "ck"), max_files_per_trigger=1
    )
    q.awaitTermination()

    # one committed epoch per micro-batch, in the collision-proof
    # string namespace (a 64-bit WAL position can never equal these)
    eps = set(table.committed_epochs("pages"))
    assert len(eps) == 3 and all(e.startswith("stream:") for e in eps)

    # live state == batch winner oracle (tombstones filtered)
    live = table.read_live().toPandas()
    want = duckdb_winners(ev.toPandas(), drop_tombstones=True)
    assert sorted(live["url"]) == sorted(want["url"])
    got = live.sort_values("url").reset_index(drop=True)
    exp = want.sort_values("url").reset_index(drop=True)
    assert list(got["_airbyte_ab_id"]) == list(exp["_airbyte_ab_id"])

    # restart with the same checkpoint and no new data: nothing re-applies
    v = table.current_version()
    q2 = stream_sync(
        spark, log, table, cfg, str(tmp_path / "ck"), max_files_per_trigger=1
    )
    q2.awaitTermination()
    assert table.current_version() == v
    assert set(table.committed_epochs("pages")) == eps

    # new log files arrive: the restarted stream picks up only them
    more = gen_change_events(spark, 2600, n_urls=80).filter(
        "_ab_cdc_lsn > 2000"
    ).select(*COLS)
    more.coalesce(1).write.mode("append").parquet(log)
    q3 = stream_sync(
        spark, log, table, cfg, str(tmp_path / "ck"), max_files_per_trigger=1
    )
    q3.awaitTermination()
    all_ev = ev.unionByName(more)
    live2 = table.read_live().toPandas()
    want2 = duckdb_winners(all_ev.toPandas(), drop_tombstones=True)
    assert sorted(live2["url"]) == sorted(want2["url"])


def test_stream_sync_on_run_sync_table_retains_tombstones_through_compact(
    spark, tmp_path
):
    """The mixed lifecycle: a table CREATED by run_sync (no
    keep_tombstones prop) later tailed by stream_sync with compaction.
    The first stream merge must make the prop durable, or compact()
    silently drops the retained tombstone and a stale pre-delete image
    resurrects the key."""
    from airbyte_integrations_spark.streaming.microbatch import run_sync

    base = gen_change_events(spark, 300, n_urls=15).select(*COLS)
    table = LakeTable(spark, str(tmp_path / "lake"))
    cfg = SyncConfig(stream="pages", n_buckets=2)
    run_sync(spark, base, table, cfg, max_events_per_epoch=300,
             extract_missing_text=False)
    assert not table.props().get("keep_tombstones")

    url = base.first()["url"]
    tomb = base.limit(1).select(
        F.lit(url).alias("url"), "warc_ts", F.lit(None).cast("string").alias("text"),
        "lang", F.lit(5000).cast("long").alias("_ab_cdc_lsn"),
        "_ab_cdc_updated_at", F.current_timestamp().alias("_ab_cdc_deleted_at"),
        F.lit("zz-t").alias("_airbyte_ab_id"), "_airbyte_emitted_at",
    )
    stale = base.limit(1).select(
        F.lit(url).alias("url"), "warc_ts", F.lit("ghost").alias("text"),
        "lang", F.lit(4000).cast("long").alias("_ab_cdc_lsn"),
        "_ab_cdc_updated_at", F.lit(None).cast("timestamp").alias("_ab_cdc_deleted_at"),
        F.lit("aa-s").alias("_airbyte_ab_id"), "_airbyte_emitted_at",
    )
    log = str(tmp_path / "slog")
    _one_file_slices(tomb.unionByName(stale), log,
                     ["_ab_cdc_lsn = 5000", "_ab_cdc_lsn = 4000"])
    # compact_threshold=1 forces a compaction after every batch — the
    # hostile schedule for tombstone retention
    q = stream_sync(spark, log, table, cfg, str(tmp_path / "ck"),
                    max_files_per_trigger=1, compact_threshold=1)
    q.awaitTermination()

    assert table.props().get("keep_tombstones") is True
    assert table.read_live().filter(F.col("url") == url).count() == 0


def test_stream_sync_late_predelete_cannot_resurrect(spark, tmp_path):
    """Arbitrary arrival order: batch 1 carries a high-lsn tombstone,
    batch 2 a stale pre-delete image for the same key. The retained
    tombstone wins; the key stays deleted (keep_tombstones design)."""
    base = gen_change_events(spark, 400, n_urls=20).select(*COLS)
    # pick one url; craft a tombstone at lsn 1000 and a stale image at 900
    url = base.first()["url"]
    tomb = base.limit(1).select(
        F.lit(url).alias("url"), "warc_ts", F.lit(None).cast("string").alias("text"),
        "lang", F.lit(1000).cast("long").alias("_ab_cdc_lsn"),
        "_ab_cdc_updated_at",
        F.current_timestamp().alias("_ab_cdc_deleted_at"),
        F.lit("zz-tomb").alias("_airbyte_ab_id"), "_airbyte_emitted_at",
    )
    stale = base.limit(1).select(
        F.lit(url).alias("url"), "warc_ts", F.lit("stale-body").alias("text"),
        "lang", F.lit(900).cast("long").alias("_ab_cdc_lsn"),
        "_ab_cdc_updated_at",
        F.lit(None).cast("timestamp").alias("_ab_cdc_deleted_at"),
        F.lit("aa-stale").alias("_airbyte_ab_id"), "_airbyte_emitted_at",
    )
    log = str(tmp_path / "log")
    tomb.coalesce(1).write.mode("append").parquet(log)
    for n in os.listdir(log):
        if n.endswith(".parquet"):
            os.utime(os.path.join(log, n), (time.time() - 60,) * 2)
    stale.coalesce(1).write.mode("append").parquet(log)

    table = LakeTable(spark, str(tmp_path / "lake"))
    cfg = SyncConfig(stream="pages", n_buckets=2)
    q = stream_sync(
        spark, log, table, cfg, str(tmp_path / "ck"), max_files_per_trigger=1
    )
    q.awaitTermination()

    assert table.read_live().filter(F.col("url") == url).count() == 0
    # the tombstone row is physically retained with the winning lsn
    raw = table.read().filter(F.col("url") == url).collect()
    assert len(raw) == 1 and raw[0]["_ab_cdc_lsn"] == 1000
    assert raw[0]["_ab_cdc_deleted_at"] is not None


def test_stream_sync_debezium_envelope_tail(spark, tmp_path):
    """source_format='debezium': the stream tails raw envelope JSONL
    and the one-projection decode rides inside the streaming plan —
    same exactly-once epochs, same winner convergence, ab_ids differ
    (envelope-derived) so convergence is checked on url+lsn."""
    from airbyte_integrations_spark.sources.debezium import emit_debezium

    ev = gen_change_events(spark, 1500, n_urls=60).select(*COLS)
    log = str(tmp_path / "dbz")
    for cond in ("_ab_cdc_lsn <= 800", "_ab_cdc_lsn > 800"):
        emit_debezium(
            ev.filter(cond), ["url", "warc_ts", "text", "lang"]
        ).coalesce(1).write.mode("append").text(log)
    table = LakeTable(spark, str(tmp_path / "lake"))
    cfg = SyncConfig(stream="pages", n_buckets=4)
    vs = "url string, warc_ts timestamp, text string, lang string"

    q = stream_sync(
        spark, log, table, cfg, str(tmp_path / "ck"),
        max_files_per_trigger=1, source_format="debezium", value_schema=vs,
    )
    q.awaitTermination()
    eps = set(table.committed_epochs("pages"))
    assert len(eps) == 2 and all(e.startswith("stream:") for e in eps)
    live = table.read_live().toPandas()
    want = duckdb_winners(ev.toPandas(), drop_tombstones=True)
    got = live.sort_values("url").reset_index(drop=True)
    exp = want.sort_values("url").reset_index(drop=True)
    assert list(got["url"]) == list(exp["url"])
    assert list(got["_ab_cdc_lsn"]) == list(exp["_ab_cdc_lsn"])
    assert list(got["text"]) == list(exp["text"])

    # restart, no new envelopes: nothing re-applies
    v = table.current_version()
    q2 = stream_sync(
        spark, log, table, cfg, str(tmp_path / "ck"),
        max_files_per_trigger=1, source_format="debezium", value_schema=vs,
    )
    q2.awaitTermination()
    assert table.current_version() == v


def test_stream_sync_mongo_change_stream_tail(spark, tmp_path):
    """source_format='mongo_cdc': the stream tails native change-stream
    JSONL — folded BsonTimestamp positions and KEY-ONLY deletes decode
    inside the streaming plan; exactly-once epochs unchanged."""
    import json

    from airbyte_integrations_spark.sources.mongo import (
        discover_collection,
        emit_change_stream,
    )

    ev = gen_change_events(spark, 1500, n_urls=60).select(*COLS)
    log = str(tmp_path / "cs")
    for cond in ("_ab_cdc_lsn <= 800", "_ab_cdc_lsn > 800"):
        emit_change_stream(
            ev.filter(cond), ["text", "lang"]
        ).coalesce(1).write.mode("append").text(log)
    fields = discover_collection(
        spark,
        spark.createDataFrame(
            [(json.dumps({"_id": "u", "text": "t", "lang": "en"}),)],
            "value string",
        ),
    )
    table = LakeTable(spark, str(tmp_path / "lake"))
    cfg = SyncConfig(stream="pages", primary_key=("_id",), n_buckets=4)

    q = stream_sync(
        spark, log, table, cfg, str(tmp_path / "ck"),
        max_files_per_trigger=1, source_format="mongo_cdc", fields=fields,
    )
    q.awaitTermination()
    assert len(table.committed_epochs("pages")) == 2
    live = table.read_live().toPandas()
    want = duckdb_winners(ev.toPandas(), drop_tombstones=True)
    got = live.sort_values("_id").reset_index(drop=True)
    exp = want.sort_values("url").reset_index(drop=True)
    assert list(got["_id"]) == list(exp["url"])
    assert list(got["_ab_cdc_lsn"]) == list(exp["_ab_cdc_lsn"])
    assert list(got["text"]) == list(exp["text"])
    # deleted keys are gone even though their tombstones carried no
    # payload (key-only delete through the streaming MERGE)
    dead = set(ev.filter(F.col("_ab_cdc_deleted_at").isNotNull())
               .select("url").toPandas()["url"]) - set(exp["url"])
    assert dead and not (dead & set(got["_id"]))

    # restart with no new events: nothing re-applies
    v = table.current_version()
    q2 = stream_sync(
        spark, log, table, cfg, str(tmp_path / "ck"),
        max_files_per_trigger=1, source_format="mongo_cdc", fields=fields,
    )
    q2.awaitTermination()
    assert table.current_version() == v


def test_stream_sync_update_description_patch_tail(spark, tmp_path):
    """source_format='mongo_cdc' + update_description: the DEFAULT
    update wire ($set/$unset, no fullDocument) tails through the
    patch-overlay MERGE per trigger; per-trigger splits of the ordered
    stream compose to the whole-log mask fold, and checkpoint restart
    re-applies nothing."""
    import json
    from pyspark.sql import Window

    from airbyte_integrations_spark.operators.patch import coalesce_patches
    from airbyte_integrations_spark.sources.mongo import (
        emit_change_stream,
        fields_from_schema,
        parse_change_stream,
    )

    lsn = F.col("_ab_cdc_lsn")
    ev = (
        gen_change_events(spark, 1200, n_urls=70, seed="streamud")
        .select(*COLS)
        .withColumn(
            "op",
            F.when(
                F.row_number().over(
                    Window.partitionBy("url").orderBy(lsn.asc())
                )
                == 1,
                "insert",
            ).otherwise("update"),
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
                (F.col("op") == "insert") | ((lsn % 2 != 0) & (lsn % 14 != 0)),
                F.col("lang"),
            ),
        )
    )
    log = str(tmp_path / "udcs")
    # ordered tail: files append in stream order
    for cond in ("_ab_cdc_lsn <= 600", "_ab_cdc_lsn > 600"):
        emit_change_stream(
            ev.filter(cond).orderBy("_ab_cdc_lsn"),
            ["text", "lang"], op_col="op", removed_col="removed",
        ).coalesce(1).write.mode("append").text(log)
    fields = fields_from_schema("text string, lang string")
    table = LakeTable(spark, str(tmp_path / "lake"))
    cfg = SyncConfig(stream="pages", primary_key=("_id",), n_buckets=4)
    q = stream_sync(
        spark, log, table, cfg, str(tmp_path / "ck"),
        max_files_per_trigger=1, source_format="mongo_cdc", fields=fields,
        update_description=True,
    )
    q.awaitTermination()
    assert len(table.committed_epochs("pages")) == 2
    parsed = parse_change_stream(
        spark.read.text(log), fields, update_description=True
    )
    want = (
        coalesce_patches(
            parsed.withColumnRenamed("_id", "url"),
            patch_cols=("text", "lang"), mask_cols=("_w_text", "_w_lang"),
        )
        .select(F.col("url").alias("_id"), "_ab_cdc_lsn", "text", "lang")
    )
    got = table.read_live().select("_id", "_ab_cdc_lsn", "text", "lang")
    assert got.count() == want.count() > 0
    assert got.exceptAll(want).count() == 0
    # an $unset survived the split-trigger overlay
    assert got.filter(F.col("lang").isNull()).count() > 0

    # restart with no new events: nothing re-applies
    v = table.current_version()
    q2 = stream_sync(
        spark, log, table, cfg, str(tmp_path / "ck"),
        max_files_per_trigger=1, source_format="mongo_cdc", fields=fields,
        update_description=True,
    )
    q2.awaitTermination()
    assert table.current_version() == v


def test_stream_sync_update_description_rejects_bad_combinations(spark, tmp_path):
    """update_description only exists on the change-stream wire: any
    other source_format (or missing fields) is rejected at entry, and
    extract_missing_text cannot ride the patch arm (partial images
    never carry a full html column to extract from)."""
    import pytest

    from airbyte_integrations_spark.sources.mongo import fields_from_schema

    table = LakeTable(spark, str(tmp_path / "t"))
    cfg = SyncConfig(stream="pages", n_buckets=2)
    fields = fields_from_schema("n bigint")
    with pytest.raises(ValueError, match="mongo_cdc"):
        stream_sync(
            spark, str(tmp_path / "log"), table, cfg,
            str(tmp_path / "ck"), source_format="parquet",
            update_description=True,
        )
    with pytest.raises(ValueError, match="needs source_format"):
        stream_sync(
            spark, str(tmp_path / "log"), table, cfg,
            str(tmp_path / "ck"), source_format="mongo_cdc",
            update_description=True,  # fields missing
        )
    with pytest.raises(ValueError, match="extract_missing_text"):
        stream_sync(
            spark, str(tmp_path / "log"), table, cfg,
            str(tmp_path / "ck"), source_format="mongo_cdc",
            fields=fields, update_description=True,
            extract_missing_text=True,
        )
