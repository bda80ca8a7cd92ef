"""Round-4 ADVICE fixes pinned by test:

1. incremental+append cdc/dataframe streams get a synthesized
   lsn-bounded epoch: re-running read_catalog is a no-op and the
   watermark advances (previously every re-run re-appended the source).
2. incremental+append without a total order is explicitly rejected.
3. jdbc_streams_from_discovery falls back to the first DISCOVERED
   column (never a domain-name default) for PK-less full-refresh
   tables.
4. hopping_rates integer cents use round(), matching session_stats.
"""

import pytest
from pyspark.sql import functions as F

from airbyte_integrations_spark.catalog_sync import (
    ConfiguredCatalog,
    ConfiguredStream,
    jdbc_streams_from_discovery,
    read_catalog,
    stream_table,
)
from airbyte_integrations_spark.config import DestinationSyncMode, SyncConfig, SyncMode
from airbyte_integrations_spark.gen import gen_change_events

COLS = [
    "url", "warc_ts", "text", "lang",
    "_ab_cdc_lsn", "_ab_cdc_updated_at", "_ab_cdc_deleted_at",
    "_airbyte_ab_id", "_airbyte_emitted_at",
]

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _incr_append_catalog(df):
    cs = ConfiguredStream(
        config=SyncConfig(
            stream="raw_log",
            sync_mode=SyncMode.INCREMENTAL,
            destination_sync_mode=DestinationSyncMode.APPEND,
            n_buckets=4,
        ),
        source={"kind": "dataframe", "df": df},
    )
    return ConfiguredCatalog(streams=(cs,))


def test_incremental_append_rerun_is_noop_and_watermark_advances(spark, tmp_path):
    ev = gen_change_events(spark, 600, n_urls=30).select(*COLS).cache()
    lake = str(tmp_path / "lake")
    read_catalog(spark, _incr_append_catalog(ev), lake)
    t = stream_table(spark, lake, "raw_log")
    assert t.read().count() == 600
    assert t.watermark("raw_log") == 600  # epoch_meta carries to_lsn

    # re-run of the SAME source: no duplication (the epoch is committed
    # and the batch past the watermark is empty)
    read_catalog(spark, _incr_append_catalog(ev), lake)
    assert t.read().count() == 600

    # a grown source appends ONLY the tail past the watermark
    grown = gen_change_events(spark, 900, n_urls=30).select(*COLS)
    read_catalog(spark, _incr_append_catalog(grown), lake)
    assert t.read().count() == 900
    assert t.watermark("raw_log") == 900
    # appended rows are exactly the events above the old watermark
    assert t.read().filter(F.col("_ab_cdc_lsn") <= 600).count() == 600


def test_incremental_append_without_total_order_rejected(spark, tmp_path):
    df = spark.range(10).select(F.col("id").cast("string").alias("url"))
    cs = ConfiguredStream(
        config=SyncConfig(
            stream="unordered",
            sync_mode=SyncMode.INCREMENTAL,
            destination_sync_mode=DestinationSyncMode.APPEND,
            n_buckets=4,
        ),
        source={"kind": "dataframe", "df": df},
    )
    with pytest.raises(ValueError, match="_ab_cdc_lsn"):
        read_catalog(spark, ConfiguredCatalog(streams=(cs,)), str(tmp_path / "l"))


def test_discovery_pk_fallback_is_first_discovered_column(spark, tmp_path):
    db = str(tmp_path / "nopkdb")
    url = f"jdbc:derby:{db};create=true"
    jvm = spark._jvm
    jvm.java.lang.Class.forName(DERBY_DRIVER)
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    # deliberately NO primary key and NO column named "url"
    st.execute("CREATE TABLE metrics (metric_name VARCHAR(40), val BIGINT)")
    st.execute("INSERT INTO metrics VALUES ('a', 1)")
    st.close()
    conn.close()
    (cs,) = jdbc_streams_from_discovery(
        spark, f"jdbc:derby:{db}", driver=DERBY_DRIVER, n_buckets=2
    )
    assert cs.config.primary_key == ("METRIC_NAME",)
    assert cs.config.sync_mode == SyncMode.FULL_REFRESH
    # and a full sync through the fallback key actually lands
    lake = str(tmp_path / "lake2")
    read_catalog(spark, ConfiguredCatalog(streams=(cs,)), lake)
    t = stream_table(spark, lake, cs.config.stream)
    assert t.read().count() == 1


def test_hopping_rates_cents_round_not_floor(spark):
    from airbyte_integrations_spark.operators.sessionize import hopping_rates

    # 0.29 * 100 = 28.999999999999996 in IEEE doubles: floor() loses a
    # cent; round() (the session_stats rule) keeps it
    ev = spark.createDataFrame(
        [("2024-01-01 00:05:00", "click", 0.29)], "ts string, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = hopping_rates(ev, size="1 hour", slide="1 hour", value_col="value").collect()
    assert all(r["value_cents"] == 29 for r in out)


def test_widened_table_reads_pre_drift_files_with_their_own_schema(spark, tmp_path):
    """Fuzz-found (test_fuzz_sync drift arm): after a long->string
    widening, buckets NOT rewritten since the drift still hold INT64
    parquet files; reading them with the widened manifest schema is a
    hard reader error (PARQUET_COLUMN_DATA_TYPE_MISMATCH), not a cast.
    The manifest now records a schema id per data file (Iceberg's
    per-DataFile schema bookkeeping) and every scan groups files by
    written schema, casting up — so post-drift MERGE rewrites, live
    reads, time travel, and changelog diffs all work on mixed-schema
    file sets."""
    import datetime as dt

    from airbyte_integrations_spark.lakehouse.table import LakeTable
    from airbyte_integrations_spark.streaming.microbatch import run_sync

    TS = dt.datetime(2024, 1, 1)

    def row(lsn):
        t = TS + dt.timedelta(seconds=lsn)
        return ("u0", lsn, t, None, f"ab{lsn}", t)

    base = ("url string, _ab_cdc_lsn long, _ab_cdc_updated_at timestamp, "
            "_ab_cdc_deleted_at timestamp, _airbyte_ab_id string, "
            "_airbyte_emitted_at timestamp")
    for mode in ("cow", "mor"):
        df_old = spark.createDataFrame(
            [row(i) + (i % 97,) for i in (1, 2, 10, 79)], base + ", val long"
        )
        df_new = spark.createDataFrame(
            [row(i) + (f"x{i}", f"e{i}") for i in (130, 147, 175, 193, 203, 227)],
            base + ", val string, extra string",
        )
        root = str(tmp_path / f"drift_{mode}")
        table = LakeTable(spark, root)
        cfg = SyncConfig(stream="drift", n_buckets=4, write_mode=mode)
        # tiny epochs => the hot key's bucket holds pre-drift files that a
        # post-drift epoch must read back during MERGE
        run_sync(spark, df_old, table, cfg, max_events_per_epoch=2)
        v_pre = table.current_version()
        run_sync(spark, df_new, table, cfg, max_events_per_epoch=2)
        live = table.read_live().collect()
        assert [(r["url"], r["_ab_cdc_lsn"], r["val"], r["extra"]) for r in live] == [
            ("u0", 227, "x227", "e227")
        ], mode
        # pre-drift snapshot still reads with ITS schema (time travel)
        old = table.read_live(version=v_pre).collect()
        assert [(r["url"], r["_ab_cdc_lsn"], r["val"]) for r in old] == [
            ("u0", 79, 79 % 97)
        ], mode
        # changelog across the drift conforms before images
        ch = table.changes(v_pre, table.current_version())
        assert ch.filter(F.col("_change_type") == "update_postimage").count() == 1
        # maintenance over mixed-schema files: compact folds + rewrites
        table.compact()
        assert [
            (r["url"], r["_ab_cdc_lsn"], r["val"], r["extra"])
            for r in table.read_live().collect()
        ] == [("u0", 227, "x227", "e227")], mode
