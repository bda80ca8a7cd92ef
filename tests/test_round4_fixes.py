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
