"""Very-large-record path (reference parity:
DestinationAcceptanceTest.java:680 testSyncVeryBigRecords — multi-MB
single records must survive the full pipeline): one ~5 MB html payload
through Arrow-batched extraction -> winner-rule MERGE into the lake ->
staged JDBC destination publish, asserting no Arrow batch or row-size
failure and byte-exact text round-trips."""

import pytest
from pyspark.sql import functions as F

from airbyte_integrations_spark.config import SyncConfig
from airbyte_integrations_spark.functions.extract import (
    extract_text_py,
    with_extracted_text,
)
from airbyte_integrations_spark.lakehouse.table import LakeTable
from airbyte_integrations_spark.streaming.microbatch import run_sync

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"

# ~5 MB of html with markup interleaved so extraction does real work
_BIG_HTML = (
    "<html><head><title>big</title></head><body>"
    + "".join(f"<p>paragraph {i} with &amp; entities and text</p>" for i in range(80_000))
    + "</body></html>"
).encode("utf-8")


def _events(spark, n_small=50):
    """n_small ordinary events + ONE multi-MB record, change-event shape."""
    rows = [
        (
            f"https://example.com/{i}",
            i + 1,  # lsn
            f"<html><body><p>doc {i}</p></body></html>".encode(),
        )
        for i in range(n_small)
    ]
    rows.append(("https://example.com/big", n_small + 1, bytes(_BIG_HTML)))
    df = spark.createDataFrame(rows, "url string, _ab_cdc_lsn long, html binary")
    return df.select(
        "url",
        "html",
        "_ab_cdc_lsn",
        F.lit(None).cast("timestamp").alias("_ab_cdc_updated_at"),
        F.lit(None).cast("timestamp").alias("_ab_cdc_deleted_at"),
        F.md5(F.concat_ws("~", "url", F.col("_ab_cdc_lsn").cast("string"))).alias(
            "_airbyte_ab_id"
        ),
        F.lit(None).cast("timestamp").alias("_airbyte_emitted_at"),
    )


def test_multi_mb_record_extraction_merge_jdbc(spark, tmp_path):
    assert len(_BIG_HTML) > 3_000_000  # genuinely multi-MB
    ev = with_extracted_text(_events(spark), html_col="html", out_col="text")

    # 1. Arrow-batched extraction handles the oversized payload and is
    #    byte-identical to the driver-side reference implementation
    big = ev.filter(F.col("url") == "https://example.com/big").select("text").first()
    assert big["text"] == extract_text_py(bytes(_BIG_HTML))
    assert len(big["text"]) > 1_000_000

    # 2. MERGE into the lake: the big record lands and round-trips
    table = LakeTable(spark, str(tmp_path / "lake"))
    cfg = SyncConfig(stream="pages", n_buckets=4)
    run_sync(spark, ev, table, cfg, max_events_per_epoch=1000,
             extract_missing_text=False)
    final = table.read()
    assert final.count() == 51
    got = final.filter(F.col("url") == "https://example.com/big").first()
    assert got["text"] == extract_text_py(bytes(_BIG_HTML))

    # 3. staged JDBC publish — text stays on Derby's default Spark
    #    string mapping (CLOB: the only Derby type that fits multi-MB
    #    strings; overwrite-publish never compares it)
    from airbyte_integrations_spark.destinations.jdbc import (
        JdbcDestination,
        JdbcDestinationConfig,
    )

    db = str(tmp_path / "bigdb")
    jvm = spark._jvm
    jvm.java.lang.Class.forName(DERBY_DRIVER)
    jvm.java.sql.DriverManager.getConnection(f"jdbc:derby:{db};create=true").close()
    dest = JdbcDestination(
        spark, JdbcDestinationConfig(url=f"jdbc:derby:{db}", driver=DERBY_DRIVER)
    )
    out = final.select("url", "text")
    dest.write(
        out, "bigpages", mode="overwrite",
        create_table_column_types="url VARCHAR(300)",
    )
    back = (
        spark.read.format("jdbc")
        .option("url", f"jdbc:derby:{db}")
        .option("driver", DERBY_DRIVER)
        .option("dbtable", "BIGPAGES")
        .load()
    )
    assert back.count() == 51
    row = back.filter(F.col("url") == "https://example.com/big").first()
    assert row["text"] == extract_text_py(bytes(_BIG_HTML))
