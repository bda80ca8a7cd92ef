"""Example Debezium-envelope sync — run with:

    zip -qr ais.zip airbyte_integrations_spark
    spark-submit --master <cluster-or-local[N]> \
        --py-files ais.zip examples/debezium_sync.py <envelope_jsonl_dir> <lake_root>

Tails a directory of raw Debezium envelope JSONL (the embedded
engine's wire: {before, after, source:{lsn, ts_ms[, ts_us], table},
op}) and applies it to the lake:

1. Multi-table: every table in the log syncs lock-step with ONE
   GLOBAL offset (the Debezium one-log-many-tables shape), via the
   cdc_shared catalog kind routed on source.table.
2. The decode is one from_json projection — no per-event driver loop.

The value schema below matches BASELINE.json's page shape; adjust for
your tables. Kill anywhere and re-run: resume derives from the member
tables' commit logs (min watermark), never a stored offset file.
"""

import json
import sys

from pyspark.sql import SparkSession

from airbyte_integrations_spark.catalog_sync import (
    ConfiguredCatalog,
    ConfiguredStream,
    read_catalog,
    stream_table,
)
from airbyte_integrations_spark.config import SyncConfig
from airbyte_integrations_spark.session import tune_session
from airbyte_integrations_spark.sources.debezium import shared_log_from_envelopes

VALUE_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def main() -> None:
    envelopes, lake_root = sys.argv[1], sys.argv[2]
    spark = SparkSession.builder.appName("debezium-sync").getOrCreate()
    tune_session(spark)

    # discover the member tables from the log itself (source.table)
    log = shared_log_from_envelopes(spark, envelopes, VALUE_SCHEMA)
    names = sorted(
        r["stream"] for r in log.select("stream").distinct().collect()
    )
    members = tuple(
        ConfiguredStream(
            config=SyncConfig(stream=n, write_mode="mor"),
            source={
                "kind": "cdc_shared",
                "group": "debezium-wal",
                "debezium_path": envelopes,
                "value_schema": VALUE_SCHEMA,
            },
        )
        for n in names
    )
    msgs = read_catalog(
        spark, ConfiguredCatalog(streams=members), lake_root
    )
    for m in msgs:
        print(json.dumps(m))
    for n in names:
        t = stream_table(spark, lake_root, n)
        print(n, "live rows:", t.read_live().count(), "watermark:", t.watermark(n))


if __name__ == "__main__":
    main()
