"""Example multi-stream catalog sync — run with:

    zip -qr ais.zip airbyte_integrations_spark
    spark-submit --master <cluster-or-local[N]> \
        --py-files ais.zip examples/catalog_sync.py <log_dir> <files_dir> <lake_root>

The platform-shaped entrypoint: a ConfiguredAirbyteCatalog of two
streams — an incremental CDC log tail ("pages") and a full-refresh
file drop ("sidecar") — synced through read_catalog with the
reference's incremental-before-full-refresh ordering
(AbstractDbSource.java:135-140). One combined PER_STREAM STATE is
printed after each stream's durable commit; kill it anywhere and
re-run to converge (resume is driven by the commit logs alone).
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
from airbyte_integrations_spark.config import DestinationSyncMode, SyncConfig, SyncMode
from airbyte_integrations_spark.session import tune_session


def main() -> None:
    log_dir, files_dir, lake_root = sys.argv[1], sys.argv[2], sys.argv[3]
    spark = tune_session(SparkSession.builder.getOrCreate())

    catalog = ConfiguredCatalog(
        streams=(
            ConfiguredStream(
                config=SyncConfig(
                    stream="pages",
                    sync_mode=SyncMode.INCREMENTAL,
                    destination_sync_mode=DestinationSyncMode.APPEND_DEDUP,
                    n_buckets=64,
                ),
                source={"kind": "cdc_log", "path": log_dir},
            ),
            ConfiguredStream(
                config=SyncConfig(
                    stream="sidecar",
                    sync_mode=SyncMode.FULL_REFRESH,
                    destination_sync_mode=DestinationSyncMode.OVERWRITE,
                ),
                source={"kind": "files", "root": files_dir, "format": "parquet"},
            ),
        )
    )

    states = read_catalog(spark, catalog, lake_root)
    for st in states:
        print("STATE", json.dumps(st, default=str))
    for name in ("pages", "sidecar"):
        t = stream_table(spark, lake_root, name)
        if t.exists():
            print(f"{name}: {t.read().count()} rows @ v{t.current_version()}")


if __name__ == "__main__":
    main()
