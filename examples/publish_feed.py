"""Example outbound replication (lake -> change feed) — run:

    zip -qr ais.zip airbyte_integrations_spark
    spark-submit --master <cluster-or-local[N]> \
        --py-files ais.zip examples/publish_feed.py <lake_root> <stream> <feed_root>

Publishes the table's row-level changes since the last published
version to a partitioned log (destinations/cdf_publish): the first run
emits the live table as a baseline snapshot; every later run emits
ONLY the rows whose live image changed (bucket-pruned changelog diff),
with deletes as before-image tombstones. Exactly-once per version
range — the durable cursor is the destination's idempotent-producer
epoch log, so cron-ing this script after each inbound sync gives a
downstream consumer (sources/partitioned_log -> run_sync) a complete,
ordered, never-duplicated change feed.
"""

import sys

from pyspark.sql import SparkSession

from airbyte_integrations_spark.destinations.cdf_publish import (
    publish_changes,
    published_version,
)
from airbyte_integrations_spark.destinations.partitioned_log import (
    log_offsets,
    resolve_topic,
)
from airbyte_integrations_spark.lakehouse.table import LakeTable
from airbyte_integrations_spark.session import tune_session


def main() -> None:
    lake_root, stream, feed_root = sys.argv[1], sys.argv[2], sys.argv[3]
    spark = SparkSession.builder.config(
        "spark.sql.session.timeZone", "UTC"
    ).getOrCreate()
    tune_session(spark)
    table = LakeTable(spark, lake_root)
    topic = resolve_topic("{namespace}.{stream}", None, stream)
    before = published_version(feed_root, topic)
    offsets = publish_changes(spark, table, feed_root, stream)
    after = published_version(feed_root, topic)
    if offsets is None:
        print(f"feed already at table head (version {before}); nothing to do")
    else:
        kind = "baseline snapshot" if before < 0 else "delta"
        print(f"published {kind}: versions {before} -> {after}")
        print("per-partition high offsets:", dict(sorted(offsets.items())))
    print("topic offsets now:", dict(sorted(log_offsets(feed_root, topic).items())))


if __name__ == "__main__":
    main()
