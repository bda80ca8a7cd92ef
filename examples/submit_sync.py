"""Example cluster driver — run with:

    zip -qr ais.zip airbyte_integrations_spark
    spark-submit --master <cluster-or-local[N]> \
        --py-files ais.zip examples/submit_sync.py <event_log_dir> <lake_dir>

Tails the parquet CDC event log at <event_log_dir> (schema: FIXTURES.md
F2), applies every unread epoch to the lake table at <lake_dir> with
exactly-once semantics, prints lineage + final-state summary. Safe to
re-run / cron: resumes from the committed watermark.
"""

import sys

from pyspark.sql import SparkSession, functions as F

from airbyte_integrations_spark.config import SyncConfig
from airbyte_integrations_spark.lakehouse.table import LakeTable
from airbyte_integrations_spark.lineage import read_lineage
from airbyte_integrations_spark.session import tune_session
from airbyte_integrations_spark.streaming.microbatch import run_sync


def main() -> None:
    log_dir, lake_dir = sys.argv[1], sys.argv[2]
    max_per_epoch = int(sys.argv[3]) if len(sys.argv) > 3 else 10_000_000
    spark = tune_session(SparkSession.builder.getOrCreate())

    events = spark.read.parquet(log_dir)
    table = LakeTable(spark, lake_dir)
    cfg = SyncConfig(stream="pages", n_buckets=4096)  # sized for the 10^10 point

    wm_before = table.watermark("pages") if table.exists() else None
    epochs = run_sync(spark, events, table, cfg, max_events_per_epoch=max_per_epoch)
    print(f"applied {len(epochs)} epochs "
          f"(watermark {wm_before} -> {table.watermark('pages')})")
    if epochs:
        lin = read_lineage(spark, table.root)
        lin.groupBy("epoch").agg(
            F.sum("n_events").alias("events"), F.sum("n_deletes").alias("deletes")
        ).orderBy("epoch").show(truncate=False)
    final = table.read()
    print(f"final table: {final.count()} urls @ snapshot v{table.current_version()}")


if __name__ == "__main__":
    main()
