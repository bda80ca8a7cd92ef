"""Live materialized view of the final table at stream latency.

Tails a growing CDC event-log directory with Structured Streaming and
keeps the per-url winner in streaming state (applyInPandasWithState) —
no lake read needed to answer "what is the current row for this url".

Run packaged, as on a cluster:
  zip -qr ais.zip airbyte_integrations_spark
  spark-submit --master local[8] --py-files ais.zip examples/stream_live_view.py
"""

import os
import tempfile

from pyspark.sql import SparkSession

from airbyte_integrations_spark.gen import gen_change_events
from airbyte_integrations_spark.streaming.stateful import (
    event_time_rates,
    latest_wins_stream,
)

spark = (
    SparkSession.builder.appName("live_view")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.shuffle.partitions", "8")
    .getOrCreate()
)

root = tempfile.mkdtemp(prefix="live_view_")
log = os.path.join(root, "log")
cols = [
    "url", "warc_ts", "text", "lang", "_ab_cdc_lsn", "_ab_cdc_updated_at",
    "_ab_cdc_deleted_at", "_airbyte_ab_id", "_airbyte_emitted_at",
]
gen_change_events(spark, 20_000, n_urls=1_000).select(*cols).write.parquet(log)

events = spark.readStream.schema(spark.read.parquet(log).schema).parquet(log)

# 1) live final-table view: current winner per url, tombstones flagged
live = (
    latest_wins_stream(events)
    .writeStream.format("memory").queryName("live_pages")
    .outputMode("update")
    .option("checkpointLocation", os.path.join(root, "ck1"))
    .trigger(availableNow=True)
    .start()
)
live.awaitTermination()
spark.sql(
    "SELECT url, _ab_cdc_lsn, is_deleted FROM live_pages ORDER BY url LIMIT 10"
).show(truncate=False)

# 2) watermarked delivery metrics (state-bounded)
rates = (
    event_time_rates(
        spark.readStream.schema(spark.read.parquet(log).schema).parquet(log),
        time_col="warc_ts", group_col="lang",
    )
    .writeStream.format("memory").queryName("rates")
    .outputMode("update")
    .option("checkpointLocation", os.path.join(root, "ck2"))
    .trigger(availableNow=True)
    .start()
)
rates.awaitTermination()
spark.sql("SELECT * FROM rates ORDER BY win_start, lang LIMIT 10").show()
