"""MoR read-amplification curve: live-read cost vs accumulated delta
epochs, and the compaction cost that resets it.

Quantifies the trade the mor layout makes (BASELINE.md): O(batch)
writes per epoch, but each un-compacted epoch adds delta files that
every read must winner-resolve. Output: one JSON line with read
seconds after each epoch, compact seconds, and read seconds after
compaction — the data behind choosing compact_threshold.

Usage: python tools/bench_mor_amplification.py [n_events] [n_epochs]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from airbyte_integrations_spark.gen import gen_change_events  # noqa: E402
from airbyte_integrations_spark.lakehouse.merge import merge_into  # noqa: E402
from airbyte_integrations_spark.lakehouse.table import LakeTable  # noqa: E402
from airbyte_integrations_spark.session import get_spark  # noqa: E402

COLS = [
    "url", "warc_ts", "text", "lang",
    "_ab_cdc_lsn", "_ab_cdc_updated_at", "_ab_cdc_deleted_at",
    "_airbyte_ab_id", "_airbyte_emitted_at",
]


def timed_read(table) -> float:
    t0 = time.perf_counter()
    table.read_live().agg(F.count(F.lit(1)), F.max("_ab_cdc_lsn")).collect()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    n_epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    spark = get_spark("mor_amp", cores=cpus, shuffle_partitions=cpus)
    root = tempfile.mkdtemp(prefix="mor_amp_", dir=base)

    log = os.path.join(root, "log")
    gen_change_events(
        spark, n_events, n_urls=max(n_events // 20, 1000), skew_alpha=2.5,
        n_partitions=cpus * 2,
    ).select(*COLS).write.parquet(log)
    events = spark.read.parquet(log)
    per = max(n_events // n_epochs, 1)

    table = LakeTable(spark, os.path.join(root, "t"))
    reads, writes = [], []
    for e in range(n_epochs):
        batch = events.filter(
            (F.col("_ab_cdc_lsn") > e * per) & (F.col("_ab_cdc_lsn") <= (e + 1) * per)
        )
        t0 = time.perf_counter()
        merge_into(table, batch, stream="pages", epoch=e, mode="mor")
        writes.append(round(time.perf_counter() - t0, 3))
        reads.append(timed_read(table))

    t0 = time.perf_counter()
    table.compact(max_files_per_bucket=1)
    compact_s = round(time.perf_counter() - t0, 3)
    read_after = timed_read(table)

    print(json.dumps({
        "n_events": n_events, "n_epochs": n_epochs, "cpus": cpus,
        "write_sec_per_epoch": writes,
        "read_sec_after_epoch": reads,
        "compact_sec": compact_s,
        "read_sec_after_compact": read_after,
        "read_amplification_at_last_epoch": round(reads[-1] / read_after, 2),
    }))


if __name__ == "__main__":
    main()
