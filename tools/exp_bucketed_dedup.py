"""Experiment: MoR epoch dedup+delta-write, current vs bucket-keyed.

Current plan (winner_agg then _write_files):
  sort -> SortAgg(partial) -> Exchange(hash url) -> sort -> SortAgg
  -> Exchange(hash _bucket) -> sort(_bucket, key) -> parquet
Candidate (groupBy(_bucket, key) after repartition(n_buckets, _bucket)):
  Exchange(hash _bucket) -> sort(_bucket, key) -> SortAgg -> parquet
i.e. one exchange and two sorts fewer (guide §2.4: two operations
keyed the same way share one exchange).

Usage: python tools/exp_bucketed_dedup.py [n_events] [n_urls] [repeats]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from airbyte_integrations_spark.gen import gen_change_events  # noqa: E402
from airbyte_integrations_spark.lakehouse.table import bucket_expr  # noqa: E402
from airbyte_integrations_spark.operators.dedup import (  # noqa: E402
    _rank_struct,
    winner_agg,
)
from airbyte_integrations_spark.session import get_spark  # noqa: E402

COLS = [
    "url", "warc_ts", "text", "lang",
    "_ab_cdc_lsn", "_ab_cdc_updated_at", "_ab_cdc_deleted_at",
    "_airbyte_ab_id", "_airbyte_emitted_at",
]


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_urls = int(sys.argv[2]) if len(sys.argv) > 2 else n_events // 20
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_buckets = 64
    spark = get_spark("exp_bucketed", cores=cpus, shuffle_partitions=cpus)
    root = tempfile.mkdtemp(prefix="expbkt_")
    log = os.path.join(root, "log")
    gen_change_events(
        spark, n_events, n_urls=n_urls, skew_alpha=2.5, n_partitions=cpus * 2
    ).select(*COLS).write.parquet(log)
    ev = spark.read.parquet(log)
    ev.count()

    key = ("url",)

    def current(out):
        w = winner_agg(ev, key)
        b = w.withColumn("_bucket", bucket_expr(key, n_buckets))
        (
            b.repartition(n_buckets, F.col("_bucket"))
            .sortWithinPartitions("_bucket", *key)
            .write.partitionBy("_bucket")
            .mode("overwrite")
            .parquet(out)
        )

    def bucketed(out):
        b = ev.withColumn("_bucket", bucket_expr(key, n_buckets))
        rs = _rank_struct(b, "_ab_cdc_lsn",
                          ("_ab_cdc_updated_at", "_airbyte_emitted_at"),
                          "_airbyte_ab_id")
        agg = (
            b.repartition(n_buckets, F.col("_bucket"))
            .groupBy("_bucket", *key)
            .agg(F.max(rs).alias("_w"))
        )
        w = agg.select(
            "_bucket",
            *[
                F.col("_w._ab" if c == "_airbyte_ab_id" else f"_w._row.{c}").alias(c)
                for c in ev.columns
            ],
        )
        w.write.partitionBy("_bucket").mode("overwrite").parquet(out)

    for name, fn in (("current", current), ("bucketed", bucketed)):
        best = None
        for i in range(repeats):
            out = os.path.join(root, f"{name}{i}")
            t0 = time.perf_counter()
            fn(out)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            print(f"  {name} run{i}: {dt:.2f}s", flush=True)
        print(f"{name}: best {best:.2f}s")

    # row-equivalence spot check
    a = spark.read.parquet(os.path.join(root, "current0"))
    b = spark.read.parquet(os.path.join(root, "bucketed0"))
    diff = a.drop("_bucket").exceptAll(b.drop("_bucket")).count() + \
        b.drop("_bucket").exceptAll(a.drop("_bucket")).count()
    print("row diff (must be 0):", diff)
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
