"""Large-scale replay evidence point (SURVEY §6 / BASELINE.md F5).

Runs the full CDC MERGE-apply replay at a large event count on
local[32] — same code path as the 10^10 design point; only bucket
count and file layout scale on a real cluster. Records throughput for
the mor (sustained-ingest) and optionally cow layouts plus final-state
row count, to one JSON line.

Usage:
  python tools/bench_scale_point.py [n_events] [n_epochs] [modes]
  # defaults: 50_000_000 10 mor,cow   (on tmpfs under /dev/shm)

The log is pre-materialized as many parquet files (32 MB splits read)
so epoch scans parallelize the way a segmented WAL would at scale.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from airbyte_integrations_spark.config import SyncConfig  # noqa: E402
from airbyte_integrations_spark.gen import gen_change_events  # noqa: E402
from airbyte_integrations_spark.lakehouse.table import LakeTable  # noqa: E402
from airbyte_integrations_spark.session import get_spark  # noqa: E402
from airbyte_integrations_spark.streaming.microbatch import run_sync  # noqa: E402

COLS = [
    "url", "warc_ts", "text", "lang",
    "_ab_cdc_lsn", "_ab_cdc_updated_at", "_ab_cdc_deleted_at",
    "_airbyte_ab_id", "_airbyte_emitted_at",
]


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
    n_epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    modes = (sys.argv[3] if len(sys.argv) > 3 else "mor,cow").split(",")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None

    spark = get_spark("scale_point", cores=cpus, shuffle_partitions=cpus)
    root = tempfile.mkdtemp(prefix="scale_point_", dir=base)
    log_dir = os.path.join(root, "log")
    t0 = time.perf_counter()
    gen_change_events(
        spark, n_events, n_urls=max(n_events // 20, 1000), skew_alpha=2.5,
        n_partitions=cpus * 4,
    ).select(*COLS).write.parquet(log_dir)
    gen_s = time.perf_counter() - t0
    events = spark.read.parquet(log_dir)
    events.count()  # warm file index

    out: dict = {
        "n_events": n_events, "n_epochs": n_epochs, "cpus": cpus,
        "gen_sec": round(gen_s, 1),
        "log_gb": round(sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(log_dir) for f in fs) / 2**30, 2),
    }
    try:
        for mode in modes:
            table = LakeTable(spark, os.path.join(root, f"t_{mode}"))
            cfg = SyncConfig(stream="pages", n_buckets=128, write_mode=mode)
            t0 = time.perf_counter()
            run_sync(
                spark, events, table, cfg,
                max_events_per_epoch=max(n_events // n_epochs, 1),
                compact_threshold=n_epochs if mode == "mor" else 8,
            )
            dt = time.perf_counter() - t0
            out[f"{mode}_sec"] = round(dt, 1)
            out[f"{mode}_events_per_sec"] = round(n_events / dt, 1)
            out[f"{mode}_final_rows"] = table.read_live().count()
            shutil.rmtree(os.path.join(root, f"t_{mode}"), ignore_errors=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    out["protocol"] = (
        f"tools/bench_scale_point.py {n_events} {n_epochs} {','.join(modes)}; "
        f"local[{cpus}], 128 buckets, {max(n_events // 20, 1000):,} urls "
        "skew 2.5, tmpfs, single cold run each; both layouts must converge "
        "to the identical final row count"
    )
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.makedirs(os.path.join(here, "bench_out"), exist_ok=True)
    with open(os.path.join(here, "bench_out", "scale_point.json"), "w") as f:
        json.dump(out, f)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
