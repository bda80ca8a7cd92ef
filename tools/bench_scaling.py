"""N -> 4N scaling-efficiency evidence (north rule / BASELINE.md).

No real cluster exists in the sandbox; per the driver protocol the SAME
job runs at two parallelism levels on the SAME pre-materialized input
and we report throughput at both + efficiency = (ev/s@4N / ev/s@N) / 4.

Methodology notes (documented in BASELINE.md):
- The sandbox is a shared 32-core box with fluctuating neighbor load,
  so parallelism levels are N=local[2] -> 4N=local[8], both inside the
  box's free capacity; a raw-CPU control (multiprocessing busy loop) is
  run at the same levels to bound what the hardware itself can show.
- Input layout is identical at both levels and sized so no stage
  degenerates below the core count: the log is written as 128+ files
  (a 10^10-event epoch spans hundreds of WAL segment files; a 2-file
  epoch slice would serialize the scan and measure nothing) and the
  child sessions read with files.maxPartitionBytes=32m.
- Lake root, event log, and shuffle dirs live on tmpfs: the box has ONE
  ~250MB/s virtual disk shared by every tenant, while the north rule's
  N->4N criterion describes executors that each bring their own disks
  and memory bandwidth. RAM-backed storage is the closest sandbox
  analogue of per-executor storage. (measured: the same job on the
  shared disk is capped at ~1.3x from 2->8 cores regardless of code.)
- Each level runs in a fresh JVM; levels are interleaved and best-of-K
  is used to filter contention spikes.
- The workload is the full north-rule ingest pipeline in the
  merge-on-read layout (epoch slice -> winner dedup (associative
  max-by-ordering agg) -> Arrow pandas UDF html->text extraction on
  winners -> per-bucket delta commit + lineage -> delta fold
  (compaction) inside the timed window).

Usage: python tools/bench_scaling.py [n_events] [n_epochs] [repeats]
Writes bench_out/scaling.json.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_CORES = (2, 8)
TMPFS = "/dev/shm" if os.path.isdir("/dev/shm") else None

CHILD = r"""
import json, os, sys, time, tempfile
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from airbyte_integrations_spark.session import get_spark
from airbyte_integrations_spark.config import SyncConfig
from airbyte_integrations_spark.functions.extract import extract_text
from airbyte_integrations_spark.lakehouse.table import LakeTable
from airbyte_integrations_spark.streaming.microbatch import run_sync

cores = int(sys.argv[1]); log_dir = sys.argv[2]
n_events = int(sys.argv[3]); n_epochs = int(sys.argv[4]); repeats = int(sys.argv[5])
tmpfs = sys.argv[6] if len(sys.argv) > 6 and sys.argv[6] != "-" else None
spark = get_spark(f"scaling_{{cores}}", cores=cores, shuffle_partitions=max(cores, 4),
                  extra_conf={{"spark.sql.files.maxPartitionBytes": "32m"}})
events = spark.read.parquet(log_dir)
events.count()  # warm metadata + page cache uniformly
best = None; best_x = None
for i in range(repeats):
    table = LakeTable(spark, tempfile.mkdtemp(prefix=f"scal{{cores}}_", dir=tmpfs) + "/t")
    cfg = SyncConfig(stream="pages", n_buckets=32, write_mode="mor")
    t0 = time.perf_counter()
    run_sync(spark, events, table, cfg,
             max_events_per_epoch=max(n_events // n_epochs, 1),
             extract_missing_text=True,
             compact_threshold=max(n_epochs, 2))
    dt = time.perf_counter() - t0
    best = dt if best is None else min(best, dt)
    # extraction stage alone (forced over every event): the CPU-bound
    # component of the pipeline
    t0 = time.perf_counter()
    events.withColumn("text", extract_text(F.col("html"))).select(
        F.sum(F.length("text"))).collect()
    dx = time.perf_counter() - t0
    best_x = dx if best_x is None else min(best_x, dx)
print("RESULT " + json.dumps({{"cores": cores, "sec": best,
      "events_per_sec": n_events / best,
      "extract_sec": best_x, "extract_events_per_sec": n_events / best_x}}))
"""


def _burn(n: int) -> int:
    s = 0
    for i in range(n):
        s += i * i
    return s


def raw_cpu_control() -> dict:
    out = {}
    for procs in N_CORES:
        best = 0.0
        for _ in range(2):
            with mp.Pool(procs) as p:
                t0 = time.perf_counter()
                p.map(_burn, [2_000_000] * procs * 6)
                dt = time.perf_counter() - t0
            best = max(best, procs * 6 * 2_000_000 / dt)
        out[procs] = best
    return out


def run_at(cores: int, log_dir: str, n_events: int, n_epochs: int, repeats: int) -> dict:
    script = CHILD.format(repo=REPO)
    env = dict(os.environ)
    if TMPFS:
        shm_shuffle = os.path.join(TMPFS, "sparktmp_scaling")
        os.makedirs(shm_shuffle, exist_ok=True)
        env["SPARK_LOCAL_DIRS"] = shm_shuffle
    out = subprocess.run(
        [sys.executable, "-c", script, str(cores), log_dir, str(n_events),
         str(n_epochs), str(repeats), TMPFS or "-"],
        capture_output=True, text=True, timeout=3000, env=env,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT from cores={cores}:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    sys.path.insert(0, REPO)
    from airbyte_integrations_spark.gen import gen_change_events
    from airbyte_integrations_spark.session import get_spark

    cols = [
        "url", "warc_ts", "html", "lang",
        "_ab_cdc_lsn", "_ab_cdc_updated_at", "_ab_cdc_deleted_at",
        "_airbyte_ab_id", "_airbyte_emitted_at",
    ]  # no pre-extracted text: the pipeline extracts
    log_root = tempfile.mkdtemp(prefix="scaling_log_", dir=TMPFS)
    log_dir = os.path.join(log_root, "log")
    spark = get_spark("scaling_gen", cores=16, shuffle_partitions=16)
    gen_change_events(
        spark, n_events, n_urls=max(n_events // 20, 1000), skew_alpha=2.5,
        n_partitions=max(128, n_epochs * 32), body_words=150,
    ).select(*cols).write.mode("overwrite").parquet(log_dir)
    spark.stop()

    load0 = open("/proc/loadavg").read().split()[:3]
    control = raw_cpu_control()
    runs = []
    try:
        for cores in (*N_CORES, *reversed(N_CORES)):  # interleaved
            r = run_at(cores, log_dir, n_events, n_epochs, repeats)
            print(f"cores={cores}: {r['events_per_sec']:.0f} ev/s ({r['sec']:.1f}s)", flush=True)
            runs.append(r)
    finally:
        shutil.rmtree(log_root, ignore_errors=True)
        if TMPFS:
            for d in os.listdir(TMPFS):
                if d.startswith("scal"):
                    shutil.rmtree(os.path.join(TMPFS, d), ignore_errors=True)
    load1 = open("/proc/loadavg").read().split()[:3]
    lo, hi = N_CORES
    best = {c: max(r["events_per_sec"] for r in runs if r["cores"] == c) for c in N_CORES}
    best_x = {c: max(r["extract_events_per_sec"] for r in runs if r["cores"] == c) for c in N_CORES}
    summary = {
        "protocol": (
            f"local[{lo}] (N) vs local[{hi}] (4N), same pre-materialized input "
            f"({max(128, n_epochs * 32)} log files, 32m read splits), merge-on-read "
            f"apply incl. winners-only extraction + timed delta fold, tmpfs lake+shuffle "
            f"(per-executor-storage analogue), fresh JVM each, interleaved best-of-{repeats}"
        ),
        "n_events": n_events,
        "n_epochs": n_epochs,
        "events_per_sec_N": round(best[lo], 1),
        "events_per_sec_4N": round(best[hi], 1),
        "scaling_efficiency_N_to_4N": round(best[hi] / best[lo] / 4.0, 3),
        "extract_events_per_sec_N": round(best_x[lo], 1),
        "extract_events_per_sec_4N": round(best_x[hi], 1),
        "extract_scaling_efficiency": round(best_x[hi] / best_x[lo] / 4.0, 3),
        "raw_cpu_control_ops_per_sec": {str(k): round(v, 0) for k, v in control.items()},
        "raw_cpu_control_efficiency": round(control[hi] / control[lo] / 4.0, 3),
        "host_loadavg_before": load0,
        "host_loadavg_after": load1,
        "runs": runs,
    }
    os.makedirs(os.path.join(REPO, "bench_out"), exist_ok=True)
    with open(os.path.join(REPO, "bench_out", "scaling.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
