"""Per-query overhead profile: wall seconds + Spark job/stage/task
counts for named queries() entries (all when none named).

At the driver's bench scale the inputs are small (sf0.1: events =
100k rows / 2 MB), so multi-second query times are FIXED OVERHEAD —
job count x per-job latency, per-epoch commit machinery, driver round
trips — not data volume. This tool attributes them: a query whose
wall time tracks its job count is overhead-bound; one whose stage
tasks dominate is compute-bound.

Usage: python tools/profile_queries.py [query ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as ent  # noqa: E402
from airbyte_integrations_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("profile_queries", cores=cpus, shuffle_partitions=cpus)
    spark.read.parquet(f"{sf_dir}/events.parquet").count()  # warm

    reg = ent.queries()
    names = sys.argv[1:] or list(reg)
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    out = {}
    for name in names:
        fn = reg[name]
        group = f"pq_{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        jobs = tracker.getJobIdsForGroup(group)
        n_stages = 0
        n_tasks = 0
        for j in jobs:
            ji = tracker.getJobInfo(j)
            if ji is None:
                continue
            for s in ji.stageIds:
                si = tracker.getStageInfo(s)
                if si is not None:
                    n_stages += 1
                    n_tasks += si.numTasks
        out[name] = {
            "sec": round(wall, 3),
            "jobs": len(jobs),
            "stages": n_stages,
            "tasks": n_tasks,
            "ms_per_job": round(1000 * wall / max(len(jobs), 1), 1),
        }
        print(
            f"{name:35s} {wall:7.2f}s  jobs={len(jobs):4d} "
            f"stages={n_stages:4d} tasks={n_tasks:6d} "
            f"ms/job={1000 * wall / max(len(jobs), 1):7.1f}",
            flush=True,
        )
    with open(os.path.join(REPO, "bench_out", "profile_queries.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
