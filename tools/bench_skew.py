"""Hot-url skew evidence (north rule: "skew on hot urls is handled with
salted pre-aggregation + two-phase merge").

Generates a log where a single url receives ~25% of all events (Zipf
exponent 8), runs every interchangeable winner implementation at
local[8] (identical outputs — the rule is associative), and measures
the quantity that actually decides survival at 10^10 events: how many
rows of the HOT key reach the reduce side.

- window: the hot key's entire row set (here ~475k; at 10^10 events,
  ~10^9) lands on ONE reducer task to be sorted — linear in the skew.
- agg / salted: map-side partial aggregation (or the explicit salt
  phase) caps the hot key's reduce input at one row per mapper /
  per salt — constant in the skew, growing only with cluster width.

Wall-clock at sandbox scale is reported but nearly flat (sorting 475k
rows is cheap); the reduce-side row counts are the scale-projectable
evidence, together with PLANS.md's generated partial-agg plan check.

Usage: python tools/bench_skew.py [n_events]
Writes bench_out/skew.json.
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
from airbyte_integrations_spark.operators.dedup import (  # noqa: E402
    winner_agg,
    winner_join,
    winner_salted,
    winner_window,
)
from airbyte_integrations_spark.session import get_spark  # noqa: E402

IMPLS = {
    "window (literal reference plan)": winner_window,
    "agg (associative max-by-ordering)": winner_agg,
    "salted (explicit two-phase)": winner_salted,
    "join (max-cursor reduction)": winner_join,
}


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    tmpfs = "/dev/shm" if os.path.isdir("/dev/shm") else None
    spark = get_spark("skew", cores=8, shuffle_partitions=8)
    log = tempfile.mkdtemp(prefix="skew_", dir=tmpfs) + "/log"
    gen_change_events(
        spark, n_events, n_urls=100_000, skew_alpha=8.0, n_partitions=64
    ).write.parquet(log)
    ev = spark.read.parquet(log)
    ev.count()
    top = (
        ev.groupBy("url").count().orderBy(F.desc("count")).limit(1).collect()[0]
    )
    hot_share = top["count"] / n_events

    # Reduce-side exposure of the hot key: rows one reducer must absorb.
    # window: every row of the hot url. agg: one partial-agg row per
    # scan task. salted: one row per salt (phase 2).
    hot_rows_per_mapper = (
        ev.filter(F.col("url") == top["url"])
        .groupBy(F.spark_partition_id().alias("p"))
        .count()
        .count()
    )
    reduce_exposure = {
        "window_hot_rows_to_one_reducer": int(top["count"]),
        "agg_hot_rows_to_one_reducer": int(hot_rows_per_mapper),
        "salted_hot_rows_to_one_reducer_phase2": 16,
    }

    results = {}
    canonical = None
    for name, fn in IMPLS.items():
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            n = fn(ev, drop_tombstones=True).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        results[name] = {"sec": round(best, 2), "rows": n}
        canonical = n if canonical is None else canonical
        assert n == canonical, f"{name} row count diverged"

    out = {
        "n_events": n_events,
        "n_urls": 100_000,
        "hottest_url_share": round(hot_share, 3),
        "cores": 8,
        "reduce_side_hot_key_rows": reduce_exposure,
        "impls": results,
        "note": "identical output row counts across impls (winner rule is associative)",
    }
    os.makedirs(os.path.join(REPO, "bench_out"), exist_ok=True)
    with open(os.path.join(REPO, "bench_out", "skew.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
