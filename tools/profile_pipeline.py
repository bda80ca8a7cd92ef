"""Phase-level wall-time profile of the CDC apply pipeline at one
parallelism level. Used to attribute the N->4N scaling gap: phases
whose time does not shrink with cores are the Amdahl fixed cost.

Usage: python tools/profile_pipeline.py <cores> [n_events] [n_epochs]
Prints one JSON line with per-phase seconds.
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

from airbyte_integrations_spark.config import SyncConfig  # noqa: E402
from airbyte_integrations_spark.functions.extract import with_extracted_text  # noqa: E402
from airbyte_integrations_spark.gen import gen_change_events  # noqa: E402
from airbyte_integrations_spark.lakehouse.merge import merge_into  # noqa: E402
from airbyte_integrations_spark.lakehouse.table import LakeTable  # noqa: E402
from airbyte_integrations_spark.lineage import compute_lineage, write_lineage  # noqa: E402
from airbyte_integrations_spark.session import get_spark  # noqa: E402
from airbyte_integrations_spark.streaming.microbatch import plan_epochs  # noqa: E402


def main() -> None:
    cores = int(sys.argv[1])
    n_events = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    n_epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    spark = get_spark(f"profile_{cores}", cores=cores, shuffle_partitions=max(cores, 4))
    log_dir = tempfile.mkdtemp(prefix=f"prof{cores}_") + "/log"
    gen_change_events(spark, n_events).write.parquet(log_dir)
    events = spark.read.parquet(log_dir)
    events.count()

    cfg = SyncConfig(stream="pages", n_buckets=32)
    table = LakeTable(spark, tempfile.mkdtemp(prefix=f"proft{cores}_") + "/t")
    phases: dict[str, float] = {}

    def clock(name: str, fn):
        t0 = time.perf_counter()
        out = fn()
        phases[name] = phases.get(name, 0.0) + time.perf_counter() - t0
        return out

    t_all = time.perf_counter()
    lsn_col = cfg.cursor_field[0]
    epochs = clock(
        "plan",
        lambda: plan_epochs(events, table.watermark(cfg.stream),
                            max(n_events // n_epochs, 1), lsn_col),
    )
    for ep in epochs:
        batch = events.filter(
            (F.col(lsn_col) > F.lit(ep.from_lsn)) & (F.col(lsn_col) <= F.lit(ep.to_lsn))
        )
        clock("lineage", lambda b=batch, e=ep: write_lineage(
            compute_lineage(b, cfg.stream, e.epoch_id, lsn_col), table.root, e.epoch_id))
        clock("merge", lambda b=batch, e=ep: merge_into(
            table, b, stream=cfg.stream, epoch=e.epoch_id,
            epoch_meta={"from_lsn": e.from_lsn, "to_lsn": e.to_lsn},
            cursor=lsn_col, secondary=cfg.secondary_order,
            transform_winners=with_extracted_text))
    clock("compact", lambda: table.compact(max_files_per_bucket=8))
    total = time.perf_counter() - t_all
    print("RESULT " + json.dumps({
        "cores": cores, "n_events": n_events, "n_epochs": n_epochs,
        "total_sec": round(total, 3),
        "events_per_sec": round(n_events / total, 1),
        "phases": {k: round(v, 3) for k, v in phases.items()},
    }))


if __name__ == "__main__":
    main()
