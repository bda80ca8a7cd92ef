"""Sub-phase profile of merge_into: winners / bucket-read+join / write.

Usage: python tools/profile_merge.py <cores> [n_events] [n_epochs] [mode]
mode: cow (default) | mor
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

from airbyte_integrations_spark.functions.extract import with_extracted_text  # noqa: E402
from airbyte_integrations_spark.gen import gen_change_events  # noqa: E402
from airbyte_integrations_spark.lakehouse.table import LakeTable, bucket_expr, conform  # noqa: E402
from airbyte_integrations_spark.operators.dedup import winner_join, winner_window  # noqa: E402
from airbyte_integrations_spark.schema import merge_schemas  # noqa: E402
from airbyte_integrations_spark.session import get_spark  # noqa: E402

SECONDARY = ("_ab_cdc_updated_at", "_airbyte_emitted_at")


def main() -> None:
    cores = int(sys.argv[1])
    n_events = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    n_epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    mode = sys.argv[4] if len(sys.argv) > 4 else "cow"
    tmp_base = os.environ.get("SPARK_GRAFT_TMP")  # e.g. /dev/shm to take the
    # shared single-disk ceiling out of scaling measurements (BASELINE.md)
    spark = get_spark(f"pm_{cores}", cores=cores, shuffle_partitions=max(cores, 4),
                      extra_conf={"spark.sql.files.maxPartitionBytes": "32m"})
    log_dir = tempfile.mkdtemp(prefix=f"pm{cores}_", dir=tmp_base) + "/log"
    gen_change_events(
        spark, n_events,
        # enough log files that every epoch's lsn slice spans >= all
        # cores at either parallelism level (a real 10^10 epoch is
        # hundreds of files; without this the scan of a contiguous lsn
        # slice degenerates to 1-2 tasks and nothing downstream can
        # scale)
        n_partitions=max(64, n_epochs * 16),
    ).write.parquet(log_dir)
    events = spark.read.parquet(log_dir)
    events.count()

    table = LakeTable(spark, tempfile.mkdtemp(prefix=f"pmt{cores}_", dir=tmp_base) + "/t")
    per = n_events // n_epochs
    phases: dict[str, float] = {}

    def clock(name, fn):
        t0 = time.perf_counter()
        out = fn()
        phases[name] = phases.get(name, 0.0) + time.perf_counter() - t0
        return out

    t_all = time.perf_counter()
    for i in range(n_epochs):
        lo, hi = i * per, (i + 1) * per
        batch = events.filter((F.col("_ab_cdc_lsn") > lo) & (F.col("_ab_cdc_lsn") <= hi))
        if mode == "mor":
            from airbyte_integrations_spark.lakehouse.merge import merge_into

            clock("merge", lambda b=batch: merge_into(
                table, b, stream="pages", epoch=lo, epoch_meta={},
                transform_winners=with_extracted_text, mode="mor"))
            continue
        if not table.exists():
            w = clock("winners", lambda b=batch: winner_join(
                b, ("url",), "_ab_cdc_lsn", SECONDARY, "_airbyte_ab_id"))
            w = with_extracted_text(w)
            clock("write", lambda w=w: table.create(w, ("url",), 32, "pages", lo, {}))
            continue
        key = table.key_cols()
        target_schema = merge_schemas(table.schema, batch.schema)
        winners = clock("winners", lambda b=batch: winner_join(
            conform(b, target_schema), key, "_ab_cdc_lsn", SECONDARY, "_airbyte_ab_id"))
        winners = conform(with_extracted_text(winners), target_schema)
        winners = winners.withColumn("_bucket", bucket_expr(key, 32)).persist()
        touched = clock("winners_materialize", lambda w=winners: [
            r["_bucket"] for r in w.select("_bucket").distinct().collect()])
        current = conform(table.read(touched), target_schema)
        wb = winners.drop("_bucket")
        keys_df = F.broadcast(wb.select(*key).distinct())
        carried = current.join(keys_df, list(key), "left_anti")
        contested = current.join(keys_df, list(key), "left_semi")
        merged = winner_window(contested.unionByName(wb), key, "_ab_cdc_lsn",
                               SECONDARY, "_airbyte_ab_id")
        new_data = carried.unionByName(merged)
        clock("write", lambda nd=new_data, t=touched: table.replace_buckets(
            nd, t, target_schema, "pages", lo, {}))
        winners.unpersist()
    if mode == "mor":
        clock("read_resolved", lambda: table.read_live().count())
    total = time.perf_counter() - t_all
    print("RESULT " + json.dumps({
        "cores": cores, "n_events": n_events, "mode": mode,
        "total_sec": round(total, 3),
        "events_per_sec": round(n_events / total, 1),
        "phases": {k: round(v, 3) for k, v in phases.items()},
    }))


if __name__ == "__main__":
    main()
