"""Capture .explain("formatted") evidence for OPTIMIZATION_r06.md.

Usage: python tools/capture_r06_plans.py <repo_root> <out_dir> <suffix>

Run once from the round-start worktree (suffix "before") and once from
the optimized tree (suffix "after"); writes <out_dir>/<name>_<suffix>.txt.
The script branches on feature presence so the same file runs in both
trees: when `winner_agg_bucketed` is absent (round-start code) it
captures the OLD MoR epoch write frame (winner_agg + the writer's own
repartition+sort), which is exactly what append_deltas executed then.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.abspath(sys.argv[1])
OUT = os.path.abspath(sys.argv[2])
SUFFIX = sys.argv[3]
sys.path.insert(0, REPO)
os.chdir(REPO)

from pyspark.sql import functions as F  # noqa: E402

from airbyte_integrations_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def explain(df) -> str:
    jvm = df._sc._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def dump(name: str, df) -> None:
    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, f"{name}_{SUFFIX}.txt"), "w") as f:
        f.write(explain(df))
    print(f"wrote {name}_{SUFFIX}.txt")


def main() -> None:
    spark = get_spark("r06_plans", cores=8, shuffle_partitions=8)
    import __spark_entry__ as ent

    reg = ent.queries()

    # Lazy queries whose returned frame IS the whole pipeline.
    for q in ("docs_neardup_pairs", "docs_minhash", "docs_length_deciles"):
        try:
            dump(q, reg[q](spark, SF_DIR))
        except Exception as e:  # noqa: BLE001
            print(f"skip {q}: {e}")

    # MoR epoch write frame (operator-level): what append_deltas executes.
    from airbyte_integrations_spark.gen import gen_change_events
    from airbyte_integrations_spark.lakehouse.table import bucket_expr
    from airbyte_integrations_spark.operators.dedup import winner_agg

    cols = [
        "url", "warc_ts", "text", "lang",
        "_ab_cdc_lsn", "_ab_cdc_updated_at", "_ab_cdc_deleted_at",
        "_airbyte_ab_id", "_airbyte_emitted_at",
    ]
    batch = gen_change_events(spark, 100_000, n_urls=5000).select(*cols)
    try:
        from airbyte_integrations_spark.operators.dedup import (
            winner_agg_bucketed,
        )

        frame = winner_agg_bucketed(
            batch, ("url",), "_ab_cdc_lsn",
            ("_ab_cdc_updated_at", "_airbyte_emitted_at"), "_airbyte_ab_id",
            bucket_expr(("url",), 64), 64,
        )
    except ImportError:
        w = winner_agg(batch)
        frame = (
            w.withColumn("_bucket", bucket_expr(("url",), 64))
            .repartition(64, F.col("_bucket"))
            .sortWithinPartitions("_bucket", "url")
        )
    dump("mor_epoch_write_frame", frame)

    # Incremental-snapshot chunk select: does the chunk predicate reach
    # below the winner window? (url-only predicate over an url window)
    from airbyte_integrations_spark.operators.dedup import winner_window
    from airbyte_integrations_spark.sources.incremental_snapshot import (
        chunk_pred,
    )
    from airbyte_integrations_spark.testdata import change_events

    ce = change_events(spark, SF_DIR)
    state = winner_window(ce, drop_tombstones=True)
    dump(
        "isnap_chunk_select",
        state.select("url", "event_type", "value_m").filter(
            chunk_pred("url", 1, 4)
        ),
    )


if __name__ == "__main__":
    main()
