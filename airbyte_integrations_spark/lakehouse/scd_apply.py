"""Incremental SCD2 history-table maintenance.

The reference's append_dedup destination materializes TWO tables per
stream: the `_scd` Type-2 history and the active-rows final table. The
incremental scd run is (golden dedup_cdc_excluded_scd.sql:20-47 +
second_output scd :3-14):

  new_data_ids   = distinct PKs of the new batch
  prev_active    = {{this}} SEMI JOIN new_data_ids WHERE active_row = 1
  input          = prev_active's raw columns UNION ALL new batch
  re-window input (start/end/active + unique_key_scd)
  DELETE FROM scd WHERE unique_key_scd IN (result); INSERT result

Only touched keys are re-windowed; history rows that were already
inactive are never read or rewritten (their unique_key_scd cannot
appear in the result: the collapse key is content-keyed, and a
re-emitted duplicate event replaces them in place — which is exactly
how re-delivery stays idempotent).

Spark realization: broadcast semi/anti joins on the key set, bucketed
copy-on-write commit via LakeTable.replace_buckets, atomic with the
epoch log (exactly-once).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from airbyte_integrations_spark.lakehouse.table import LakeTable, bucket_expr, conform
from airbyte_integrations_spark.operators.scd import scd2
from airbyte_integrations_spark.schema import merge_schemas

SCD_COLS = (
    "_airbyte_unique_key",
    "_airbyte_start_at",
    "_airbyte_end_at",
    "_airbyte_active_row",
    "_airbyte_unique_key_scd",
)


def apply_scd_batch(
    table: LakeTable,
    batch: DataFrame,
    key: tuple[str, ...] = ("url",),
    cursor: str = "_ab_cdc_lsn",
    secondary: tuple[str, ...] = ("_ab_cdc_updated_at", "_airbyte_emitted_at"),
    ab_id: str = "_airbyte_ab_id",
    stream: str = "pages",
    epoch: int | None = None,
    n_buckets: int = 32,
) -> int:
    """Apply one batch to the SCD history table; returns the committed
    snapshot version. Idempotent per epoch via the commit log."""
    max_broadcast_keys = 2_000_000
    if epoch is not None and table.exists() and table.is_epoch_committed(stream, epoch):
        return table.current_version()

    if not table.exists():
        result = scd2(batch, key, cursor, secondary, ab_id)
        return table.create(result, key, n_buckets, stream, epoch)

    target_input_schema = merge_schemas(
        _strip_scd(table.schema), batch.schema
    )
    batch = conform(batch, target_input_schema)

    # Same size-guarded broadcast decision as merge_into: broadcast the
    # key set for typical epochs (carried payload stays shuffle-free),
    # degrade to a shuffled hash join past max_broadcast_keys instead of
    # OOMing the driver on a 10^8-key backfill.
    keys_df = batch.select(*key).distinct()
    if keys_df.limit(max_broadcast_keys + 1).count() <= max_broadcast_keys:
        keys_df = F.broadcast(keys_df)
    else:
        keys_df = keys_df.hint("shuffle_hash")
    winners_bucket = batch.withColumn("_bucket", bucket_expr(key, table.n_buckets))
    touched = [
        r["_bucket"] for r in winners_bucket.select("_bucket").distinct().collect()
    ]

    current = table.read(touched)
    cur_touched = current.join(keys_df, list(key), "left_semi")
    cur_rest = current.join(keys_df, list(key), "left_anti")

    prev_active = cur_touched.filter(F.col("_airbyte_active_row") == 1)
    prev_inactive = cur_touched.filter(F.col("_airbyte_active_row") != 1)
    prev_active_input = conform(
        prev_active.drop(*SCD_COLS), target_input_schema
    )

    rewindowed = scd2(
        prev_active_input.unionByName(batch), key, cursor, secondary, ab_id
    )

    # delete+insert by unique_key_scd: drop previously-stored rows whose
    # scd key reappears in the result (the prev-active row re-emitted
    # with an updated end_at/active flag, or an exact-duplicate event).
    result_keys = rewindowed.select("_airbyte_unique_key_scd").distinct()
    if result_keys.limit(max_broadcast_keys + 1).count() <= max_broadcast_keys:
        result_keys = F.broadcast(result_keys)
    else:
        result_keys = result_keys.hint("shuffle_hash")
    survivors = prev_inactive.join(result_keys, ["_airbyte_unique_key_scd"], "left_anti")

    out_schema = merge_schemas(table.schema, rewindowed.schema)
    new_data = (
        conform(cur_rest, out_schema)
        .unionByName(conform(survivors, out_schema))
        .unionByName(conform(rewindowed, out_schema))
    )
    return table.replace_buckets(new_data, touched, out_schema, stream, epoch)


def _strip_scd(schema):
    from pyspark.sql import types as T

    return T.StructType([f for f in schema.fields if f.name not in SCD_COLS])


def final_view(table: LakeTable) -> DataFrame:
    """The final (Type-1) table = active rows of the history
    (dedup_cdc_excluded.sql:22-24)."""
    return table.read().filter(F.col("_airbyte_active_row") == 1)
