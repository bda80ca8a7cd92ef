"""SCD Type 2 history — the reference's `_scd` table semantics.

Exact translation of the generated SCD model
(stream_processor.py:698-959; golden dedup_cdc_excluded_scd.sql:55-106):

- `_airbyte_start_at` = cursor value of the row,
- `_airbyte_end_at`   = lag(cursor) over (partition by PK order by the
  winner ordering) — i.e. the next-newer row's cursor,
- `_airbyte_active_row` = 1 iff row_number()==1 AND not tombstoned,
- exact-duplicate collapse: row_number() over (partition by unique_key,
  start_at, emitted_at, deleted_at::string, updated_at::string order by
  active_row DESC, _airbyte_ab_id) == 1, with `_airbyte_unique_key_scd`
  = md5 over those fields (stream_processor.py:921-956),
- `_airbyte_unique_key` = md5 surrogate of the PK (:906-910).

Final table = scd rows where active_row == 1, one row per PK
(dedup_cdc_excluded.sql:1-6, 22-24).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from airbyte_integrations_spark.functions.hashing import surrogate_key


def scd2(
    df: DataFrame,
    key: tuple[str, ...] = ("url",),
    cursor: str = "_ab_cdc_lsn",
    secondary: tuple[str, ...] = ("_ab_cdc_updated_at", "_airbyte_emitted_at"),
    ab_id: str = "_airbyte_ab_id",
    deleted_at: str = "_ab_cdc_deleted_at",
    emitted_at: str = "_airbyte_emitted_at",
    updated_at: str = "_ab_cdc_updated_at",
    log_pos: str = "_ab_cdc_log_pos",
) -> DataFrame:
    # Reference window ordering (pos_dedup_cdcx_scd.sql:70-84):
    # cursor IS NULL ASC, cursor DESC, updated_at DESC,
    # [_ab_cdc_log_pos DESC,] emitted_at DESC — when the stream carries
    # log_pos it joins the ORDER BY between updated_at and emitted_at,
    # not only the duplicate-collapse key.
    sec = list(secondary)
    if log_pos in df.columns and log_pos not in sec:
        try:
            sec.insert(sec.index(updated_at) + 1, log_pos)
        except ValueError:
            sec.insert(0, log_pos)
    order = [F.col(cursor).isNull().asc(), F.col(cursor).desc()]
    order += [F.col(c).desc() for c in sec]
    order.append(F.col(ab_id).desc())
    w = Window.partitionBy(*key).orderBy(*order)

    is_cdc = deleted_at in df.columns
    active = F.row_number().over(w) == 1
    if is_cdc:
        active = active & F.col(deleted_at).isNull()
    out = (
        df.withColumn("_airbyte_unique_key", surrogate_key(*key))
        .withColumn("_airbyte_start_at", F.col(cursor))
        .withColumn("_airbyte_end_at", F.lag(F.col(cursor), 1).over(w))
        .withColumn("_airbyte_active_row", active.cast("int"))
    )
    # exact-duplicate collapse (idempotent re-apply of overlapping
    # batches produces identical unique_key_scd => one survivor).
    # The CDC columns join the collapse key only when the stream has
    # them (non-CDC scd models hash just key/start/emitted); when
    # _ab_cdc_log_pos exists it joins too
    # (golden pos_dedup_cdcx_scd.sql:94-106).
    dedup_cols = [
        F.col("_airbyte_unique_key"),
        F.col("_airbyte_start_at"),
        F.col(emitted_at),
    ]
    if is_cdc:
        dedup_cols.append(F.col(deleted_at).cast("string"))
    if updated_at in df.columns:
        dedup_cols.append(F.col(updated_at).cast("string"))
    if log_pos in df.columns:
        dedup_cols.append(F.col(log_pos).cast("string"))
    w2 = Window.partitionBy(*dedup_cols).orderBy(
        F.col("_airbyte_active_row").desc(), F.col(ab_id).asc()
    )
    out = (
        out.withColumn("_airbyte_unique_key_scd", surrogate_key(*dedup_cols))
        .withColumn("__rn2", F.row_number().over(w2))
        .filter(F.col("__rn2") == 1)
        .drop("__rn2")
    )
    return out


def final_from_scd(scd: DataFrame) -> DataFrame:
    """Final (type-1) table: active rows only (golden final model
    :22-24); one row per PK by construction."""
    return scd.filter(F.col("_airbyte_active_row") == 1)
