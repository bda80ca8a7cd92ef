"""Partial-image (patch) CDC -> lake MERGE.

`merge_into` (lakehouse/merge.py) applies FULL-image winners: the
latest event per key IS the new row. Patch sources (MongoDB
updateDescription / `$unset`, Debezium-Mongo sparse after-images,
DynamoDB attribute-level streams) break that contract — the latest
event only carries the fields a statement touched, so the apply must
overlay per-column latest writes onto the key's CURRENT row, with
deletes as hard resets (reference context: the Debezium Mongo
connector's patch column, debezium/.../DebeziumEventUtils.java
formatMongoDbDebeziumData surfaces exactly this sparse shape).

Dataflow per epoch (the 10^10-event shape):

1. `fold_patch_writes` — ONE mask-aware hash aggregation with map-side
   partial combine collapses the slice to per-key write structs (hot
   keys cost O(n_mappers) partial rows, never a per-key sort).
2. The fold's keys prune the table read to TOUCHED BUCKETS only, and
   the overlay join is per-bucket (both sides hash on the key): a
   column's new value is its latest in-batch write if that postdates
   the batch's last delete for the key, NULL if the key was deleted
   in-batch and never rewritten, else the current row's value.
3. The overlaid FULL rows (winner ordering metadata attached) feed the
   ordinary `merge_into`, so COW/MoR layouts, epoch-keyed idempotent
   commits, schema handling, and compaction are shared, not forked.

Epoch-composition law (pinned in tests/test_patch_apply.py): applying
a log split at ANY epoch boundaries converges to the same final table
as folding the whole log at once — per-column max-by-ordering is
associative, and a batch tombstone resets columns exactly where the
whole-log fold would (every pre-batch write predates the watermark,
hence the tombstone).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from airbyte_integrations_spark.lakehouse.merge import CDC_ORDER_COLS, merge_into
from airbyte_integrations_spark.lakehouse.table import LakeTable, bucket_expr
from airbyte_integrations_spark.operators.patch import fold_patch_writes, patch_value


def merge_patches_into(
    table: LakeTable,
    batch: DataFrame,
    patch_cols: tuple[str, ...],
    stream: str = "pages",
    epoch: int | None = None,
    epoch_meta: dict | None = None,
    cursor: str = "_ab_cdc_lsn",
    secondary: tuple[str, ...] = CDC_ORDER_COLS,
    ab_id: str = "_airbyte_ab_id",
    tombstone_col: str = "_ab_cdc_deleted_at",
    mask_cols: tuple[str, ...] | None = None,
    mode: str = "cow",
    key: tuple[str, ...] = ("url",),
    n_buckets: int = 32,
) -> int:
    """Apply one micro-batch of PARTIAL-image events; returns the
    committed snapshot version. Exactly-once per (stream, epoch) via
    the shared commit log; safe to re-run and to kill anywhere."""
    if epoch is not None and table.is_epoch_committed(stream, epoch):
        return table.current_version()
    fold = fold_patch_writes(
        batch, key, patch_cols, cursor, secondary, ab_id, tombstone_col, mask_cols
    )
    meta_cols = [
        F.col("_w.o._ab").alias(ab_id),
        *[F.col(f"_w.m.{c}").alias(c) for c in (cursor, *secondary)],
        F.col("_w.m._tomb").alias(tombstone_col),
    ]
    if not table.exists():
        # first epoch: no current rows to overlay — the fold's own
        # post-delete projection IS the full row
        events = fold.select(
            *[F.col(k) for k in key],
            *[patch_value(i, c) for i, c in enumerate(patch_cols)],
            *meta_cols,
        )
        return merge_into(
            table, events, stream=stream, epoch=epoch, epoch_meta=epoch_meta,
            cursor=cursor, secondary=secondary, ab_id=ab_id,
            mode=mode, key=key, n_buckets=n_buckets,
        )

    key = tuple(table.key_cols())
    have = {f.name for f in table.schema.fields}
    # a patch column the table does not know yet is ADDITIVE schema
    # evolution (the reference's additive null-backfill rule, SURVEY
    # §2.9): the overlay reads null for every current row and
    # merge_into's schema-merge widens the table on apply
    new_cols = {c for c in patch_cols if c not in have}
    # the overlay rebuilds FULL rows from key + patch_cols + winner
    # metadata; a payload column outside patch_cols would be silently
    # nulled on the rewrite — reject loudly instead
    meta = {cursor, ab_id, tombstone_col, *secondary, "_bucket"}
    uncovered = sorted(have - set(key) - set(patch_cols) - meta)
    if uncovered:
        raise ValueError(
            f"table payload column(s) {uncovered} are not in patch_cols; "
            "a patch apply must cover every payload column or it would "
            "null them on rewrite"
        )
    nb = table.n_buckets
    ids = sorted(
        r["_b"]
        for r in fold.select(bucket_expr(key, nb).alias("_b")).distinct().collect()
    )
    batch_types = dict(batch.dtypes)
    old = table.read_live(buckets=ids).select(
        *[F.col(k) for k in key],
        *[
            (
                F.lit(None).cast(batch_types[c])
                if c in new_cols
                else F.col(c)
            ).alias(f"__old_{c}")
            for c in patch_cols
        ],
    )
    joined = fold.join(old, list(key), "left")
    overlaid = [
        F.when(
            F.col(f"_p{i}").isNotNull()
            & (F.col("_t").isNull() | (F.col(f"_p{i}.o") > F.col("_t"))),
            F.col(f"_p{i}.v"),
        )
        .when(F.col("_t").isNotNull(), F.lit(None))
        .otherwise(F.col(f"__old_{c}"))
        .alias(c)
        for i, c in enumerate(patch_cols)
    ]
    events = joined.select(
        *[F.col(k) for k in key], *overlaid, *meta_cols
    )
    return merge_into(
        table, events, stream=stream, epoch=epoch, epoch_meta=epoch_meta,
        cursor=cursor, secondary=secondary, ab_id=ab_id,
        mode=mode, key=key, n_buckets=nb,
    )
