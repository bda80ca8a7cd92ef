"""MERGE INTO — the append_dedup / CDC apply operator.

Semantics (north rule + SURVEY §2.8): per primary key,
  WHEN MATCHED AND source wins AND source is tombstone  -> DELETE
  WHEN MATCHED AND source wins                          -> UPDATE *
  WHEN NOT MATCHED AND source is not tombstone          -> INSERT *
where "source wins" is the reference winner ordering over
(lsn, _ab_cdc_updated_at, _airbyte_emitted_at, _airbyte_ab_id) —
the table's stored row carries those columns, so re-applying an old or
overlapping batch converges (idempotent; monotone `s.lsn > t.lsn`
guard emerges from the ordering itself).

Physical plan, designed for the 10^10-event point:

1. batch winners: associative max-by-ordering groupBy on the key
   (map-side partial agg => hot-key safe) — operators/dedup.winner_agg.
2. touched buckets = distinct bucket ids of winners (metadata-sized).
3. semi-join reduction (reference's `new_data_ids` CTE,
   stream_processor.py:848-898): within touched buckets, rows whose
   key is NOT in the batch are carried forward untouched (left_anti
   against the key set — broadcast while the winner count stays under
   max_broadcast_keys, shuffled hash join beyond it); only matched
   rows + batch rows go through winner selection again.
4. copy-on-write: rewrite only touched buckets' files; untouched
   buckets move to the new snapshot by reference.

Schema evolution is resolved first: target schema = union-by-name with
widening casts of (table schema, batch schema); both sides conformed
before the union (SURVEY §2.9). A widening the parquet reader cannot
serve over existing files (e.g. int -> string; see
schema.parquet_read_compatible) forces a FULL rewrite of every bucket
in the same commit — otherwise the committed manifest schema would
make untouched old files unreadable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from airbyte_integrations_spark.lakehouse.table import LakeTable, bucket_expr, conform
from airbyte_integrations_spark.operators.dedup import (
    winner_agg,
    winner_agg_bucketed,
    winner_join,
    winner_salted,
    winner_window,
)

from airbyte_integrations_spark.schema import incompatible_widenings, merge_schemas

# Interchangeable batch-winner implementations (operators/dedup.py);
# equivalence-tested in tests/test_dedup.py. "agg" (associative
# max-by-ordering-struct with map-side partial aggregation) is the
# default: one scan + one combined shuffle, hot-key safe, and measured
# ~3x faster than the join-reduction at 10^5-10^6-key batches.
DEDUP_IMPLS = {
    "agg": winner_agg,
    "join": winner_join,
    "salted": winner_salted,
    "window": winner_window,
}

CDC_ORDER_COLS = ("_ab_cdc_updated_at", "_airbyte_emitted_at")


def merge_into(
    table: LakeTable,
    batch: DataFrame,
    stream: str = "pages",
    epoch: int | None = None,
    epoch_meta: dict | None = None,
    cursor: str = "_ab_cdc_lsn",
    secondary: tuple[str, ...] = CDC_ORDER_COLS,
    ab_id: str = "_airbyte_ab_id",
    broadcast_keys: bool | None = None,
    max_broadcast_keys: int = 2_000_000,
    transform_winners=None,
    keep_tombstones: bool = False,
    mode: str = "cow",
    dedup_impl: str = "agg",
    key: tuple[str, ...] = ("url",),
    n_buckets: int = 32,
) -> int:
    """Apply one micro-batch; returns the committed snapshot version.

    Exactly-once: if (stream, epoch) is already in the commit log the
    call is a no-op (BufferedStreamConsumer.java:39-57 state-after-
    commit rule, keyed by epoch instead of STATE message).

    `key`/`n_buckets` take effect at table CREATION (the first epoch);
    an existing table's manifest values win thereafter — a bucket/key
    layout cannot change under committed data.

    mode:
      "cow" — copy-on-write: touched buckets rewritten; reads are raw
              file scans. Write cost O(table-in-touched-buckets)/epoch.
      "mor" — merge-on-read: batch winners (tombstones included, as
              equality-delete markers) appended as per-bucket delta
              files; reads resolve the winner rule over base ∪ deltas;
              compaction folds. Write cost O(batch)/epoch — the
              sustained-CDC-throughput layout at the 10^10 point.
    Both modes converge to identical live state (tests/test_mor.py).
    """
    if epoch is not None and table.is_epoch_committed(stream, epoch):
        return table.current_version()
    batch_winners = DEDUP_IMPLS[dedup_impl]

    if not table.exists():
        missing = [k for k in key if k not in batch.columns]
        if missing:
            raise ValueError(f"batch is missing primary-key column(s) {missing}")
        aligned = dedup_impl == "agg"
        if aligned:
            # same single-exchange bucket-keyed dedup as the MoR epoch
            # path below: the first epoch's write layout is known here
            # (key/n_buckets fix at creation), so the winner Exchange
            # doubles as the writer's and the create skips its shuffle.
            winners = winner_agg_bucketed(
                batch, key, cursor, secondary, ab_id,
                bucket_expr(key, n_buckets), n_buckets,
                drop_tombstones=not keep_tombstones,
            )
        else:
            winners = batch_winners(
                batch, key, cursor, secondary, ab_id,
                drop_tombstones=not keep_tombstones,
            )
        if transform_winners is not None:
            winners = transform_winners(winners)
        props: dict | None = {"keep_tombstones": True} if keep_tombstones else None
        if mode == "mor":
            props = {
                **(props or {}),
                "mor": True,
                "order": {"cursor": cursor, "secondary": list(secondary), "ab_id": ab_id},
            }
        return table.create(
            winners, key, n_buckets, stream, epoch, epoch_meta, props=props,
            aligned=aligned,
        )

    # ONE manifest parse per merge: at the 10^10 point the manifest
    # (bucket file lists + commit log) is MB-scale JSON; re-parsing it
    # for every key_cols()/props()/schema accessor was ~8 reads/epoch.
    m = table.manifest()
    mprops = m.get("props", {})
    table_schema = T.StructType.fromJson(m["schema"])
    key = tuple(m["key"])
    n_buckets = int(m["n_buckets"])

    if keep_tombstones and not mprops.get("keep_tombstones"):
        # A retention-requiring writer (stream_sync) attached to a table
        # created without the prop: make it durable at this commit, or a
        # later compact()/read path would silently drop the retained
        # tombstones and a stale pre-delete image could resurrect keys.
        table.want_props(keep_tombstones=True)

    missing = [k for k in key if k not in batch.columns]
    if missing:
        # conform() would null-backfill the key and collapse the whole
        # batch into one null-key winner — data loss with a committed
        # epoch. Fail loudly instead.
        raise ValueError(
            f"batch is missing the table's primary-key column(s) {missing}"
        )
    target_schema = merge_schemas(table_schema, batch.schema)
    # Widenings the parquet reader cannot serve over existing files
    # (schema.py matrix) force a full rewrite in this same commit.
    needs_rewrite = incompatible_widenings(table_schema, target_schema)

    if mode == "mor" and not needs_rewrite:
        order = {"cursor": cursor, "secondary": list(secondary), "ab_id": ab_id}
        if not mprops.get("order"):
            # COW-created table switched to MoR: the resolution order
            # must be durable before any read_resolved/compact uses it.
            table.want_props(mor=True, order=order)
        if dedup_impl == "agg":
            # Bucket-keyed dedup: the winner aggregation's one Exchange
            # is hash(_bucket) == the delta writer's layout, so the
            # write runs aligned (no second shuffle, no extra sort) —
            # one exchange + one sort per epoch instead of two + three.
            winners = winner_agg_bucketed(
                conform(batch, target_schema), key, cursor, secondary, ab_id,
                bucket_expr(key, n_buckets), n_buckets,
            )
            if transform_winners is not None:
                # projections (withColumn / pandas-UDF eval) preserve
                # the bucket partitioning and ordering — still aligned
                winners = transform_winners(winners)
            return table.append_deltas(
                winners, stream, epoch, epoch_meta, order=order, aligned=True
            )
        winners = batch_winners(
            conform(batch, target_schema), key, cursor, secondary, ab_id
        )
        if transform_winners is not None:
            winners = conform(transform_winners(winners), target_schema)
        return table.append_deltas(winners, stream, epoch, epoch_meta, order=order)

    if dedup_impl == "agg":
        # Same single-exchange bucket-keyed dedup as the MoR path: one
        # Exchange(_bucket) + one sort replaces partial-sort ->
        # Exchange(key) -> sort, and the output already carries _bucket
        # so the touched-bucket count below is exchange-free.
        winners = winner_agg_bucketed(
            conform(batch, target_schema), key, cursor, secondary, ab_id,
            bucket_expr(key, n_buckets), n_buckets,
        )
        if transform_winners is not None:
            # Expensive row transforms (e.g. html->text extraction) run
            # here, AFTER dedup: only winners pay. conform drops the
            # bucket column; recompute it (same deterministic hash).
            winners = conform(
                transform_winners(winners), target_schema
            ).withColumn("_bucket", bucket_expr(key, n_buckets))
    else:
        winners = batch_winners(
            conform(batch, target_schema), key, cursor, secondary, ab_id
        )
        if transform_winners is not None:
            winners = conform(transform_winners(winners), target_schema)
        winners = winners.withColumn("_bucket", bucket_expr(key, n_buckets))
    # One row per key after dedup — small relative to the batch; cache it
    # so touched-bucket discovery and the merge share one computation.
    winners = winners.persist()
    # Touched buckets + winner count in ONE action (bounded by
    # n_buckets — metadata, not data): the count drives the broadcast
    # decision below, so the sync loop pays one job here, not two.
    bucket_counts = (
        winners.groupBy("_bucket").agg(F.count(F.lit(1)).alias("c")).collect()
    )
    touched = [r["_bucket"] for r in bucket_counts]
    n_winners = sum(r["c"] for r in bucket_counts)

    if not touched:
        # Empty batch: still record the epoch (empty-sync state emission,
        # CdcSourceTest.testNoData semantics).
        winners.unpersist()
        return table.replace_buckets(
            conform(batch.limit(0), target_schema),
            [],
            target_schema,
            stream,
            epoch,
            epoch_meta,
        )

    if needs_rewrite:
        # Every existing bucket must be rewritten under the new schema
        # (old physical types can't be scanned under it after commit).
        existing = {int(b) for b in m.get("files", {})}
        existing |= {int(b) for b in m.get("deltas", {})}
        touched = sorted(existing | set(touched))

    has_deltas = bool(m.get("deltas"))
    # A COW merge over a table carrying MoR deltas first resolves them
    # (the rewrite folds the touched buckets' deltas into the new base;
    # replace_buckets drops their manifest entries).
    current = conform(
        table.read_resolved(touched) if has_deltas else table.read(touched),
        target_schema,
    )

    wb = winners.drop("_bucket")
    keys_df = wb.select(*key).distinct()
    # broadcast_keys=None (default): decide from the ACTUAL key count
    # (computed with the touched buckets above — no extra job).
    # Small/typical epochs broadcast (keeps the carried payload
    # shuffle-free); a 10^8-winner epoch degrades to a shuffled join
    # instead of OOMing the driver. True/False force either way.
    if broadcast_keys is None:
        broadcast_keys = n_winners <= max_broadcast_keys
    if broadcast_keys:
        keys_df = F.broadcast(keys_df)
    else:
        keys_df = keys_df.hint("shuffle_hash")
    # Null-safe split, matching winner_join's NULL-key semantics: with
    # plain equality a NULL-key base row would survive the anti-join
    # (carried) while the NULL-key batch winner also lands via merged —
    # two live rows for one key group. <=> keeps it one. Catalyst still
    # plans both sides as a single Broadcast/ShuffledHashJoin (null-safe
    # equality is a valid hash key), so the carried-aligned write path
    # is unaffected.
    split_cond = None
    for k in key:
        c = current[k].eqNullSafe(keys_df[k])
        split_cond = c if split_cond is None else (split_cond & c)
    carried = current.join(keys_df, split_cond, "left_anti")
    contested = current.join(keys_df, split_cond, "left_semi")

    # contested + batch winners are <= 2 rows per contested key.
    # keep_tombstones mode (or a table created in it) retains delete
    # rows physically so even NON-monotone redelivery of a pre-delete
    # image cannot resurrect a key; read_live() hides them.
    retain = keep_tombstones or bool(mprops.get("keep_tombstones"))
    if dedup_impl == "agg":
        # bucket-keyed resolution (equivalence-tested vs the window):
        # its one Exchange is the writer's layout, so the merged part
        # writes aligned alongside the carried part.
        merged = winner_agg_bucketed(
            contested.unionByName(wb), key, cursor, secondary, ab_id,
            bucket_expr(key, n_buckets), n_buckets,
            drop_tombstones=not retain,
        )
        merged_aligned = True
    else:
        merged = winner_window(
            contested.unionByName(wb), key, cursor, secondary, ab_id,
            drop_tombstones=not retain,
        )
        merged_aligned = False
    # Two-part commit: the carried table payload is scanned out of
    # bucket-pure files and written back WITHOUT a shuffle
    # (aligned=True); only the merged rows — O(batch keys) — pay the
    # repartition. This halves the MERGE's disk traffic: the dominant
    # cost at scale is moving the carried payload once, not twice.
    # Alignment holds ONLY when the carried side never shuffled: a
    # broadcast anti-join preserves the bucket-pure scan partitioning,
    # but the shuffled-hash fallback re-keys partitions by Spark's key
    # hash — writing it unaligned would fan each task across buckets
    # (partitions x buckets tiny files). Shuffled path repartitions.
    carried_aligned = (not has_deltas) and bool(broadcast_keys)
    parts = [(carried, carried_aligned), (merged, merged_aligned)]
    try:
        return table.replace_buckets(
            parts, touched, target_schema, stream, epoch, epoch_meta
        )
    finally:
        winners.unpersist()
