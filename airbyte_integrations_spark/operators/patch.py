"""Partial-image (patch) CDC events — per-key column coalescing.

Some CDC sources emit PARTIAL after-images: only the fields a statement
touched are present, everything else is NULL (MongoDB update-description
events, DynamoDB streams with NEW_IMAGE off at the attribute level; the
reference's Debezium Mongo connector surfaces exactly this shape as a
sparse `after` document). Folding such a stream into a final table is
NOT winner-selection — the latest event does not carry the full row —
but per-key, per-column "latest non-null value", with delete events
acting as a hard reset (a field written before a DELETE must not leak
into the state of a later re-insert).

Dataflow (the 10^10-event shape):

- ONE hash aggregation on the key with map-side partial aggregation:
  every term is an associative max of an ordering-struct —
  - per patch column: max over rows where that column is non-null of
    (ordering, value) — "latest write of this field",
  - the overall winner's metadata: max of (ordering, meta),
  - the last tombstone position: max of (ordering) over delete rows.
  Hot keys cost O(n_mappers) partial rows, never a per-key row sort
  (the physical agg is SortAggregate over struct-max — same shape as
  operators/dedup.winner_agg — but partial_max runs below the
  exchange, which is the property that matters at 10^10).
- Post-aggregation (pure projection): a field's latest write is kept
  only if it happened AFTER the last tombstone (struct comparison);
  keys whose overall winner IS the tombstone drop out entirely.

The ordering tuple is the reference winner ordering
(stream_processor.py:832-846 + ab_id tiebreak), with the same
NULL-below-everything flag encoding as operators/dedup._rank_struct.
Equivalence with the literal ordered-window fold
(`last(col, ignorenulls=True)`) is pinned in tests/test_patch.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

CDC_SECONDARY = ("_ab_cdc_updated_at", "_airbyte_emitted_at")


def _ord_struct(
    df: DataFrame,
    cursor: str,
    secondary: tuple[str, ...],
    ab_id: str,
) -> Column:
    """Total-order struct (no payload): max == reference winner.

    Same flag+floor NULL encoding as dedup._rank_struct — a NULL in any
    ordering column sorts strictly below every real value of its dtype.
    """
    dtypes = dict(df.dtypes)

    def _floor(dt: str) -> Column:
        if dt in ("timestamp", "timestamp_ntz"):
            return F.lit("0001-01-01 00:00:00").cast(dt)
        if dt == "date":
            return F.lit("0001-01-01").cast("date")
        if dt == "string":
            return F.lit("")
        return F.lit(0).cast(dt)

    fields: list[Column] = [
        F.col(cursor).isNotNull().alias("_nn"),
        F.coalesce(F.col(cursor), _floor(dtypes[cursor])).alias("_cur"),
    ]
    for i, c in enumerate(secondary):
        fields.append(F.col(c).isNotNull().alias(f"_nn{i}"))
        fields.append(F.coalesce(F.col(c), _floor(dtypes[c])).alias(f"_s{i}"))
    fields.append(F.col(ab_id).alias("_ab"))
    return F.struct(*fields)


def fold_patch_writes(
    df: DataFrame,
    key: tuple[str, ...] = ("url",),
    patch_cols: tuple[str, ...] = (),
    cursor: str = "_ab_cdc_lsn",
    secondary: tuple[str, ...] = CDC_SECONDARY,
    ab_id: str = "_airbyte_ab_id",
    tombstone_col: str = "_ab_cdc_deleted_at",
    mask_cols: tuple[str, ...] | None = None,
) -> DataFrame:
    """The raw per-key fold every patch consumer shares: ONE mask-aware
    hash aggregation (map-side partial), keeping the write structs.

    Returns one row per key: key columns, ``_w`` (the overall winner's
    ordering struct + metadata, tombstone included), ``_t`` (ordering
    of the key's last delete, null if none), and per patch column i a
    struct ``_pi {o, v}`` = the key's LATEST WRITE of that column
    (null if never written). With ``mask_cols`` (one boolean column per
    patch column), "written" means the mask is true — which lets an
    EXPLICIT null win (MongoDB `$unset` / removedFields, a full-image
    replace dropping a field); without masks it falls back to
    value-is-not-null (sparse after-images, where null means
    untouched)."""
    if not patch_cols:
        raise ValueError("patch_cols must name at least one column")
    if mask_cols is not None and len(mask_cols) != len(patch_cols):
        raise ValueError("mask_cols must align 1:1 with patch_cols")
    o = _ord_struct(df, cursor, secondary, ab_id)
    meta = F.struct(
        *[F.col(c) for c in (cursor, *secondary)],
        F.col(tombstone_col).alias("_tomb"),
    )
    aggs = [
        F.max(F.struct(o.alias("o"), meta.alias("m"))).alias("_w"),
        F.max(F.when(F.col(tombstone_col).isNotNull(), o)).alias("_t"),
    ]
    for i, c in enumerate(patch_cols):
        wrote = (
            F.col(mask_cols[i]) if mask_cols is not None else F.col(c).isNotNull()
        )
        aggs.append(
            F.max(
                F.when(wrote, F.struct(o.alias("o"), F.col(c).alias("v")))
            ).alias(f"_p{i}")
        )
    return df.groupBy(*[F.col(k) for k in key]).agg(*aggs)


def patch_value(i: int, c: str, tomb: Column | None = None) -> Column:
    """Post-fold projection of patch column i: its latest write, kept
    only if it postdates the key's last delete (struct comparison over
    the full ordering tuple); NULL if never written since."""
    t = F.col("_t") if tomb is None else tomb
    return F.when(
        F.col(f"_p{i}").isNotNull() & (t.isNull() | (F.col(f"_p{i}.o") > t)),
        F.col(f"_p{i}.v"),
    ).alias(c)


def coalesce_patches(
    df: DataFrame,
    key: tuple[str, ...] = ("url",),
    patch_cols: tuple[str, ...] = (),
    cursor: str = "_ab_cdc_lsn",
    secondary: tuple[str, ...] = CDC_SECONDARY,
    ab_id: str = "_airbyte_ab_id",
    tombstone_col: str = "_ab_cdc_deleted_at",
    mask_cols: tuple[str, ...] | None = None,
) -> DataFrame:
    """Fold a partial-image event stream into one row per live key.

    Returns: key columns, the overall winner's (cursor, *secondary,
    ab_id) metadata, and for each patch column its latest write after
    the key's last delete (NULL if never written since). Keys whose
    latest event is a delete are dropped. ``mask_cols`` as in
    fold_patch_writes (explicit-null writes win)."""
    agg = fold_patch_writes(
        df, key, patch_cols, cursor, secondary, ab_id, tombstone_col, mask_cols
    )
    live = agg.filter(F.col("_w.m._tomb").isNull())
    out_cols: list[Column] = [*[F.col(k) for k in key]]
    out_cols.append(F.col(f"_w.o._ab").alias(ab_id))
    for c in (cursor, *secondary):
        out_cols.append(F.col(f"_w.m.{c}").alias(c))
    for i, c in enumerate(patch_cols):
        out_cols.append(patch_value(i, c))
    return live.select(*out_cols)


def coalesce_patches_window(
    df: DataFrame,
    key: tuple[str, ...] = ("url",),
    patch_cols: tuple[str, ...] = (),
    cursor: str = "_ab_cdc_lsn",
    secondary: tuple[str, ...] = CDC_SECONDARY,
    ab_id: str = "_airbyte_ab_id",
    tombstone_col: str = "_ab_cdc_deleted_at",
    mask_cols: tuple[str, ...] | None = None,
) -> DataFrame:
    """Literal ordered-window fold (`last ignorenulls` ascending) —
    the clarity/equivalence cross-check, one sort per key partition.
    Events at or before a key's last delete are filtered first (the
    delete reset), so `last` only sees post-delete writes. With
    ``mask_cols``, each write is wrapped in a single-field struct so an
    explicit null write is itself a non-null element `last` can pick."""
    if not patch_cols:
        raise ValueError("patch_cols must name at least one column")
    if mask_cols is not None and len(mask_cols) != len(patch_cols):
        raise ValueError("mask_cols must align 1:1 with patch_cols")
    o = _ord_struct(df, cursor, secondary, ab_id)
    with_o = df.withColumn("_o", o)
    last_del = (
        with_o.filter(F.col(tombstone_col).isNotNull())
        .groupBy(*[F.col(k) for k in key])
        .agg(F.max("_o").alias("_dord"))
    )
    live = with_o.join(last_del, list(key), "left").filter(
        F.col("_dord").isNull() | (F.col("_o") > F.col("_dord"))
    )
    w = (
        Window.partitionBy(*key)
        .orderBy(F.col("_o").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    def _write(i: int, c: str) -> Column:
        if mask_cols is None:
            return F.last(F.col(c), ignorenulls=True).over(w)
        wrapped = F.when(F.col(mask_cols[i]), F.struct(F.col(c).alias("v")))
        return F.last(wrapped, ignorenulls=True).over(w)["v"]

    folded = live.select(
        *[F.col(k) for k in key],
        F.col("_o"),
        F.col(ab_id),
        *[F.col(c) for c in (cursor, *secondary)],
        *[_write(i, c).alias(f"__f_{c}") for i, c in enumerate(patch_cols)],
    )
    wn = Window.partitionBy(*key).orderBy(F.col("_o").desc())
    return (
        folded.withColumn("_rn", F.row_number().over(wn))
        .filter(F.col("_rn") == 1)
        .select(
            *[F.col(k) for k in key],
            F.col(ab_id),
            *[F.col(c) for c in (cursor, *secondary)],
            *[F.col(f"__f_{c}").alias(c) for c in patch_cols],
        )
    )
