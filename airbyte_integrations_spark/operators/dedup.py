"""Per-key winner selection — the heart of append_dedup / CDC apply.

Reference semantics (must match byte-exactly): the SCD window
`row_number() over (partition by <PK> order by cursor IS NULL ASC,
cursor DESC, _ab_cdc_updated_at DESC, [_ab_cdc_log_pos DESC,]
_airbyte_emitted_at DESC) = 1` — stream_processor.py:698-706, 727-754,
832-846; cursor resolution :961-972; final tie broken deterministically
by `_airbyte_ab_id` (the reference uses ab_id ordering for its
exact-duplicate collapse, :921-956 — we pin ab_id DESC so winner =
max over the full ordering tuple, which makes the rule associative).

Three interchangeable implementations, equivalence-tested:

- winner_window: literal window translation (clearest; one shuffle,
  full sort within key partitions).
- winner_agg: `max(struct(order..., payload))` groupBy aggregation.
  Struct comparison is lexicographic, the tuple is made total (nulls
  coalesced below any real value, with an explicit IS NOT NULL flag
  first — matching `cursor IS NULL ... DESC` null ordering), so the
  reduce is associative+commutative => Spark does map-side partial
  aggregation: every mapper emits at most one row per hot url before
  the shuffle. This is the 10^10-scale default — hot-key skew costs
  O(n_mappers) rows per key, not O(n_events).
- winner_salted: explicit two-phase salted variant
  (groupBy(key, salt) -> groupBy(key)) demonstrating SURVEY §4's
  salted pre-aggregation; used when upstream aggregation is disabled
  or for cross-checking.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Sort key: (cursor IS NULL last, cursor DESC, *secondary DESC, ab_id DESC)
LONG_MIN = -(2**63)


def _order_cols_desc(cursor: str, secondary: tuple[str, ...], ab_id: str) -> list[Column]:
    cols: list[Column] = [
        F.col(cursor).isNull().asc(),  # nulls last under DESC (Postgres default parity)
        F.col(cursor).desc(),
    ]
    for c in secondary:
        cols.append(F.col(c).desc())
    cols.append(F.col(ab_id).desc())
    return cols


def winner_window(
    df: DataFrame,
    key: tuple[str, ...] = ("url",),
    cursor: str = "_ab_cdc_lsn",
    secondary: tuple[str, ...] = ("_ab_cdc_updated_at", "_airbyte_emitted_at"),
    ab_id: str = "_airbyte_ab_id",
    drop_tombstones: bool = False,
) -> DataFrame:
    """row_number()==1 per key under the reference ordering."""
    w = Window.partitionBy(*key).orderBy(*_order_cols_desc(cursor, secondary, ab_id))
    out = (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    if drop_tombstones:
        out = out.filter(F.col("_ab_cdc_deleted_at").isNull())
    return out


def _rank_struct(
    df: DataFrame,
    cursor: str,
    secondary: tuple[str, ...],
    ab_id: str,
) -> Column:
    """Total-order struct whose max == the window winner.

    Field order mirrors the ORDER BY; every ordering value is paired
    with an IS NOT NULL flag, so NULLs sort strictly below every real
    value of ANY dtype — exactly Spark's `desc()` NULLS LAST that
    winner_window uses. (A coalesce-to-a-floor-constant alone is wrong
    for bounded dtypes: cast(LONG_MIN as int) wraps, and booleans have
    no value below false — the flag makes the floor constant
    ordering-irrelevant.)
    """
    dtypes = dict(df.dtypes)

    def _floor(dt: str) -> Column:
        # Only a type-correct placeholder: the paired flag already
        # decided the ordering whenever the value was NULL.
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
    payload = [c for c in df.columns if c != ab_id]
    fields.append(F.struct(*[F.col(c) for c in payload]).alias("_row"))
    return F.struct(*fields)


def _unpack_winner(agg: DataFrame, df_columns: list[str], ab_id: str) -> DataFrame:
    cols = []
    for c in df_columns:
        src = "_w._ab" if c == ab_id else f"_w._row.{c}"
        cols.append(F.col(src).alias(c))
    return agg.select(*cols)


def winner_agg(
    df: DataFrame,
    key: tuple[str, ...] = ("url",),
    cursor: str = "_ab_cdc_lsn",
    secondary: tuple[str, ...] = ("_ab_cdc_updated_at", "_airbyte_emitted_at"),
    ab_id: str = "_airbyte_ab_id",
    drop_tombstones: bool = False,
) -> DataFrame:
    """Associative max-by-ordering-tuple aggregation (scale default)."""
    rs = _rank_struct(df, cursor, secondary, ab_id)
    agg = df.groupBy(*[F.col(k) for k in key]).agg(F.max(rs).alias("_w"))
    out = _unpack_winner(agg, df.columns, ab_id)
    if drop_tombstones:
        out = out.filter(F.col("_ab_cdc_deleted_at").isNull())
    return out


def winner_agg_bucketed(
    df: DataFrame,
    key: tuple[str, ...],
    cursor: str,
    secondary: tuple[str, ...],
    ab_id: str,
    bucket: Column,
    n_buckets: int,
    bucket_col: str = "_bucket",
    drop_tombstones: bool = False,
) -> DataFrame:
    """winner_agg keyed through the table's bucket id, so the dedup
    Exchange IS the write layout (guide §2.4: two operations keyed the
    same way share one exchange).

    Plan: Exchange(hash bucket, n_buckets) -> Sort(bucket, key) ->
    SortAggregate — one exchange and one sort total, and the output is
    bucket-pure and key-clustered, exactly what the per-bucket file
    writer needs, so the write skips its own repartition+sort
    (aligned). winner_agg alone plans partial-SortAgg (a full local
    sort) -> Exchange(key) -> Sort -> final -> THEN the writer's
    Exchange(bucket) + sort — two exchanges and three sorts for the
    same rows.

    Trade-off vs winner_agg: no below-exchange partial aggregation, so
    a hot key's rows all cross the wire (bounded by the hottest key's
    batch share; the generator's zipf-2.5 hottest url is <1% of an
    epoch, and at the 10^10 point a single key's share only shrinks).
    The aggregation itself collapses hot keys exactly as winner_agg
    does (same associative max). Returns winners WITH `bucket_col`.
    """
    rs = _rank_struct(df, cursor, secondary, ab_id)
    agg = (
        df.withColumn(bucket_col, bucket)
        .repartition(n_buckets, F.col(bucket_col))
        .groupBy(F.col(bucket_col), *[F.col(k) for k in key])
        .agg(F.max(rs).alias("_w"))
    )
    cols = [F.col(bucket_col)]
    for c in df.columns:
        src = "_w._ab" if c == ab_id else f"_w._row.{c}"
        cols.append(F.col(src).alias(c))
    out = agg.select(*cols)
    if drop_tombstones:
        out = out.filter(F.col("_ab_cdc_deleted_at").isNull())
    return out


def winner_join(
    df: DataFrame,
    key: tuple[str, ...] = ("url",),
    cursor: str = "_ab_cdc_lsn",
    secondary: tuple[str, ...] = ("_ab_cdc_updated_at", "_airbyte_emitted_at"),
    ab_id: str = "_airbyte_ab_id",
    drop_tombstones: bool = False,
) -> DataFrame:
    """Max-cursor semi-join reduction, then window the residue — the
    high-throughput path.

    Phase 1 is a plain `max(cursor)` hash aggregation: fixed-width agg
    buffer => HashAggregate with map-side partial aggregation (skew-safe
    — each mapper emits one row per hot key). Phase 2 joins the max back
    (null-safe equality, so all-null-cursor keys keep their rows and are
    resolved by the window, preserving `cursor IS NULL last`); Catalyst
    broadcasts the max side when small, so the wide payload never
    shuffles. Phase 3 is the exact reference window over the candidate
    set (ties on the cursor only — tiny). Equivalent to winner_window by
    construction; cross-checked in tests/test_dedup.py.

    Unlike winner_agg, rows never get duplicated into an ordering
    struct and nothing sorts the full batch — at 10^10 events this is
    one scan + one narrow shuffle + one candidate-sized shuffle.
    """
    maxes = (
        df.groupBy(*[F.col(k) for k in key])
        .agg(F.max(cursor).alias("__mc"))
        .select(*[F.col(k).alias(f"__k{i}") for i, k in enumerate(key)], "__mc")
    )
    # null-safe: a NULL-key group's rows must survive the join-back
    # (plain equality drops them; winner_window/winner_agg keep them)
    cond = [F.col(k).eqNullSafe(F.col(f"__k{i}")) for i, k in enumerate(key)]
    cond.append(F.col(cursor).eqNullSafe(F.col("__mc")))
    pred = cond[0]
    for c in cond[1:]:
        pred = pred & c
    cand = df.join(maxes, pred, "inner").drop(
        "__mc", *[f"__k{i}" for i in range(len(key))]
    )
    return winner_window(cand, key, cursor, secondary, ab_id, drop_tombstones)


def winner_salted(
    df: DataFrame,
    key: tuple[str, ...] = ("url",),
    cursor: str = "_ab_cdc_lsn",
    secondary: tuple[str, ...] = ("_ab_cdc_updated_at", "_airbyte_emitted_at"),
    ab_id: str = "_airbyte_ab_id",
    n_salts: int = 16,
    drop_tombstones: bool = False,
) -> DataFrame:
    """Explicit two-phase salted reduce (SURVEY §4 item 1).

    Phase 1 shuffles on (key, salt) — a hot key fans out over n_salts
    reducers, each keeping one candidate; phase 2 reduces <= n_salts
    rows per key. Correct because the ordering-tuple max is associative
    (tests/test_dedup.py cross-checks vs winner_window).
    """
    rs = _rank_struct(df, cursor, secondary, ab_id)
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in (ab_id,)]), F.lit(n_salts)).alias("_salt")
    phase1 = (
        df.withColumn("_salt", salt)
        .groupBy(*[F.col(k) for k in key], F.col("_salt"))
        .agg(F.max(rs).alias("_w"))
    )
    phase2 = phase1.groupBy(*[F.col(k) for k in key]).agg(F.max("_w").alias("_w"))
    out = _unpack_winner(phase2, df.columns, ab_id)
    if drop_tombstones:
        out = out.filter(F.col("_ab_cdc_deleted_at").isNull())
    return out
