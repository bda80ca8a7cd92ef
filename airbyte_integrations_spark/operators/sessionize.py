"""Gap-based sessionization over an event stream.

The classic eventlog operator: a user's events belong to one session
until a silence longer than `gap` splits them. Batch form here (two
stacked windows over ONE user-keyed shuffle); the streaming analogue is
Structured Streaming's session_window, which `sessionize_stream`
exposes for the unbounded path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_s: int = 1800,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Assign `session_id` (1-based per user) by the gap rule: a new
    session starts when ts - previous ts > gap_s (a silence of exactly
    gap_s does NOT split — pinned by test).

    Plan shape: both windows share PARTITION BY user ORDER BY ts, so
    Catalyst plans ONE Exchange + one Sort and stacks the lag and the
    running sum on it — a single shuffle keyed by user. Per-user data
    is bounded (humans generate few events), so partitions stay small
    at any corpus size; hot synthetic users would need the salted
    two-pass variant, which real user-keyed logs don't.
    """
    order = [F.col(ts_col).asc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(user_col).orderBy(*order)
    prev = F.lag(F.col(ts_col)).over(w)
    is_new = (
        prev.isNull()
        | (F.unix_micros(F.col(ts_col).cast("timestamp"))
           - F.unix_micros(prev.cast("timestamp")) > gap_s * 1_000_000)
    ).cast("long")
    running = Window.partitionBy(user_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("session_id", F.sum(is_new).over(running))


def session_stats(
    sessions: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str | None = "value",
) -> DataFrame:
    """Collapse sessionized events to one row per (user, session):
    n_events, start/end as epoch micros, duration seconds, and an
    exact integer cents sum of `value_col` (round(value*100) per event
    before summing — long arithmetic, so the result is independent of
    aggregation order, unlike a double sum).

    Map-side-combining hash aggregate on the SAME (user) partitioning
    the sessionize shuffle produced — AQE/EnsureRequirements reuses it;
    no second exchange.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    aggs = [
        F.count("*").alias("n_events"),
        F.min(us).alias("start_us"),
        F.max(us).alias("end_us"),
        F.floor((F.max(us) - F.min(us)) / F.lit(1_000_000))
        .cast("long").alias("duration_s"),
    ]
    if value_col:
        aggs.append(
            F.sum(F.round(F.col(value_col) * 100).cast("long")).alias("sum_cents")
        )
    return sessions.groupBy(user_col, "session_id").agg(*aggs)


def sessionize_stream(events, user_col="user_id", ts_col="ts", gap="30 minutes"):
    """Unbounded flavor: Structured Streaming session_window aggregation
    (state-store backed, watermark-driven eviction). Returns the
    windowed aggregate; caller attaches the watermark + sink."""
    return (
        events.groupBy(
            F.col(user_col), F.session_window(F.col(ts_col), gap).alias("w")
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            user_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def hopping_rates(
    events,
    ts_col: str = "ts",
    keys: tuple[str, ...] = ("event_type",),
    size: str = "1 hour",
    slide: str = "15 minutes",
    value_col: str | None = None,
    watermark: str | None = None,
):
    """Hopping-window rates (the sliding monitoring view): one row per
    (window, keys) with event count and optional exact integer-cents
    value sum. Batch and streaming share this ONE definition — pass a
    streaming DataFrame plus `watermark` for the unbounded flavor
    (state-store windows, watermark-driven eviction; append sinks emit
    a window once the watermark passes its end). Plan shape either way:
    each event expands into size/slide window slots (a constant
    factor), then ONE map-side-combining hash aggregation — no
    self-join, no sort."""
    src = events.withWatermark(ts_col, watermark) if watermark else events
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None:
        aggs.append(
            F.sum(F.round(F.col(value_col) * 100).cast("long")).alias("value_cents")
        )
    return (
        src.groupBy(F.window(F.col(ts_col), size, slide).alias("w"), *[F.col(k) for k in keys])
        .agg(*aggs)
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *keys,
            *[a_name for a_name in (["n_events"] + (["value_cents"] if value_col else []))],
        )
    )
