"""Stateful Structured Streaming operators.

Two continuous-mode complements to the lake-table MERGE path:

1. `latest_wins_stream` — the per-PK latest-wins rule (the reference's
   SCD winner window, stream_processor.py:832-846) kept as **streaming
   state** via `applyInPandasWithState`: the state store holds the
   current winner tuple per url, every micro-batch folds its rows into
   that state with the exact reference ordering
   (lsn IS NULL last, lsn DESC, _ab_cdc_updated_at DESC,
   _airbyte_emitted_at DESC, _airbyte_ab_id DESC), and emits the
   updated winner. This is a live materialized view of the final table
   — useful when consumers want per-key currency at stream latency
   without reading the lake. The fold is associative (max over a total
   ordering tuple), so state updates commute with batch boundaries:
   any slicing of the event stream converges to the same state
   (equivalence vs the batch window is pinned in
   tests/test_stateful_streaming.py).

2. `event_time_rates` — watermarked tumbling-window delivery metrics
   (events/deletes per (window, lang)). The reference never drops late
   data for *correctness* (SURVEY §2.10 — ordering is resolved at
   apply time); watermarking here bounds state for *metrics only*,
   mirroring the replication worker's per-stream stats
   (DefaultReplicationWorker.java:197-228) in continuous form.

All pandas work is vectorized (sort_values / column ops on Arrow
batches) — no per-row Python, per BASELINE.json input_hint.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# int64 microseconds; pandas NaT -> int64 min, which sorts LAST under
# descending order — exactly the reference's `IS NULL ASC, ... DESC`
# null placement for the secondary timestamp keys.
_NAT = -(2**63)

# State: the current winner's ordering tuple + carried payload.
# Timestamps are stored as int64 epoch-microseconds: the state codec
# round-trips longs exactly and keeps the comparison integer-only.
STATE_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType(), True),
        T.StructField("updated_us", T.LongType(), True),
        T.StructField("emitted_us", T.LongType(), True),
        T.StructField("ab_id", T.StringType(), True),
        T.StructField("deleted_us", T.LongType(), True),
        T.StructField("warc_us", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("_ab_cdc_lsn", T.LongType(), True),
        T.StructField("_ab_cdc_updated_at", T.TimestampType(), True),
        T.StructField("_ab_cdc_deleted_at", T.TimestampType(), True),
        T.StructField("_airbyte_ab_id", T.StringType(), True),
        T.StructField("_airbyte_emitted_at", T.TimestampType(), True),
        T.StructField("is_deleted", T.BooleanType(), False),
    ]
)

_EVENT_COLS = [
    "url", "warc_ts", "text", "lang", "_ab_cdc_lsn", "_ab_cdc_updated_at",
    "_ab_cdc_deleted_at", "_airbyte_ab_id", "_airbyte_emitted_at",
]


def _us(series: pd.Series) -> pd.Series:
    """Timestamp series -> int64 epoch-microseconds (NaT -> int64 min)."""
    return pd.Series(
        series.values.astype("datetime64[us]").astype("int64"), index=series.index
    )


def _ts(v) -> object:
    return pd.NaT if v is None or v == _NAT else pd.Timestamp(v, unit="us")


def _fold_winner(key, pdf_iter, state: GroupState):
    """Fold a micro-batch's rows for one url into the winner state.

    Winner = max over (lsn IS NOT NULL, lsn, updated, emitted, ab_id)
    — the associative form of the reference window, identical to
    operators/dedup.winner_agg's ordering struct.
    """
    pdf = pd.concat(list(pdf_iter), ignore_index=True)
    lsn = pd.to_numeric(pdf["_ab_cdc_lsn"], errors="coerce")
    order = pd.DataFrame(
        {
            "nn": lsn.notna().astype("int8"),
            "lsn": lsn.fillna(_NAT).astype("int64"),
            "upd": _us(pdf["_ab_cdc_updated_at"]),
            "emit": _us(pdf["_airbyte_emitted_at"]),
            "ab": pdf["_airbyte_ab_id"].astype("str"),
        }
    )
    i = order.sort_values(
        ["nn", "lsn", "upd", "emit", "ab"], ascending=False, kind="stable"
    ).index[0]
    row = pdf.loc[i]
    cand = (
        None if pd.isna(lsn.loc[i]) else int(lsn.loc[i]),
        int(order.at[i, "upd"]),
        int(order.at[i, "emit"]),
        str(order.at[i, "ab"]),
        int(_us(pdf["_ab_cdc_deleted_at"]).loc[i]),
        int(_us(pdf["warc_ts"]).loc[i]),
        None if pd.isna(row["text"]) else str(row["text"]),
        None if pd.isna(row["lang"]) else str(row["lang"]),
    )

    def rank(t):  # total ordering tuple (nulls-last parity)
        return (t[0] is not None, t[0] if t[0] is not None else _NAT,
                t[1], t[2], t[3])

    if state.exists:
        cur = tuple(state.get)
        if rank(cand) > rank(cur):
            state.update(cand)
        else:
            cand = cur
    else:
        state.update(cand)

    # Typed one-row frame: explicit dtypes keep the Arrow conversion
    # stable even when a column is entirely null in this batch.
    yield pd.DataFrame(
        {
            "url": pd.Series([key[0]], dtype="object"),
            "warc_ts": pd.Series([_ts(cand[5])], dtype="datetime64[us]"),
            "text": pd.Series([cand[6]], dtype="object"),
            "lang": pd.Series([cand[7]], dtype="object"),
            "_ab_cdc_lsn": pd.Series([cand[0]], dtype="Int64"),
            "_ab_cdc_updated_at": pd.Series([_ts(cand[1])], dtype="datetime64[us]"),
            "_ab_cdc_deleted_at": pd.Series([_ts(cand[4])], dtype="datetime64[us]"),
            "_airbyte_ab_id": pd.Series([cand[3]], dtype="object"),
            "_airbyte_emitted_at": pd.Series([_ts(cand[2])], dtype="datetime64[us]"),
            "is_deleted": pd.Series([cand[4] != _NAT], dtype="bool"),
        }
    )


def latest_wins_stream(events: DataFrame, impl: str = "agg") -> DataFrame:
    """Per-url winner state over a (streaming) change-event DataFrame.

    Emits one row per (micro-batch, touched url) with the url's current
    winner after folding the batch — a live view of the final table.
    Tombstone winners are emitted with is_deleted=true (downstream
    filters them; state retains them so a late pre-delete image can
    never resurrect the key, cf. merge keep_tombstones mode).

    impl="agg" (default): the winner rule is an associative
    `max(ordering-struct)` (operators/dedup.winner_agg), so Spark's own
    streaming aggregation IS the state machine — the state store holds
    the per-url max struct, partial aggregation pre-reduces each
    micro-batch map-side before the state update, and the whole fold
    stays JVM-side (no Python in the hot path). Update mode re-emits
    each touched key's current winner per batch, exactly the live-view
    contract. This fixed round 1's 60x slowdown: the pandas-state fold
    paid ~0.6 ms of per-(url,batch)-group Python overhead (concat +
    sort + one-row typed DataFrame construction), which at millions of
    touched keys per batch dominates end-to-end cost.

    impl="pandas_state": the explicit applyInPandasWithState fold —
    kept as the template for state logic that is NOT an associative
    aggregate (e.g. per-key session windows, custom eviction); not the
    latest-wins default.
    """
    ev = events.select(*_EVENT_COLS)
    if impl == "pandas_state":
        return ev.groupBy("url").applyInPandasWithState(
            _fold_winner,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    from ..operators.dedup import winner_agg

    w = winner_agg(ev)  # streaming groupBy(url).agg(max(struct)) — stateful
    return w.select(
        *_EVENT_COLS,
        F.col("_ab_cdc_deleted_at").isNotNull().alias("is_deleted"),
    )


def event_time_rates(
    events: DataFrame,
    window_duration: str = "5 minutes",
    watermark_delay: str = "10 minutes",
    time_col: str = "warc_ts",
    group_col: str = "lang",
) -> DataFrame:
    """Watermarked tumbling-window delivery metrics.

    Counts events and tombstones per (event-time window, group). The
    watermark bounds METRICS STATE only — window state older than
    `watermark_delay` behind the max seen event time is evicted every
    micro-batch (Spark's guarantee is one-sided: on-time data is never
    dropped; data later than the delay may or may not be aggregated
    once before its window's state is evicted). The correctness path
    (MERGE winner rule) never involves a watermark — late lsns are
    resolved at apply time (SURVEY §2.10). On a batch DataFrame the
    watermark is a no-op and this is a plain windowed aggregation.
    """
    return (
        events.withWatermark(time_col, watermark_delay)
        .groupBy(F.window(time_col, window_duration).alias("win"), F.col(group_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count(F.col("_ab_cdc_deleted_at")).alias("n_deletes"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            F.col(group_col),
            "n_events",
            "n_deletes",
        )
    )
