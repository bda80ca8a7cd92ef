"""Watermarked stream-stream interval join.

The remaining Structured Streaming join surface: correlating two
unbounded streams key-by-key within a time interval (click↔impression
attribution, CDC event ↔ activity enrichment). Spark's state-store
join buffers each side until the watermark proves no more matches can
arrive; WITHOUT a time bound the state grows forever, so this wrapper
makes the interval condition and both watermarks mandatory — the
bounded-state contract is the API, not a caller footnote.

Scale shape: both sides shuffle once on the key; state per key is
bounded by (watermark + interval) × arrival rate; eviction is
watermark-driven inside the JVM state store (no Python in the path).
The SAME function accepts bounded DataFrames (watermarks become
no-ops) so batch backfill and the live stream share one definition —
the batch≡stream equality is pinned in
tests/test_structured_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower: str = "0 seconds",
    upper: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Join rows sharing `key` where right_ts ∈ [left_ts - lower?, …]
    — precisely: left_ts <= right_ts AND right_ts <= left_ts + upper,
    shifted by `lower` (right may trail left by up to `lower`).

    `how` supports inner and leftOuter (outer emission waits for the
    watermark to close the interval — Spark's documented semantics).
    Column names must be disjoint apart from `key`; the right key
    column is dropped from the output.
    """
    if how not in ("inner", "leftOuter"):
        raise ValueError("stream-stream interval join supports inner/leftOuter")
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark).withColumnRenamed(key, f"__r_{key}")
    cond = (
        (F.col(key) == F.col(f"__r_{key}"))
        & (F.col(right_ts) >= F.col(left_ts) - F.expr(f"INTERVAL {lower}"))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper}"))
    )
    return lw.join(rw, cond, how).drop(f"__r_{key}")
