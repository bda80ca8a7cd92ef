"""Cursor-based incremental scans (non-CDC).

Reference: `queryTableIncremental` — `SELECT ... WHERE cursor > ?`
with the max cursor tracked separately
(AbstractJdbcSource.java:261-286, StateDecoratingIterator.java:50-60).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def read_incremental(
    df: DataFrame, cursor: str, state, eager_state: bool = True
) -> tuple[DataFrame, "object"]:
    """Returns (rows with cursor strictly greater than state, new state
    = max cursor seen). state=None => full read (initial sync).

    eager_state=True computes max(cursor) NOW with a dedicated scan —
    simple, but at 10^10 rows that is one extra full pass, and a source
    that gains rows between this scan and the caller's materialization
    re-delivers them next sync (harmless under the winner rule, but
    wasteful). eager_state=False returns new_state=None; the caller
    computes the max from the batch it actually materialized (the
    reference's StateDecoratingIterator tracks the max WHILE streaming
    — one pass, state always matches delivered data; run_sync's epoch
    bounds do the same thing for the CDC path)."""
    out = df if state is None else df.filter(F.col(cursor) > F.lit(state))
    if not eager_state:
        return out, None
    row = out.agg(F.max(cursor).alias("m")).collect()[0]
    new_state = row["m"] if row["m"] is not None else state
    return out, new_state


def incremental_clause(cursor: str, state) -> Column:
    """The dbt incremental_clause analogue (macros/incremental.sql:7-19):
    coalesce(cursor >= state, true) — tolerant of null cursors."""
    if state is None:
        return F.lit(True)
    return F.coalesce(F.col(cursor) >= F.lit(state), F.lit(True))
