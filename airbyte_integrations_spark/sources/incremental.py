"""Cursor-based incremental scans (non-CDC).

Reference: `queryTableIncremental` — `SELECT ... WHERE cursor > ?`
with the max cursor tracked separately
(AbstractJdbcSource.java:261-286, StateDecoratingIterator.java:50-60).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def read_incremental(
    df: DataFrame, cursor: str, state
) -> tuple[DataFrame, "object"]:
    """Returns (rows with cursor strictly greater than state, new state
    = max cursor seen). state=None => full read (initial sync)."""
    out = df if state is None else df.filter(F.col(cursor) > F.lit(state))
    row = out.agg(F.max(cursor).alias("m")).collect()[0]
    new_state = row["m"] if row["m"] is not None else state
    return out, new_state


def incremental_clause(cursor: str, state) -> Column:
    """The dbt incremental_clause analogue (macros/incremental.sql:7-19):
    coalesce(cursor >= state, true) — tolerant of null cursors."""
    if state is None:
        return F.lit(True)
    return F.coalesce(F.col(cursor) >= F.lit(state), F.lit(True))
