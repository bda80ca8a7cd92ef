"""Shared oracle helpers: DuckDB / pandas replay of the winner rule."""

from __future__ import annotations

import duckdb
import pandas as pd

WINNER_SQL = """
SELECT * EXCLUDE (__rn) FROM (
  SELECT *, row_number() OVER (
    PARTITION BY url
    ORDER BY _ab_cdc_lsn IS NULL ASC, _ab_cdc_lsn DESC,
             _ab_cdc_updated_at DESC, _airbyte_emitted_at DESC,
             _airbyte_ab_id DESC
  ) AS __rn
  FROM events_pdf
) WHERE __rn = 1
"""


def duckdb_winners(pdf: pd.DataFrame, drop_tombstones: bool = True) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("events_pdf", pdf)
    sql = WINNER_SQL
    if drop_tombstones:
        sql += " AND _ab_cdc_deleted_at IS NULL"
    return con.execute(sql).df()


def norm(pdf: pd.DataFrame, sort_cols=("url",)) -> pd.DataFrame:
    cols = sorted(pdf.columns)
    return (
        pdf[cols]
        .sort_values(list(sort_cols) if sort_cols else cols)
        .reset_index(drop=True)
    )


def assert_frames_equal(a: pd.DataFrame, b: pd.DataFrame, sort_cols=("url",)):
    a, b = norm(a, sort_cols), norm(b, sort_cols)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_like=True)
