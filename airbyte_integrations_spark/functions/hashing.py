"""Surrogate keys and content hashes.

Mirrors dbt_utils.surrogate_key semantics: md5 of '~'-joined,
null-coalesced stringified fields (stream_processor.py:631-660 for
`_airbyte_<stream>_hashid`, :906-910 for `_airbyte_unique_key`,
:921-956 for `_airbyte_unique_key_scd`) — all JVM-side builtins.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _stringify(c: str | Column) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return F.coalesce(col.cast("string"), F.lit(""))


def surrogate_key(*cols: str | Column) -> Column:
    """md5 over '~'-joined stringified columns (nulls -> '')."""
    return F.md5(F.concat_ws("~", *[_stringify(c) for c in cols]))


def unique_key_scd(
    pk_cols: list[str],
    start_at: str = "_airbyte_start_at",
    emitted_at: str = "_airbyte_emitted_at",
    deleted_at: str = "_ab_cdc_deleted_at",
    updated_at: str = "_ab_cdc_updated_at",
) -> Column:
    """Content-keyed SCD row identity (stream_processor.py:921-956):
    md5 over (PK..., start_at, emitted_at, deleted_at, updated_at) —
    the key dbt's delete+insert dedups on, making re-applies idempotent.
    """
    return surrogate_key(*pk_cols, start_at, emitted_at, deleted_at, updated_at)


def row_hash(df_columns: list[str]) -> Column:
    """Whole-row hash (`_airbyte_<stream>_hashid` analogue)."""
    return surrogate_key(*df_columns)
