"""Sync configuration — the engine's "query language".

Mirrors the reference protocol's ConfiguredAirbyteStream
(airbyte_protocol.yaml:250-289): which stream, which sync mode
(full_refresh | incremental), which destination mode
(append | overwrite | append_dedup), primary key and cursor field.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum


class SyncMode(str, Enum):
    """Source-side read mode (airbyte_protocol.yaml:278-282)."""

    FULL_REFRESH = "full_refresh"
    INCREMENTAL = "incremental"


class DestinationSyncMode(str, Enum):
    """Sink-side apply mode (airbyte_protocol.yaml:283-289).

    APPEND_DEDUP is the reference's "SCD Type 1 & 2": one active row per
    primary key in the final table, winner chosen by the cursor ordering.
    """

    APPEND = "append"
    OVERWRITE = "overwrite"
    APPEND_DEDUP = "append_dedup"


# Default cursor resolution order for CDC streams, mirroring
# stream_processor.py:961-972: explicit cursor_field, else
# _ab_cdc_updated_at, else _ab_cdc_log_pos, else _airbyte_emitted_at.
DEFAULT_CDC_CURSOR_CANDIDATES = (
    "_ab_cdc_lsn",
    "_ab_cdc_updated_at",
    "_ab_cdc_log_pos",
    "_airbyte_emitted_at",
)


@dataclass(frozen=True)
class SyncConfig:
    """One configured stream (ConfiguredAirbyteStream equivalent)."""

    stream: str
    primary_key: tuple[str, ...] = ("url",)
    cursor_field: tuple[str, ...] = ("_ab_cdc_lsn",)
    sync_mode: SyncMode = SyncMode.INCREMENTAL
    destination_sync_mode: DestinationSyncMode = DestinationSyncMode.APPEND_DEDUP
    # Ordering columns appended after the cursor for winner selection,
    # per the reference SCD window (stream_processor.py:832-846):
    # cursor IS NULL last, cursor DESC, then these DESC, tie-broken by
    # _airbyte_ab_id.
    secondary_order: tuple[str, ...] = ("_ab_cdc_updated_at", "_airbyte_emitted_at")
    # Number of hash buckets used for the final table layout; buckets are
    # the unit of copy-on-write during MERGE. At the 10^10-event design
    # point this would be sized so each bucket's active rows fit an
    # executor task (e.g. 4096+); tests use small values.
    n_buckets: int = 32
    # Physical apply layout: "cow" (copy-on-write, rewrite touched
    # buckets; cheapest reads) or "mor" (merge-on-read, append winner
    # deltas as equality-delete markers; O(batch) writes — the
    # sustained-throughput layout for continuous CDC). Same live state
    # either way.
    write_mode: str = "cow"
    # Batch-winner implementation (lakehouse/merge.DEDUP_IMPLS):
    # "agg" (default; associative max-by-ordering, map-side combine),
    # "join" (max-cursor semi-join reduction), "salted" (explicit
    # two-phase), "window" (literal reference window).
    dedup_impl: str = "agg"
    # Field selection: when non-empty, only these payload columns (plus
    # the primary key, cursor, secondary-order and protocol system
    # columns, which always ride) reach the destination. Mirrors the
    # reference's catalog-driven column restriction — AbstractDbSource
    # queries only the fields named in the configured catalog's schema
    # (source-relational-db/.../AbstractDbSource.java:229-233,
    # selectedFieldsInCatalog via CatalogHelpers.getTopLevelFieldNames).
    # Spark-first: the projection is applied to the declarative source
    # frame before any epoch planning, so Catalyst pushes it into the
    # scan (parquet ReadSchema / JDBC column list) — deselected columns
    # are never read, not read-then-dropped. Empty tuple = all fields.
    selected_fields: tuple[str, ...] = ()
    properties: dict = field(default_factory=dict)
