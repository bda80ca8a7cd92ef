"""Slice-planned incremental JDBC sync: DB-side range slices, one
durable checkpoint per slice.

Reference parity: the CDK's `state_checkpoint_interval` cadence
(python CDK abstract_source.py:224-236 — "checkpoint state after
every N records") combined with Airbyte's slice model: each slice is
an independent bounded read whose completion is checkpointed, so a
killed sync resumes at slice granularity rather than re-reading the
stream. Here a slice is a half-open cursor range `(lo, hi]` rendered
with `cursor_literal` into a database-side predicate (one connection
per slice — read_slices), applied through the same epoch-keyed
idempotent MERGE as the CDC path:

- epoch key `jdbc:<from_lsn>` (string namespace — disjoint from WAL
  positions and stream batch ids),
- epoch_meta carries from_lsn/to_lsn so `LakeTable.watermark` tracks
  the applied cursor frontier,
- a STATE message (the pinned PER_STREAM wire shape) is emitted after
  EVERY slice commit — the per-slice checkpoint cadence.

Slice planning runs IN the database (one MIN/MAX/COUNT aggregate over
the unread tail — an index scan, not a table ship), then boundaries
are spaced evenly in cursor space; density skew unbalances slice
sizes, never correctness (same argument as plan_epochs).

Cursor domains: integral cursors map to the lsn space directly;
TIMESTAMP cursors map through microseconds (matching
as_change_events's unix_micros), so watermarks round-trip exactly.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import SparkSession

from airbyte_integrations_spark.config import SyncConfig
from airbyte_integrations_spark.connector import state_message
from airbyte_integrations_spark.lakehouse.merge import merge_into
from airbyte_integrations_spark.lakehouse.table import LakeTable
from airbyte_integrations_spark.sources.jdbc import (
    JdbcSource,
    as_change_events,
    cursor_literal,
    quote_identifier,
)

_INTEGRAL = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT"}


def _cursor_to_lsn(value, jdbc_type: str) -> int:
    if jdbc_type.upper() in _INTEGRAL:
        return int(value)
    if jdbc_type.upper() == "TIMESTAMP":
        if isinstance(value, str):
            value = datetime.fromisoformat(value)
        if value.tzinfo is None:
            value = value.replace(tzinfo=timezone.utc)
        return int(value.timestamp() * 1_000_000)
    raise ValueError(f"{jdbc_type} cursors are not sliceable (need a total order)")


def _lsn_to_cursor(lsn: int, jdbc_type: str):
    if jdbc_type.upper() in _INTEGRAL:
        return int(lsn)
    # microseconds -> "YYYY-MM-DD HH:MM:SS.ffffff" (JDBC {ts} shape)
    dt = datetime.fromtimestamp(lsn / 1_000_000, tz=timezone.utc)
    return dt.strftime("%Y-%m-%d %H:%M:%S.%f")


def plan_cursor_slices(
    src: JdbcSource,
    cursor_col: str,
    jdbc_type: str,
    from_lsn: int | None,
    rows_per_slice: int,
) -> list[tuple[int, int]]:
    """DB-side bounds aggregate over the unread tail -> even slice
    boundaries in lsn space. Returns [(from_lsn, to_lsn)] half-open."""
    qc = quote_identifier(cursor_col)
    where = ""
    if from_lsn is not None:
        lit = cursor_literal(_lsn_to_cursor(from_lsn, jdbc_type), jdbc_type)
        where = f" WHERE {qc} > {lit}"
    bounds_q = (
        f"(SELECT MIN({qc}) AS lo, MAX({qc}) AS hi, COUNT(*) AS n "
        f"FROM {src.config.table}{where}) b"
    )
    row = {k.lower(): v for k, v in src._reader(bounds_q).load().collect()[0].asDict().items()}
    n = int(row["n"] or 0)
    if n == 0:
        return []
    lo, hi = _cursor_to_lsn(row["lo"], jdbc_type), _cursor_to_lsn(row["hi"], jdbc_type)
    start = from_lsn if from_lsn is not None else lo - 1
    span = hi - start
    n_slices = max((n + rows_per_slice - 1) // rows_per_slice, 1)
    width = max(span // n_slices, 1)
    out, cur = [], start
    while cur < hi:
        to = min(cur + width, hi)
        out.append((cur, to))
        cur = to
    return out


def sync_jdbc_incremental(
    spark: SparkSession,
    src: JdbcSource,
    table: LakeTable,
    config: SyncConfig,
    key_col: str,
    cursor_col: str,
    jdbc_type: str,
    rows_per_slice: int = 1_000_000,
    updated_at_col: str | None = None,
    deleted_at_col: str | None = None,
    max_slices: int | None = None,
) -> list[dict]:
    """Sync the table's unread cursor tail slice by slice; returns the
    STATE messages emitted (one per committed slice). Kill at any
    point and re-run: committed slices are epoch no-ops, the frontier
    resumes from the durable watermark."""
    wm = table.watermark(config.stream)
    slices = plan_cursor_slices(src, cursor_col, jdbc_type, wm, rows_per_slice)
    if max_slices is not None:
        slices = slices[:max_slices]
    messages: list[dict] = []
    for lo, hi in slices:
        epoch = f"jdbc:{lo}"
        if table.is_epoch_committed(config.stream, epoch):
            continue
        qc = quote_identifier(cursor_col)
        pred = (
            f"{qc} > {cursor_literal(_lsn_to_cursor(lo, jdbc_type), jdbc_type)} "
            f"AND {qc} <= {cursor_literal(_lsn_to_cursor(hi, jdbc_type), jdbc_type)}"
        )
        batch = as_change_events(
            src.read_slices([pred]),
            key_col=key_col,
            cursor_col=cursor_col,
            updated_at_col=updated_at_col,
            deleted_at_col=deleted_at_col,
        )
        merge_into(
            table,
            batch,
            stream=config.stream,
            epoch=epoch,
            epoch_meta={"from_lsn": lo, "to_lsn": hi},
            cursor="_ab_cdc_lsn",
            secondary=config.secondary_order,
            mode=config.write_mode,
            dedup_impl=config.dedup_impl,
            key=config.primary_key,
            n_buckets=config.n_buckets,
        )
        # per-slice checkpoint cadence: STATE after the durable commit
        messages.append(state_message(table, config.stream))
    return messages
