"""Raw-tier persistence + (re)normalization — the reference's two-tier
destination contract re-expressed Spark-first.

Reference: Java destinations land every record in
`_airbyte_raw_<stream>(_airbyte_ab_id, _airbyte_data JSON,
_airbyte_emitted_at)` (base-java JavaBaseConstants.java:19-21) and
base-normalization builds the typed tables FROM that raw tier via the
dbt model chain ab1 json_extract -> ab2 cast -> ab3 hashid -> final
(base-normalization/normalization/transform_catalog/stream_processor.py
:399-486 and :782), so a schema fix or normalization upgrade re-runs
against raw without re-reading the source, and incremental runs reduce
work to the new raw rows (:848-898 `new_data` CTE).

Spark-first mapping, designed for the 10^10-row point:

- The raw tier is a LakeTable bucketed by `_airbyte_ab_id` (uniform
  md5 -> no skew), append-only, with the same epoch-keyed idempotent
  commit log every other sink here uses.
- ab1+ab2 collapse into ONE `from_json(_airbyte_data, schema)` typed
  projection — whole-stage-codegen, no Python, no per-column
  json_extract re-parse (the reference parses the blob once per
  column; Catalyst parses it once per row).
- ab3's `_airbyte_<stream>_hashid` is functions/hashing.surrogate_key
  (md5 of `~`-joined stringified columns — same bytes as dbt_utils
  surrogate_key, pinned by tests/test_reference_fixtures.py).
- Incremental normalization is a FILE-level snapshot diff: raw is
  append-only, so the rows added between raw snapshot W and snapshot V
  are exactly the data files in manifest(V) not in manifest(W) — the
  Iceberg incremental-read shape. Scan cost is O(new data); no full
  raw scan, no reliance on emitted_at monotonicity, and the final
  table's committed-epoch log (epoch = raw version V) makes re-runs
  exact no-ops.
- Re-normalization (the "drop the final tables and rebuild" operation
  the raw tier exists for) is one full-scan batch — embarrassingly
  parallel, winner-deduped by the same associative aggregation as the
  CDC apply path.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from airbyte_integrations_spark.config import SyncConfig
from airbyte_integrations_spark.functions.hashing import surrogate_key
from airbyte_integrations_spark.lakehouse.merge import merge_into
from airbyte_integrations_spark.lakehouse.table import LakeTable

AB_ID = "_airbyte_ab_id"
EMITTED_AT = "_airbyte_emitted_at"
DATA = "_airbyte_data"
NORMALIZED_AT = "_airbyte_normalized_at"

RAW_COLS = (AB_ID, EMITTED_AT, DATA)

# Spark's default JSON timestamp formats are millisecond-precision;
# raw is the replayable source of truth, so serialize full micros for
# BOTH timestamp flavors (LTZ uses timestampFormat, NTZ uses
# timestampNTZFormat — setting only one silently truncates the other;
# caught by the cdc_raw_normalize value oracle: updated_us drifted).
_JSON_OPTS = {
    "ignoreNullFields": "false",
    "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
    "timestampNTZFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
}


def to_raw(df: DataFrame, data_cols: list[str] | None = None) -> DataFrame:
    """Typed frame -> raw-tier rows.

    `_airbyte_data` is `to_json` over the payload struct with explicit
    nulls (the reference's raw blob is the record as emitted — a null
    field is data, not absence). `_airbyte_ab_id`/`_airbyte_emitted_at`
    must already be on the frame (every source here stamps them); the
    payload is every other column unless `data_cols` narrows it.
    """
    payload = data_cols or [c for c in df.columns if c not in (AB_ID, EMITTED_AT)]
    return df.select(
        F.col(AB_ID),
        F.col(EMITTED_AT),
        F.to_json(
            F.struct(*[F.col(c) for c in payload]), _JSON_OPTS
        ).alias(DATA),
    )


def write_raw(
    table: LakeTable,
    df: DataFrame,
    stream: str,
    epoch: int | None = None,
    epoch_meta: dict | None = None,
    data_cols: list[str] | None = None,
    n_buckets: int = 32,
) -> int:
    """Append one batch to the raw tier (idempotent under the epoch
    key, like every sink commit here). Raw rows are already serialized
    if the frame has exactly the raw columns; otherwise they are
    serialized via to_raw()."""
    raw = df if set(df.columns) == set(RAW_COLS) else to_raw(df, data_cols)
    return table.append(
        raw.select(*RAW_COLS), stream, epoch, epoch_meta,
        key=(AB_ID,), n_buckets=n_buckets,
    )


def typed_from_raw(
    raw: DataFrame,
    schema: T.StructType | str,
    stream: str,
    hashid: bool = True,
    normalized_at: datetime | None = None,
) -> DataFrame:
    """ab1+ab2+ab3 in one projection: parse `_airbyte_data` against the
    declared stream schema (one from_json per row), lift the fields to
    columns, and stamp the dbt-parity `_airbyte_<stream>_hashid` (md5
    of `~`-joined stringified payload columns, stream_processor.py:782)
    plus `_airbyte_normalized_at` (pass a datetime for deterministic
    output; None uses current_timestamp(), the reference default)."""
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    out = raw.select(
        F.col(AB_ID),
        F.col(EMITTED_AT),
        F.from_json(F.col(DATA), schema, _JSON_OPTS).alias("_d"),
    ).select(AB_ID, EMITTED_AT, "_d.*")
    if hashid:
        out = out.withColumn(
            f"_airbyte_{stream}_hashid",
            surrogate_key(*[f.name for f in schema.fields]),
        )
    ts = F.lit(normalized_at) if normalized_at is not None else F.current_timestamp()
    return out.withColumn(NORMALIZED_AT, ts.cast("timestamp"))


def _new_file_rows(raw_table: LakeTable, since: int, until: int) -> DataFrame:
    """Rows in data files added between raw snapshots `since` and
    `until` — a manifest file-list diff, valid because the raw tier is
    append-only (files are never rewritten). If a file present at
    `since` is gone at `until` (someone compacted/rewrote raw), the
    diff is no longer the added rows: fail loudly; renormalize() is
    the recovery."""
    old = raw_table.manifest(since)
    new = raw_table.manifest(until)
    old_paths = {p for ps in old["files"].values() for p in ps}
    new_paths = [p for ps in new["files"].values() for p in ps]
    missing = old_paths - set(new_paths)
    if missing:
        raise ValueError(
            f"raw tier was rewritten between snapshots {since} and {until} "
            f"({len(missing)} files gone); incremental normalization needs "
            "an append-only raw tier — renormalize() instead"
        )
    added = [p for p in new_paths if p not in old_paths]
    schema = T.StructType.fromJson(new["schema"])
    return raw_table._read_paths(added, schema)


def _last_raw_version(final: LakeTable, stream: str) -> int | None:
    if not final.exists():
        return None
    best = None
    for meta in final.committed_epochs(stream).values():
        v = (meta or {}).get("raw_version_to")
        if v is not None and (best is None or v > best):
            best = v
    return best


def normalize_into(
    raw_table: LakeTable,
    final: LakeTable,
    cfg: SyncConfig,
    schema: T.StructType | str,
    normalized_at: datetime | None = None,
) -> int | None:
    """Incremental normalization: apply the raw rows added since the
    last normalized raw snapshot to the final table (winner-dedup MERGE
    per cfg). Epoch = the raw snapshot version, so crash/replay
    re-runs are exact no-ops and a no-new-raw run returns None."""
    cur = raw_table.current_version()
    last = _last_raw_version(final, cfg.stream)
    if last is not None and last >= cur:
        return None
    raw = raw_table.read() if last is None else _new_file_rows(raw_table, last, cur)
    typed = typed_from_raw(raw, schema, cfg.stream, normalized_at=normalized_at)
    return merge_into(
        final,
        typed,
        stream=cfg.stream,
        epoch=cur,
        epoch_meta={"raw_version_from": last, "raw_version_to": cur},
        cursor=cfg.cursor_field[0],
        # only ordering columns the typed frame actually carries — the
        # SyncConfig default names CDC columns a plain stream lacks
        secondary=tuple(
            c
            for c in cfg.secondary_order
            if c != cfg.cursor_field[0] and c in typed.columns
        ),
        keep_tombstones="_ab_cdc_deleted_at" not in typed.columns,
        mode=cfg.write_mode,
        dedup_impl=cfg.dedup_impl,
        key=cfg.primary_key,
        n_buckets=cfg.n_buckets,
    )


def renormalize(
    spark,
    raw_table: LakeTable,
    final_root: str,
    cfg: SyncConfig,
    schema: T.StructType | str,
    normalized_at: datetime | None = None,
) -> LakeTable:
    """Full rebuild from raw — the operation the raw tier exists for
    (normalization upgrade, schema fix) and the reference runs as a
    full-refresh dbt build. One full raw scan, one winner-dedup MERGE
    into a FRESH table at `final_root`; its commit log records the raw
    snapshot it reflects, so normalize_into() continues incrementally
    from there. Must equal the incrementally-built final
    (tests/test_normalization.py pins frame equality)."""
    final = LakeTable(spark, final_root)
    if final.exists():
        raise ValueError(f"renormalize target {final_root} already exists")
    normalize_into(raw_table, final, cfg, schema, normalized_at=normalized_at)
    return final
