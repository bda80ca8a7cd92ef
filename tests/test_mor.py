"""Merge-on-read apply mode (Iceberg v2 equality-delete analogue).

Invariants (FIXTURES.md F4 matrix, applied to the MoR layout):
- MoR live state == COW live state == DuckDB winner-rule oracle on any
  epoch-sliced replay with inserts/updates/deletes and out-of-order
  LSNs inside an epoch.
- compaction folds deltas into the base without changing live state.
- re-committing an epoch is a no-op (exactly-once).
- a COW merge over a table carrying deltas resolves them first.
"""

import pytest
from pyspark.sql import functions as F

from airbyte_integrations_spark.config import SyncConfig
from airbyte_integrations_spark.gen import gen_change_events
from airbyte_integrations_spark.lakehouse.merge import merge_into
from airbyte_integrations_spark.lakehouse.table import LakeTable
from airbyte_integrations_spark.streaming.microbatch import run_sync
from tests.util import assert_frames_equal, duckdb_winners

COLS = [
    "url",
    "warc_ts",
    "text",
    "lang",
    "_ab_cdc_lsn",
    "_ab_cdc_updated_at",
    "_ab_cdc_deleted_at",
    "_airbyte_ab_id",
    "_airbyte_emitted_at",
]


@pytest.fixture()
def events(spark):
    return gen_change_events(spark, 2500, n_urls=60, skew_alpha=2.5).select(*COLS)


def _run(spark, events, root, mode, per_epoch=500, compact=None):
    table = LakeTable(spark, root)
    cfg = SyncConfig(stream="pages", write_mode=mode)
    run_sync(
        spark, events, table, cfg,
        max_events_per_epoch=per_epoch,
        extract_missing_text=False,
        compact_threshold=compact,
    )
    return table


def test_mor_matches_oracle(spark, tmp_path, events):
    t = _run(spark, events, str(tmp_path / "mor"), "mor")
    got = t.read_live().toPandas()
    want = duckdb_winners(events.toPandas())
    assert_frames_equal(got, want)
    # deltas actually exist (the mode took the MoR path past epoch 0)
    assert t.manifest().get("deltas"), "expected uncompacted delta files"


def test_mor_equals_cow(spark, tmp_path, events):
    mor = _run(spark, events, str(tmp_path / "mor"), "mor")
    cow = _run(spark, events, str(tmp_path / "cow"), "cow")
    assert_frames_equal(mor.read_live().toPandas(), cow.read_live().toPandas())


def test_mor_compaction_preserves_state(spark, tmp_path, events):
    t = _run(spark, events, str(tmp_path / "mor"), "mor")
    before = t.read_live().toPandas()
    v0 = t.current_version()
    t.compact(max_files_per_bucket=1)
    assert t.current_version() > v0
    assert not t.manifest().get("deltas"), "compaction should fold all deltas"
    assert_frames_equal(t.read_live().toPandas(), before)
    # after folding, read_live is a plain base scan (no window needed)
    assert_frames_equal(t.read().toPandas(), before)


def test_mor_epoch_recommit_is_noop(spark, tmp_path, events):
    t = _run(spark, events, str(tmp_path / "mor"), "mor")
    v = t.current_version()
    before = t.read_live().toPandas()
    # re-apply an already-committed epoch slice
    batch = events.filter(
        (F.col("_ab_cdc_lsn") > 0) & (F.col("_ab_cdc_lsn") <= 500)
    )
    merge_into(t, batch, stream="pages", epoch=0, mode="mor")
    assert t.current_version() == v
    assert_frames_equal(t.read_live().toPandas(), before)


def test_mor_tombstone_removes_key_and_delta_redelivery_converges(spark, tmp_path, events):
    pdf = events.toPandas()
    t = _run(spark, events, str(tmp_path / "mor"), "mor")
    dead = set(
        duckdb_winners(pdf, drop_tombstones=False)
        .pipe(lambda d: d[d["_ab_cdc_deleted_at"].notna()])["url"]
    )
    if dead:
        live = set(r["url"] for r in t.read_live().select("url").collect())
        assert not (dead & live)
    # redeliver the LAST epoch's winners as a brand-new epoch (simulates
    # an at-least-once transport duplicating deltas): state unchanged
    # because resolution is by ordering, not file recency.
    hi = int(pdf["_ab_cdc_lsn"].max())
    batch = events.filter(F.col("_ab_cdc_lsn") > hi - 500)
    before = t.read_live().toPandas()
    merge_into(t, batch, stream="pages", epoch=99999, mode="mor")
    assert_frames_equal(t.read_live().toPandas(), before)


def test_cow_merge_over_deltas_resolves_them(spark, tmp_path, events):
    """Mixed-mode: MoR epochs followed by a COW epoch fold cleanly."""
    pdf = events.toPandas()
    hi = int(pdf["_ab_cdc_lsn"].max())
    cut = hi // 2
    first = events.filter(F.col("_ab_cdc_lsn") <= cut)
    t = LakeTable(spark, str(tmp_path / "mix"))
    cfg = SyncConfig(stream="pages", write_mode="mor")
    run_sync(spark, first, t, cfg, max_events_per_epoch=300,
             extract_missing_text=False, compact_threshold=None)
    assert t.manifest().get("deltas")
    rest = events.filter(F.col("_ab_cdc_lsn") > cut)
    merge_into(t, rest, stream="pages", epoch=hi, mode="cow")
    want = duckdb_winners(pdf)
    assert_frames_equal(t.read_live().toPandas(), want)


def test_mor_resume_mid_sync(spark, tmp_path, events):
    """Kill after K epochs, restart the full sync: identical final state."""
    t = LakeTable(spark, str(tmp_path / "mor"))
    cfg = SyncConfig(stream="pages", write_mode="mor")
    run_sync(spark, events, t, cfg, max_events_per_epoch=400,
             extract_missing_text=False, max_epochs=2, compact_threshold=None)
    run_sync(spark, events, t, cfg, max_events_per_epoch=400,
             extract_missing_text=False, compact_threshold=None)
    want = duckdb_winners(events.toPandas())
    assert_frames_equal(t.read_live().toPandas(), want)
