"""Snapshot-diff changelog (Delta CDF / Iceberg create_changelog_view
analogue): LakeTable.changes(v_from, v_to) classifies every key whose
live image differs — insert / update_postimage / delete (before image)."""

import pyspark.sql.functions as F

from airbyte_integrations_spark.config import SyncConfig
from airbyte_integrations_spark.gen import gen_change_events
from airbyte_integrations_spark.lakehouse.table import LakeTable
from airbyte_integrations_spark.streaming.microbatch import run_sync

COLS = [
    "url",
    "text",
    "lang",
    "_ab_cdc_lsn",
    "_ab_cdc_updated_at",
    "_ab_cdc_deleted_at",
    "_airbyte_ab_id",
    "_airbyte_emitted_at",
]


def _split_sync(spark, tmp_path, mode="cow", n=1200, n_urls=60):
    ev = gen_change_events(spark, n, n_urls=n_urls).select(*COLS)
    mid = n // 2
    cfg = SyncConfig(stream="pages", write_mode=mode)
    t = LakeTable(spark, str(tmp_path / f"t_{mode}"))
    run_sync(spark, ev.filter(F.col("_ab_cdc_lsn") <= mid), t, cfg,
             extract_missing_text=False, compact_threshold=None)
    v_mid = t.current_version()
    run_sync(spark, ev, t, cfg, extract_missing_text=False,
             compact_threshold=None)
    return ev, mid, t, v_mid


def _expected(spark, ev, mid):
    """Reference diff computed from the raw log with plain DataFrame
    winners (independent of the lake layer)."""
    from airbyte_integrations_spark.operators.dedup import winner_window

    old = winner_window(ev.filter(F.col("_ab_cdc_lsn") <= mid),
                        drop_tombstones=True).select("url", "_ab_cdc_lsn")
    new = winner_window(ev, drop_tombstones=True).select("url", "_ab_cdc_lsn")
    o = {r.url: r._ab_cdc_lsn for r in old.collect()}
    n_ = {r.url: r._ab_cdc_lsn for r in new.collect()}
    ins = {u for u in n_ if u not in o}
    dels = {u for u in o if u not in n_}
    upd = {u for u in n_ if u in o and n_[u] != o[u]}
    return ins, upd, dels, o, n_


def _check(t, v_mid, expected):
    ins, upd, dels, o, n_ = expected
    ch = t.changes(v_mid)
    got = {(r.url, r._change_type): r._ab_cdc_lsn for r in
           ch.select("url", "_change_type", "_ab_cdc_lsn").collect()}
    assert {u for (u, c) in got if c == "insert"} == ins
    assert {u for (u, c) in got if c == "update_postimage"} == upd
    assert {u for (u, c) in got if c == "delete"} == dels
    # post-images carry the NEW winner; deletes the BEFORE image
    for (u, c), lsn in got.items():
        assert lsn == (o[u] if c == "delete" else n_[u])
    assert len(got) == len(ins) + len(upd) + len(dels)


def test_changes_cow(spark, tmp_path):
    ev, mid, t, v_mid = _split_sync(spark, tmp_path, "cow")
    exp = _expected(spark, ev, mid)
    assert exp[2], "fixture must contain at least one delete"
    _check(t, v_mid, exp)


def test_changes_mor(spark, tmp_path):
    ev, mid, t, v_mid = _split_sync(spark, tmp_path, "mor")
    _check(t, v_mid, _expected(spark, ev, mid))


def test_changes_same_version_empty(spark, tmp_path):
    _ev, _mid, t, v_mid = _split_sync(spark, tmp_path, "cow", n=300, n_urls=20)
    assert t.changes(v_mid, v_mid).count() == 0
    assert t.changes(t.current_version()).count() == 0


def test_changes_schema_evolution_before_image(spark, tmp_path):
    """Old snapshot lacks a column added later: before images
    null-backfill it (conform onto the to-version schema)."""
    ev = gen_change_events(spark, 400, n_urls=30).select(*COLS)
    cfg = SyncConfig(stream="pages")
    t = LakeTable(spark, str(tmp_path / "t"))
    run_sync(spark, ev.filter(F.col("_ab_cdc_lsn") <= 200).drop("lang"),
             t, cfg, extract_missing_text=False, compact_threshold=None)
    v1 = t.current_version()
    run_sync(spark, ev, t, cfg, extract_missing_text=False,
             compact_threshold=None)
    ch = t.changes(v1)
    assert "lang" in ch.columns
    dels = ch.filter(F.col("_change_type") == "delete")
    if dels.count():
        assert dels.filter(F.col("lang").isNotNull()).count() == 0


def test_changes_update_preimage_pairs(spark, tmp_path):
    """include_update_preimage: each update expands to a (preimage,
    postimage) pair — the preimage carries the OLD winner's values —
    and insert/delete rows are unchanged (Delta CDF four-kind feed)."""
    ev, mid, t, v_mid = _split_sync(spark, tmp_path, "cow")
    ins, upd, dels, o, n_ = _expected(spark, ev, mid)
    ch = t.changes(v_mid, include_update_preimage=True)
    got = {(r.url, r._change_type): r._ab_cdc_lsn for r in
           ch.select("url", "_change_type", "_ab_cdc_lsn").collect()}
    assert {u for (u, c) in got if c == "update_preimage"} == upd
    assert {u for (u, c) in got if c == "update_postimage"} == upd
    for (u, c), lsn in got.items():
        want = o[u] if c in ("delete", "update_preimage") else n_[u]
        assert lsn == want, (u, c)
    assert len(got) == len(ins) + 2 * len(upd) + len(dels)
    # plain mode is untouched by the flag's existence
    assert t.changes(v_mid).count() == len(ins) + len(upd) + len(dels)


def test_changed_buckets_prunes_and_preserves_diff(spark, tmp_path):
    """changed_buckets is metadata-only and sound: a second sync that
    touches a few keys yields a strict subset of buckets, and the
    pruned diff equals the full-scan diff row for row."""
    ev = gen_change_events(spark, 2000, n_urls=400).select(*COLS)
    hi = int(ev.agg(F.max("_ab_cdc_lsn")).collect()[0][0])
    cfg = SyncConfig(stream="pages", n_buckets=16)
    t = LakeTable(spark, str(tmp_path / "t"))
    run_sync(spark, ev.filter(F.col("_ab_cdc_lsn") <= hi - 20), t, cfg,
             extract_missing_text=False, compact_threshold=None)
    v0 = t.current_version()
    run_sync(spark, ev, t, cfg, extract_missing_text=False,
             compact_threshold=None)
    v1 = t.current_version()
    cb = t.changed_buckets(v0, v1)
    assert cb is not None and 0 < len(cb) < 16, cb
    # soundness: every changed key's bucket is in the pruned set
    from airbyte_integrations_spark.lakehouse.table import bucket_expr
    ch = t.changes(v0, v1)
    key_buckets = {
        r.b
        for r in ch.select(bucket_expr(("url",), 16).alias("b")).collect()
    }
    assert key_buckets <= set(cb)
    # equivalence vs an unpruned diff (monkeypatch pruning off)
    import airbyte_integrations_spark.lakehouse.table as tbl
    orig = tbl.LakeTable.changed_buckets
    try:
        tbl.LakeTable.changed_buckets = lambda self, a, b: None
        full = {tuple(r) for r in t.changes(v0, v1).collect()}
    finally:
        tbl.LakeTable.changed_buckets = orig
    pruned = {tuple(r) for r in ch.collect()}
    assert pruned == full
