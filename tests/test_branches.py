"""Write-audit-publish branches (Iceberg branch + fastForwardBranch
analogue): metadata-only forks sharing immutable data files, synced in
isolation, audited, then fast-forward published to main atomically."""

import pytest
from pyspark.sql import functions as F

from airbyte_integrations_spark.config import SyncConfig
from airbyte_integrations_spark.gen import gen_change_events
from airbyte_integrations_spark.lakehouse.table import (
    CommitConflictError,
    LakeTable,
)
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


def _rows(df):
    return {tuple(r) for r in df.select("url", "_ab_cdc_lsn").collect()}


def _setup(spark, tmp_path, mode="cow", n=1200, n_urls=70):
    ev = gen_change_events(spark, n, n_urls=n_urls).select(*COLS)
    hi = int(ev.agg(F.max("_ab_cdc_lsn")).collect()[0][0])
    cfg = SyncConfig(stream="pages", write_mode=mode)
    t = LakeTable(spark, str(tmp_path / "t"))
    run_sync(spark, ev.filter(F.col("_ab_cdc_lsn") <= hi // 2), t, cfg,
             extract_missing_text=False, compact_threshold=None)
    return ev, cfg, t


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_write_audit_publish_happy_path(spark, tmp_path, mode):
    ev, cfg, t = _setup(spark, tmp_path, mode)
    half_state = _rows(t.read_live())
    v_main = t.current_version()
    wm_main = t.watermark("pages")

    audit = t.create_branch("audit")
    assert t.branches() == ["audit"]
    # WRITE: the rest of the log lands on the branch only; the branch
    # resumes from main's watermark (epoch log came with the fork)
    assert audit.watermark("pages") == wm_main
    eps = run_sync(spark, ev, audit, cfg, extract_missing_text=False,
                   compact_threshold=None)
    assert eps, "branch sync applied nothing"
    full_state = _rows(audit.read_live())
    assert full_state != half_state
    # main is untouched by branch writes
    assert t.current_version() == v_main
    assert _rows(t.read_live()) == half_state

    # AUDIT: invariants hold on the branch (one live row per key), and
    # the audit diff — what publishing would change on main — is the
    # standard changelog read from the fork state (branch version 0)
    live = audit.read_live()
    assert live.count() == live.select("url").distinct().count()
    diff = audit.changes(0)
    assert diff.count() > 0
    assert set(
        r._change_type for r in diff.select("_change_type").distinct().collect()
    ) <= {"insert", "update_postimage", "delete"}

    # PUBLISH: one metadata commit; main == branch head, watermark moved
    t.publish_branch(audit)
    assert _rows(t.read_live()) == full_state
    assert t.watermark("pages") == audit.watermark("pages") != wm_main
    assert t.manifest()["published_from"]["branch"] == "audit"
    # re-running the sync against published main is a no-op (epoch skip)
    assert run_sync(spark, ev, t, cfg, extract_missing_text=False,
                    compact_threshold=None) == []


def test_publish_refused_when_main_advanced(spark, tmp_path):
    ev, cfg, t = _setup(spark, tmp_path)
    audit = t.create_branch("audit")
    run_sync(spark, ev, audit, cfg, extract_missing_text=False,
             compact_threshold=None)
    # concurrent main commit after the fork -> the audit is stale
    t.commit_marker_epoch("pages", "hb:concurrent", {"note": "x"})
    with pytest.raises(CommitConflictError, match="fast-forward refused"):
        t.publish_branch(audit)


def test_publish_requires_fork_of_self(spark, tmp_path):
    _ev, _cfg, t = _setup(spark, tmp_path, n=300, n_urls=20)
    a = t.create_branch("a")
    b = a.create_branch("b")  # forked from a, not main
    with pytest.raises(ValueError, match="not forked from"):
        t.publish_branch(b)
    with pytest.raises(ValueError, match="already exists"):
        t.create_branch("a")


def test_expire_on_main_keeps_branch_files(spark, tmp_path):
    """Branch-aware GC: main's expire must not reclaim files only a
    live branch references; after drop_branch they are reclaimable."""
    ev, cfg, t = _setup(spark, tmp_path)
    audit = t.create_branch("audit")
    run_sync(spark, ev, audit, cfg, extract_missing_text=False,
             compact_threshold=None)
    branch_state = _rows(audit.read_live())
    # churn main so old versions expire
    t.commit_marker_epoch("pages", "hb:1", {})
    t.commit_marker_epoch("pages", "hb:2", {})
    t.expire_snapshots(keep_last=1)
    # the branch still reads perfectly (its files survived the sweep)
    assert _rows(audit.read_live()) == branch_state
    # drop the branch -> its exclusive files become orphans
    t.drop_branch("audit")
    assert t.branches() == []
    stats = t.expire_snapshots(keep_last=1)
    assert stats["data_files_removed"] > 0
    # main remains intact
    assert t.read_live().count() > 0
