"""Optimistic-concurrency commit guard (Iceberg CommitFailedException
analogue): a writer that derived its change from a stale snapshot must
fail cleanly instead of silently erasing the interleaved commit; crash
orphans from a writer that died mid-commit must not poison recovery."""

import json
import os

import pytest
from pyspark.sql import Row

from airbyte_integrations_spark.lakehouse.table import (
    CommitConflictError,
    LakeTable,
)


def _df(spark, *rows):
    return spark.createDataFrame([Row(url=u, v=v) for u, v in rows])


def test_stale_parent_commit_rejected(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "t"))
    t.create(_df(spark, ("a", 1)), key=("url",), n_buckets=2)
    m = t.manifest()  # writer A reads state at version 0
    # writer B commits in between
    t.overwrite(_df(spark, ("b", 2)), key=("url",), n_buckets=2)
    # writer A tries to commit a manifest derived from version 0
    stale = {**m, "parent": m["version"]}
    with pytest.raises(CommitConflictError, match="stale commit"):
        t._commit(stale)
    # B's state intact
    assert {r.url for r in t.read().collect()} == {"b"}


def test_crash_orphan_manifest_recovers(spark, tmp_path):
    """A v{N}.json written by a writer that died BEFORE the VERSION
    swap is invisible; the next commit must replace it and succeed."""
    t = LakeTable(spark, str(tmp_path / "t"))
    t.create(_df(spark, ("a", 1)), key=("url",), n_buckets=2)
    cur = t.current_version()
    orphan = os.path.join(str(tmp_path / "t"), "_meta", f"v{cur + 1}.json")
    with open(orphan, "w") as fh:
        json.dump({"garbage": True}, fh)
    v = t.overwrite(_df(spark, ("c", 3)), key=("url",), n_buckets=2)
    assert v == cur + 1
    assert {r.url for r in t.read().collect()} == {"c"}
    # the recovered manifest is the real one, not the orphan
    assert "files" in t.manifest(v)
