"""Sort-based as-of join: semantics (strict/non-strict, left-outer,
probe payload carry-through) and the no-join plan shape."""

import pytest
from pyspark.sql import functions as F

from airbyte_integrations_spark.operators.asof import asof_join


@pytest.fixture()
def frames(spark):
    versions = spark.createDataFrame(
        [("a", 1, 10), ("a", 5, 50), ("a", 9, 90), ("b", 2, 20)],
        "k string, lsn long, val long",
    )
    probes = spark.createDataFrame(
        [("a", 0, "p0"), ("a", 1, "p1"), ("a", 6, "p6"), ("b", 7, "p7"), ("c", 3, "pc")],
        "k string, plsn long, tag string",
    )
    return probes, versions


def _rows(df):
    return {
        (r["k"], r["plsn"]): (r["asof_lsn"], r["asof_val"], r["tag"])
        for r in df.collect()
    }


def test_non_strict_matches_at_equal_ordinal(frames):
    probes, versions = frames
    out = asof_join(probes, versions, ["k"], "plsn", "lsn", ["val"])
    got = _rows(out)
    assert got[("a", 0)] == (None, None, "p0")  # nothing at or before 0
    assert got[("a", 1)] == (1, 10, "p1")  # equal ordinal included
    assert got[("a", 6)] == (5, 50, "p6")  # latest <= 6
    assert got[("b", 7)] == (2, 20, "p7")
    assert got[("c", 3)] == (None, None, "pc")  # key with no versions
    assert len(got) == 5  # left join: every probe survives


def test_strict_excludes_equal_ordinal(frames):
    probes, versions = frames
    out = asof_join(probes, versions, ["k"], "plsn", "lsn", ["val"], strict=True)
    got = _rows(out)
    assert got[("a", 1)] == (None, None, "p1")  # lsn=1 no longer visible
    assert got[("a", 6)] == (5, 50, "p6")  # unchanged away from ties


def test_plan_has_no_join(frames):
    probes, versions = frames
    out = asof_join(probes, versions, ["k"], "plsn", "lsn", ["val"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # union + ONE window, never a theta-join
    assert plan.count("Exchange hashpartitioning") <= 1


def test_probe_duplicates_all_match(spark):
    versions = spark.createDataFrame([("a", 2, 7)], "k string, lsn long, val long")
    probes = spark.createDataFrame(
        [("a", 4, "x"), ("a", 4, "y")], "k string, plsn long, tag string"
    )
    out = asof_join(probes, versions, ["k"], "plsn", "lsn", ["val"])
    rows = sorted((r["tag"], r["asof_val"]) for r in out.collect())
    assert rows == [("x", 7), ("y", 7)]
