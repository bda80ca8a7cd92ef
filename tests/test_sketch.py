"""KMV bottom-k sketch: exact-below-k, estimator accuracy, merge ==
sketch-of-union (the rollup property), per-group parity with the
global sketch, and NULL/duplicate semantics."""

import pytest
from pyspark.sql import functions as F

from airbyte_integrations_spark.functions.sketch import (
    kmv_estimate,
    kmv_merge,
    kmv_per_group,
    kmv_sketch,
)


def test_exact_when_under_k(spark):
    df = spark.range(100).select(F.concat(F.lit("v"), F.col("id")).alias("v"))
    # duplicates + nulls do not perturb the sketch
    df = df.unionByName(df).unionByName(
        spark.createDataFrame([(None,)], "v string")
    )
    est = kmv_estimate(kmv_sketch(df, "v", k=256), k=256).collect()[0]
    assert est["n_seen"] == 100
    assert est["ndv_est"] == 100


def test_estimator_within_bound(spark):
    n = 20000
    df = spark.range(n).select(F.concat(F.lit("u"), F.col("id")).alias("v"))
    k = 512
    est = kmv_estimate(kmv_sketch(df, "v", k=k), k=k).collect()[0]
    assert est["n_seen"] == k
    # KMV relative error ~ 1/sqrt(k-2) ≈ 4.4%; allow 4 sigma
    assert abs(est["ndv_est"] - n) / n < 0.18, est["ndv_est"]


def test_merge_equals_sketch_of_union(spark):
    a = spark.range(5000).select(F.concat(F.lit("a"), F.col("id")).alias("v"))
    b = spark.range(3000, 9000).select(
        F.concat(F.lit("a"), F.col("id")).alias("v")  # overlaps a
    )
    k = 128
    merged = kmv_merge(kmv_sketch(a, "v", k=k), kmv_sketch(b, "v", k=k), k=k)
    direct = kmv_sketch(a.unionByName(b), "v", k=k)
    assert [r["h"] for r in merged.collect()] == [
        r["h"] for r in direct.collect()
    ]


def test_per_group_matches_global_per_slice(spark):
    df = spark.range(6000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.concat(F.lit("x"), F.col("id")).alias("v"),
    )
    k = 64
    per = {
        r["g"]: (r["n_seen"], r["ndv_est"])
        for r in kmv_per_group(df, "g", "v", k=k).collect()
    }
    assert set(per) == {"0", "1", "2"}
    for g in per:
        sl = df.filter(F.col("g") == g)
        want = kmv_estimate(kmv_sketch(sl, "v", k=k), k=k).collect()[0]
        assert per[g] == (want["n_seen"], want["ndv_est"]), g


def test_estimator_cross_engine_bit_identical(spark):
    duckdb = pytest.importorskip("duckdb")
    df = spark.range(4000).select(F.concat(F.lit("w"), F.col("id")).alias("v"))
    k = 100
    got = kmv_estimate(kmv_sketch(df, "v", k=k), k=k).collect()[0]
    con = duckdb.connect()
    con.register("t", df.toPandas())
    want = con.execute(
        f"""
        WITH h AS (
          SELECT DISTINCT ('0x' || substr(md5(v), 1, 15))::BIGINT AS h
          FROM t WHERE v IS NOT NULL
        ),
        r AS (SELECT h, row_number() OVER (ORDER BY h) AS rank FROM h
              ORDER BY h LIMIT {k})
        SELECT count(*) AS n_seen,
               CASE WHEN count(*) < {k} THEN count(*)
                    ELSE CAST(floor(({k} - 1) * power(2.0, 60)
                              / max(CASE WHEN rank = {k} THEN h END)) AS BIGINT)
               END AS ndv_est
        FROM r
        """
    ).fetchone()
    assert (got["n_seen"], got["ndv_est"]) == want
