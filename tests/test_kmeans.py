"""Deterministic spherical k-means + SemDeDup semantic dedup.

Beyond-the-reference training-data op (task mandate): pins the
determinism contract (exact-long centroid sums, seeded init), cluster
recovery on separable data, the keep-lowest-id dedup rule, and
parallelism invariance — the property that makes the exact-integer
Lloyd update safe on any partitioning.
"""

import math

import pytest
from pyspark.sql import Row, functions as F

from airbyte_integrations_spark.functions.kmeans import (
    assign_cells,
    embeddings_base,
    refine_centroids,
    seed_centroids,
    semantic_dedup,
    spherical_kmeans,
)


def _emb(spark, rows):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in rows]
    )


def _two_clusters(spark):
    """Ids 0..3 hug +x, ids 97,98,99,100 hug +y (97 and 0 are seeds
    under seed_mod=97)."""
    rows = [
        (0, [1.0, 0.1, 0.0]), (1, [0.9, 0.2, 0.0]),
        (2, [1.1, 0.0, 0.1]), (3, [0.8, 0.1, 0.1]),
        (97, [0.1, 1.0, 0.0]), (98, [0.0, 0.9, 0.1]),
        (99, [0.2, 1.1, 0.0]), (100, [0.1, 0.8, 0.1]),
    ]
    return _emb(spark, rows)


def test_kmeans_recovers_separable_clusters(spark):
    base = embeddings_base(_two_clusters(spark))
    a = spherical_kmeans(base, seed_mod=97, iters=2)
    cells = {r["vec_id"]: r["cell"] for r in a.collect()}
    assert {cells[i] for i in (0, 1, 2, 3)} == {0}
    assert {cells[i] for i in (97, 98, 99, 100)} == {97}


def test_refine_centroids_exact_long_sums(spark):
    base = embeddings_base(_emb(spark, [(0, [1.0, 2.0]), (5, [3.0, 4.0])]))
    assigned = base.select(
        "vec_id", "v", "nrm", F.lit(7).alias("cell"), F.lit(0).alias("csim")
    )
    c = refine_centroids(assigned).collect()
    assert len(c) == 1
    # sums = [1000+3000, 2000+4000] / cnt 2 -> [2000.0, 3000.0]
    assert c[0]["cent_id"] == 7
    assert c[0]["cv"] == [2000.0, 3000.0]
    assert c[0]["cn"] == pytest.approx(math.sqrt(2000.0**2 + 3000.0**2))


def test_kmeans_parallelism_invariance(spark):
    emb = _two_clusters(spark)
    out = []
    for parts in (1, 7):
        base = embeddings_base(emb.repartition(parts))
        a = spherical_kmeans(base, seed_mod=97, iters=2)
        out.append(sorted((r["vec_id"], r["cell"], r["csim"]) for r in a.collect()))
    assert out[0] == out[1]


def test_semantic_dedup_keeps_lowest_id(spark):
    """A planted same-direction duplicate loses to the lower id; the
    across-cell twin survives (dedup never crosses cells)."""
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (3, [2.0, 0.0, 0.0]),   # exact direction dup of 0 -> dropped
        (97, [0.0, 1.0, 0.0]),
        (98, [0.0, 0.0, 1.0]),  # orthogonal, same cell as nothing close
    ]
    base = embeddings_base(_emb(spark, rows))
    a = spherical_kmeans(base, seed_mod=97, iters=1)
    sd = {r["vec_id"]: r["is_kept"] for r in semantic_dedup(a, 95).collect()}
    assert sd[0] is True and sd[3] is False
    assert sd[97] is True and sd[98] is True


def test_seed_centroids_rule(spark):
    base = embeddings_base(_two_clusters(spark))
    seeds = sorted(r["cent_id"] for r in seed_centroids(base, 97).collect())
    assert seeds == [0, 97]


def test_assign_impl_equivalence(spark):
    """expr (literal-codebook narrow pass) and join (broadcast
    explosion + winner window) pick identical winners — the
    (csim, cent_id) ordering is total, so both impls are the same
    function. Also pins zero-Exchange on the expr plan."""
    from pyspark.sql import functions as F

    emb = spark.range(0, 300).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(1, 6), i -> cast(pmod(id * i, 53) / 53.0 - 0.5 as float))"
        ).alias("embedding"),
    )
    base = embeddings_base(emb)
    cents = seed_centroids(base, 97)
    a_expr = assign_cells(base, cents, impl="expr")
    a_join = assign_cells(base, cents, impl="join")
    rows_e = sorted((r["vec_id"], r["cell"], r["csim"]) for r in a_expr.collect())
    rows_j = sorted((r["vec_id"], r["cell"], r["csim"]) for r in a_join.collect())
    assert rows_e == rows_j
    plan = a_expr._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan
    # full loop equivalence too
    k_e = spherical_kmeans(base, 97, iters=2, impl="expr")
    k_j = spherical_kmeans(base, 97, iters=2, impl="join")
    assert sorted(map(tuple, k_e.select("vec_id", "cell", "csim").collect())) == \
           sorted(map(tuple, k_j.select("vec_id", "cell", "csim").collect()))


def test_seed_centroids_topk_fixed_k(spark):
    from airbyte_integrations_spark.functions.kmeans import (
        embeddings_base as _eb,
        seed_centroids_topk,
        spherical_kmeans as _sk,
    )
    from airbyte_integrations_spark.testdata import load

    base = _eb(load(spark, "/root/testdata/sf0.001", "embeddings"))
    seeds = seed_centroids_topk(base, k=8)
    # k is a CONSTANT — never a function of corpus size — and the md5
    # rule is deterministic across runs
    ids1 = sorted(r["cent_id"] for r in seeds.collect())
    ids2 = sorted(r["cent_id"] for r in seed_centroids_topk(base, k=8).collect())
    assert len(ids1) == 8 and ids1 == ids2
    # seed_k overrides seed_mod in spherical_kmeans
    a = _sk(base, seed_k=8, iters=1)
    assert a.select("cell").distinct().count() <= 8
