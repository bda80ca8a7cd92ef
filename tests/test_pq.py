"""Product quantization (functions/pq.py): codes, ADC LUTs, exact
two-phase top-k, and end-to-end agreement with a brute-force oracle
computed over the same int-scaled vectors."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from airbyte_integrations_spark.functions.pq import (
    adc_luts,
    adc_topk,
    int_vectors,
    pq_code_columns,
    seed_codebook,
)

DIM, M, WIDTH, K_CB = 64, 4, 16, 4


@pytest.fixture(scope="module")
def vecs(spark):
    # Deterministic synthetic embeddings: 200 vectors, 64 dims, values
    # derived from (id, dim) so every engine sees identical longs.
    df = spark.range(200).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda d: (
                F.sin(F.col("id") * 7 + d * 13) * F.cos(d * 3 + 1)
            ).cast("float"),
        ).alias("embedding"),
    )
    return int_vectors(df).cache()


def _brute_codes(rows, cents):
    out = {}
    for r in rows:
        codes = []
        for s in range(M):
            dists = [
                sum(
                    (r["v"][s * WIDTH + j] - c[s * WIDTH + j]) ** 2
                    for j in range(WIDTH)
                )
                for c in cents
            ]
            codes.append(dists.index(min(dists)))
        out[r["vec_id"]] = codes
    return out


def test_codes_match_bruteforce(vecs):
    cents = seed_codebook(vecs, k=K_CB)
    got = {
        r["vec_id"]: [r[f"code{s}"] for s in range(M)]
        for r in pq_code_columns(vecs, cents).collect()
    }
    want = _brute_codes(vecs.collect(), cents)
    assert got == want


def test_err_q_is_sum_of_assigned_subdistances(vecs):
    cents = seed_codebook(vecs, k=K_CB)
    rows = pq_code_columns(vecs, cents, with_err=True).collect()
    raw = {r["vec_id"]: r["v"] for r in vecs.collect()}
    for r in rows:
        want = 0
        v = raw[r["vec_id"]]
        for s in range(M):
            c = cents[r[f"code{s}"]]
            want += sum(
                (v[s * WIDTH + j] - c[s * WIDTH + j]) ** 2 for j in range(WIDTH)
            )
        assert r["err_q"] == want


def test_adc_equals_lut_sum_and_topk_exact(vecs):
    """End-to-end: ADC top-k equals a brute-force ADC ranking computed
    in Python over the same codes + LUTs (total order, so equality is
    exact, including ties broken by cid)."""
    cents = seed_codebook(vecs, k=K_CB)
    codes = pq_code_columns(vecs, cents, with_err=False)
    q = vecs.filter(F.col("vec_id") < 3).select("vec_id", "v")
    luts = adc_luts(q, cents)
    got = [
        (r["qid"], r["cid"], r["adist"], r["rank"])
        for r in adc_topk(codes, luts, k=4).orderBy("qid", "rank").collect()
    ]

    lut_rows = {r["qid"]: [r[f"lut{s}"] for s in range(M)] for r in luts.collect()}
    code_rows = {
        r["vec_id"]: [r[f"code{s}"] for s in range(M)] for r in codes.collect()
    }
    want = []
    for qid in sorted(lut_rows):
        cand = sorted(
            (
                sum(lut_rows[qid][s][cs[s]] for s in range(M)),
                cid,
            )
            for cid, cs in code_rows.items()
            if cid != qid
        )[:4]
        want += [(qid, cid, d, i + 1) for i, (d, cid) in enumerate(cand)]
    assert got == want


def test_adc_plan_shape(vecs):
    """Scale-shape pins: the ADC join is broadcast (corpus never
    shuffles for it), code assignment is join-free, and the rank<=k
    window gets a map-side Partial WindowGroupLimit — so the per-qid
    reducer sees O(partitions * k) rows, never the corpus."""
    cents = seed_codebook(vecs, k=K_CB)
    codes = pq_code_columns(vecs, cents, with_err=False)
    cplan = codes._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in cplan and "Exchange" not in cplan
    q = vecs.filter(F.col("vec_id") < 2).select("vec_id", "v")
    res = adc_topk(codes, adc_luts(q, cents), k=3)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "row_number(), 3, Partial" in plan
