"""Product quantization: codes + asymmetric-distance (ADC) top-k search.

The compressed-vector half of an IVF-PQ index. A 64-dim embedding is
split into `m` subvectors of `width` dims; each subvector is assigned
the nearest entry of a per-subspace codebook, so a vector is stored as
`m` small codes (bytes) instead of 64 floats — at the 10^10-vector
design point the code table is ~40 GB instead of ~2.5 TB, small enough
to scan per query. Search uses ADC: the QUERY stays uncompressed, a
per-query lookup table LUT[s][c] = dist(query subvector s, centroid c)
is precomputed (m*k longs — metadata), and the approximate distance to
any database vector is m table lookups summed over its codes.

Scale shapes (every stage plan-audited in tools/capture_plans.py):

* codes: the codebook is metadata (k x dim ints) inlined as literal
  arrays — assignment is a pure narrow projection, zero Exchange/join
  at any corpus size.
* LUTs: computed on the (constant-budget) query set only; broadcast.
* ADC scan: one BroadcastNestedLoopJoin of the narrow code table
  against the |Q|-row LUT table — O(n * |Q|) with |Q| fixed, never a
  shuffle of the corpus.
* top-k: one per-qid row_number window — safe at any corpus size
  because Spark plans rank<=k windows as WindowGroupLimit with a
  PARTIAL (map-side) pass: each scan task forwards at most k rows per
  query, so the per-qid reducer receives O(partitions * k) rows, not
  n (the plan check pins `WindowGroupLimit ... Partial`). Exact, not
  approximate: (dist ASC, cid ASC) is a total order, so the partial
  pass can never evict a global top-k row.

Exactness: vectors are integer-scaled (floor(x*1000) longs) BEFORE any
distance, so every comparison is over exact integer sums — no float
summation-order hazard; argmin/rank ties break to the lowest index in
both this engine and the DuckDB oracle.

Reference parity: the reference has no ANN surface (it is an ingest
engine); this extends the repo's LLM-data-pipeline family (SURVEY §2
addendum) alongside IVF/LSH ANN. PQ/ADC per Jégou et al., "Product
Quantization for Nearest Neighbor Search" (TPAMI 2011), §II-III.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def int_vectors(df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id",
                scale: int = 1000) -> DataFrame:
    """Integer-scale a float vector column: floor(x*scale) as longs.

    All PQ math downstream compares exact integer sums, never floats."""
    iv = F.transform(
        F.col(vec_col), lambda x: F.floor(x.cast("double") * scale).cast("long")
    )
    return df.select(id_col, iv.alias("v"))


def seed_codebook(base: DataFrame, k: int = 4, id_col: str = "vec_id") -> list:
    """Deterministic codebook: the k lowest-id int-scaled vectors
    (the same fixed-k seeding rule as the IVF codebook — k is a
    CONSTANT, never a function of corpus size). Returns k python lists
    (metadata: k x dim longs, collected once, inlined as literals)."""
    return [r["v"] for r in base.orderBy(id_col).limit(k).collect()]


def _sub_dist(vec_col, cent: list, s: int, width: int):
    """Exact squared L2 between subvector s of `vec_col` and the
    literal centroid subvector — a fold over zip_with, all longs."""
    return F.aggregate(
        F.zip_with(
            F.slice(vec_col, s * width + 1, width),
            F.array(*[F.lit(int(cent[s * width + j])) for j in range(width)]),
            lambda a, b: (a - b) * (a - b),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def pq_code_columns(base: DataFrame, cents: list, m: int = 4,
                    width: int = 16, with_err: bool = True) -> DataFrame:
    """Assign PQ codes: for each subspace s, argmin over the literal
    codebook (ties to the lowest centroid index). Narrow projection,
    zero Exchange. Emits code0..code{m-1} (+ err_q, the total
    quantized squared error, when with_err)."""
    out = base
    for s in range(m):
        dists = F.array(*[_sub_dist(F.col("v"), c, s, width) for c in cents])
        out = out.withColumn(f"_d{s}", dists)
    code = lambda s: (
        F.array_position(F.col(f"_d{s}"), F.array_min(F.col(f"_d{s}"))) - 1
    ).cast("long")
    cols = [F.col(c) for c in base.columns if c != "v"] + [
        code(s).alias(f"code{s}") for s in range(m)
    ]
    if with_err:
        cols.append(
            sum(
                [F.array_min(F.col(f"_d{s}")) for s in range(m)],
                F.lit(0).cast("long"),
            ).alias("err_q")
        )
    return out.select(*cols)


def adc_luts(queries: DataFrame, cents: list, m: int = 4,
             width: int = 16, id_col: str = "vec_id") -> DataFrame:
    """Per-query ADC lookup tables: lut{s} = array of k longs,
    lut{s}[c] = squared L2 between the query's subvector s and
    centroid c's subvector s. Runs on the constant-budget query set
    only (|Q| rows) — metadata-sized, meant to be broadcast."""
    luts = [
        F.array(*[_sub_dist(F.col("v"), c, s, width) for c in cents]).alias(
            f"lut{s}"
        )
        for s in range(m)
    ]
    return queries.select(F.col(id_col).alias("qid"), *luts)


def adc_topk(codes: DataFrame, luts: DataFrame, k: int = 5, m: int = 4,
             id_col: str = "vec_id") -> DataFrame:
    """ADC search: approximate distance = sum over subspaces of the
    query's LUT entry at the database vector's code; exact top-k per
    query under (adist ASC, cid ASC).

    Plan: BroadcastNestedLoopJoin against the |Q|-row LUT table (the
    corpus never shuffles for the join); the rank<=k window compiles
    to WindowGroupLimit with a map-side Partial pass, so the only
    Exchange carries O(partitions * k) narrow (qid, cid, adist)
    triples per query — never the corpus."""
    adist = sum(
        [
            F.element_at(F.col(f"lut{s}"), (F.col(f"code{s}") + 1).cast("int"))
            for s in range(m)
        ],
        F.lit(0).cast("long"),
    )
    pairs = (
        codes.crossJoin(F.broadcast(luts))
        .filter(F.col("qid") != F.col(id_col))
        .select(
            "qid", F.col(id_col).alias("cid"), adist.alias("adist"),
        )
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("adist").asc(), F.col("cid").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "cid", "adist", "rank")
    )
