"""Deterministic spherical k-means + SemDeDup-style semantic dedup.

The reference has no clustering operator — this is part of the
training-data-pipeline surface the engine adds on top of the Airbyte
semantics (task mandate: embedding-cosine near-dup at corpus scale).
The IVF-Flat ANN query already treats "k-means refinement" as an
offline concern; this module IS that refinement, built so the whole
loop is oracle-checkable:

- **Deterministic seeding**: either every ``seed_mod``-th vector, or
  — the scale rule — the FIXED-k set of vectors with the smallest
  md5(vec_id) (``seed_k``). Two runs — and the DuckDB oracle — pick
  identical initial centroids. No RNG anywhere. seed_k is the 10^10
  parameterization: a modulus couples k to the corpus size, making
  the "broadcast" codebook grow to 10^8 rows and the assignment pass
  O(n * n/mod) = O(n^2); a fixed k keeps assignment O(n*k).
- **Exact-integer centroids**: a centroid is the pair (element-wise
  SUM of floor(v[i]*1000) as 64-bit ints, member count). Long sums
  are associative, so the groupBy is order-independent across any
  partitioning — the float non-determinism that makes naive
  distributed k-means unreproducible is gone. The double-valued
  centroid ``sums[i]/cnt`` is then a single exact division per
  element, identical in every engine.
- **Floor-scaled ranking**: assignment compares floor(cos*1000) longs
  with centroid-id tiebreaks (the ANN queries' rounding-proof rule).

Scale shape (10^10 vectors): the codebook is broadcast (k*dim longs),
assignment is ONE narrow pass with a broadcast hash join, refinement
is a (cell, pos)-keyed hash agg with map-side combine producing k*dim
rows, and semantic dedup joins only WITHIN cells — the SemDeDup trick
that turns all-pairs O(n^2) cosine into per-cluster blocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SCALE = 1000  # centroid component quantization, floor(v*SCALE) longs


def embeddings_base(emb: DataFrame) -> DataFrame:
    """(vec_id, v: array<double>, nrm) — float->double is exact, the
    norm fold is array-ordered (deterministic)."""
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        dbl.alias("v"),
        F.sqrt(F.aggregate(dbl, F.lit(0.0), lambda a, x: a + x * x)).alias("nrm"),
    )


def seed_centroids(base: DataFrame, seed_mod: int = 97) -> DataFrame:
    """Every seed_mod-th vector, as (cent_id, cv, cn). k grows with the
    corpus — sandbox/test rule only; use seed_centroids_topk at scale."""
    return base.filter(F.col("vec_id") % seed_mod == 0).select(
        F.col("vec_id").alias("cent_id"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
    )


def seed_centroids_topk(base: DataFrame, k: int = 16) -> DataFrame:
    """FIXED-k deterministic seeds: the k vectors with the smallest
    (md5(vec_id), vec_id) — a hash-ordered sample, so the codebook size
    is independent of the corpus size (TakeOrderedAndProject: top-k per
    partition then a k-row merge; constant memory at any n)."""
    return (
        base.withColumn(
            "_skey", F.md5(F.col("vec_id").cast("string").cast("binary"))
        )
        .orderBy(F.col("_skey").asc(), F.col("vec_id").asc())
        .limit(k)
        .select(
            F.col("vec_id").alias("cent_id"),
            F.col("v").alias("cv"),
            F.col("nrm").alias("cn"),
        )
    )


def _floor_cos(v, nrm, cv, cn):
    dot = F.aggregate(
        F.zip_with(v, cv, lambda a, b: a * b), F.lit(0.0), lambda a, x: a + x
    )
    return F.floor(dot / (nrm * cn) * SCALE).cast("long")


def assign_cells(
    base: DataFrame, cents: DataFrame, impl: str = "expr"
) -> DataFrame:
    """One pass over the corpus: each vector goes to its argmax-floor-
    cosine centroid (lowest cent_id on ties). Returns
    (vec_id, v, nrm, cell, csim).

    impl="expr" (default): the codebook is collected (k*dim doubles —
    metadata-sized, same class as the MERGE's touched-bucket collect)
    and inlined as a literal array; argmax is array_max over per-row
    struct scores — a PURE NARROW projection, zero Exchange, nothing
    but the corpus scan at any corpus size. Right up to k in the low
    thousands (codegen grows with k*dim literals).

    impl="join": broadcast-join explosion + per-vector winner window —
    no driver collect and no literal-size ceiling, for codebooks too
    large to inline. Costs an n-row Exchange for the window.
    Both impls are equivalence-tested; winners are identical because
    the (csim, cent_id) ordering is total."""
    if impl == "expr":
        rows = sorted(cents.collect(), key=lambda r: r["cent_id"])
        if not rows:
            raise ValueError("empty codebook")
        arr = F.array(
            *[
                F.struct(
                    F.lit(int(r["cent_id"])).alias("cent_id"),
                    F.array(*[F.lit(float(x)) for x in r["cv"]]).alias("cv"),
                    F.lit(float(r["cn"])).alias("cn"),
                )
                for r in rows
            ]
        )
        scored = F.transform(
            arr,
            lambda c: F.struct(
                _floor_cos(F.col("v"), F.col("nrm"), c["cv"], c["cn"]).alias(
                    "csim"
                ),
                (-c["cent_id"]).alias("neg_cent"),
            ),
        )
        best = F.array_max(scored)
        return base.select(
            "vec_id", "v", "nrm",
            (-best["neg_cent"]).cast("long").alias("cell"),
            best["csim"].alias("csim"),
        )
    if impl != "join":
        raise ValueError(f"unknown assign impl: {impl!r}")
    scored = base.crossJoin(F.broadcast(cents)).select(
        "vec_id", "v", "nrm", "cent_id",
        _floor_cos(F.col("v"), F.col("nrm"), F.col("cv"), F.col("cn")).alias("csim"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("csim").desc(), F.col("cent_id").asc()
    )
    return (
        scored.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select("vec_id", "v", "nrm", F.col("cent_id").alias("cell"), "csim")
    )


def refine_centroids(assigned: DataFrame) -> DataFrame:
    """Lloyd update with exact arithmetic: per-cell element-wise SUM of
    floor(v[i]*SCALE) longs + member count, re-expressed as double
    centroids only at the very end. The (cell, pos) hash agg combines
    map-side and its result is k*dim rows — driver-free, any scale.
    Returns (cent_id, cv, cn) keyed by the cell id."""
    ex = assigned.select(
        "cell",
        F.posexplode(
            F.transform("v", lambda x: F.floor(x * SCALE).cast("long"))
        ).alias("pos", "sv"),
    )
    sums = ex.groupBy("cell", "pos").agg(F.sum("sv").alias("s"))
    arrs = sums.groupBy("cell").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "s"))), lambda t: t["s"]
        ).alias("sums")
    )
    cnt = assigned.groupBy("cell").agg(F.count(F.lit(1)).alias("cnt"))
    cv = F.transform(F.col("sums"), lambda s: s / F.col("cnt"))
    return (
        arrs.join(cnt, "cell")
        .select(
            F.col("cell").alias("cent_id"),
            cv.alias("cv"),
            F.sqrt(
                F.aggregate(
                    F.transform(cv, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
                )
            ).alias("cn"),
        )
    )


def spherical_kmeans(
    base: DataFrame,
    seed_mod: int = 97,
    iters: int = 2,
    impl: str = "expr",
    seed_k: int | None = None,
) -> DataFrame:
    """iters rounds of assign->refine from the deterministic seeds;
    returns the final assignment (vec_id, v, nrm, cell, csim).
    seed_k (fixed-k md5 seeding) is the scale parameterization and
    overrides seed_mod when given."""
    if iters < 1:
        raise ValueError("iters must be >= 1")
    cents = (
        seed_centroids_topk(base, seed_k)
        if seed_k is not None
        else seed_centroids(base, seed_mod)
    )
    assigned = assign_cells(base, cents, impl=impl)
    for _ in range(iters - 1):
        assigned = assign_cells(base, refine_centroids(assigned), impl=impl)
    return assigned


def semantic_dedup(assigned: DataFrame, threshold_pct: int = 35) -> DataFrame:
    """SemDeDup rule over the final clustering: a vector is a duplicate
    iff some LOWER-id vector in the SAME cell has floor(cos*100) >=
    threshold_pct; the lowest id of each near-dup group survives.
    Joins stay within cells — never all-pairs. Returns
    (vec_id, cell, is_kept)."""
    a = assigned.select(
        F.col("vec_id").alias("id_a"), F.col("v").alias("va"),
        F.col("nrm").alias("na"), F.col("cell").alias("cell_a"),
    )
    b = assigned.select(
        F.col("vec_id").alias("id_b"), F.col("v").alias("vb"),
        F.col("nrm").alias("nb"), F.col("cell").alias("cell_b"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    dups = (
        a.join(b, F.col("cell_a") == F.col("cell_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.floor(dot / (F.col("na") * F.col("nb")) * 100).cast("long")
            >= threshold_pct
        )
        .select(F.col("id_b").alias("dup_id"))
        .distinct()
    )
    return (
        assigned.join(dups, assigned["vec_id"] == dups["dup_id"], "left")
        .select(
            "vec_id", "cell", F.col("dup_id").isNull().alias("is_kept")
        )
    )
