"""KMV (k-minimum-values) distinct-count sketches.

Corpus profiling at 10^10 rows needs cardinalities — distinct urls,
distinct shingles per host, vocabulary growth — where exact
COUNT(DISTINCT) means shuffling every distinct value to one counter.
The classic fix is a bottom-k sketch (Bar-Yossef et al. 2002,
"Counting distinct elements in a data stream"): hash every value
uniformly into [0, 2^60), keep the k smallest DISTINCT hashes, and
estimate NDV = (k-1) * 2^60 / h_k where h_k is the k-th smallest.
Spark ships HLL++ (approx_count_distinct), but its binary registers
are engine-internal — a KMV over the engine-portable md5-derived
60-bit hash (same rendering rule as functions/checksum.py) is exactly
reproducible in ANY SQL engine, which makes the sketch itself
value-testable against an oracle and mergeable across systems.

Scale shape: groupBy(hash) first — map-side combine collapses each
partition to its distinct hashes before any shuffle — then the k
smallest survive via sort().limit(k), which Spark executes as
TakeOrderedAndProject: every task forwards at most k rows, the driver
merges. Per-group variants use a rank<=k window, which Spark 4
compiles to WindowGroupLimit with a map-side PARTIAL pass (each scan
task forwards at most k rows per group — pinned in docs/PLANS.md for
the top-k family). Sketches merge by unioning hash sets and re-taking
the k smallest: union-then-limit, associative, no rescan of either
input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# hash space size: 60 bits (15 hex chars of md5) — fits a signed
# BIGINT on every engine, same convention as checksum.row_hash60
SPACE = 1 << 60


def value_hash60(col) -> F.Column:
    """Engine-portable uniform hash of a single value into [0, 2^60):
    conv(substr(md5(v), 1, 15), 16, 10). NULLs hash to NULL and drop
    out of the sketch (COUNT DISTINCT semantics)."""
    return F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def kmv_sketch(df: DataFrame, col: str, k: int = 1024) -> DataFrame:
    """The k smallest distinct hashes of `col`, ranked ascending.
    Output: (rank, h) with rank in [1, min(k, ndv)] — the sketch is a
    tiny exactly-defined DataFrame, so it can be persisted, merged, or
    compared value-for-value across engines."""
    hashes = (
        df.select(value_hash60(col).alias("h"))
        .where(F.col("h").isNotNull())
        .distinct()
    )
    # TakeOrderedAndProject: map-side top-k per task, driver merge
    topk = hashes.sort("h").limit(k)
    w = Window.orderBy("h")  # <= k rows — metadata-sized, never the corpus
    return topk.select(F.row_number().over(w).alias("rank"), "h")


def kmv_estimate(sketch: DataFrame, k: int = 1024) -> DataFrame:
    """NDV estimate from a kmv_sketch frame. If fewer than k distinct
    hashes exist the count is EXACT (the sketch saw everything);
    otherwise est = floor((k-1) * 2^60 / h_k). The numerator exceeds
    int64 for k > 9, so it is carried as an IEEE double — (k-1)*2^60
    is exactly representable (small mantissa, power-of-two scale) and
    double divide + floor round identically on every engine, so the
    estimate is still bit-identical cross-engine."""
    agg = sketch.agg(
        F.count("*").alias("n_seen"),
        F.max(F.when(F.col("rank") == k, F.col("h"))).alias("h_k"),
    )
    return agg.select(
        F.col("n_seen"),
        F.when(F.col("n_seen") < k, F.col("n_seen"))
        .otherwise(F.floor(F.lit(float((k - 1) * SPACE)) / F.col("h_k")))
        .cast("long")
        .alias("ndv_est"),
    )


def kmv_merge(*sketches: DataFrame, k: int = 1024) -> DataFrame:
    """Union bottom-k sketches into the bottom-k of the union — the
    property that lets per-shard / per-day sketches roll up without
    rescanning data. Inputs may overlap (same hash in both): distinct
    first."""
    out = sketches[0].select("h")
    for s in sketches[1:]:
        out = out.unionByName(s.select("h"))
    topk = out.distinct().sort("h").limit(k)
    w = Window.orderBy("h")
    return topk.select(F.row_number().over(w).alias("rank"), "h")


def kmv_per_group(df: DataFrame, group_col: str, col: str, k: int = 64) -> DataFrame:
    """Per-group NDV estimates in one pass: distinct (group, hash)
    pairs -> rank<=k per group (WindowGroupLimit: map-side partial
    top-k per group) -> the same (k-1)*2^60/h_k estimator per group.
    Output: (group_col, n_seen, ndv_est)."""
    pairs = (
        df.select(F.col(group_col), value_hash60(col).alias("h"))
        .where(F.col("h").isNotNull())
        .distinct()
    )
    w = Window.partitionBy(group_col).orderBy("h")
    ranked = pairs.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )
    return ranked.groupBy(group_col).agg(
        F.count("*").alias("n_seen"),
        F.max(F.when(F.col("rank") == k, F.col("h"))).alias("h_k"),
    ).select(
        group_col,
        F.col("n_seen"),
        F.when(F.col("n_seen") < k, F.col("n_seen"))
        .otherwise(F.floor(F.lit(float((k - 1) * SPACE)) / F.col("h_k")))
        .cast("long")
        .alias("ndv_est"),
    )
