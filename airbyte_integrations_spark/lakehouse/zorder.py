"""Z-order (Morton curve) clustering keys for multi-column file skipping.

A 1-D sort order (``compact(sort_by=col)``) makes that column's
per-file zone maps disjoint — but any OTHER column's min/max stay as
wide as the bucket, so range reads on a second dimension scan
everything. Interleaving the bits of several normalized columns
(Morton order — the strategy behind Iceberg's
``rewrite_data_files(strategy => 'sort', sort_order => 'zorder(a,b)')``
and Delta's ``OPTIMIZE ZORDER BY``) clusters rows so that EVERY
participating column's per-file range is narrow: a file covering a
z-range covers a small hyper-rectangle, so zone maps prune on each
dimension independently — at 10^10 rows a 2-D range read touches
O(matching files) instead of a full dimension scan.

Spark-first: the key is pure Catalyst integer arithmetic (shift / mask
/ or, unrolled at plan-build time) — whole-stage codegen, no UDF — and
the clustering ride is the existing per-bucket ``sortWithinPartitions``
(never a global Exchange). Bounds for normalization come from one
metadata-sized min/max aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_NUMERIC = {"long", "integer", "short", "byte", "double", "float"}


def normalize_rank(col: Column, lo, hi, bits: int = 16) -> Column:
    """Scale a numeric column into [0, 2^bits) by its [lo, hi] bounds
    (clamped; a constant column maps to 0). Double arithmetic is fine
    here — the rank only drives CLUSTERING; correctness of reads comes
    from the real per-file zone maps on the original columns."""
    top = (1 << bits) - 1
    if hi is None or lo is None or not hi > lo:
        return F.lit(0).cast("long")
    scaled = (
        (col.cast("double") - F.lit(float(lo)))
        * F.lit(float(top))
        / F.lit(float(hi) - float(lo))
    ).cast("long")
    return F.greatest(F.lit(0).cast("long"), F.least(F.lit(top).cast("long"), scaled))


def interleave_bits(cols: list[Column], bits: int = 16) -> Column:
    """Morton interleave of already-normalized integer columns (each in
    [0, 2^bits)): bit b of column i lands at position b*n + i. Unrolled
    into a flat OR-of-shifts expression — bits*len(cols) must stay
    within a signed 64-bit key (<= 62)."""
    n = len(cols)
    if n < 2:
        raise ValueError("z-order needs at least 2 columns")
    if bits * n > 62:
        raise ValueError(f"bits*n_cols = {bits * n} exceeds the 62-bit key")
    z: Column | None = None
    for b in range(bits):
        for i, c in enumerate(cols):
            piece = F.shiftleft(
                F.shiftright(c, b).bitwiseAND(F.lit(1)), b * n + i
            ).cast("long")
            z = piece if z is None else z.bitwiseOR(piece)
    return z


def zorder_key(
    bounds: dict[str, tuple], cols: tuple[str, ...], bits: int = 16
) -> Column:
    """The full z-key for `cols` given {col: (lo, hi)} bounds."""
    return interleave_bits(
        [normalize_rank(F.col(c), *bounds[c], bits=bits) for c in cols],
        bits=bits,
    )
