"""Broadcast Bloom filter for membership pre-filtering at ingest.

The 100 TB dedup-on-ingest pattern: instead of shuffling every incoming
batch against the full corpus fingerprint index (a 10^10-row join per
micro-batch), the corpus is summarized once into an m-bit Bloom bitmap
that ships to every executor. Batch rows that miss the bitmap are
definitively new (Bloom has no false negatives) and skip the join;
only the bitmap-positive sliver is verified with the exact semi-join,
which removes the false positives — so the combined operator returns
EXACTLY the plain-join answer while the expensive join sees a small
fraction of the batch. This mirrors what the reference's incremental
dedup would need at crawl scale (the `new_data_ids` semi-join of
base-normalization/stream_processor.py:698-959 shrunk by a summary
structure), and what Spark itself does JVM-side with runtime-filter
bloom pushdown.

Build dataflow (shuffle-free): every partition folds its rows into a
local numpy bitmap via mapInPandas (one m/8-byte row out per
partition), and the driver ORs the ~hundreds of partial bitmaps — at
10^10 rows the cost is one narrow scan; the driver merges
n_partitions x m/8 bytes (e.g. 512 x 128 KiB). Probing is a
vectorized Arrow pandas UDF over the same double-hashing scheme; the
bitmap rides to executors inside the serialized UDF closure (for
GiB-scale bitmaps hand it to `SparkContext.broadcast` instead).

Hashing: h1/h2 are computed JVM-side with xxhash64 (seeds 0 / 7) so
the Python side never touches strings; positions are the standard
Kirsch-Mitzenmacher double hash pos_i = (h1 + i*h2) mod m in uint64
arithmetic — identical in build and probe by construction. The hash
count k is baked into the filter's 8-byte header so build and probe
can never disagree on it: a probe with k' > k would manufacture FALSE
NEGATIVES — the one failure mode Bloom must never have — and a
mismatch here is silent by nature, so the API makes it unrepresentable.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

H1_SEED = 0
H2_SEED = 7
_MAGIC = b"BLM1"
_HEADER = 8  # magic (4) + k (uint16) + reserved (2)


def hash_cols(col: str | Column) -> tuple[Column, Column]:
    """The (h1, h2) pair both build and probe must use."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.xxhash64(c, F.lit(H1_SEED)),
        F.xxhash64(c, F.lit(H2_SEED)),
    )


def _u64(s: pd.Series) -> np.ndarray:
    return s.to_numpy(dtype=np.int64).view(np.uint64)


def _unpack(bloom: bytes) -> tuple[np.ndarray, int, int]:
    if bloom[:4] != _MAGIC:
        raise ValueError("not a bloom filter produced by build_bloom")
    (k,) = struct.unpack("<H", bloom[4:6])
    bm = np.frombuffer(bloom, dtype=np.uint8, offset=_HEADER)
    return bm, len(bm) * 8, k


def build_bloom(df: DataFrame, col: str, m_bits: int = 1 << 20, k: int = 5) -> bytes:
    """Fold `df[col]` (non-null) into an m_bits Bloom bitmap, returned
    with an 8-byte header carrying k (probe reads it back — the two
    sides cannot disagree).

    m_bits must be a multiple of 8. Partition-order independent (OR is
    commutative), so the result is byte-identical at any parallelism —
    pinned by test.
    """
    if m_bits % 8:
        raise ValueError("m_bits must be a multiple of 8")
    m_bytes = m_bits // 8
    h1, h2 = hash_cols(col)
    hashed = df.filter(F.col(col).isNotNull()).select(
        h1.alias("h1"), h2.alias("h2")
    )

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bm = np.zeros(m_bytes, dtype=np.uint8)
        for pdf in batches:
            if not len(pdf):
                continue
            a, b = _u64(pdf["h1"]), _u64(pdf["h2"])
            for i in range(k):
                pos = (a + np.uint64(i) * b) % np.uint64(m_bits)
                byte_ix = (pos >> np.uint64(3)).astype(np.int64)
                bit = (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))
                np.bitwise_or.at(bm, byte_ix, bit)
        yield pd.DataFrame({"bitmap": [bm.tobytes()]})

    out = np.zeros(m_bytes, dtype=np.uint8)
    for row in hashed.mapInPandas(fold, "bitmap binary").collect():
        out |= np.frombuffer(row["bitmap"], dtype=np.uint8)
    return _MAGIC + struct.pack("<H", k) + b"\x00\x00" + out.tobytes()


def might_contain(bloom: bytes, col: str | Column) -> Column:
    """Boolean column: True iff all k probe bits are set (possible
    member — false positives exist, false negatives do not). k and the
    bitmap width come from the filter itself."""
    bm, m_bits, k = _unpack(bloom)

    @pandas_udf("boolean")
    def probe(h1: pd.Series, h2: pd.Series) -> pd.Series:
        a, b = _u64(h1), _u64(h2)
        res = np.ones(len(a), dtype=bool)
        for i in range(k):
            pos = (a + np.uint64(i) * b) % np.uint64(m_bits)
            byte_ix = (pos >> np.uint64(3)).astype(np.int64)
            bit = (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))
            res &= (bm[byte_ix] & bit) != 0
        return pd.Series(res)

    c1, c2 = hash_cols(col)
    return probe(c1, c2)
