"""Order-independent table checksums for source↔sink reconciliation.

CDC pipelines need a cheap answer to "does the replica actually equal
the source right now?" — the role pt-table-checksum plays for MySQL
replication and Debezium's "data verification" guidance plays for
connectors (the reference ships no verifier; its acceptance tests
compare full record sets, e.g. DestinationAcceptanceTest's
retrieveRecords diffing, which cannot run at production scale).

Design (the pt-table-checksum dataflow, Spark-first):

- Every row hashes to a 60-bit integer derived from the md5 of a
  `~`-joined rendering of the checked columns (the same rendering rule
  as the surrogate-key hash in functions/hashing.py). md5 keeps the
  hash ENGINE-PORTABLE: any SQL store a user reconciles against
  (DuckDB, Postgres, MySQL) computes the identical value, which
  xxhash64 would not give us. 60 bits (15 hex chars) stays inside a
  signed BIGINT on every engine.
- Rows group into `n_buckets` chunks by an md5-prefix hash of the key
  columns — NOT by physical file/partition, so both sides bucket
  identically regardless of layout.
- Per bucket we fold `bit_xor(row_hash)` + `count(*)`. XOR is
  commutative/associative ⇒ the aggregate is order- and
  partitioning-independent and combines map-side; it also never
  overflows (a SUM of 60-bit hashes would). A mismatch in any single
  row flips its bucket's xor with probability 1 - 2^-60.

Scale shape: ONE scan + ONE map-side-combining hash aggregation per
side; output is n_buckets rows (metadata-sized). Re-verification after
a mismatch re-reads only the flagged buckets (pair with
LakeTable.read(buckets=...) when the checked key is the table key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def row_hash60(cols: list[str]) -> F.Column:
    """Engine-portable 60-bit row hash: first 15 hex chars of the md5
    of the `~`-joined string rendering. NULL renders as an explicit
    NUL-byte sentinel (chr(0) — unreachable from real string data in
    the pipelines this checks): bare concat_ws SKIPS nulls, which made
    ('a', NULL, 'b') and ('a', 'b', NULL) hash identically — a value
    shifting between adjacent nullable columns would have been
    invisible to reconciliation (pt-table-checksum keeps a separate
    null bitmap for the same reason). SQL equivalent:
    coalesce(CAST(c AS VARCHAR), chr(0))."""
    rendered = F.concat_ws(
        "~", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols]
    )
    return F.conv(F.substring(F.md5(rendered), 1, 15), 16, 10).cast("long")


def bucket_hash(key_cols: list[str], n_buckets: int) -> F.Column:
    """Logical chunk id from the KEY columns only — layout-independent,
    so source and replica agree on chunk membership."""
    rendered = F.concat_ws("~", *[F.col(c).cast("string") for c in key_cols])
    h = F.conv(F.substring(F.md5(rendered), 1, 8), 16, 10).cast("long")
    return (h % n_buckets).cast("int").alias("bucket")


def table_checksum(
    df: DataFrame,
    key_cols: list[str],
    value_cols: list[str] | None = None,
    n_buckets: int = 16,
) -> DataFrame:
    """Per-bucket (bucket, n_rows, xor_hash) checksum of `df`.

    `value_cols` defaults to every column; the row hash always covers
    key + value columns in the given order.
    """
    if value_cols is None:
        value_cols = [c for c in df.columns if c not in key_cols]
    hashed = df.select(
        bucket_hash(key_cols, n_buckets),
        row_hash60(list(key_cols) + list(value_cols)).alias("__h"),
    )
    return hashed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.bit_xor("__h").alias("xor_hash"),
    )


def reconcile(
    source: DataFrame,
    replica: DataFrame,
    key_cols: list[str],
    value_cols: list[str] | None = None,
    n_buckets: int = 16,
) -> DataFrame:
    """Buckets where source and replica disagree (either count or
    content). Full-outer join on the metadata-sized checksum outputs —
    a bucket present on one side only is a mismatch too. Returns
    (bucket, src_rows, rep_rows, src_hash, rep_hash); empty ⇒ the
    tables are equal up to the 60-bit collision bound."""
    s = table_checksum(source, key_cols, value_cols, n_buckets).alias("s")
    r = table_checksum(replica, key_cols, value_cols, n_buckets).alias("r")
    j = s.join(r, F.col("s.bucket") == F.col("r.bucket"), "full_outer")
    return (
        j.select(
            F.coalesce(F.col("s.bucket"), F.col("r.bucket")).alias("bucket"),
            F.col("s.n_rows").alias("src_rows"),
            F.col("r.n_rows").alias("rep_rows"),
            F.col("s.xor_hash").alias("src_hash"),
            F.col("r.xor_hash").alias("rep_hash"),
        )
        .filter(
            ~(
                F.col("src_rows").eqNullSafe(F.col("rep_rows"))
                & F.col("src_hash").eqNullSafe(F.col("rep_hash"))
            )
        )
    )
