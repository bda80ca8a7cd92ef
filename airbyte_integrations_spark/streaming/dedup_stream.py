"""Streaming dedup-on-ingest: first-occurrence-wins over a document
stream.

The continuous complement of the batch `docs_incremental_dedup` query:
an unbounded stream of documents (a crawl frontier, a CDC tail of an
upstream corpus) is filtered so only the FIRST occurrence of each
fingerprint ever reaches the sink. Spark-first: this is the engine's
own JVM state-store `dropDuplicates` — no Python state operator, no
applyInPandas; the state is a hash of seen keys maintained by the
StateStore with map-side pre-dedup per micro-batch, exactly the shape
that scales to 10^10 keys with RocksDB-backed state on a cluster.

Two arms, mirroring the house watermark rule (SURVEY §2.10 — the
correctness path never drops late data):

- `dedup_stream(..., within_watermark=None)`: exact, unbounded state.
  First occurrence wins across the whole stream lifetime.
- `dedup_stream(..., within_watermark="2 hours")`: bounded state via
  `dropDuplicatesWithinWatermark` — keys older than the watermark age
  out; re-occurrences farther apart than the horizon pass through.
  This is the METRICS/cost-bounded arm, not the correctness arm, and
  callers must opt in explicitly.

The fingerprint column is computed with the same normalization as the
batch fingerprint query (lower + whitespace-collapse + md5), so batch
and stream agree on identity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Same identity as the batch docs_fingerprint query."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return df.withColumn("fingerprint", F.md5(norm))


def dedup_stream(
    stream: DataFrame,
    keys: tuple[str, ...] = ("fingerprint",),
    event_time_col: str | None = None,
    within_watermark: str | None = None,
) -> DataFrame:
    """First-occurrence-wins dedup over a streaming DataFrame.

    Exact arm: JVM-state `dropDuplicates(keys)`; state grows with the
    distinct-key count (the correctness path — nothing is ever
    re-admitted). Bounded arm: `dropDuplicatesWithinWatermark` with a
    watermark on `event_time_col` — state is bounded by the horizon.
    """
    if within_watermark is not None:
        if event_time_col is None:
            raise ValueError(
                "within_watermark requires event_time_col to watermark on"
            )
        wm = stream.withWatermark(event_time_col, within_watermark)
        return wm.dropDuplicatesWithinWatermark(list(keys))
    return stream.dropDuplicates(list(keys))
