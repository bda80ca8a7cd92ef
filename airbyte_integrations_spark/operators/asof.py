"""Sort-based as-of join (the "point-in-time lookup" operator).

For each probe row, find the latest version row of the same key whose
ordinal is <= (non-strict) or < (strict) the probe's ordinal — the
temporal join CDC consumers run constantly ("what did this page look
like when the event fired?"). Reference semantics: the per-PK
latest-before-cursor read that incremental normalization performs when
it joins new batches against the active SCD row set
(airbyte-integrations/bases/base-normalization/normalization/transform_catalog/stream_processor.py:698-959
builds the interval table this operator probes).

Spark-first shape: NOT an inequality join. A naive
`probe.ord >= version.ord` theta-join is O(probes x versions) per key
and falls to BroadcastNestedLoopJoin. Instead both sides are tagged and
UNIONed, then ONE window (partitionBy key, orderBy ordinal) carries the
last version payload forward into each probe row — the classic
sort-merge as-of dataflow: one Exchange, one Sort, zero joins, linear
in |probes| + |versions| per key. This is exactly how kdb/QuestDB/
Flink implement ASOF at scale, and it survives 10^10 rows because a
key's history is never materialized as pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probes: DataFrame,
    versions: DataFrame,
    key_cols: list[str],
    probe_ord: str,
    version_ord: str,
    payload_cols: list[str],
    strict: bool = False,
    prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: every probe row survives; matched version
    payload columns appear as `{prefix}{version_ord}` and
    `{prefix}{col}` (NULL when no version precedes the probe).

    strict=False matches versions with ordinal <= probe ordinal;
    strict=True matches strictly earlier versions only. `version_ord`
    must be unique per key (true for LSNs / commit versions); equal
    probe ordinals are fine and all receive the same match. Ordinals
    are compared as longs; a NULL ordinal sorts first (a NULL-ordinal
    version behaves as "before everything", a NULL-ordinal probe
    matches nothing) — CDC LSNs are never NULL, so this is a contract
    note, not a hot path.
    """
    payload = F.struct(
        F.col(version_ord).alias(f"{prefix}{version_ord}"),
        *[F.col(c).alias(f"{prefix}{c}") for c in payload_cols],
    )
    payload_t = versions.select(payload.alias("_payload")).schema["_payload"].dataType
    probe_rest = [c for c in probes.columns if c not in set(key_cols) and c != probe_ord]
    probe_rest_t = {c: probes.schema[c].dataType for c in probe_rest}
    v = versions.select(
        *key_cols,
        F.col(version_ord).cast("long").alias("_ord"),
        F.lit(0).alias("_is_probe"),
        payload.alias("_payload"),
        *[F.lit(None).cast(probe_rest_t[c]).alias(f"_p_{c}") for c in probe_rest],
    )
    p = probes.select(
        *key_cols,
        F.col(probe_ord).cast("long").alias("_ord"),
        F.lit(1).alias("_is_probe"),
        F.lit(None).cast(payload_t).alias("_payload"),
        *[F.col(c).alias(f"_p_{c}") for c in probe_rest],
    )
    # At equal ordinals the version row must sort BEFORE the probe for
    # non-strict (so last() sees it) and AFTER for strict.
    tag_order = F.col("_is_probe").asc() if not strict else F.col("_is_probe").desc()
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("_ord").asc(), tag_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("_payload", ignorenulls=True).over(w)
    out = (
        v.unionByName(p)
        .withColumn("_m", matched)
        .filter(F.col("_is_probe") == 1)
    )
    return out.select(
        *key_cols,
        F.col("_ord").alias(probe_ord),
        *[F.col(f"_p_{c}").alias(c) for c in probe_rest],
        *[F.col(f"_m.{f.name}").alias(f.name) for f in payload_t.fields],
    )
