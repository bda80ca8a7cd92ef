"""Per-partition lineage + metrics (north rule requirement).

Mirrors the replication worker's per-stream emitted/committed counts
(DefaultReplicationWorker.java:197-228) at partition granularity:
for every (epoch, source partition) — offset range (min/max lsn),
event count, delete count. Written as parquet under
`<table root>/_lineage/epoch=<id>/` BEFORE the snapshot commit;
re-running an epoch overwrites the same directory, so lineage stays
exactly-once together with the data.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_DIR = "_lineage"


def compute_lineage(
    batch: DataFrame, stream: str, epoch: int, lsn_col: str = "_ab_cdc_lsn"
) -> DataFrame:
    return (
        batch.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(
            F.min(lsn_col).alias("from_lsn"),
            F.max(lsn_col).alias("to_lsn"),
            F.count("*").alias("n_events"),
            F.sum(
                F.col("_ab_cdc_deleted_at").isNotNull().cast("long")
            ).alias("n_deletes"),
        )
        .select(
            F.lit(stream).alias("stream"),
            F.lit(epoch).cast("long").alias("epoch"),
            F.col("_pid").alias("partition_id"),
            "from_lsn",
            "to_lsn",
            "n_events",
            "n_deletes",
        )
    )


def compute_lineage_bulk(
    events: DataFrame,
    stream: str,
    epochs,
    lsn_col: str = "_ab_cdc_lsn",
    balanced_target: int | None = None,
):
    """Every planned epoch's per-partition lineage in ONE scan.

    plan_epochs emits contiguous uniform-width slices (the final slice
    may be narrower), so an event's epoch id is pure arithmetic on its
    lsn — no per-epoch scan job. At the 10^10 design point a sync has
    ~10^4 epochs; one lineage job per epoch is a scheduler storm that
    doubles the sync's job count, while this is a single
    map-side-combining aggregation over the unread tail whose output
    (epochs x partitions rows) is metadata-sized.

    Returns (pandas body rows incl. `epoch`, pyarrow schema of the body
    without `epoch`) for write_lineage_rows, or None when the plan is
    not uniform-width contiguous (e.g. tx-aligned boundaries) — callers
    fall back to per-epoch compute_lineage. Row-balanced plans are not
    uniform in lsn width but ARE bulk-computable from their rank
    structure: pass `balanced_target` (the planner's
    max_events_per_epoch) to route them to lineage_balanced_frame."""
    lin = lineage_bulk_frame(events, stream, epochs, lsn_col)
    if lin is None and balanced_target is not None:
        lin = lineage_balanced_frame(
            events, stream, epochs, lsn_col, balanced_target
        )
    if lin is None:
        return None
    schema = _pa_body_schema(lin)
    return lin.toPandas(), schema


def lineage_bulk_frame(
    events: DataFrame,
    stream: str,
    epochs,
    lsn_col: str = "_ab_cdc_lsn",
):
    """The (lazy) one-scan lineage frame behind compute_lineage_bulk;
    separate so the plan audit (tools/capture_plans.py) can inspect the
    physical plan without collecting."""
    if not epochs:
        return None
    width = epochs[0].to_lsn - epochs[0].from_lsn
    prev_to = epochs[0].from_lsn
    for ep in epochs[:-1]:
        if ep.from_lsn != prev_to or ep.to_lsn - ep.from_lsn != width:
            return None
        prev_to = ep.to_lsn
    last = epochs[-1]
    if last.from_lsn != prev_to or last.to_lsn - last.from_lsn > width:
        return None
    start, last_from, last_to = epochs[0].from_lsn, last.from_lsn, last.to_lsn
    # integer `div` (not `/` + floor): exact at full 64-bit lsn range
    eid = F.least(
        F.lit(start)
        + F.expr(f"((`{lsn_col}` - {start}L - 1L) div {width}L)") * F.lit(width),
        F.lit(last_from),
    ).cast("long")
    lin = (
        events.filter(
            (F.col(lsn_col) > F.lit(start)) & (F.col(lsn_col) <= F.lit(last_to))
        )
        .withColumn("_pid", F.spark_partition_id())
        .groupBy(eid.alias("epoch"), "_pid")
        .agg(
            F.min(lsn_col).alias("from_lsn"),
            F.max(lsn_col).alias("to_lsn"),
            F.count("*").alias("n_events"),
            F.sum(
                F.col("_ab_cdc_deleted_at").isNotNull().cast("long")
            ).alias("n_deletes"),
        )
        .select(
            F.lit(stream).alias("stream"),
            "epoch",
            F.col("_pid").alias("partition_id"),
            "from_lsn",
            "to_lsn",
            "n_events",
            "n_deletes",
        )
    )
    return lin


def lineage_balanced_frame(
    events: DataFrame,
    stream: str,
    epochs,
    lsn_col: str = "_ab_cdc_lsn",
    target: int | None = None,
):
    """Bulk lineage for ROW-BALANCED plans (plan_epochs_balanced):
    boundaries are order statistics at ranks i*target, so an event's
    epoch INDEX is pure rank arithmetic — (rank-1) div target — and the
    global rank is computed without a global sort by the same two-phase
    scheme the planner used: an arithmetic coarse-bucket histogram
    (metadata-sized, collected once) plus one rank window PARTITIONED
    BY bucket (parallel across buckets; the only event-sized Exchange,
    and it carries just (lsn, deleted_at, pid)). The alternative —
    per-epoch lineage scans — is a scheduler storm at large epoch
    counts, the exact problem compute_lineage_bulk solved for uniform
    plans.

    Preconditions (both are the balanced planner's own): the plan is
    contiguous, and lsns are unique within the tail. Returns None when
    the plan is not contiguous or `target` is missing."""
    if not epochs or not target or target < 1:
        return None
    prev = epochs[0].from_lsn
    for ep in epochs:
        if ep.from_lsn != prev or ep.to_lsn <= ep.from_lsn:
            return None
        prev = ep.to_lsn
    start, last_to = epochs[0].from_lsn, epochs[-1].to_lsn
    spark = events.sparkSession
    tail = (
        events.filter(
            (F.col(lsn_col) > F.lit(start)) & (F.col(lsn_col) <= F.lit(last_to))
        )
        # source partition id captured BEFORE the rank Exchange
        .withColumn("_pid", F.spark_partition_id())
        .select(lsn_col, "_ab_cdc_deleted_at", "_pid")
    )
    k = len(epochs)
    span = last_to - start
    g = int(min(max(k * 8, 64), 65_536))
    bwidth = max((span + g - 1) // g, 1)
    bucket = F.expr(f"((`{lsn_col}` - {start}L - 1L) div {bwidth}L)")
    hist = sorted(
        (int(r["b"]), int(r["cnt"]))
        for r in tail.groupBy(bucket.alias("b"))
        .agg(F.count("*").alias("cnt"))
        .collect()
    )
    if not hist:
        return None
    cum_rows, c = [], 0
    for b, cnt in hist:
        cum_rows.append((b, c))
        c += cnt
    cumdf = spark.createDataFrame(cum_rows, "b long, cum long")
    emap = spark.createDataFrame(
        [(i, int(ep.from_lsn)) for i, ep in enumerate(epochs)], "idx long, epoch long"
    )
    from pyspark.sql import Window

    wn = Window.partitionBy("b").orderBy(F.col(lsn_col).asc())
    ranked = (
        tail.withColumn("b", bucket)
        .withColumn("rb", F.row_number().over(wn))
        .join(F.broadcast(cumdf), "b")
        .withColumn("idx", F.expr(f"((cum + rb - 1) div {int(target)}L)"))
        .join(F.broadcast(emap), "idx")
    )
    return (
        ranked.groupBy("epoch", "_pid")
        .agg(
            F.min(lsn_col).alias("from_lsn"),
            F.max(lsn_col).alias("to_lsn"),
            F.count("*").alias("n_events"),
            F.sum(
                F.col("_ab_cdc_deleted_at").isNotNull().cast("long")
            ).alias("n_deletes"),
        )
        .select(
            F.lit(stream).alias("stream"),
            "epoch",
            F.col("_pid").alias("partition_id"),
            "from_lsn",
            "to_lsn",
            "n_events",
            "n_deletes",
        )
    )


def _pa_body_schema(lineage: DataFrame):
    import pyarrow as pa

    pa_types = {
        "string": pa.string(),
        "int": pa.int32(),
        "bigint": pa.int64(),
        "double": pa.float64(),
        "timestamp": pa.timestamp("us"),
    }
    return pa.schema(
        [
            pa.field(f.name, pa_types[f.dataType.simpleString()])
            for f in lineage.schema.fields
            if f.name != "epoch"
        ]
    )


def write_lineage(lineage: DataFrame, table_root: str, epoch: int) -> None:
    """Persist one epoch's lineage under `<root>/_lineage/epoch=<id>/`.

    The frame is tiny (<= one row per source partition), so it is
    collected and written driver-side with pyarrow: a full Spark write
    job (task launch + commit protocol) per epoch would serialize the
    sync loop for metadata-sized output. Directory layout and schema
    are identical to a Spark `partitionBy(epoch)` write, so
    read_lineage is unchanged."""
    schema = _pa_body_schema(lineage)
    pdf = lineage.drop("epoch").toPandas()
    write_lineage_rows(pdf, schema, table_root, epoch)


def write_lineage_rows(pdf, schema, table_root: str, epoch: int) -> None:
    """Driver-side single-file lineage write of already-computed rows
    (pandas body WITHOUT the epoch column)."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    out = os.path.join(table_root, LINEAGE_DIR, f"epoch={epoch}")
    shutil.rmtree(out, ignore_errors=True)  # overwrite semantics on re-run
    os.makedirs(out, exist_ok=True)
    tmp = os.path.join(out, "_tmp.parquet")
    pq.write_table(pa.Table.from_pandas(pdf, schema=schema, preserve_index=False), tmp)
    os.replace(tmp, os.path.join(out, "part-00000.parquet"))


def sync_summary(spark: SparkSession, table) -> DataFrame:
    """Per-stream emitted/committed accounting, the replication
    worker's output stats (DefaultReplicationWorker.java:197-228):
    committed epochs x (events, deletes, offset range) joined from the
    commit log and the lineage table."""
    from pyspark.sql import functions as F

    lin = read_lineage(spark, table.root)
    per_epoch = lin.groupBy("stream", "epoch").agg(
        F.min("from_lsn").alias("from_lsn"),
        F.max("to_lsn").alias("to_lsn"),
        F.sum("n_events").alias("n_emitted"),
        F.sum("n_deletes").alias("n_deletes"),
        F.count("*").alias("n_partitions"),
    )
    # Commit keys are either numeric lsn epochs or "stream:<batch_id>"
    # (stream_sync's collision-proof namespace); the latter map to the
    # lineage table's numeric metrics label STREAM_EPOCH_BASE+batch_id.
    from airbyte_integrations_spark.streaming.stream_sync import STREAM_EPOCH_BASE

    def _epoch_num(e: str) -> int:
        if e.startswith("stream:"):
            return STREAM_EPOCH_BASE + int(e.split(":", 1)[1])
        return int(e)

    committed = [
        (s, _epoch_num(e))
        for s, eps in table.manifest().get("committed", {}).items()
        for e in eps
    ]
    if not committed:
        return per_epoch.withColumn("committed", F.lit(False))
    cdf = spark.createDataFrame(committed, "stream string, epoch long").withColumn(
        "committed", F.lit(True)
    )
    return per_epoch.join(F.broadcast(cdf), ["stream", "epoch"], "left").fillna(
        {"committed": False}
    )


def read_lineage(spark: SparkSession, table_root: str) -> DataFrame:
    return spark.read.option("basePath", os.path.join(table_root, LINEAGE_DIR)).parquet(
        os.path.join(table_root, LINEAGE_DIR)
    )
