"""Streaming dedup-on-ingest (JVM state-store dropDuplicates).

Pins: first-occurrence-wins across micro-batch boundaries (state
persists between batches), plan stays JVM-side (no Python operator),
and restart-with-checkpoint does not re-admit keys seen before the
restart — the streaming twin of the batch docs_incremental_dedup
taxonomy.
"""

import os

from pyspark.sql import functions as F

from airbyte_integrations_spark.streaming.dedup_stream import (
    dedup_stream,
    with_fingerprint,
)


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _pump(spark, src, ckpt, out):
    """Parquet sink (memory sink cannot recover from a checkpoint, and
    cross-restart state recovery is exactly what we pin here)."""
    stream = (
        spark.readStream.schema("doc_id long, text string").parquet(src)
    )
    deduped = dedup_stream(with_fingerprint(stream))
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def test_first_occurrence_wins_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    _write_batch(spark, src, [(1, "alpha  doc"), (2, "beta doc"), (3, "ALPHA DOC")])
    out = str(tmp_path / "out")
    _pump(spark, src, ckpt, out)
    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    # 1 and 3 normalize to the same fingerprint -> exactly one admitted
    assert len(got) == 2 and 2 in got and (1 in got) != (3 in got)

    # second batch: the duplicate of doc 1/3 must NOT be re-admitted --
    # state persisted via the checkpoint; genuinely new doc passes
    _write_batch(spark, src, [(4, "alpha doc"), (5, "gamma doc")])
    _pump(spark, src, ckpt, out)
    got2 = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert 5 in got2 and 4 not in got2 and got <= got2


def test_stream_plan_is_jvm_side(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_batch(spark, src, [(1, "x y z")])
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = (
        dedup_stream(with_fingerprint(stream))
        .writeStream.format("memory")
        .queryName("dedup_plan_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    plan = q._jsq.explainInternal(False)
    assert "StateStoreSave" in plan or "Deduplicate" in plan
    assert "InPandas" not in plan and "BatchEvalPython" not in plan


def test_within_watermark_requires_event_time(spark, tmp_path):
    import pytest

    src = str(tmp_path / "src")
    _write_batch(spark, src, [(1, "x")])
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    with pytest.raises(ValueError):
        dedup_stream(with_fingerprint(stream), within_watermark="1 hour")


def test_matches_batch_first_occurrence_rule(spark, tmp_path):
    """Stream result == batch groupBy-min(doc_id) first-occurrence set
    when arrival order is doc_id order (single input file)."""
    rows = [(i, f"text {i % 7}") for i in range(1, 30)]
    src = str(tmp_path / "src")
    _write_batch(spark, src, rows)
    out_eq = str(tmp_path / "out_eq")
    _pump(spark, src, str(tmp_path / "ck3"), out_eq)
    stream_ids = sorted(
        r["doc_id"] for r in spark.read.parquet(out_eq).collect()
    )
    batch = (
        with_fingerprint(spark.createDataFrame(rows, "doc_id long, text string"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    batch_ids = sorted(r["doc_id"] for r in batch.collect())
    assert stream_ids == batch_ids
