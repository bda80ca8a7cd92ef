"""Multimodal binary plumbing: schema, batch shape, stub gating."""

import pytest
from pyspark.sql import functions as F

from airbyte_integrations_spark.functions.multimodal import (
    decode_image_meta,
    fake_image_payload,
    resize_stub,
)


def _payloads(spark, n=50):
    df = spark.range(n)
    return df.select(
        F.col("id").alias("doc_id"),
        fake_image_payload(
            F.col("id"), (F.col("id") % 100 + 1).cast("int"), F.lit(64).cast("int")
        ).alias("blob"),
    )


def test_decode_meta_roundtrip(spark):
    meta = decode_image_meta(_payloads(spark), strict=False)
    rows = {r["doc_id"]: r for r in meta.collect()}
    assert len(rows) == 50
    assert rows[7]["format"] == "img1"
    assert rows[7]["width"] == 8 and rows[7]["height"] == 64
    assert rows[7]["n_bytes"] == 4 + 4 + 4 + 32


def test_decode_handles_null_and_unknown(spark):
    df = spark.createDataFrame(
        [(1, None), (2, bytearray(b"GARBAGE"))], "doc_id long, blob binary"
    )
    rows = {r["doc_id"]: r for r in decode_image_meta(df, strict=False).collect()}
    assert rows[1]["format"] == "null"
    assert rows[2]["format"] == "unknown"


def test_strict_decode_raises_until_codecs_exist(spark):
    df = spark.createDataFrame([(2, bytearray(b"GARBAGE"))], "doc_id long, blob binary")
    with pytest.raises(Exception, match="NotImplementedError|not available"):
        decode_image_meta(df, strict=True).collect()


def test_resize_stub_is_gated(spark):
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        resize_stub(_payloads(spark, 5)).collect()


def test_compaction_and_time_travel(spark, tmp_path):
    """Lake maintenance ops introduced with this batch of features."""
    import datetime as dt

    from airbyte_integrations_spark.lakehouse.merge import merge_into
    from airbyte_integrations_spark.lakehouse.table import LakeTable

    ts = dt.datetime(2021, 6, 1)
    schema = (
        "url string, _ab_cdc_lsn long, _ab_cdc_updated_at timestamp, "
        "_ab_cdc_deleted_at timestamp, _airbyte_ab_id string, "
        "_airbyte_emitted_at timestamp"
    )
    t = LakeTable(spark, str(tmp_path / "t"))
    for i in range(3):
        b = spark.createDataFrame(
            [(f"u{j}", 10 * i + j, ts, None, f"a{i}{j}", ts) for j in range(5)], schema
        )
        merge_into(t, b, epoch=i)
    v_before = t.current_version()
    rows_before = sorted(r["url"] for r in t.read().collect())
    n_files_before = sum(len(ps) for ps in t.manifest()["files"].values())
    t.compact(max_files_per_bucket=1)
    assert sum(len(ps) for ps in t.manifest()["files"].values()) <= n_files_before
    assert sorted(r["url"] for r in t.read().collect()) == rows_before
    # time travel: older snapshot still readable and smaller
    assert t.read(version=0).count() == 5
    assert t.read(version=v_before).count() == t.read().count()
    hist = t.history()
    assert hist[0]["version"] == 0 and len(hist) == t.current_version() + 1


def test_frame_sample_expansion_deterministic(spark):
    from pyspark.sql import functions as F

    from airbyte_integrations_spark.functions.multimodal import (
        fake_video_payload,
        frame_sample,
    )

    vids = spark.range(20).select(
        F.col("id").alias("doc_id"),
        fake_video_payload(
            F.col("id"), (F.col("id") + 1) * 1500, F.lit(30)
        ).alias("blob"),
    )
    frames = frame_sample(vids, every_ms=1000)
    got = frames.orderBy("doc_id", "frame_idx").collect()
    # expansion factor: ceil(1500*(id+1) / 1000) frames per video
    import math

    expected_n = sum(math.ceil(1500 * (i + 1) / 1000) for i in range(20))
    assert len(got) == expected_n
    # offsets are the deterministic sample grid
    for r in got[:5]:
        assert r["ts_ms"] == r["frame_idx"] * 1000
    # partitioning invariance: same frame table at any parallelism
    got7 = frame_sample(vids.repartition(7), every_ms=1000).orderBy(
        "doc_id", "frame_idx"
    ).collect()
    assert got == got7


def test_audio_meta_roundtrip_and_bounds(spark):
    from pyspark.sql import functions as F

    from airbyte_integrations_spark.functions.multimodal import (
        decode_audio_meta,
        fake_audio_payload,
    )

    df = spark.range(1, 5).select(
        F.col("id").alias("doc_id"),
        fake_audio_payload(
            F.col("id"), F.lit(16000).cast("int"), (F.col("id") * 16000).cast("long")
        ).alias("blob"),
    )
    rows = {r["doc_id"]: r for r in decode_audio_meta(df).collect()}
    assert rows[2]["sample_rate"] == 16000 and rows[2]["n_samples"] == 32000
    assert rows[2]["duration_ms"] == 2000 and rows[2]["format"] == "aud1"
    assert rows[2]["n_bytes"] == 54

    # out-of-range rate/samples null the payload instead of corrupting
    bad = spark.range(1).select(
        F.col("id").alias("doc_id"),
        fake_audio_payload(
            F.col("id"), F.lit(2_000_000).cast("int"), F.lit(10).cast("long")
        ).alias("blob"),
    )
    assert bad.filter(F.col("blob").isNull()).count() == 1
    r = decode_audio_meta(bad).collect()[0]
    assert r["format"] == "null" and r["n_bytes"] == 0

    # strict mode raises on non-AUD1 bytes until real codecs exist
    import pytest as _pytest

    junk = spark.createDataFrame([(1, bytearray(b"RIFFxxxx"))], ["doc_id", "blob"])
    with _pytest.raises(Exception, match="audio codecs"):
        decode_audio_meta(junk, strict=True).collect()


def test_corrupt_headers_degrade_per_row_not_per_job(spark):
    """A blob with a valid magic but garbage fields must degrade to
    'unknown' (or be skipped) per-row, never abort the task."""
    from pyspark.sql import functions as F

    from airbyte_integrations_spark.functions.multimodal import (
        decode_audio_meta,
        decode_image_meta,
        frame_sample,
    )

    bad = spark.createDataFrame(
        [
            (1, bytearray(b"AUD1xxxxxxxxyyyyyyyyyyyy")),  # non-digit fields
            (2, bytearray(b"AUD100000000000000000000000")),  # rate 0
            (3, bytearray(b"AUD1")),  # truncated
            (4, bytearray(b"IMG1ab")),  # truncated/garbage image
            (5, bytearray(b"VID1notdigit")),  # garbage video
        ],
        ["doc_id", "blob"],
    )
    a = {r["doc_id"]: r for r in decode_audio_meta(bad).collect()}
    assert a[1]["format"] == "unknown" and a[2]["format"] == "unknown"
    assert a[3]["format"] == "unknown"
    i = decode_image_meta(bad.filter(F.col("doc_id") == 4)).collect()[0]
    assert i["format"] == "unknown" and i["width"] == 0
    # garbage VID1 rows are skipped, not fatal
    assert frame_sample(bad.filter(F.col("doc_id") == 5)).count() == 0
