"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video travel as `binary` columns with a small typed
metadata struct; decode / feature-extract / resize / frame-sample are
Arrow `mapInPandas` stages so payload bytes move in columnar batches
and the Python stage scales with cores.

The actual codecs (PIL/librosa/ffmpeg) are NOT in this container, so
the decode step is STUBBED: `decode_image_meta(strict=True)` raises
NotImplementedError where a real decoder would run, and the default
deterministic fake parses our own tiny header format so the Spark-side
plumbing (schema, batch shape, partitioning) is real and tested.

Fake payload format (gen side): b"IMG1" + width:4BE + height:4BE + raw.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = (
    "doc_id long, n_bytes long, format string, width int, height int"
)


def fake_image_payload(ident: Column, width: Column, height: Column) -> Column:
    """Deterministic synthetic binary image payload (JVM-side).

    Fixed-width fields bound the range (width/height < 10^4); lpad
    would silently truncate larger values into a wrong-but-parseable
    header, so out-of-range inputs null the payload — the same rule as
    the video/audio encoders."""
    w_ok = width.isNotNull() & (width > 0) & (width < 10_000)
    h_ok = height.isNotNull() & (height > 0) & (height < 10_000)
    hdr = F.concat(
        F.encode(F.lit("IMG1"), "UTF-8"),
        F.encode(F.lpad(width.cast("string"), 4, "0"), "UTF-8"),
        F.encode(F.lpad(height.cast("string"), 4, "0"), "UTF-8"),
        F.encode(F.md5(ident.cast("string")), "UTF-8"),
    )
    return F.when(w_ok & h_ok, hdr)


def _parse_one(b: bytes | None, strict: bool) -> tuple[int, str, int, int]:
    if b is None:
        return 0, "null", 0, 0
    if bytes(b[:4]) == b"IMG1":
        try:
            w = int(bytes(b[4:8]))
            h = int(bytes(b[8:12]))
            return len(b), "img1", w, h
        except (ValueError, IndexError):
            return len(b), "unknown", 0, 0  # corrupt header: degrade per-row
    if strict:
        # a real build would dispatch to PIL.Image.open here
        raise NotImplementedError(
            "real image codecs are not available in this environment"
        )
    return len(b), "unknown", 0, 0


def decode_image_meta(
    df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob", strict: bool = False
) -> DataFrame:
    """mapInPandas metadata extraction over binary payloads."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pdf[blob_col].map(lambda b: _parse_one(b, strict))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": meta.map(lambda m: m[0]),
                    "format": meta.map(lambda m: m[1]),
                    "width": meta.map(lambda m: m[2]),
                    "height": meta.map(lambda m: m[3]),
                }
            )

    return df.mapInPandas(gen, IMAGE_META_SCHEMA)


def resize_stub(df: DataFrame, blob_col: str = "blob", max_side: int = 256) -> DataFrame:
    """Resize stage shape: passes payloads through mapInPandas with the
    real batch plumbing; the pixel work raises until codecs exist."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            raise NotImplementedError(
                "resize requires an image codec not present in this container"
            )
            yield pdf  # pragma: no cover

    return df.mapInPandas(gen, df.schema)


VIDEO_FRAME_SCHEMA = "doc_id long, frame_idx int, ts_ms long, n_bytes long"


def fake_video_payload(ident: Column, duration_ms: Column, fps: Column) -> Column:
    """Deterministic synthetic video payload (JVM-side).

    Format: b"VID1" + duration_ms:8 dec chars + fps:4 dec chars + body.
    Fixed-width fields bound the encodable range: duration_ms < 10^8
    (~27.8 h) and fps < 10^4. lpad would silently TRUNCATE longer
    values into a corrupt header, so out-of-range inputs are forced to
    null here (assert_true would fail the whole job for one bad row;
    a null payload surfaces per-row in frame_sample instead).
    """
    dur_ok = duration_ms.isNotNull() & (duration_ms >= 0) & (duration_ms < 100_000_000)
    fps_ok = fps.isNotNull() & (fps > 0) & (fps < 10_000)
    payload = F.concat(
        F.encode(F.lit("VID1"), "UTF-8"),
        F.encode(F.lpad(duration_ms.cast("string"), 8, "0"), "UTF-8"),
        F.encode(F.lpad(fps.cast("string"), 4, "0"), "UTF-8"),
        F.encode(F.md5(ident.cast("string")), "UTF-8"),
    )
    return F.when(dur_ok & fps_ok, payload)


def frame_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    blob_col: str = "blob",
    every_ms: int = 1000,
    strict: bool = False,
) -> DataFrame:
    """Frame-sampling stage: one OUTPUT ROW PER SAMPLED FRAME (the
    1->N mapInPandas expansion a video pipeline needs — Arrow batches
    in, a longer frame table out; Spark parallelizes by input
    partition, so payload bytes never converge on one worker).

    A real build would hand each payload to ffmpeg/PyAV and emit the
    decoded frame bytes; absent codecs (strict=True raises), the stub
    parses our VID1 header and emits deterministic frame timestamps at
    `every_ms` intervals, which exercises the real schema, batch shape
    and expansion factor.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, sizes = [], [], [], []
            for did, b in zip(pdf[id_col], pdf[blob_col]):
                if b is None:
                    continue
                if bytes(b[:4]) != b"VID1":
                    if strict:
                        raise NotImplementedError(
                            "real video codecs are not available in this environment"
                        )
                    continue
                try:
                    dur = int(bytes(b[4:12]))
                except (ValueError, IndexError):
                    continue  # corrupt header: skip the row, not the job
                for i, t in enumerate(range(0, max(dur, 1), every_ms)):
                    ids.append(did)
                    idxs.append(i)
                    tss.append(t)
                    sizes.append(len(b))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "ts_ms": tss, "n_bytes": sizes}
            )

    return df.mapInPandas(gen, VIDEO_FRAME_SCHEMA)


AUDIO_META_SCHEMA = (
    "doc_id long, n_bytes long, format string, sample_rate int, "
    "n_samples long, duration_ms long"
)


def fake_audio_payload(ident: Column, sample_rate: Column, n_samples: Column) -> Column:
    """Deterministic synthetic audio payload (JVM-side).

    Format: b"AUD1" + sample_rate:6 dec chars + n_samples:12 dec chars
    + md5 body. Bounds: rate < 10^6 Hz, samples < 10^12 (~723 days at
    16 kHz) — out-of-range inputs null the payload (lpad truncation
    would corrupt the header silently, same rule as fake_video_payload).
    """
    rate_ok = sample_rate.isNotNull() & (sample_rate > 0) & (sample_rate < 1_000_000)
    n_ok = n_samples.isNotNull() & (n_samples >= 0) & (n_samples < 10**12)
    payload = F.concat(
        F.encode(F.lit("AUD1"), "UTF-8"),
        F.encode(F.lpad(sample_rate.cast("string"), 6, "0"), "UTF-8"),
        F.encode(F.lpad(n_samples.cast("string"), 12, "0"), "UTF-8"),
        F.encode(F.md5(ident.cast("string")), "UTF-8"),
    )
    return F.when(rate_ok & n_ok, payload)


def _parse_audio(b, strict: bool):
    if b is None:
        return 0, "null", 0, 0, 0
    if bytes(b[:4]) == b"AUD1":
        # A malformed header (non-digit fields, zero rate) must degrade
        # to "unknown" per-row, never abort the task — the same rule as
        # the null-on-overflow encoders.
        try:
            rate = int(bytes(b[4:10]))
            n = int(bytes(b[10:22]))
            if rate > 0:
                return len(b), "aud1", rate, n, n * 1000 // rate
        except (ValueError, IndexError):
            pass
        return len(b), "unknown", 0, 0, 0
    if strict:
        # a real build would dispatch to soundfile/librosa here
        raise NotImplementedError(
            "real audio codecs are not available in this environment"
        )
    return len(b), "unknown", 0, 0, 0


def decode_audio_meta(
    df: DataFrame, id_col: str = "doc_id", blob_col: str = "blob", strict: bool = False
) -> DataFrame:
    """mapInPandas audio-metadata extraction (sample rate, sample
    count, derived duration) over binary payloads — same Arrow batch
    plumbing as decode_image_meta."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pdf[blob_col].map(lambda b: _parse_audio(b, strict))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": meta.map(lambda m: m[0]),
                    "format": meta.map(lambda m: m[1]),
                    "sample_rate": meta.map(lambda m: m[2]),
                    "n_samples": meta.map(lambda m: m[3]),
                    "duration_ms": meta.map(lambda m: m[4]),
                }
            )

    return df.mapInPandas(gen, AUDIO_META_SCHEMA)
