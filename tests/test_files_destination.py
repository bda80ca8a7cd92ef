"""Object-store files destination (destination-s3 analogue).

Pins the reference's contract: path-template resolution
(S3StorageOperations.java:69-87), part-id continuation (:138,197),
OVERWRITE regex cleanup (:240-258 + S3ConsumerFactory onStart), and
format round-trips incl. gzip double extensions (:187-193) and the
vendored executor-side Avro writer.
"""

import gzip
import os
from datetime import datetime, timezone

import pytest
from pyspark.sql import Row, functions as F

from airbyte_integrations_spark.destinations.files import (
    DEFAULT_PATH_FORMAT,
    FilesDestination,
    FilesDestinationConfig,
    object_path_regex,
    resolve_object_path,
)

DT = datetime(2023, 4, 5, 6, 7, 8, 90000, tzinfo=timezone.utc)


def _df(spark, n=6, start=0):
    return spark.range(start, start + n).select(
        F.col("id").alias("pk"), F.concat(F.lit("v"), F.col("id")).alias("name")
    )


def test_resolve_object_path_default_template():
    got = resolve_object_path(DEFAULT_PATH_FORMAT, "Public Ns", "My-Stream", DT)
    epoch_ms = int(DT.timestamp() * 1000)
    assert got == f"public_ns/my_stream/2023_04_05_{epoch_ms}_"


def test_resolve_object_path_all_vars():
    fmt = "${YEAR}/${MONTH}/${DAY}/${HOUR}${MINUTE}${SECOND}_${MILLISECOND}//x"
    assert resolve_object_path(fmt, None, "s", DT) == "2023/04/05/060708_0090/x"


def test_object_path_regex_matches_resolved():
    import re

    resolved = resolve_object_path(DEFAULT_PATH_FORMAT, "ns", "st", DT)
    rx = re.compile(object_path_regex(DEFAULT_PATH_FORMAT, "ns", "st"))
    assert rx.fullmatch(resolved + "0.jsonl")
    assert not rx.fullmatch("ns/other/2023_04_05_99_0.jsonl")


def test_object_path_regex_empty_namespace_collapse_parity():
    """Empty namespace collapses `${NAMESPACE}/${STREAM_NAME}` to a single
    path segment in resolve_object_path; the OVERWRITE cleanup regex must
    collapse identically or it silently matches none of the prior sync's
    objects (S3StorageOperations.getRegexFormat parity)."""
    import re

    resolved = resolve_object_path(DEFAULT_PATH_FORMAT, None, "st", DT)
    assert resolved.startswith("st/")  # the double slash was collapsed
    rx = re.compile(object_path_regex(DEFAULT_PATH_FORMAT, None, "st"))
    assert rx.fullmatch(resolved + "0.jsonl")


def test_jsonl_append_part_ids_continue(spark, tmp_path):
    cfg = FilesDestinationConfig(root=str(tmp_path), format="jsonl")
    dest = FilesDestination(spark, cfg)
    w1 = dest.write(_df(spark, 4).coalesce(1), "pages", "ns", sync_dt=DT)
    w2 = dest.write(_df(spark, 3, start=4).coalesce(1), "pages", "ns", sync_dt=DT)
    assert len(w1) == 1 and w1[0].endswith("_0.jsonl")
    assert len(w2) == 1 and w2[0].endswith("_1.jsonl")
    back = spark.read.json(os.path.join(str(tmp_path), "ns/pages"))
    assert back.count() == 7


def test_overwrite_cleans_prior_sync_only_this_stream(spark, tmp_path):
    cfg = FilesDestinationConfig(root=str(tmp_path), format="jsonl")
    dest = FilesDestination(spark, cfg)
    dest.write(_df(spark, 5), "pages", "ns", sync_dt=DT)
    dest.write(_df(spark, 2), "other", "ns", sync_dt=DT)
    dt2 = datetime(2024, 1, 2, tzinfo=timezone.utc)
    dest.write(_df(spark, 3), "pages", "ns", mode="overwrite", sync_dt=dt2)
    pages = spark.read.json(os.path.join(str(tmp_path), "ns/pages"))
    assert pages.count() == 3  # first sync's objects removed
    other = spark.read.json(os.path.join(str(tmp_path), "ns/other"))
    assert other.count() == 2  # untouched


def test_csv_gzip_roundtrip_and_extension(spark, tmp_path):
    cfg = FilesDestinationConfig(root=str(tmp_path), format="csv", gzip=True)
    dest = FilesDestination(spark, cfg)
    (rel,) = dest.write(_df(spark, 5).coalesce(1), "s", "n", sync_dt=DT)
    assert rel.endswith(".csv.gz")
    with gzip.open(os.path.join(str(tmp_path), rel), "rt") as f:
        lines = f.read().strip().splitlines()
    assert lines[0] == "pk,name" and len(lines) == 6
    back = spark.read.options(header=True).csv(os.path.dirname(os.path.join(str(tmp_path), rel)))
    assert back.count() == 5


def test_parquet_roundtrip(spark, tmp_path):
    cfg = FilesDestinationConfig(root=str(tmp_path), format="parquet")
    dest = FilesDestination(spark, cfg)
    dest.write(_df(spark, 8), "s", None, sync_dt=DT)
    back = spark.read.parquet(os.path.join(str(tmp_path), "s"))
    assert back.count() == 8
    assert {r["pk"] for r in back.collect()} == set(range(8))


def test_avro_roundtrip_with_timestamps(spark, tmp_path):
    cfg = FilesDestinationConfig(root=str(tmp_path), format="avro")
    dest = FilesDestination(spark, cfg)
    df = spark.createDataFrame(
        [
            Row(pk=1, name="a", ts=datetime(2023, 1, 2, 3, 4, 5)),
            Row(pk=2, name=None, ts=datetime(2023, 6, 7, 8, 9, 10)),
        ]
    )
    written = dest.write(df.coalesce(1), "s", None, sync_dt=DT)
    assert all(w.endswith(".avro") for w in written)
    from airbyte_integrations_spark.sources.avro_io import read_avro

    back = read_avro(
        spark, [os.path.join(str(tmp_path), w) for w in written]
    ).toPandas().sort_values("pk")
    assert list(back["pk"]) == [1, 2]
    assert back["name"].tolist()[0] == "a" and back["name"].isna().tolist()[1]
    assert back["ts"].tolist()[0] == datetime(2023, 1, 2, 3, 4, 5)


def test_gzip_rejected_for_parquet():
    with pytest.raises(ValueError):
        FilesDestinationConfig(root="/tmp/x", format="parquet", gzip=True)


def test_wire_no_flattening_envelope(spark, tmp_path):
    """NoFlatteningSheetGenerator.java:17-30 — 3-column envelope with
    the record as one json blob; ab_id deterministic md5-uuid."""
    cfg = FilesDestinationConfig(root=str(tmp_path), format="jsonl", flattening="no")
    dest = FilesDestination(spark, cfg)
    dest.write(_df(spark, 3).coalesce(1), "pages", "ns", sync_dt=DT)
    back = spark.read.json(os.path.join(str(tmp_path), "ns/pages"))
    assert sorted(back.columns) == [
        "_airbyte_ab_id", "_airbyte_data", "_airbyte_emitted_at"
    ]
    rows = {r["_airbyte_data"] for r in back.collect()}
    assert '{"pk":0,"name":"v0"}' in rows
    one = back.collect()[0]
    assert one["_airbyte_emitted_at"] == int(DT.timestamp() * 1000)
    import re as _re
    assert _re.fullmatch(
        r"[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}",
        one["_airbyte_ab_id"],
    )


def test_wire_root_level_flattening_sorted_headers(spark, tmp_path):
    """RootLevelFlatteningSheetGenerator.java:24-35 — ab columns first,
    then record fields in SORTED header order."""
    cfg = FilesDestinationConfig(
        root=str(tmp_path), format="csv", flattening="root_level"
    )
    dest = FilesDestination(spark, cfg)
    df = _df(spark, 2).select("name", "pk")  # deliberately unsorted
    paths = dest.write(df.coalesce(1), "pages", "ns", sync_dt=DT)
    with open(os.path.join(str(tmp_path), paths[0])) as f:
        header = f.readline().strip()
    assert header == "_airbyte_ab_id,_airbyte_emitted_at,name,pk"


def test_wire_replay_is_byte_identical(spark, tmp_path):
    """Deterministic ab_id + pinned emitted_at: re-running the same
    sync produces byte-identical objects (replayability invariant)."""
    cfg = FilesDestinationConfig(root=str(tmp_path), format="jsonl", flattening="no")
    dest = FilesDestination(spark, cfg)
    p1 = dest.write(_df(spark, 4).coalesce(1), "pages", "ns", sync_dt=DT)
    p2 = dest.write(_df(spark, 4).coalesce(1), "pages", "ns", sync_dt=DT)
    b1 = open(os.path.join(str(tmp_path), p1[0]), "rb").read()
    b2 = open(os.path.join(str(tmp_path), p2[0]), "rb").read()
    assert sorted(b1.splitlines()) == sorted(b2.splitlines())


def test_check_write_probe(spark, tmp_path):
    """S3Destination.attemptWriteAndDelete parity: probe object written,
    listed, deleted; no residue; unwritable root -> FAILED."""
    cfg = FilesDestinationConfig(root=str(tmp_path / "bucket"))
    dest = FilesDestination(spark, cfg)
    assert dest.check() == {"status": "SUCCEEDED"}
    assert os.listdir(str(tmp_path / "bucket")) == []  # probe removed
    blocker = tmp_path / "blocker"
    blocker.write_text("not a dir")
    bad = FilesDestination(
        spark, FilesDestinationConfig(root=str(blocker / "sub"))
    )
    out = bad.check()
    assert out["status"] == "FAILED" and out["message"]
