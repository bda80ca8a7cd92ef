"""Raw-tier + (re)normalization lifecycle — base-normalization's
two-tier contract (JavaBaseConstants.java:19-21 raw columns;
stream_processor.py ab1->ab2->ab3->final chain, :848-898 incremental
new_data reduction) re-expressed as LakeTable raw snapshots + file-diff
incremental normalization."""

import hashlib
from datetime import datetime, timezone

import pytest
from pyspark.sql import Row, functions as F

from airbyte_integrations_spark.config import SyncConfig
from airbyte_integrations_spark.lakehouse.table import LakeTable
from airbyte_integrations_spark.normalization import (
    normalize_into,
    renormalize,
    to_raw,
    typed_from_raw,
    write_raw,
)

SCHEMA = "id string, ver bigint, score double, note string"
NORM_AT = datetime(2024, 6, 1, tzinfo=timezone.utc)


def _cfg(**kw):
    return SyncConfig(
        stream="s", primary_key=("id",), cursor_field=("ver",),
        n_buckets=4, **kw,
    )


def _batch(spark, rows, emitted=1):
    df = spark.createDataFrame(
        [Row(id=i, ver=v, score=s, note=n) for i, v, s, n in rows],
        SCHEMA,
    )
    return df.select(
        F.md5(F.concat_ws("~", "id", "ver")).alias("_airbyte_ab_id"),
        F.lit(f"2024-01-0{emitted} 00:00:00").cast("timestamp").alias(
            "_airbyte_emitted_at"
        ),
        "*",
    )


def test_raw_roundtrip_typed_values_and_hashid(spark):
    df = _batch(spark, [("a", 1, 0.5, None), ("b", 2, None, "x")])
    typed = typed_from_raw(to_raw(df), SCHEMA, "s", normalized_at=NORM_AT)
    got = {r.id: r for r in typed.collect()}
    assert got["a"].ver == 1 and got["a"].score == 0.5 and got["a"].note is None
    assert got["b"].score is None and got["b"].note == "x"
    # dbt-utils surrogate_key parity: md5 of ~-joined stringified cols
    expect = hashlib.md5(b"a~1~0.5~").hexdigest()
    assert got["a"]._airbyte_s_hashid == expect
    assert got["a"]._airbyte_normalized_at == NORM_AT.replace(tzinfo=None)


def test_write_raw_epoch_idempotent(spark, tmp_path):
    raw = LakeTable(spark, str(tmp_path / "raw"))
    df = _batch(spark, [("a", 1, 0.5, "x")])
    v1 = write_raw(raw, df, "s", epoch=1)
    assert write_raw(raw, df, "s", epoch=1) == v1  # replay is a no-op
    assert raw.read().count() == 1


def test_incremental_file_diff_reads_only_new_rows(spark, tmp_path):
    raw = LakeTable(spark, str(tmp_path / "raw"))
    final = LakeTable(spark, str(tmp_path / "final"))
    cfg = _cfg()
    write_raw(raw, _batch(spark, [("a", 1, 1.0, "x"), ("b", 1, 2.0, "y")]), "s", epoch=1)
    assert normalize_into(raw, final, cfg, SCHEMA, normalized_at=NORM_AT) is not None
    assert normalize_into(raw, final, cfg, SCHEMA) is None  # no new raw
    wm = raw.current_version()
    write_raw(raw, _batch(spark, [("a", 2, 9.0, "up"), ("c", 1, 3.0, "z")], emitted=2), "s", epoch=2)
    # the file diff exposes exactly the new batch's rows
    from airbyte_integrations_spark.normalization import _new_file_rows

    assert _new_file_rows(raw, wm, raw.current_version()).count() == 2
    normalize_into(raw, final, cfg, SCHEMA, normalized_at=NORM_AT)
    live = {r.id: r for r in final.read_live().collect()}
    assert live["a"].ver == 2 and live["a"].note == "up"
    assert set(live) == {"a", "b", "c"}


def test_renormalize_equals_incremental(spark, tmp_path):
    raw = LakeTable(spark, str(tmp_path / "raw"))
    final = LakeTable(spark, str(tmp_path / "final"))
    cfg = _cfg()
    write_raw(raw, _batch(spark, [("a", 1, 1.0, "x"), ("b", 1, 2.0, "y")]), "s", epoch=1)
    normalize_into(raw, final, cfg, SCHEMA, normalized_at=NORM_AT)
    write_raw(raw, _batch(spark, [("a", 2, 9.0, "up"), ("b", 1, 2.0, "y")], emitted=2), "s", epoch=2)
    normalize_into(raw, final, cfg, SCHEMA, normalized_at=NORM_AT)
    rebuilt = renormalize(
        spark, raw, str(tmp_path / "rebuilt"), cfg, SCHEMA, normalized_at=NORM_AT
    )
    cols = sorted(final.read_live().columns)
    a = sorted(final.read_live().select(*cols).collect())
    b = sorted(rebuilt.read_live().select(*cols).collect())
    assert a == b
    # and the rebuilt table continues incrementally from the raw head
    assert normalize_into(raw, rebuilt, cfg, SCHEMA) is None


def test_raw_rewrite_breaks_file_diff_loudly(spark, tmp_path):
    raw = LakeTable(spark, str(tmp_path / "raw"))
    final = LakeTable(spark, str(tmp_path / "final"))
    cfg = _cfg()
    write_raw(raw, _batch(spark, [("a", 1, 1.0, "x")]), "s", epoch=1, n_buckets=1)
    normalize_into(raw, final, cfg, SCHEMA, normalized_at=NORM_AT)
    write_raw(raw, _batch(spark, [("b", 1, 2.0, "y")], emitted=2), "s", epoch=2)
    raw.compact(max_files_per_bucket=1)  # folds the bucket's 2 files into 1
    with pytest.raises(ValueError, match="append-only raw tier"):
        normalize_into(raw, final, cfg, SCHEMA)


def test_renormalize_refuses_existing_target(spark, tmp_path):
    raw = LakeTable(spark, str(tmp_path / "raw"))
    write_raw(raw, _batch(spark, [("a", 1, 1.0, "x")]), "s", epoch=1)
    renormalize(spark, raw, str(tmp_path / "f"), _cfg(), SCHEMA, normalized_at=NORM_AT)
    with pytest.raises(ValueError, match="already exists"):
        renormalize(spark, raw, str(tmp_path / "f"), _cfg(), SCHEMA)
