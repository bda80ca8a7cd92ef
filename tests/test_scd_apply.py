"""Incremental SCD history table: reference run1/run2 shape (scd 8 ->
cumulative 9), end-dating of superseded active rows, idempotent
re-apply, equivalence with a from-scratch scd2 over all events."""

from pyspark.sql import functions as F

from airbyte_integrations_spark.lakehouse.scd_apply import apply_scd_batch, final_view
from airbyte_integrations_spark.lakehouse.table import LakeTable
from airbyte_integrations_spark.operators.scd import scd2
from tests.test_reference_fixtures import RUN1, RUN2, SCHEMA
from tests.util import assert_frames_equal


def _kwargs():
    return dict(
        key=("id",),
        cursor="_ab_cdc_lsn",
        secondary=("_ab_cdc_updated_at", "_airbyte_emitted_at"),
    )


def test_incremental_scd_reproduces_reference_counts(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "scd"))
    apply_scd_batch(t, spark.createDataFrame(RUN1, SCHEMA), stream="s", epoch=1, **_kwargs())
    assert t.read().count() == 8  # run 1: scd 8
    assert final_view(t).count() == 4  # final 4 (ids 1,2,5,7)

    apply_scd_batch(t, spark.createDataFrame(RUN2, SCHEMA), stream="s", epoch=2, **_kwargs())
    scd = t.read()
    assert scd.count() == 9  # run 2 oracle: scd 9 cumulative (dup collapsed)
    # id 5's original active row is now end-dated + inactive
    id5 = {r["_ab_cdc_lsn"]: r for r in scd.filter("id = 5").collect()}
    assert id5[26975264]["_airbyte_active_row"] == 0
    assert id5[26975264]["_airbyte_end_at"] == 28010252
    assert id5[28010252]["_airbyte_active_row"] == 0  # tombstone never active
    # active view: {1,2,7} (full-replay truth; the reference FINAL
    # table's stale-row quirk is pinned in test_reference_fixtures)
    assert {r["id"] for r in final_view(t).collect()} == {1, 2, 7}


def test_incremental_equals_from_scratch(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "scd"))
    apply_scd_batch(t, spark.createDataFrame(RUN1, SCHEMA), stream="s", epoch=1, **_kwargs())
    apply_scd_batch(t, spark.createDataFrame(RUN2, SCHEMA), stream="s", epoch=2, **_kwargs())
    got = t.read().toPandas()

    want = scd2(spark.createDataFrame(RUN1 + RUN2, SCHEMA), **_kwargs()).toPandas()
    assert_frames_equal(got, want, sort_cols=("_airbyte_unique_key_scd",))


def test_scd_apply_idempotent(spark, tmp_path):
    t = LakeTable(spark, str(tmp_path / "scd"))
    apply_scd_batch(t, spark.createDataFrame(RUN1, SCHEMA), stream="s", epoch=1, **_kwargs())
    v = t.current_version()
    before = t.read().toPandas()
    # same epoch re-delivered: no-op
    apply_scd_batch(t, spark.createDataFrame(RUN1, SCHEMA), stream="s", epoch=1, **_kwargs())
    assert t.current_version() == v
    # same DATA as a new epoch (at-least-once overlap): content-keyed
    # delete+insert keeps the table identical
    apply_scd_batch(t, spark.createDataFrame(RUN1, SCHEMA), stream="s", epoch=99, **_kwargs())
    assert_frames_equal(t.read().toPandas(), before, sort_cols=("_airbyte_unique_key_scd",))
