"""Snapshot-isolation crash safety + property-based winner-rule checks."""

import datetime as dt

from hypothesis import given, settings, strategies as st

from airbyte_integrations_spark.lakehouse.merge import merge_into
from airbyte_integrations_spark.lakehouse.table import LakeTable
from airbyte_integrations_spark.operators.dedup import winner_agg, winner_join, winner_window

SCHEMA = (
    "url string, _ab_cdc_lsn long, _ab_cdc_updated_at timestamp, "
    "_ab_cdc_deleted_at timestamp, _airbyte_ab_id string, _airbyte_emitted_at timestamp"
)
TS = dt.datetime(2021, 6, 1)


def test_crash_between_data_write_and_commit_is_invisible(spark, tmp_path):
    """A writer that dies after writing data files but before the
    VERSION swap leaves the table state unchanged (orphan files only)."""
    t = LakeTable(spark, str(tmp_path / "t"))
    merge_into(t, spark.createDataFrame([("u", 1, TS, None, "a", TS)], SCHEMA), epoch=1)
    v = t.current_version()
    before = t.read().collect()
    # simulate the crash: data files written, no commit
    df = spark.createDataFrame([("u", 2, TS, None, "b", TS)], SCHEMA)
    t._write_files(df, t.n_buckets, t.key_cols())  # "crashed" writer
    assert t.current_version() == v
    assert t.read().collect() == before
    # a later successful merge is unaffected
    merge_into(t, df, epoch=2)
    assert t.read().collect()[0]["_ab_cdc_lsn"] == 2


@st.composite
def event_sets(draw):
    n = draw(st.integers(2, 24))
    events = []
    for i in range(n):
        events.append(
            (
                f"u{draw(st.integers(0, 4))}",
                draw(st.one_of(st.none(), st.integers(0, 5))),  # lsn with ties/nulls
                TS + dt.timedelta(seconds=draw(st.integers(0, 3))),
                TS if draw(st.booleans()) and i % 3 == 0 else None,  # tombstones
                f"ab{i:02d}",
                TS + dt.timedelta(seconds=draw(st.integers(0, 3))),
            )
        )
    return events


@given(event_sets())
@settings(max_examples=12, deadline=None)
def test_winner_implementations_agree_on_adversarial_ties(spark, events):
    """Random lsn ties, null cursors, equal timestamps, tombstones:
    all scalable implementations must equal the window truth."""
    df = spark.createDataFrame(events, SCHEMA)
    want = {
        (r["url"], r["_airbyte_ab_id"])
        for r in winner_window(df, drop_tombstones=True).collect()
    }
    for impl in (winner_agg, winner_join):
        got = {
            (r["url"], r["_airbyte_ab_id"])
            for r in impl(df, drop_tombstones=True).collect()
        }
        assert got == want, impl.__name__


def test_keep_tombstones_prevents_resurrection(spark, tmp_path):
    """With keep_tombstones=True, a NON-monotone redelivery of a
    pre-delete image (lsn 5 arriving after the delete at lsn 10 was
    applied) cannot resurrect the key — the retained tombstone row wins
    the merge; read_live() hides it."""
    t = LakeTable(spark, str(tmp_path / "t"))
    ins = spark.createDataFrame([("u", 1, TS, None, "a", TS)], SCHEMA)
    merge_into(t, ins, epoch=1, keep_tombstones=True)
    dele = spark.createDataFrame([("u", 10, TS, TS, "b", TS)], SCHEMA)
    merge_into(t, dele, epoch=2, keep_tombstones=True)
    assert t.read().count() == 1  # tombstone retained physically
    assert t.read_live().count() == 0
    stale = spark.createDataFrame([("u", 5, TS, None, "c", TS)], SCHEMA)
    merge_into(t, stale, epoch=3, keep_tombstones=True)
    rows = t.read().collect()
    assert len(rows) == 1 and rows[0]["_ab_cdc_lsn"] == 10  # delete still wins
    assert t.read_live().count() == 0


def test_default_mode_monotone_epochs_unaffected(spark, tmp_path):
    """Default (drop) mode keeps the lean table: tombstoned keys are
    physically absent and read_live == read."""
    t = LakeTable(spark, str(tmp_path / "t"))
    merge_into(t, spark.createDataFrame([("u", 1, TS, None, "a", TS)], SCHEMA), epoch=1)
    merge_into(t, spark.createDataFrame([("u", 10, TS, TS, "b", TS)], SCHEMA), epoch=2)
    assert t.read().count() == 0
    assert t.read_live().count() == 0
