"""Replay of the reference's own normalization test streams
(integration_tests/resources/test_simple_streams/data_input/messages.txt
and messages_incremental.txt), asserting the reference's row-count
oracles (simple_streams_{first,second}_run_row_counts.sql) —
FIXTURES.md F3.1 / F3.2.

Records are re-encoded by hand from the reference JSONL fixtures; the
cursor for these streams is numeric-epoch `_ab_cdc_updated_at` /
`_ab_cdc_lsn` per catalog.json:142.
"""

from pyspark.sql import functions as F

from airbyte_integrations_spark.operators.dedup import winner_window
from airbyte_integrations_spark.operators.scd import final_from_scd, scd2

SCHEMA = (
    "id int, name string, _ab_cdc_updated_at long, _ab_cdc_lsn long, "
    "_ab_cdc_deleted_at long, _airbyte_emitted_at long, _airbyte_ab_id string"
)

# messages.txt dedup_cdc_excluded (8 records)
RUN1 = [
    (1, "mazda", 1623849130530, 26971624, None, 1623859926, "ab01"),
    (2, "toyata", 1623849130549, 26971624, None, 1623859926, "ab02"),
    (4, "bmw", 1623849314535, 26974776, None, 1623860160, "ab03"),
    (5, "vw", 1623849314663, 26975264, None, 1623860160, "ab04"),
    (4, None, 1623849314791, 26975440, 1623849314791, 1623860160, "ab05"),
    (6, "opel", 1623850868109, 27009440, None, 1623861660, "ab06"),
    (7, "lotus", 1623850868237, 27010048, None, 1623861660, "ab07"),
    (6, None, 1623850868371, 27010232, 1623850868371, 1623861660, "ab08"),
]
# messages_incremental.txt dedup_cdc_excluded (2 records; first is an
# exact logical dup of run-1's id 5)
RUN2 = [
    (5, "vw", 1623849314663, 26975264, None, 1623860160, "ab04"),
    (5, None, 1623900000000, 28010252, 1623900000000, 1623900000000, "ab09"),
]

POS_SCHEMA = SCHEMA + ", _ab_cdc_log_pos long"
POS_RUN1 = [
    (1, "mazda", 1623849130530, 26971624, None, 1623859926, "pb01", 33274),
    (2, "toyata", 1623849130549, 26971624, None, 1623859926, "pb02", 33275),
    (2, "bmw", 1623849314535, 26974776, None, 1623860160, "pb03", 33278),
    (3, None, 1623849314791, 26975440, 1623849314791, 1623860160, "pb04", 33274),
    (4, "lotus", 1623850868237, 27010048, None, 1623861660, "pb05", 33271),
    (4, None, 1623850868371, 27010232, 1623850868371, 1623861660, "pb06", 33279),
    (5, "lotus", 1623850868371, 27010048, None, 1623861660, "pb07", 33280),
    (5, "lily", 1623850868371, 27010232, None, 1623861660, "pb08", 33281),
]


def _scd_kwargs():
    return dict(
        key=("id",),
        cursor="_ab_cdc_lsn",
        secondary=("_ab_cdc_updated_at", "_airbyte_emitted_at"),
    )


def test_dedup_cdc_excluded_first_run(spark):
    df = spark.createDataFrame(RUN1, SCHEMA)
    scd = scd2(df, **_scd_kwargs())
    assert scd.count() == 8  # raw 8 -> scd 8
    final = final_from_scd(scd)
    assert final.count() == 4  # oracle: final 4
    assert {r["id"] for r in final.collect()} == {1, 2, 5, 7}


def test_dedup_cdc_excluded_cumulative_and_replay(spark):
    """Reference quirk pinned (FIXTURES.md F3.1 / SURVEY §2.8 caveat):
    cumulative scd = 9 (the re-emitted id-5 row collapses onto the same
    _airbyte_unique_key_scd); the reference's incremental final stays 4
    (stale tombstoned row never touched), while a full replay — and our
    MERGE engine, per the north rule — yields 3."""
    both = spark.createDataFrame(RUN1 + RUN2, SCHEMA)
    scd = scd2(both, **_scd_kwargs())
    assert scd.count() == 9  # 10 raw events, 1 exact dup collapsed
    final = final_from_scd(scd)
    assert final.count() == 3  # full-replay truth
    assert {r["id"] for r in final.collect()} == {1, 2, 7}

    # the engine's latest-wins view agrees with the replay
    w = winner_window(
        both, ("id",), "_ab_cdc_lsn",
        ("_ab_cdc_updated_at", "_airbyte_emitted_at"),
        drop_tombstones=True,
    )
    assert {r["id"] for r in w.collect()} == {1, 2, 7}


def test_pos_dedup_cdcx_log_pos_tiebreak(spark):
    """F3.2: cursor [] => default cursor chain _ab_cdc_updated_at then
    _ab_cdc_log_pos (stream_processor.py:961-968, 749-754); id 5 has two
    events with EQUAL updated_at and out-of-order lsn — log_pos breaks
    the tie and 'lily' wins."""
    df = spark.createDataFrame(POS_RUN1, POS_SCHEMA)
    scd = scd2(
        df,
        key=("id",),
        cursor="_ab_cdc_updated_at",
        secondary=("_ab_cdc_log_pos", "_airbyte_emitted_at"),
    )
    assert scd.count() == 8
    final = final_from_scd(scd)
    assert final.count() == 3
    got = {r["id"]: r["name"] for r in final.collect()}
    assert got == {1: "mazda", 2: "bmw", 5: "lily"}


def test_scd_validity_intervals(spark):
    """_airbyte_start_at/_airbyte_end_at chain: end_at of version k ==
    start_at (cursor) of version k+1; active row has end_at NULL."""
    df = spark.createDataFrame(RUN1, SCHEMA)
    scd = scd2(df, **_scd_kwargs())
    for r in scd.filter(F.col("_airbyte_active_row") == 1).collect():
        assert r["_airbyte_end_at"] is None
    id4 = {r["_ab_cdc_lsn"]: r for r in scd.filter(F.col("id") == 4).collect()}
    assert id4[26974776]["_airbyte_end_at"] == 26975440  # closed by the delete
