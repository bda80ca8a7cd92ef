"""Dead-letter queue: replicate(quarantine=...) routes schema-invalid
rows to <stream>__rejected with the violation messages attached, and
only valid rows reach (and are committed at) the destination."""

import pytest
from pyspark.sql import functions as F

from airbyte_integrations_spark.replication import (
    ERRORS_COL,
    REJECTED_SUFFIX,
    ReplicationStream,
    replicate,
)


class Capture:
    def __init__(self):
        self.frames = {}

    def write(self, df, stream, **kw):
        self.frames[stream] = df.toPandas()


@pytest.fixture()
def mixed(spark):
    # "age" declared long; two rows carry non-numeric strings
    return spark.createDataFrame(
        [("a", "30"), ("b", "not-a-number"), ("c", "44"), ("d", "NaN?")],
        "id string, age string",
    )


def test_dlq_splits_valid_and_rejected(spark, mixed):
    dest, dlq = Capture(), Capture()
    summary = replicate(
        [ReplicationStream(stream="people", df=mixed,
                           expected_schema={"age": "long"})],
        dest, quarantine=dlq,
    )
    assert summary.status == "completed"
    st = summary.stream_stats["people"]
    assert st.records_emitted == 4
    assert st.records_quarantined == 2
    assert st.records_committed == 2
    assert sorted(dest.frames["people"]["id"]) == ["a", "c"]
    rej = dlq.frames["people" + REJECTED_SUFFIX]
    assert sorted(rej["id"]) == ["b", "d"]
    assert all(
        "age is of an incorrect type" in m for m in rej[ERRORS_COL].iloc[0]
    )
    assert summary.state["people"]["records"] == 2


def test_no_quarantine_keeps_reference_behavior(spark, mixed):
    dest = Capture()
    summary = replicate(
        [ReplicationStream(stream="people", df=mixed,
                           expected_schema={"age": "long"})],
        dest,
    )
    st = summary.stream_stats["people"]
    assert st.validation_failures == 2 and st.records_quarantined == 0
    assert st.records_committed == 4  # invalid rows flow through, counted only
    assert len(dest.frames["people"]) == 4


def test_all_valid_skips_dlq_write(spark):
    df = spark.createDataFrame([("a", "1"), ("b", "2")], "id string, age string")
    dest, dlq = Capture(), Capture()
    summary = replicate(
        [ReplicationStream(stream="s", df=df, expected_schema={"age": "long"})],
        dest, quarantine=dlq,
    )
    assert not dlq.frames  # no empty rejected table materialized
    assert summary.stream_stats["s"].records_committed == 2


def test_missing_field_rejects_whole_stream(spark):
    df = spark.createDataFrame([("a",), ("b",)], "id string")
    dest, dlq = Capture(), Capture()
    summary = replicate(
        [ReplicationStream(stream="s", df=df, expected_schema={"age": "long"})],
        dest, quarantine=dlq,
    )
    st = summary.stream_stats["s"]
    assert st.records_quarantined == 2 and st.records_committed == 0
    assert len(dlq.frames["s" + REJECTED_SUFFIX]) == 2
    assert len(dest.frames["s"]) == 0
