"""Replication worker (DefaultReplicationWorker analogue).

Pins: per-stream emitted/committed counts with committed == emitted on
success (:197-228), the capped schema-validation messages (:313-330 +
RecordSchemaValidator.java:46-81), the mapper hook (:334), the
partial-success state on destination failure (:265-280), and resume
from that state.
"""

import pytest
from pyspark.sql import functions as F

from airbyte_integrations_spark.replication import (
    MAX_VALIDATION_MESSAGES,
    ReplicationStream,
    replicate,
    validation_errors_col,
)


DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture()
def derby_db(spark, tmp_path):
    db = str(tmp_path / "repdb")
    jvm = spark._jvm
    jvm.java.lang.Class.forName(DERBY_DRIVER)
    jvm.java.sql.DriverManager.getConnection(f"jdbc:derby:{db};create=true").close()
    return f"jdbc:derby:{db}"


class MemoryDestination:
    """Synchronous destination double: records writes, can fail once."""

    def __init__(self, fail_streams=()):
        self.written = {}
        self.fail_streams = set(fail_streams)

    def write(self, df, stream, **kwargs):
        if stream in self.fail_streams:
            raise RuntimeError("boom")
        self.written[stream] = (df.count(), kwargs)


def _df(spark, n=5):
    return spark.range(n).select(
        F.col("id").alias("pk"), F.concat(F.lit("v"), F.col("id")).alias("name")
    )


def test_completed_sync_counts_and_state(spark):
    dest = MemoryDestination()
    streams = [
        ReplicationStream("a", _df(spark, 5), {"pk": "long", "name": "string"}),
        ReplicationStream("b", _df(spark, 3), destination_args={"mode": "append"}),
    ]
    out = replicate(streams, dest)
    assert out.status == "completed"
    assert out.stream_stats["a"].records_emitted == 5
    assert out.stream_stats["a"].records_committed == 5  # committed=emitted
    assert out.stream_stats["a"].bytes_emitted > 0
    assert out.stream_stats["a"].validation_failures == 0
    assert dest.written["b"][1] == {"mode": "append"}
    assert out.state == {
        "a": {"committed": True, "records": 5},
        "b": {"committed": True, "records": 3},
    }
    assert out.records_emitted == 8 and out.records_committed == 8


def test_validation_messages_capped_and_shaped(spark):
    # 'name' declared long but holds v0..v24 -> every row invalid with
    # one shared message; 'pk' is fine. Cap stays at 10 distinct.
    df = spark.range(25).select(
        F.col("id").alias("pk"),
        F.concat(F.lit("v"), F.col("id")).alias("name"),
    )
    dest = MemoryDestination()
    out = replicate(
        [ReplicationStream("s", df, {"name": "long", "missing_col": "string"})],
        dest,
    )
    st = out.stream_stats["s"]
    assert st.validation_failures == 25
    assert len(st.validation_messages) <= MAX_VALIDATION_MESSAGES
    assert "name is of an incorrect type. Expected it to be long" in st.validation_messages
    assert "missing_col is missing" in st.validation_messages
    # invalid records are STILL delivered (the reference logs and pumps)
    assert dest.written["s"][0] == 25


def test_many_distinct_messages_cap(spark):
    # 15 typed columns all violated -> more distinct messages than cap
    cols = [F.concat(F.lit("x"), F.col("id")).alias(f"c{i:02d}") for i in range(15)]
    df = spark.range(4).select(F.col("id").alias("pk"), *cols)
    expected = {f"c{i:02d}": "long" for i in range(15)}
    out = replicate([ReplicationStream("s", df, expected)], MemoryDestination())
    assert len(out.stream_stats["s"].validation_messages) == MAX_VALIDATION_MESSAGES


def test_mapper_runs_between_source_and_destination(spark):
    seen = {}

    class CaptureDest(MemoryDestination):
        def write(self, df, stream, **kwargs):
            seen[stream] = df.columns
            super().write(df, stream, **kwargs)

    out = replicate(
        [ReplicationStream("s", _df(spark, 2))],
        CaptureDest(),
        mapper=lambda df: df.withColumnRenamed("name", "mapped_name"),
    )
    assert out.status == "completed"
    assert seen["s"] == ["pk", "mapped_name"]


def test_partial_failure_state_then_resume(spark):
    streams = [
        ReplicationStream("ok1", _df(spark, 4)),
        ReplicationStream("bad", _df(spark, 2)),
        ReplicationStream("never", _df(spark, 9)),
    ]
    dest = MemoryDestination(fail_streams={"bad"})
    out = replicate(streams, dest)
    assert out.status == "failed" and "bad" in out.failure
    assert out.stream_stats["ok1"].records_committed == 4
    assert out.stream_stats["bad"].records_committed is None
    assert "never" not in out.stream_stats  # loop stopped at the failure
    assert out.state == {"ok1": {"committed": True, "records": 4}}

    # next attempt with the partial state: ok1 skipped, bad+never sync
    dest2 = MemoryDestination()
    out2 = replicate(streams, dest2, state=out.state)
    assert out2.status == "completed"
    assert "ok1" not in dest2.written  # resumed past it
    assert dest2.written["bad"][0] == 2 and dest2.written["never"][0] == 9
    assert out2.stream_stats["ok1"].records_committed == 4  # carried


def test_validation_errors_col_null_values_pass(spark):
    # NULL is not a type violation (reference validates types, nulls
    # flow through as nullable fields)
    df = spark.createDataFrame([(1, None), (2, "x")], "pk long, name string")
    err = validation_errors_col(df, {"name": "string", "pk": "long"})
    assert df.filter(F.size(err) > 0).count() == 0


def test_jdbc_destination_end_to_end(spark, derby_db):
    """The pump drives the real JDBC destination live on Derby."""
    from airbyte_integrations_spark.destinations.jdbc import (
        JdbcDestination, JdbcDestinationConfig,
    )

    class JdbcAdapter:
        def __init__(self, inner):
            self.inner = inner

        def write(self, df, stream, **kwargs):
            self.inner.write(df, stream, **kwargs)

    dest = JdbcAdapter(
        JdbcDestination(
            spark, JdbcDestinationConfig(url=derby_db, driver=DERBY_DRIVER)
        )
    )
    out = replicate(
        [
            ReplicationStream(
                "rep_pump",
                _df(spark, 6),
                {"pk": "long", "name": "string"},
                destination_args={
                    "mode": "overwrite",
                    "create_table_column_types": "name VARCHAR(50)",
                },
            )
        ],
        dest,
    )
    assert out.status == "completed"
    back = spark.read.format("jdbc").options(
        url=derby_db, dbtable="rep_pump", driver=DERBY_DRIVER,
    ).load()
    assert back.count() == 6


# ------------------------------------------------- namespacing mapper


def test_namespacing_mapper_rules():
    """NamespacingMapperTest.java case matrix: SOURCE passthrough,
    DESTINATION nulls, CUSTOMFORMAT substitution (variable + literal +
    empty-source fallback), stream prefix."""
    from airbyte_integrations_spark.mappers import NamespacingMapper

    src = NamespacingMapper(namespace_definition="source", stream_prefix="out_")
    assert src.map_address("ns", "s") == ("ns", "out_s")
    assert src.map_address(None, "s") == (None, "out_s")  # testEmptySourceNamespace

    dst = NamespacingMapper(namespace_definition="destination")
    assert dst.map_address("ns", "s") == (None, "s")

    cf = NamespacingMapper("customformat", "${SOURCE_NAMESPACE}_suffix")
    assert cf.map_namespace("ns") == "ns_suffix"
    lit = NamespacingMapper("customformat", "hardcoded")
    assert lit.map_namespace("ns") == "hardcoded"  # testCustomFormatWithoutVariable
    # testEmptyCustomFormatWithVariableNamespace: "${SOURCE_NAMESPACE}"
    # over a null source namespace collapses to null
    empty = NamespacingMapper("customformat", "${SOURCE_NAMESPACE}")
    assert empty.map_namespace(None) is None
    blank = NamespacingMapper("customformat", "  ")
    assert blank.map_namespace("ns") is None  # blank format -> destination default

    with pytest.raises(ValueError):
        NamespacingMapper(namespace_definition="bogus")


def test_replicate_applies_namespacing(spark):
    """The mapper sits ahead of the destination AND its state listener
    (NamespacingMapper.java:63-78): writes, stats, and resume state are
    all keyed by the mapped address."""
    from airbyte_integrations_spark.mappers import NamespacingMapper

    dest = MemoryDestination()
    streams = [
        ReplicationStream(
            "pages", _df(spark, 4), destination_args={"namespace": "srcns"}
        )
    ]
    ns = NamespacingMapper("customformat", "${SOURCE_NAMESPACE}_x", "pre_")
    out = replicate(streams, dest, namespacing=ns)
    assert out.status == "completed"
    assert set(dest.written) == {"pre_pages"}
    n, kwargs = dest.written["pre_pages"]
    assert n == 4 and kwargs["namespace"] == "srcns_x"
    assert out.state["pre_pages"]["committed"]
    # resume with the same mapper skips the committed mapped stream
    dest2 = MemoryDestination()
    out2 = replicate(streams, dest2, namespacing=ns, state=out.state)
    assert dest2.written == {}
    assert out2.stream_stats["pre_pages"].records_committed == 4
