"""Airbyte wire-format replay: JSONL envelope -> typed records -> SCD,
reproducing the reference row-count oracles end-to-end from the wire."""

import json

from pyspark.sql import types as T

from airbyte_integrations_spark.operators.scd import final_from_scd, scd2
from airbyte_integrations_spark.sources.airbyte_wire import (
    read_messages,
    records_for_stream,
)

MSGS = [
    {"type": "RECORD", "record": {"stream": "dedup_cdc_excluded", "data": {"id": 1, "name": "mazda", "_ab_cdc_updated_at": 1623849130530, "_ab_cdc_lsn": 26971624, "_ab_cdc_deleted_at": None}, "emitted_at": 1623859926}},
    {"type": "RECORD", "record": {"stream": "dedup_cdc_excluded", "data": {"id": 2, "name": "toyata", "_ab_cdc_updated_at": 1623849130549, "_ab_cdc_lsn": 26971624, "_ab_cdc_deleted_at": None}, "emitted_at": 1623859926}},
    {"type": "RECORD", "record": {"stream": "dedup_cdc_excluded", "data": {"id": 4, "name": "bmw", "_ab_cdc_updated_at": 1623849314535, "_ab_cdc_lsn": 26974776, "_ab_cdc_deleted_at": None}, "emitted_at": 1623860160}},
    {"type": "RECORD", "record": {"stream": "dedup_cdc_excluded", "data": {"id": 5, "name": "vw", "_ab_cdc_updated_at": 1623849314663, "_ab_cdc_lsn": 26975264, "_ab_cdc_deleted_at": None}, "emitted_at": 1623860160}},
    {"type": "RECORD", "record": {"stream": "dedup_cdc_excluded", "data": {"id": 4, "name": None, "_ab_cdc_updated_at": 1623849314791, "_ab_cdc_lsn": 26975440, "_ab_cdc_deleted_at": 1623849314791}, "emitted_at": 1623860160}},
    {"type": "RECORD", "record": {"stream": "dedup_cdc_excluded", "data": {"id": 6, "name": "opel", "_ab_cdc_updated_at": 1623850868109, "_ab_cdc_lsn": 27009440, "_ab_cdc_deleted_at": None}, "emitted_at": 1623861660}},
    {"type": "RECORD", "record": {"stream": "dedup_cdc_excluded", "data": {"id": 7, "name": "lotus", "_ab_cdc_updated_at": 1623850868237, "_ab_cdc_lsn": 27010048, "_ab_cdc_deleted_at": None}, "emitted_at": 1623861660}},
    {"type": "RECORD", "record": {"stream": "dedup_cdc_excluded", "data": {"id": 6, "name": None, "_ab_cdc_updated_at": 1623850868371, "_ab_cdc_lsn": 27010232, "_ab_cdc_deleted_at": 1623850868371}, "emitted_at": 1623861660}},
    {"type": "RECORD", "record": {"stream": "other_stream", "data": {"id": 9}, "emitted_at": 1623861661}},
    {"type": "STATE", "state": {"data": {"cdc": {"lsn": 27010232}}}},
]

SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("name", T.StringType()),
        T.StructField("_ab_cdc_updated_at", T.LongType()),
        T.StructField("_ab_cdc_lsn", T.LongType()),
        T.StructField("_ab_cdc_deleted_at", T.LongType()),
    ]
)


def _write(tmp_path):
    p = tmp_path / "messages.jsonl"
    p.write_text("\n".join(json.dumps(m) for m in MSGS) + "\n\n")
    return str(p)


def test_envelope_parsing(spark, tmp_path):
    msgs = read_messages(spark, _write(tmp_path))
    assert msgs.count() == 10
    assert msgs.filter("type = 'RECORD'").count() == 9
    assert msgs.filter("type = 'STATE'").count() == 1
    # raw data blob preserved verbatim for the landing table
    assert msgs.filter("type = 'RECORD' AND _airbyte_data IS NULL").count() == 0


def test_wire_to_final_counts(spark, tmp_path):
    msgs = read_messages(spark, _write(tmp_path))
    recs = records_for_stream(msgs, "dedup_cdc_excluded", SCHEMA)
    assert recs.count() == 8
    scd = scd2(
        recs,
        key=("id",),
        cursor="_ab_cdc_lsn",
        secondary=("_ab_cdc_updated_at", "_airbyte_emitted_at"),
    )
    assert scd.count() == 8
    final = final_from_scd(scd)
    assert {r["id"] for r in final.collect()} == {1, 2, 5, 7}


def test_write_messages_roundtrip(spark, tmp_path):
    """Wire EMIT (the source-side protocol surface,
    abstract_source.py:288) roundtrips through the wire READER: records
    come back value-identical under the stream schema, explicit nulls
    survive, and the trailing STATE is the latest_state."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from airbyte_integrations_spark.sources.airbyte_wire import (
        latest_state,
        read_messages,
        records_for_stream,
        write_messages,
    )

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.DoubleType()),
        ]
    )
    df = spark.createDataFrame(
        [(1, "a", 0.5), (2, None, 2.25), (3, "c", None)], schema
    )
    out = str(tmp_path / "wire")
    write_messages(
        df,
        out,
        stream="things",
        emitted_at_millis=1_600_000_000_000,
        state={"things": {"cursor": 3}},
    )
    msgs = read_messages(spark, out)
    assert msgs.filter(F.col("type") == "RECORD").count() == 3
    back = records_for_stream(msgs, "things", schema)
    got = sorted(
        (r.id, r.name, r.score) for r in back.collect()
    )
    assert got == [(1, "a", 0.5), (2, None, 2.25), (3, "c", None)]
    ts = {r[0] for r in back.select("_airbyte_emitted_at").collect()}
    assert len(ts) == 1  # pinned clock
    import json as _json

    st = _json.loads(latest_state(msgs))
    assert st == {"things": {"cursor": 3}}


def test_write_messages_emitted_at_col_and_serialization_plan(spark, tmp_path):
    """emitted_at from a timestamp column (epoch-millis on the wire),
    and the envelope build is pure Catalyst (to_json over structs — no
    Python in the write plan)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from airbyte_integrations_spark.sources.airbyte_wire import (
        read_messages,
        write_messages,
    )

    df = spark.range(5).select(
        F.col("id"),
        F.timestamp_millis(
            F.lit(1_700_000_000_000) + F.col("id")
        ).alias("at"),
    )
    # plan check on the serialized projection
    msg_df = df.select(
        F.to_json(
            F.struct(F.lit("RECORD").alias("type")), {}
        ).alias("v")
    )
    plan = msg_df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan

    out = str(tmp_path / "wire2")
    write_messages(df, out, stream="s", emitted_at_col="at")
    msgs = read_messages(spark, out)
    at = sorted(
        r[0].timestamp() for r in msgs.select("_airbyte_emitted_at").collect()
    )
    assert at[0] == 1_700_000_000.0 and at[-1] == 1_700_000_000.004
    # emitted_at_col is excluded from data
    import json as _json

    one = _json.loads(msgs.select("_airbyte_data").first()[0])
    assert set(one) == {"id"}


def test_stream_status_trace_lifecycle(spark, tmp_path):
    """STREAM_STATUS TRACE bracket (protocol stream status lifecycle):
    STARTED precedes the records, COMPLETE follows state; the reader
    surfaces both in file/line order, and per-stream filters see TRACE
    messages under their descriptor's stream name."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from airbyte_integrations_spark.sources.airbyte_wire import (
        latest_state,
        read_messages,
        records_for_stream,
        stream_statuses,
        write_messages,
    )

    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("name", T.StringType())]
    )
    df = spark.createDataFrame([(1, "a"), (2, "b")], schema)
    out = str(tmp_path / "wire")
    write_messages(
        df,
        out,
        stream="things",
        emitted_at_millis=1_600_000_000_000,
        state={"things": {"cursor": 2}},
        stream_status=True,
    )
    msgs = read_messages(spark, out)
    assert msgs.filter(F.col("type") == "RECORD").count() == 2
    st = stream_statuses(msgs).collect()
    assert [(r.stream, r.status) for r in st] == [
        ("things", "STARTED"),
        ("things", "COMPLETE"),
    ]
    # records still parse; state still last
    back = records_for_stream(msgs, "things", schema)
    assert back.count() == 2
    import json

    assert json.loads(latest_state(msgs)) == {"things": {"cursor": 2}}


def test_stream_status_incomplete_on_write_failure(spark, tmp_path):
    """A failed record write leaves an INCOMPLETE status (then
    re-raises) so the consumer can distinguish crash from empty."""
    import pytest
    from pyspark.sql import types as T

    from airbyte_integrations_spark.sources.airbyte_wire import (
        read_messages,
        stream_statuses,
        write_messages,
    )

    schema = T.StructType([T.StructField("id", T.LongType())])
    # a df whose evaluation fails on the executor
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def die(s: pd.Series) -> pd.Series:
        raise RuntimeError("synthetic failure")

    df = spark.createDataFrame([(1,), (0,)], schema).withColumn("id", die("id"))
    out = str(tmp_path / "wire_fail")
    with pytest.raises(Exception):
        write_messages(df, out, stream="things", stream_status=True)
    msgs = read_messages(spark, out)
    st = [(r.stream, r.status) for r in stream_statuses(msgs).collect()]
    assert st == [("things", "STARTED"), ("things", "INCOMPLETE")]


def test_error_trace_on_write_failure(spark, tmp_path):
    """The INCOMPLETE status is accompanied by an ERROR trace carrying
    the AirbyteErrorTraceMessage fields (airbyte_protocol.yaml:136-173;
    emitSystemErrorTrace semantics)."""
    import pandas as pd
    import pytest
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    from airbyte_integrations_spark.sources.airbyte_wire import (
        error_traces,
        read_messages,
        write_messages,
    )

    @pandas_udf("long")
    def die(s: pd.Series) -> pd.Series:
        raise RuntimeError("boom-internal")

    df = spark.createDataFrame(
        [(1,)], T.StructType([T.StructField("id", T.LongType())])
    ).withColumn("id", die("id"))
    out = str(tmp_path / "wire_err")
    with pytest.raises(Exception):
        write_messages(df, out, stream="things", stream_status=True)
    errs = error_traces(read_messages(spark, out)).collect()
    assert len(errs) == 1
    assert errs[0].failure_type == "system_error"
    assert "things" in errs[0].message
    assert "boom-internal" in errs[0].internal_message


def test_stream_status_overwrite_keeps_started_trace(spark, tmp_path):
    """mode=overwrite with stream_status: the directory is cleared by
    the writer itself BEFORE the STARTED trace, so the lifecycle
    survives (Spark's own overwrite would delete the trace file)."""
    from pyspark.sql import types as T

    from airbyte_integrations_spark.sources.airbyte_wire import (
        read_messages,
        stream_statuses,
        write_messages,
    )

    schema = T.StructType([T.StructField("id", T.LongType())])
    out = str(tmp_path / "wire_ow")
    for batch in ([(1,), (2,)], [(3,)]):
        write_messages(
            spark.createDataFrame(batch, schema),
            out,
            stream="things",
            stream_status=True,
            mode="overwrite",
        )
    msgs = read_messages(spark, out)
    # only the second batch's records remain; lifecycle complete
    assert msgs.filter("type = 'RECORD'").count() == 1
    st = [(r.stream, r.status) for r in stream_statuses(msgs).collect()]
    assert st == [("things", "STARTED"), ("things", "COMPLETE")]


def test_infer_record_schema_by_sampling(spark, tmp_path):
    """Schemaless-store discover (MongoUtils.getUniqueFields contract):
    union of fields across sampled documents; a field with conflicting
    types demotes to string; nested documents become structs; the
    inferred schema round-trips through records_for_stream."""
    import json as _json

    from pyspark.sql import types as T

    from airbyte_integrations_spark.sources.airbyte_wire import (
        infer_record_schema,
        read_messages,
        records_for_stream,
    )

    docs = [
        {"id": 1, "name": "a", "meta": {"depth": 2}},
        {"id": 2, "score": 1.5},              # new field, missing name
        {"id": "three", "name": "c"},         # id conflicts: long vs str
    ]
    lines = [
        _json.dumps(
            {"type": "RECORD",
             "record": {"stream": "things", "data": d, "emitted_at": 1}}
        )
        for d in docs
    ]
    p = tmp_path / "m.jsonl"
    p.write_text("\n".join(lines) + "\n")
    msgs = read_messages(spark, str(p))
    schema = infer_record_schema(spark, msgs, "things")
    by_name = {f.name: f.dataType for f in schema.fields}
    assert isinstance(by_name["id"], T.StringType)      # conflict -> string
    assert isinstance(by_name["meta"], T.StructType)    # nested doc
    assert {"id", "name", "score", "meta"} <= set(by_name)
    back = records_for_stream(msgs, "things", schema)
    assert back.count() == 3
    assert back.filter("id = 'three'").count() == 1


def test_log_lines_in_order(spark, tmp_path):
    """LOG messages (airbyte_protocol.yaml:116-135) ride the same pipe;
    log_lines surfaces (level, message) in file/line order and records
    parse unaffected."""
    import json as _json

    from airbyte_integrations_spark.sources.airbyte_wire import log_lines

    lines = [
        {"type": "LOG", "log": {"level": "INFO", "message": "Starting syncing"}},
        {"type": "RECORD", "record": {"stream": "s",
                                      "data": {"id": 1}, "emitted_at": 0}},
        {"type": "LOG", "log": {"level": "WARN", "message": "slow page"}},
        {"type": "LOG", "log": {"level": "INFO", "message": "Finished syncing"}},
    ]
    p = tmp_path / "logs.jsonl"
    p.write_text("\n".join(_json.dumps(m) for m in lines) + "\n")
    msgs = read_messages(spark, str(p))
    got = [(r.level, r.message) for r in log_lines(msgs).collect()]
    assert got == [
        ("INFO", "Starting syncing"),
        ("WARN", "slow page"),
        ("INFO", "Finished syncing"),
    ]
    assert msgs.filter("type = 'RECORD'").count() == 1
