"""Airbyte wire-format (JSONL message envelope) source.

The reference's only transport is one `AirbyteMessage` JSON per line on
stdout (airbyte_protocol.yaml:13-49): `{"type": "RECORD", "record":
{"stream": ..., "emitted_at": epoch_millis, "data": {...}}}` plus STATE
messages carrying opaque checkpoint blobs (:71-108).

Spark-first: `spark.read.text` -> `from_json` for the envelope, then a
per-stream `from_json(data, stream_schema)` projection — all JVM-side;
the schemaless `data` blob stays a raw JSON string until a stream
schema is applied (the destination's _airbyte_data column,
JavaBaseConstants.java:19-21).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ENVELOPE = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField(
            "record",
            T.StructType(
                [
                    T.StructField("stream", T.StringType()),
                    T.StructField("namespace", T.StringType()),
                    T.StructField("emitted_at", T.LongType()),
                    # `data` is schemaless at transport time; keep raw JSON
                ]
            ),
        ),
        T.StructField("state", T.StringType()),
        # TRACE / STREAM_STATUS (airbyte_protocol.yaml AirbyteTraceMessage
        # + AirbyteStreamStatusTraceMessage): the per-stream lifecycle
        # signal the platform uses to distinguish "no records" from
        # "never ran" and to fail syncs whose streams end INCOMPLETE.
        T.StructField(
            "trace",
            T.StructType(
                [
                    T.StructField("type", T.StringType()),
                    T.StructField("emitted_at", T.LongType()),
                    # ERROR traces (airbyte_protocol.yaml:136-173
                    # AirbyteTraceMessage type=ERROR +
                    # AirbyteErrorTraceMessage)
                    T.StructField(
                        "error",
                        T.StructType(
                            [
                                T.StructField("message", T.StringType()),
                                T.StructField(
                                    "internal_message", T.StringType()
                                ),
                                T.StructField("stack_trace", T.StringType()),
                                T.StructField("failure_type", T.StringType()),
                            ]
                        ),
                    ),
                    T.StructField(
                        "stream_status",
                        T.StructType(
                            [
                                T.StructField("status", T.StringType()),
                                T.StructField(
                                    "stream_descriptor",
                                    T.StructType(
                                        [
                                            T.StructField("name", T.StringType()),
                                            T.StructField(
                                                "namespace", T.StringType()
                                            ),
                                        ]
                                    ),
                                ),
                            ]
                        ),
                    ),
                ]
            ),
        ),
        # LOG messages (airbyte_protocol.yaml:116-135 AirbyteLogMessage:
        # level FATAL/ERROR/WARN/INFO/DEBUG/TRACE + message) — the
        # reference's connector logging rides the same single pipe.
        T.StructField(
            "log",
            T.StructType(
                [
                    T.StructField("level", T.StringType()),
                    T.StructField("message", T.StringType()),
                ]
            ),
        ),
    ]
)


def read_messages(spark: SparkSession, path: str) -> DataFrame:
    """Parse a JSONL message file into the raw landing shape:
    (_airbyte_ab_id, _airbyte_emitted_at, _airbyte_data, stream, type).

    _airbyte_ab_id is a deterministic md5 of the line (the reference
    uses a random uuid, JavaBaseConstants.java:19; determinism keeps
    replays idempotent, which the uuid version only achieves via the
    content-keyed scd collapse)."""
    lines = spark.read.text(path).filter(F.length(F.trim("value")) > 0)
    env = lines.select(
        F.col("value"),
        F.from_json("value", ENVELOPE).alias("m"),
        F.get_json_object("value", "$.record.data").alias("_airbyte_data"),
        F.get_json_object("value", "$.state").alias("_state_blob"),
        # File/line order must be reconstructible: monotonically_
        # increasing_id alone encodes the PARTITION index, and Spark
        # packs splits largest-first, so across files it does not follow
        # file order. Carry the file metadata + in-file block offset;
        # _line_id then only breaks ties within one contiguous block,
        # where it does increase with line order.
        F.col("_metadata.file_modification_time").alias("_file_mtime"),
        F.col("_metadata.file_path").alias("_file"),
        F.col("_metadata.file_block_start").alias("_block_start"),
        F.monotonically_increasing_id().alias("_line_id"),
    )
    return env.select(
        F.md5("value").alias("_airbyte_ab_id"),
        F.timestamp_millis(
            F.when(
                F.col("m.record.emitted_at") < F.lit(10**11),
                F.col("m.record.emitted_at") * 1000,
            ).otherwise(F.col("m.record.emitted_at"))
        ).alias("_airbyte_emitted_at"),
        F.col("_airbyte_data"),
        # TRACE stream-status messages name their stream in the
        # descriptor, not the record envelope — coalesce so per-stream
        # filters see both message kinds
        F.coalesce(
            F.col("m.record.stream"),
            F.col("m.trace.stream_status.stream_descriptor.name"),
        ).alias("stream"),
        F.col("m.type").alias("type"),
        F.col("m.trace.stream_status.status").alias("_stream_status"),
        F.col("m.trace.error.message").alias("_error_message"),
        F.col("m.trace.error.internal_message").alias("_error_internal"),
        F.col("m.trace.error.failure_type").alias("_error_failure_type"),
        F.timestamp_millis(F.col("m.trace.emitted_at")).alias(
            "_trace_emitted_at"
        ),
        F.col("_state_blob"),
        F.col("m.log.level").alias("_log_level"),
        F.col("m.log.message").alias("_log_message"),
        F.col("_file_mtime"),
        F.col("_file"),
        F.col("_block_start"),
        F.col("_line_id"),
    )


def log_lines(messages: DataFrame) -> DataFrame:
    """LOG messages (level, message) in file/line order — the
    connector-logging half of the pipe (airbyte_protocol.yaml:116-135;
    the platform relays these to the job log, log_by_prefix parity)."""
    return (
        messages.filter(F.col("type") == "LOG")
        .orderBy("_file_mtime", "_file", "_block_start", "_line_id")
        .select(
            F.col("_log_level").alias("level"),
            F.col("_log_message").alias("message"),
        )
    )


def latest_state(messages: DataFrame) -> str | None:
    """The last STATE blob in the message stream — the checkpoint the
    platform retains (DefaultReplicationWorker.java:389-428 keeps only
    the latest committed STATE; ordering = file/line order)."""
    rows = (
        messages.filter(F.col("type") == "STATE")
        .orderBy(
            F.col("_file_mtime").desc(),
            F.col("_file").desc(),
            F.col("_block_start").desc(),
            F.col("_line_id").desc(),
        )
        .limit(1)
        .collect()
    )
    return rows[0]["_state_blob"] if rows else None


def write_messages(
    df: DataFrame,
    path: str,
    stream: str,
    emitted_at_col: str | None = None,
    emitted_at_millis: int = 0,
    namespace: str | None = None,
    state: dict | None = None,
    mode: str = "error",
    stream_status: bool = False,
) -> None:
    """Emit a DataFrame as Airbyte wire JSONL — the SOURCE side of the
    protocol (abstract_source.py:288 ``AirbyteRecordMessage(stream=...,
    data=..., emitted_at=now_millis)``, envelope per
    airbyte_protocol.yaml:13-49): one RECORD message per row, then an
    optional trailing STATE message (the per-sync checkpoint the
    platform forwards once records are durable).

    Spark-first: the envelope is built with to_json over nested structs
    — serialization is distributed, whole-stage-codegen JVM work; no
    row passes through the driver. Null fields stay EXPLICIT in data
    (ignoreNullFields=false) so a read-back sees the same shape the
    reference's jackson/pydantic serializers emit.

    emitted_at: a timestamp column (converted to epoch millis) or the
    fixed ``emitted_at_millis`` — deterministic replays need a pinned
    clock, the reference's wall-clock ``now_millis`` is the
    non-replayable choice. The STATE file is written AFTER the record
    files commit, so latest_state()'s mtime ordering puts it last —
    state never precedes the records it covers.

    stream_status=True brackets the emission with STREAM_STATUS TRACE
    messages (AirbyteStreamStatusTraceMessage): STARTED before any
    record file exists, COMPLETE after records + state are durable, and
    INCOMPLETE (then re-raise) if the record write fails — the platform
    uses these to distinguish "stream produced no records" from "stream
    never ran / died" (protocol stream status lifecycle)."""
    import json
    import os

    rec_fields = [
        F.lit(stream).alias("stream"),
    ]
    if namespace is not None:
        rec_fields.append(F.lit(namespace).alias("namespace"))
    if emitted_at_col is not None:
        emitted = F.unix_millis(F.col(emitted_at_col))
        data_cols = [c for c in df.columns if c != emitted_at_col]
    else:
        emitted = F.lit(int(emitted_at_millis))
        data_cols = list(df.columns)
    rec_fields.append(emitted.alias("emitted_at"))
    rec_fields.append(F.struct(*[F.col(c) for c in data_cols]).alias("data"))
    msg = F.to_json(
        F.struct(
            F.lit("RECORD").alias("type"),
            F.struct(*rec_fields).alias("record"),
        ),
        {"ignoreNullFields": "false"},
    )
    def _trace(status: str, fname: str) -> None:
        desc = {"name": stream}
        if namespace is not None:
            desc["namespace"] = namespace
        line = json.dumps(
            {
                "type": "TRACE",
                "trace": {
                    "type": "STREAM_STATUS",
                    "emitted_at": int(emitted_at_millis),
                    "stream_status": {
                        "status": status,
                        "stream_descriptor": desc,
                    },
                },
            },
            sort_keys=True,
        )
        with open(os.path.join(path, fname), "w") as fh:
            fh.write(line + "\n")

    if stream_status:
        # the record write must APPEND or Spark clears the directory
        # (taking the STARTED trace with it); enforce error/overwrite
        # semantics ourselves before the trace lands
        os.makedirs(path, exist_ok=True)
        existing = [
            f for f in os.listdir(path) if not f.startswith((".", "_"))
        ]
        if mode == "error" and any(f.startswith("part-") for f in existing):
            raise ValueError(f"path {path!r} already has record files")
        if mode == "overwrite":
            import shutil

            for f in os.listdir(path):
                fp = os.path.join(path, f)
                shutil.rmtree(fp) if os.path.isdir(fp) else os.remove(fp)
        _trace("STARTED", "trace_started.jsonl")
    try:
        df.select(msg.alias("value")).write.mode(
            "append" if stream_status else mode
        ).text(path)
    except Exception as exc:
        if stream_status:
            _trace("INCOMPLETE", "trace_status.jsonl")
            # ERROR trace alongside the status (airbyte_protocol.yaml
            # AirbyteErrorTraceMessage; AirbyteTraceMessageUtility
            # emitSystemErrorTrace semantics)
            import traceback

            line = json.dumps(
                {
                    "type": "TRACE",
                    "trace": {
                        "type": "ERROR",
                        "emitted_at": int(emitted_at_millis),
                        "error": {
                            "message": (
                                "Something went wrong writing records "
                                f"for stream {stream}"
                            ),
                            "internal_message": str(exc),
                            "stack_trace": traceback.format_exc(),
                            "failure_type": "system_error",
                        },
                    },
                },
                sort_keys=True,
            )
            with open(os.path.join(path, "trace_error.jsonl"), "w") as fh:
                fh.write(line + "\n")
        raise
    if state is not None:
        line = json.dumps(
            {"type": "STATE", "state": state}, sort_keys=True
        )
        with open(os.path.join(path, "state.jsonl"), "w") as fh:
            fh.write(line + "\n")
    if stream_status:
        _trace("COMPLETE", "trace_status.jsonl")


def error_traces(messages: DataFrame) -> DataFrame:
    """ERROR trace messages (AirbyteErrorTraceMessage fields) in
    file/line order — what the platform surfaces as the failure
    reason (airbyte_protocol.yaml:136-173)."""
    return (
        messages.filter(F.col("_error_message").isNotNull())
        .orderBy("_file_mtime", "_file", "_block_start", "_line_id")
        .select(
            F.col("_error_message").alias("message"),
            F.col("_error_internal").alias("internal_message"),
            F.col("_error_failure_type").alias("failure_type"),
            "_trace_emitted_at",
        )
    )


def stream_statuses(messages: DataFrame) -> DataFrame:
    """Per-stream lifecycle signals in file/line order: (stream, status,
    _trace_emitted_at). The consumer-side check is `every stream that
    STARTED also reached COMPLETE` — the replication worker's
    stream-status accounting."""
    return (
        messages.filter(F.col("_stream_status").isNotNull())
        .orderBy("_file_mtime", "_file", "_block_start", "_line_id")
        .select("stream", F.col("_stream_status").alias("status"),
                "_trace_emitted_at")
    )


def infer_record_schema(
    spark: SparkSession, messages: DataFrame, stream: str, sample: int = 10_000
) -> T.StructType:
    """Schema discovery by document sampling — the schemaless-store
    discover path (source-mongodb-v2 MongoUtils.getUniqueFields: read
    10,000 documents, union every field, demote a field whose type
    conflicts across documents to String; nested documents recurse).

    Spark-first: Catalyst's own JSON schema inference implements
    exactly that contract (field union across rows, widening, conflict
    -> StringType, recursive structs), so the sample's `_airbyte_data`
    blobs go straight through `spark.read.json` — distributed, no
    Python per document."""
    blobs = (
        messages.filter(
            (F.col("type") == "RECORD") & (F.col("stream") == stream)
        )
        .select("_airbyte_data")
        .limit(sample)
    )
    return spark.read.json(blobs.rdd.map(lambda r: r[0])).schema


def records_for_stream(
    messages: DataFrame, stream: str, schema: T.StructType
) -> DataFrame:
    """Typed records of one stream: ab1 (JSON parse) + ab2 (cast) of the
    normalization pipeline (stream_processor.py:234-311) in one
    from_json, since the schema is explicit."""
    recs = messages.filter(
        (F.col("type") == "RECORD") & (F.col("stream") == stream)
    )
    parsed = recs.withColumn("_d", F.from_json("_airbyte_data", schema))
    cols = [F.col(f"_d.{f.name}").alias(f.name) for f in schema.fields]
    return parsed.select(
        *cols, "_airbyte_ab_id", "_airbyte_emitted_at"
    )
