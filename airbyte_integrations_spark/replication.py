"""Replication worker — the platform's source→destination pump.

Reference: DefaultReplicationWorker
(/root/reference/airbyte-workers/src/main/java/io/airbyte/workers/general/DefaultReplicationWorker.java):
two container processes bridged by two threads — (a) source stdout →
mapper → destination stdin with per-record JSON schema validation
while a stream has fewer than 10 recorded failures (:289-387,
RecordSchemaValidator.java:46-81), (b) a listener retaining ONLY
destination-emitted STATE as the committed checkpoint (:389-428).
The attempt summary carries per-stream emitted/committed record and
byte counts, with committed = emitted on success and partial counts
kept on failure so the next attempt resumes (:197-228, :265-280).

Spark-first mapping: the engine replaces both processes and both
threads with one driver loop — each stream is a DataFrame, the pump
is the destination's own distributed write, and "destination-emitted
state" is the synchronous return of that write (our destinations
commit transactionally before returning; see destinations/jdbc.py
_publish and lakehouse/table.py _commit). Validation + emitted
metrics are ONE aggregation job per stream (count, serialized bytes,
invalid-record count, first-K distinct error messages), all JVM-side:
the per-record Java loop becomes a whole-stage-codegen pass, and the
10-failure cap becomes a capped distinct-message sample — same
information, no row-at-a-time Python.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAX_VALIDATION_MESSAGES = 10  # DefaultReplicationWorker.java:313 cap


# ------------------------------------------------------------ validation


def validation_errors_col(df: DataFrame, expected: dict[str, str]) -> Column:
    """Per-row array of schema-violation messages for the declared
    {field: spark_type} contract — RecordSchemaValidator.validateSchema
    (:46-81) as a vectorized expression. A field value that is present
    but not castable to the declared type yields the reference's
    message shape "<field> is of an incorrect type. Expected it to be
    <type>"."""
    msgs = []
    for name, typ in expected.items():
        if name not in df.columns:
            msgs.append(F.lit(f"{name} is missing"))
            continue
        c = F.col(name)
        # try_cast: under ANSI semantics a plain cast THROWS on
        # malformed input instead of yielding the NULL we probe for
        bad = c.isNotNull() & c.try_cast(typ).isNull()
        msgs.append(
            F.when(
                bad,
                F.lit(f"{name} is of an incorrect type. Expected it to be {typ}"),
            )
        )
    if not msgs:
        return F.array().cast("array<string>")
    return F.array_compact(F.array(*msgs))


# --------------------------------------------------------------- config


@dataclass(frozen=True)
class ReplicationStream:
    """One configured stream of the pump: the source frame, the
    declared record schema to validate against (RecordSchemaValidator's
    streamNamesToSchemas entry), and the destination dispatch args."""

    stream: str
    df: DataFrame
    expected_schema: dict[str, str] = field(default_factory=dict)
    destination_args: dict = field(default_factory=dict)


@dataclass
class StreamSyncStats:
    """StreamSyncStats analogue (DefaultReplicationWorker.java:212-228)."""

    records_emitted: int = 0
    bytes_emitted: int = 0
    records_committed: int | None = None
    validation_failures: int = 0
    validation_messages: tuple[str, ...] = ()
    records_quarantined: int = 0


@dataclass
class ReplicationSummary:
    """ReplicationAttemptSummary analogue (:230-241)."""

    status: str  # "completed" | "failed"
    stream_stats: dict[str, StreamSyncStats]
    state: dict
    failure: str | None = None

    @property
    def records_emitted(self) -> int:
        return sum(s.records_emitted for s in self.stream_stats.values())

    @property
    def records_committed(self) -> int:
        return sum(s.records_committed or 0 for s in self.stream_stats.values())


# ----------------------------------------------------------------- pump


REJECTED_SUFFIX = "__rejected"
ERRORS_COL = "_airbyte_validation_errors"


def replicate(
    streams: list[ReplicationStream],
    destination,
    mapper: Callable[[DataFrame], DataFrame] | None = None,
    state: dict | None = None,
    namespacing=None,
    quarantine=None,
) -> ReplicationSummary:
    """Pump every stream into `destination` (any object with a
    .write(df, stream, **destination_args) — JdbcDestination,
    FilesDestination, or a LakeTable adapter).

    Mirrors the worker's contract:
    - mapper runs between source and destination (:334,
      AirbyteMapper.mapMessage);
    - per-stream emitted counts/bytes + capped validation messages are
      gathered in one metrics aggregation (:313-330, :197-228);
    - committed is set to emitted only after the destination's write
      returns — its transactional commit IS the destination-emitted
      STATE (:389-428); a mid-catalog failure yields status="failed"
      with partial committed counts and a state document covering only
      the streams that committed, so re-running resumes (:265-280).
    - streams already marked committed in the incoming `state` are
      skipped (the resume path);
    - `namespacing` (mappers.NamespacingMapper) rewrites each stream's
      destination addressing BEFORE the pump, the engine's one-shot
      analogue of the reference's per-message NamespacingMapper
      (NamespacingMapper.java:63-78); state/stats are keyed by the
      mapped name, matching the reference where the mapper sits ahead
      of the destination and its state listener.
    - `quarantine` (a destination-like object, or the same destination)
      turns validation into a dead-letter queue instead of a metric:
      rows with schema violations are written to
      `<stream>__rejected` carrying an `_airbyte_validation_errors`
      array column, and ONLY valid rows reach the destination — the
      rejected-records flow of the modern platform. The DLQ write is
      at-least-once (a retry after a mid-stream failure may re-write
      rejected rows — the DLQ is diagnostic, the destination commit is
      the record of truth); `records_committed` counts valid rows
      only. A field missing from the frame entirely rejects every row
      of the stream, matching the reference's stream-level message.
      Without `quarantine`, invalid rows flow through and are only
      counted/sampled, exactly the reference worker's behavior.
    """
    if namespacing is not None:
        streams = [namespacing.map_replication_stream(rs) for rs in streams]
    stats: dict[str, StreamSyncStats] = {}
    out_state: dict = dict(state or {})
    failure = None

    for rs in streams:
        if out_state.get(rs.stream, {}).get("committed"):
            stats[rs.stream] = StreamSyncStats(
                records_emitted=0,
                bytes_emitted=0,
                records_committed=out_state[rs.stream].get("records", 0),
            )
            continue
        df = mapper(rs.df) if mapper is not None else rs.df
        err = validation_errors_col(df, rs.expected_schema)
        row = df.select(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.sum(F.octet_length(F.to_json(F.struct(*df.columns)))), F.lit(0)
            ).alias("nbytes"),
            F.count_if(F.size(err) > 0).alias("n_invalid"),
            F.slice(
                F.array_sort(
                    F.array_distinct(
                        F.flatten(
                            F.collect_list(F.when(F.size(err) > 0, err))
                        )
                    )
                ),
                1,
                MAX_VALIDATION_MESSAGES,
            ).alias("msgs"),
        ).collect()[0]
        st = StreamSyncStats(
            records_emitted=int(row["n"]),
            bytes_emitted=int(row["nbytes"]),
            validation_failures=int(row["n_invalid"]),
            validation_messages=tuple(dict.fromkeys(row["msgs"])),
        )
        stats[rs.stream] = st
        to_write = df
        use_dlq = quarantine is not None and rs.expected_schema and st.validation_failures
        try:
            if use_dlq:
                rejected = df.withColumn(ERRORS_COL, err).filter(
                    F.size(F.col(ERRORS_COL)) > 0
                )
                quarantine.write(
                    rejected, rs.stream + REJECTED_SUFFIX, **rs.destination_args
                )
                st.records_quarantined = st.validation_failures
                to_write = df.filter(F.size(err) == 0)
            destination.write(to_write, rs.stream, **rs.destination_args)
        except Exception as e:  # partial-success summary (:265-280)
            failure = f"destination failed for stream {rs.stream!r}: {e}"
            break
        st.records_committed = st.records_emitted - st.records_quarantined
        out_state[rs.stream] = {"committed": True, "records": st.records_committed}

    return ReplicationSummary(
        status="completed" if failure is None else "failed",
        stream_stats=stats,
        state=out_state,
        failure=failure,
    )
