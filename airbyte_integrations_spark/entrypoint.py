"""Connector CLI entrypoint — the reference's invocation contract.

Reference: `airbyte-cdk/python/airbyte_cdk/entrypoint.py`
(AirbyteEntrypoint.parse_args/run: the four subcommands, required
--config/--catalog/--state flags, protocol JSONL on stdout) and
base-java `IntegrationRunner`. A connector is a PROGRAM:

    <connector> spec
    <connector> check    --config config.json
    <connector> discover --config config.json
    <connector> read     --config config.json --catalog catalog.json
                         [--state state.json]

every line of stdout a protocol message (SPEC / CONNECTION_STATUS /
CATALOG / RECORD / STATE / TRACE), config errors reported as a FAILED
CONNECTION_STATUS rather than a stack trace, secrets never echoed.

Spark-first note on `read`: record serialization is DISTRIBUTED —
`to_json` over nested structs builds each wire line inside whole-stage
codegen on executors; the driver only relays finished strings to the
pipe via `toLocalIterator` (one partition buffered at a time, no
collect). stdout is the protocol's single-consumer serialization point
in the reference too (the docker stdout pipe). Lake-to-lake syncs
should use `catalog_sync.read_catalog`, which never routes records
through the driver at all; this entrypoint is the wire-compatible
boundary for a platform that speaks the protocol.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from airbyte_integrations_spark.catalog_sync import (
    ConfiguredCatalog,
    ConfiguredStream,
    _read_stream_events,
    ordered_streams,
)
from airbyte_integrations_spark.config import (
    DestinationSyncMode,
    SyncConfig,
    SyncMode,
)
from airbyte_integrations_spark.connector import check, discover, mask_secrets, spec

# source kinds a JSON catalog may carry (the DataFrame kind is
# embedded-use only — not expressible as JSON)
_JSON_KINDS = (
    "cdc_log",
    "cdc_shared",
    "debezium",
    "mongo",
    "mongo_cdc",
    "files",
    "url_file",
    "http",
    "wire",
    "singer",
    "partitioned_log",
)


def configured_catalog_from_json(doc: dict) -> ConfiguredCatalog:
    """Parse a ConfiguredAirbyteCatalog-shaped JSON document into the
    engine's ConfiguredCatalog. Per stream:

        {"name": ..., "sync_mode": "incremental"|"full_refresh",
         "destination_sync_mode": "append"|"overwrite"|"append_dedup",
         "primary_key": [...], "cursor_field": [...],
         "n_buckets": int, "write_mode": "cow"|"mor",
         "source": {"kind": ..., ...}}

    Unknown source kinds and malformed streams fail fast with a clear
    error (the reference validates the catalog against the protocol
    schema before reading)."""
    streams = []
    for i, s in enumerate(doc.get("streams", ())):
        name = s.get("name") or s.get("stream")
        if not name:
            raise ValueError(f"catalog stream #{i} has no name")
        src = dict(s.get("source") or {})
        kind = src.get("kind", "cdc_log")
        if kind not in _JSON_KINDS:
            raise ValueError(
                f"stream {name!r}: unsupported source kind {kind!r} "
                f"(one of {_JSON_KINDS})"
            )
        kw: dict = {"stream": name}
        if "primary_key" in s:
            kw["primary_key"] = tuple(s["primary_key"])
        if "cursor_field" in s:
            kw["cursor_field"] = tuple(s["cursor_field"])
        if "sync_mode" in s:
            kw["sync_mode"] = SyncMode(s["sync_mode"])
        if "destination_sync_mode" in s:
            kw["destination_sync_mode"] = DestinationSyncMode(
                s["destination_sync_mode"]
            )
        for opt in ("n_buckets", "write_mode", "dedup_impl"):
            if opt in s:
                kw[opt] = s[opt]
        if "properties" in s:
            kw["properties"] = dict(s["properties"])
        streams.append(ConfiguredStream(config=SyncConfig(**kw), source=src))
    return ConfiguredCatalog(streams=tuple(streams))


def validate_config(config: dict, spec_doc: dict | None = None) -> list[str]:
    """Pre-flight config validation against the spec's
    connectionSpecification (the reference validates with a JSON-schema
    validator before check/read ever run — entrypoint.py:71
    `validate_config_against_spec`). Returns human-readable problems:
    missing required properties and wrong primitive types. Secrets are
    never echoed — only property NAMES appear in messages."""
    doc = (spec_doc or spec())["connectionSpecification"]
    problems = []
    for req in doc.get("required", ()):
        if req not in config:
            problems.append(f"missing required config property: {req}")
    prim = {"string": str, "integer": int, "number": (int, float),
            "boolean": bool, "object": dict, "array": list}
    for k, v in config.items():
        want = doc.get("properties", {}).get(k, {}).get("type")
        py = prim.get(want)
        if py is None or v is None:
            continue
        # bool is an int subclass in Python — an integer/number
        # property fed true must still be flagged
        bad_bool = want in ("integer", "number") and isinstance(v, bool)
        if bad_bool or not isinstance(v, py):
            problems.append(f"config property {k} must be {want}")
    return sorted(set(problems))


def _emit(out, msg: dict) -> None:
    out.write(json.dumps(msg, sort_keys=True) + "\n")


def _log(out, level: str, message: str) -> None:
    """LOG message on the pipe (airbyte_protocol.yaml:116-135) — the
    reference's per-sync progress logging (abstract_source.py:98,132,
    135,170) rides the same single stdout channel as records."""
    _emit(out, {"type": "LOG", "log": {"level": level, "message": message}})


def _trace_status(out, stream: str, status: str) -> None:
    _emit(
        out,
        {
            "type": "TRACE",
            "trace": {
                "type": "STREAM_STATUS",
                "emitted_at": 0,
                "stream_status": {
                    "status": status,
                    "stream_descriptor": {"name": stream},
                },
            },
        },
    )


def _read(
    spark: SparkSession, config: dict, catalog: ConfiguredCatalog,
    state: dict | None, out, state_type: str = "PER_STREAM",
) -> None:
    """SOURCE read: emit each stream's records as RECORD JSONL
    bracketed by STREAM_STATUS traces, with one cumulative PER_STREAM
    STATE after each stream completes (abstract_source.read emission
    order; state covers only records already written to the pipe)."""
    import os
    import tempfile

    from airbyte_integrations_spark.lakehouse.table import LakeTable

    scratch = tempfile.mkdtemp(prefix="entrypoint_read_")
    blobs: dict[str, dict] = {}
    _log(out, "INFO", "Starting syncing")
    for cs in ordered_streams(catalog):
        name = cs.config.stream
        _log(out, "INFO", f"Syncing stream: {name}")
        _trace_status(out, name, "STARTED")
        try:
            # throwaway sink table: a pure source read has no durable
            # watermark of its own, so resume comes from --state
            table = LakeTable(spark, os.path.join(scratch, name))
            ev, _, _meta = _read_stream_events(spark, cs, table, state)
            cursor = cs.config.cursor_field[0]
            if ev is None:
                blobs[name] = {"lsn_watermark": None}
                _emit_state(out, blobs, state_type)
                _trace_status(out, name, "COMPLETE")
                continue
            msg = F.to_json(
                F.struct(
                    F.lit("RECORD").alias("type"),
                    F.struct(
                        F.lit(name).alias("stream"),
                        F.lit(0).alias("emitted_at"),
                        F.struct(*[F.col(c) for c in ev.columns]).alias(
                            "data"
                        ),
                    ).alias("record"),
                ),
                {"ignoreNullFields": "false"},
            ).alias("line")
            hi = None
            if cursor in ev.columns:
                # one distributed pass computes the new cursor; the
                # record relay below streams partition-by-partition
                hi = ev.agg(F.max(cursor)).collect()[0][0]
                if hasattr(hi, "isoformat"):
                    hi = hi.isoformat()
            n_records = 0
            for row in ev.select(msg).toLocalIterator():
                out.write(row["line"] + "\n")
                n_records += 1
            blobs[name] = {"lsn_watermark": hi}
            _emit_state(out, blobs, state_type)
            _trace_status(out, name, "COMPLETE")
            _log(out, "INFO", f"Read {n_records} records from {name} stream")
        except Exception as e:
            _trace_status(out, name, "INCOMPLETE")
            _emit(
                out,
                {
                    "type": "TRACE",
                    "trace": {
                        "type": "ERROR",
                        "emitted_at": 0,
                        "error": {
                            "message": mask_secrets(str(e)[:500], config),
                            "stream_descriptor": {"name": name},
                        },
                    },
                },
            )
            raise
    _log(out, "INFO", "Finished syncing")


def _emit_state(out, blobs: dict[str, dict], flavor: str = "PER_STREAM") -> None:
    if flavor == "GLOBAL":
        # log-based CDC's single shared WAL offset: the safe shared
        # watermark is the MINIMUM across streams that have one
        # (CdcStateManager.java:13-33 — resuming a laggard from a
        # higher watermark would skip its events)
        wms = [
            b.get("lsn_watermark")
            for b in blobs.values()
            if b.get("lsn_watermark") is not None
        ]
        _emit(out, {"type": "STATE", "state": {
            "state_type": "GLOBAL",
            "global": {"lsn_watermark": min(wms) if wms else None},
        }})
        return
    _emit(
        out,
        {
            "type": "STATE",
            "state": {
                "state_type": "PER_STREAM",
                "streams": [
                    {"name": n, "state": b} for n, b in sorted(blobs.items())
                ],
            },
        },
    )


def _load_json(path: str) -> dict:
    with open(path) as fh:
        return json.load(fh)


def _write(
    spark: SparkSession, config: dict, catalog_doc: dict, input_path: str,
    out,
) -> None:
    """DESTINATION write: consume protocol JSONL (another connector's
    stdout) and apply each configured stream into the lake at
    config["lake_root"] per its destination_sync_mode, echoing back
    only the STATE messages whose records are durably committed — the
    reference's BufferedStreamConsumer contract (base-java
    IntegrationRunner `write --config --catalog` over the stdin pipe).

    Spark-first: the pipe content becomes ONE distributed JSONL scan
    (read_messages); per-stream typed extraction, winner dedup, and
    MERGE are the same declarative plans every other source kind uses —
    the only driver-side work is the catalog loop."""
    from airbyte_integrations_spark.catalog_sync import read_catalog

    lake_root = config.get("lake_root")
    if not lake_root:
        raise ValueError("write requires config.lake_root")
    mapper = None
    if any(
        k in config
        for k in ("namespace_definition", "namespace_format", "stream_prefix")
    ):
        # platform-side catalog rewrite (NamespacingMapper.java:44-99):
        # the destination address changes, the wire records keep their
        # source stream names — the wire source reads by the original
        # name via source["stream"]
        from airbyte_integrations_spark.mappers import NamespacingMapper

        mapper = NamespacingMapper(
            namespace_definition=config.get("namespace_definition", "source"),
            namespace_format=config.get("namespace_format"),
            stream_prefix=config.get("stream_prefix"),
        )
    streams = []
    for s in catalog_doc.get("streams", ()):
        src = {"kind": "wire", "path": input_path, "stream": s.get("name")}
        if "record_schema" in s:
            src["record_schema"] = s["record_schema"]
        entry = {**s, "source": src}
        if mapper is not None:
            ns, name = mapper.map_address(
                s.get("namespace")
                or (s.get("properties") or {}).get("namespace"),
                s["name"],
            )
            props = dict(entry.get("properties") or {})
            if ns is not None:
                props["namespace"] = ns
            else:
                props.pop("namespace", None)
            entry = {**entry, "name": name, "properties": props}
        streams.append(entry)
    catalog = configured_catalog_from_json({"streams": streams})
    for state in read_catalog(spark, catalog, lake_root):
        _emit(out, state)


def run(
    argv: list[str], spark: SparkSession | None = None, out=None, stdin=None
) -> int:
    """Drive one subcommand; returns the process exit code. `spark`,
    `out`, and `stdin` are injectable for tests/embedding
    (entrypoint.py:40's launch(source, args) split)."""
    out = out or sys.stdout
    p = argparse.ArgumentParser(prog="airbyte-integrations-spark")
    sub = p.add_subparsers(dest="command", required=True)
    sub.add_parser("spec")
    for cmd in ("check", "discover"):
        sp = sub.add_parser(cmd)
        sp.add_argument("--config", required=True)
    rd = sub.add_parser("read")
    rd.add_argument("--config", required=True)
    rd.add_argument("--catalog", required=True)
    rd.add_argument("--state", default=None)
    rd.add_argument(
        "--state-type", default=None,
        choices=("PER_STREAM", "GLOBAL"),
        help="STATE flavor to emit (GLOBAL = one shared WAL offset); "
        "defaults to PER_STREAM, or GLOBAL when the catalog carries a "
        "cdc_shared stream (a shared WAL has one offset by contract)",
    )
    wr = sub.add_parser("write")
    wr.add_argument("--config", required=True)
    wr.add_argument("--catalog", required=True)
    wr.add_argument(
        "--input", default="-",
        help="protocol JSONL file/dir; '-' (default) reads stdin",
    )
    args = p.parse_args(argv)

    if args.command == "spec":
        _emit(out, {"type": "SPEC", "spec": spec()})
        return 0

    config = _load_json(args.config)
    problems = validate_config(config)
    if problems:
        # schema-invalid config is a FAILED status, never a crash
        # (entrypoint.py:71 validate_config_against_spec semantics)
        _emit(out, {"type": "CONNECTION_STATUS", "connectionStatus": {
            "status": "FAILED", "message": "; ".join(problems)}})
        return 0 if args.command == "check" else 1
    if spark is None:
        from airbyte_integrations_spark.session import get_spark

        spark = get_spark("entrypoint")

    if args.command == "check":
        status = check(spark, config)
        _emit(out, {"type": "CONNECTION_STATUS", "connectionStatus": status})
        # the reference exits 0 even for FAILED checks — the status IS
        # the answer (entrypoint.py run(): failed check is a message,
        # not a crash)
        return 0
    if args.command == "discover":
        _emit(out, {"type": "CATALOG", "catalog": discover(spark, config)})
        return 0
    if args.command == "write":
        input_path = args.input
        if input_path == "-":
            # spool the pipe to a file so Spark can scan it as a
            # dataset (the reference buffers stdin the same way before
            # the consumer sees batches)
            import tempfile

            src = stdin or sys.stdin
            fd = tempfile.NamedTemporaryFile(
                "w", suffix=".jsonl", prefix="wire_stdin_", delete=False
            )
            with fd:
                for line in src:
                    fd.write(line if line.endswith("\n") else line + "\n")
            input_path = fd.name
        _write(spark, config, _load_json(args.catalog), input_path, out)
        return 0
    # read
    catalog = configured_catalog_from_json(_load_json(args.catalog))
    state = _load_json(args.state) if args.state else None
    state_type = args.state_type
    if state_type is None:
        shared = any(
            cs.source.get("kind") == "cdc_shared" for cs in catalog.streams
        )
        state_type = "GLOBAL" if shared else "PER_STREAM"
    _read(spark, config, catalog, state, out, state_type=state_type)
    return 0


def main() -> None:  # pragma: no cover - thin process wrapper
    sys.exit(run(sys.argv[1:]))


if __name__ == "__main__":  # pragma: no cover
    main()
