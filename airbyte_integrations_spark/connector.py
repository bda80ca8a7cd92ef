"""Connector lifecycle entry points: spec / check / discover / read.

Mirrors IntegrationRunner.runInternal's command surface
(bases/base-java/.../IntegrationRunner.java:122-158) for the engine's
one built-in source (a CDC-event lake/parquet log of Common-Crawl-style
pages) so a user of the reference can drive the same five verbs:

  spec()      -> configuration JSON-Schema
  check(cfg)  -> connection status
  discover(cfg) -> AirbyteCatalog-shaped stream list (with JSON Schema)
  read(...)   -> the sync itself (streaming/microbatch.run_sync)
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from airbyte_integrations_spark.schema import CHANGE_EVENTS

# keyed by DataType.simpleString()
_SPARK_TO_JSON = {
    "string": {"type": ["null", "string"]},
    "tinyint": {"type": ["null", "integer"]},
    "smallint": {"type": ["null", "integer"]},
    "int": {"type": ["null", "integer"]},
    "bigint": {"type": ["null", "integer"]},
    "float": {"type": ["null", "number"]},
    "double": {"type": ["null", "number"]},
    "boolean": {"type": ["null", "boolean"]},
    "timestamp": {"type": ["null", "string"], "format": "date-time"},
    "timestamp_ntz": {"type": ["null", "string"], "format": "date-time"},
    "date": {"type": ["null", "string"], "format": "date"},
    "binary": {"type": ["null", "string"], "contentEncoding": "base64"},
}


def spec() -> dict:
    """ConnectorSpecification analogue (airbyte_protocol.yaml SPEC).
    Credential-bearing properties carry ``airbyte_secret: true`` — the
    reference's spec marker the platform uses to mask values in logs
    and the UI (airbyte_protocol.yaml ConnectorSpecification;
    JdbcUtils password property in every jdbc connector spec.json)."""
    return {
        "documentationUrl": "README.md",
        "connectionSpecification": {
            "type": "object",
            "required": ["log_path"],
            "properties": {
                "log_path": {
                    "type": "string",
                    "description": "parquet directory of the CDC event log",
                },
                "max_events_per_epoch": {"type": "integer", "default": 10_000_000},
                "jdbc_url": {
                    "type": "string",
                    "description": "optional JDBC source/destination url",
                },
                "jdbc_user": {"type": "string"},
                "jdbc_password": {
                    "type": "string",
                    "airbyte_secret": True,
                    "description": "never logged; masked in check() errors",
                },
            },
        },
    }


def secret_properties(spec_doc: dict | None = None) -> list[str]:
    """Property names marked airbyte_secret in the spec."""
    doc = spec_doc or spec()
    props = doc.get("connectionSpecification", {}).get("properties", {})
    return [k for k, v in props.items() if isinstance(v, dict) and v.get("airbyte_secret")]


def mask_secrets(message: str, config: dict, spec_doc: dict | None = None) -> str:
    """Replace every secret-valued substring of `message` with ***** —
    the platform's log-masking rule applied at the connector boundary,
    so a failed check() can never echo a credential back."""
    for k in secret_properties(spec_doc):
        v = config.get(k)
        if isinstance(v, str) and v:
            message = message.replace(v, "*****")
    return message


def check(spark: SparkSession, config: dict) -> dict:
    """CONNECTION_STATUS analogue: the log is readable and carries the
    required CDC columns; failure messages are secret-masked."""

    def fail(msg: str) -> dict:
        return {"status": "FAILED", "message": mask_secrets(msg[:500], config)[:200]}

    if config.get("jdbc_url"):
        # optional JDBC probe (the jdbc flavor of the source/destination)
        jvm = spark._jvm
        try:
            conn = jvm.java.sql.DriverManager.getConnection(
                config["jdbc_url"],
                config.get("jdbc_user") or "",
                config.get("jdbc_password") or "",
            )
            conn.close()
        except Exception as e:
            return fail(f"jdbc connection failed: {e}")
    path = config.get("log_path", "")
    if not path or not os.path.exists(path):
        return fail(f"log_path not found: {path!r}")
    try:
        df = spark.read.parquet(path)
    except Exception as e:  # unreadable / not parquet
        return fail(str(e))
    missing = [c for c in ("_ab_cdc_lsn", "_airbyte_ab_id") if c not in df.columns]
    if missing:
        return fail(f"missing CDC columns: {missing}")
    return {"status": "SUCCEEDED"}


def _field_to_json(dtype: str) -> dict:
    return dict(_SPARK_TO_JSON.get(dtype, {"type": ["null", "string"]}))


def discover(spark: SparkSession, config: dict | None = None) -> dict:
    """AirbyteCatalog analogue: per-stream JSON Schema + sync modes +
    source-defined cursor/PK (PostgresSource.java:394-406 pattern of
    advertising the injected CDC columns in the discovered schema)."""
    if config and config.get("log_path") and os.path.exists(config["log_path"]):
        schema = spark.read.parquet(config["log_path"]).schema
    else:
        schema = CHANGE_EVENTS
    props = {f.name: _field_to_json(f.dataType.simpleString()) for f in schema.fields}
    return {
        "streams": [
            {
                "name": "pages",
                "json_schema": {"type": "object", "properties": props},
                "supported_sync_modes": ["full_refresh", "incremental"],
                "source_defined_cursor": True,
                "default_cursor_field": ["_ab_cdc_lsn"],
                "source_defined_primary_key": [["url"]],
            }
        ]
    }


def state_message(table, stream: str, flavor: str = "PER_STREAM") -> dict:
    """Outgoing AirbyteStateMessage in the PINNED reference wire shape
    (airbyte_protocol.yaml:71-108: AirbyteStateMessage = {state_type:
    GLOBAL|PER_STREAM, streams: [{name, state}]}) derived ONLY from the
    table's durable commit log — the reference's state-after-commit
    rule (BufferedStreamConsumer.java:175-193): a STATE that was never
    durably applied can never be emitted. Feeding the blob back to
    `resume_lsn` (or just re-running the sync against the same table)
    resumes losslessly.

    A table with no committed snapshot yet (first sync crashed before
    any commit, or an empty source) still emits a state message —
    CdcSourceTest's empty-sync semantics — with a null watermark.

    flavor="GLOBAL" emits the protocol's other arm ({state_type:
    GLOBAL, global: <blob>}): log-based CDC keeps ONE offset for the
    whole WAL shared by every stream (CdcStateManager.java:13-33 holds
    a single CdcState), so the blob is the table-wide watermark."""
    if not table.exists():
        blob = {
            "lsn_watermark": None,
            "n_epochs_committed": 0,
            "snapshot_version": None,
        }
    else:
        blob = {
            "lsn_watermark": table.watermark(stream),
            "n_epochs_committed": len(table.committed_epochs(stream)),
            "snapshot_version": table.current_version(),
        }
    if flavor == "GLOBAL":
        # One offset for the WHOLE WAL: the safe shared watermark is the
        # MINIMUM across every stream in the commit log — resuming a
        # multi-stream table from one stream's (higher) watermark would
        # permanently skip the laggard's events.
        if table.exists():
            committed = table.manifest().get("committed", {})
            wms = [table.watermark(s) for s in committed]
            wms = [w for w in wms if w is not None]
            blob = {
                **blob,
                "lsn_watermark": min(wms) if wms else None,
                "n_epochs_committed": sum(len(e) for e in committed.values()),
            }
        return {"type": "STATE", "state": {"state_type": "GLOBAL", "global": blob}}
    return {
        "type": "STATE",
        "state": {
            "state_type": "PER_STREAM",
            "streams": [{"name": stream, "state": blob}],
        },
    }


def resume_lsn(state: dict | None, stream: str | None = None) -> int | None:
    """Parse a state_message blob back into the exclusive lower LSN
    bound for the next log slice (CdcStateManager.java:13-33 restore
    path). None / empty state => read from the beginning. Accepts the
    pinned PER_STREAM and GLOBAL shapes (first matching stream, or the only one)
    and, for back-compat with round-1 checkpoints, the legacy
    {state:{stream:{stream_state}}} shape."""
    if not state:
        return None
    s = state.get("state", state)
    if isinstance(s, dict) and s.get("state_type") == "GLOBAL":
        try:
            return s["global"]["lsn_watermark"]
        except (KeyError, TypeError):
            return None
    try:
        streams = s["streams"]
        for entry in streams:
            if stream is None or entry.get("name") == stream:
                return entry["state"]["lsn_watermark"]
        return None
    except (KeyError, TypeError):
        pass
    try:  # legacy round-1 shape
        return s["stream"]["stream_state"]["lsn_watermark"]
    except (KeyError, TypeError):
        return None
