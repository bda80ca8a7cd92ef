"""Source acceptance-test harness — the reference's
`source-acceptance-test` battery re-expressed over the CLI entrypoint.

Reference: `airbyte-integrations/bases/source-acceptance-test/
source_acceptance_test/tests/` —
  test_core.py    (spec shape :57-142, check :170, discover :193-237,
                   read :381, trace-on-failure :414)
  test_full_refresh.py:39 (two full reads produce the same records)
  test_incremental.py:113 (two sequential reads: first read's records
                   all <= its final state; a second read seeded with
                   that state yields only records past it)

The reference drives a docker container over stdin/stdout; here the
same battery drives `entrypoint.run` over injected files and a capture
buffer — the identical argv + JSONL protocol boundary, minus the
container. Every check is black-box: nothing inspects engine
internals, only protocol messages, so ANY source expressible as a
catalog stream (cdc_log / files / url_file / http / wire /
partitioned_log) can be certified by pointing the harness at its
config + catalog documents.
"""

from __future__ import annotations

import io
import json
import tempfile
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from airbyte_integrations_spark.entrypoint import run


@dataclass
class SourceAcceptance:
    """One certification run: a config document, a configured-catalog
    document, and (for the negative check arm) an intentionally broken
    config. `cursor_field` names the cursor the incremental checks
    compare records against (per-stream override via the catalog)."""

    spark: SparkSession
    config: dict
    catalog: dict
    bad_config: dict = field(default_factory=lambda: {"log_path": "/nonexistent"})
    results: list = field(default_factory=list)

    # ------------------------------------------------------------ plumbing

    def _invoke(self, *argv_parts) -> list[dict]:
        """Run one entrypoint subcommand with documents materialized to
        files (the reference mounts them into the container)."""
        tmp = tempfile.mkdtemp(prefix="sat_")
        argv = []
        for part in argv_parts:
            if isinstance(part, tuple):  # (flag, document)
                flag, doc = part
                path = f"{tmp}/{flag.lstrip('-')}.json"
                with open(path, "w") as fh:
                    json.dump(doc, fh)
                argv += [flag, path]
            else:
                argv.append(part)
        buf = io.StringIO()
        code = run(argv, spark=self.spark, out=buf)
        assert code == 0, f"{argv_parts[0]} exited {code}"
        return [json.loads(ln) for ln in buf.getvalue().splitlines()]

    def _check(self, name: str, ok: bool, detail: str = "") -> None:
        self.results.append((name, bool(ok), detail))
        assert ok, f"{name}: {detail}"

    @staticmethod
    def _records(msgs):
        return [m["record"] for m in msgs if m["type"] == "RECORD"]

    @staticmethod
    def _states(msgs):
        return [m["state"] for m in msgs if m["type"] == "STATE"]

    @staticmethod
    def _latest_cursor(state: dict, stream: str):
        for entry in state.get("streams", ()):
            if entry["name"] == stream:
                return entry["state"].get("lsn_watermark")
        return None

    def _stream_specs(self):
        for s in self.catalog["streams"]:
            yield s["name"], s.get("cursor_field", ["_ab_cdc_lsn"])[0], s.get(
                "sync_mode", "incremental"
            )

    # -------------------------------------------------------------- checks

    def test_spec(self) -> None:
        """test_core.py:57-142 — SPEC is one message whose
        connectionSpecification is a JSON-schema object; secret-bearing
        properties are marked airbyte_secret and typed string."""
        msgs = self._invoke("spec")
        self._check("spec_single_message", len(msgs) == 1, f"{len(msgs)} msgs")
        spec = msgs[0]
        self._check("spec_type", spec.get("type") == "SPEC", str(spec)[:100])
        cs = spec["spec"]["connectionSpecification"]
        self._check("spec_is_object", cs.get("type") == "object", str(cs)[:100])
        self._check("spec_has_properties", bool(cs.get("properties")))
        secrets = [
            k for k, v in cs["properties"].items()
            if isinstance(v, dict) and v.get("airbyte_secret")
        ]
        for k in secrets:
            self._check(
                f"secret_{k}_is_string",
                cs["properties"][k].get("type") == "string",
            )

    def test_check(self) -> None:
        """test_core.py:170 — a good config yields SUCCEEDED; a broken
        config yields a FAILED message (exit 0, no stack trace on the
        pipe) that never echoes a secret value."""
        msgs = self._invoke("check", ("--config", self.config))
        st = msgs[0]["connectionStatus"]
        self._check("check_succeeded", st["status"] == "SUCCEEDED", str(st))
        msgs = self._invoke("check", ("--config", self.bad_config))
        st = msgs[0]["connectionStatus"]
        self._check("check_fails_as_message", st["status"] == "FAILED", str(st))
        self._check("check_failure_has_message", bool(st.get("message")))
        self._check("check_no_exception_leak", "Traceback" not in str(st))

    def test_discover(self) -> None:
        """test_core.py:193-237 — the discovered catalog has at least
        one stream, each with a name and an object json_schema."""
        msgs = self._invoke("discover", ("--config", self.config))
        cat = msgs[0]
        self._check("discover_type", cat["type"] == "CATALOG")
        streams = cat["catalog"].get("streams", [])
        self._check("discover_nonempty", len(streams) >= 1)
        for s in streams:
            self._check(
                f"discover_{s.get('name')}_schema",
                bool(s.get("name"))
                and s.get("json_schema", {}).get("type") == "object",
                str(s)[:150],
            )

    def test_read(self) -> list[dict]:
        """test_core.py:381 + protocol ordering — a read produces at
        least one RECORD per configured stream, every record names a
        configured stream, a STATE follows the records it covers, and
        STREAM_STATUS traces bracket each stream."""
        msgs = self._invoke(
            "read", ("--config", self.config), ("--catalog", self.catalog)
        )
        recs = self._records(msgs)
        names = {s["name"] for s in self.catalog["streams"]}
        self._check("read_produces_records", len(recs) > 0)
        self._check(
            "read_records_name_configured_streams",
            {r["stream"] for r in recs} <= names,
            str({r["stream"] for r in recs} - names),
        )
        self._check("read_emits_state", len(self._states(msgs)) >= 1)
        kinds = [m["type"] for m in msgs]
        self._check(
            "read_state_after_records",
            kinds.index("STATE") > kinds.index("RECORD"),
        )
        statuses = [
            m["trace"]["stream_status"]["status"]
            for m in msgs
            if m["type"] == "TRACE" and m["trace"]["type"] == "STREAM_STATUS"
        ]
        self._check(
            "read_status_lifecycle",
            statuses.count("STARTED") == len(names)
            and statuses.count("COMPLETE") == len(names),
            str(statuses),
        )
        return msgs

    def test_full_refresh_sequential_reads(self) -> None:
        """test_full_refresh.py:39 — two full reads of the same source
        produce the identical record multiset."""
        full = {
            "streams": [
                {**s, "sync_mode": "full_refresh"}
                for s in self.catalog["streams"]
            ]
        }
        read = lambda: sorted(  # noqa: E731
            json.dumps(r["data"], sort_keys=True)
            for r in self._records(
                self._invoke(
                    "read", ("--config", self.config), ("--catalog", full)
                )
            )
        )
        first, second = read(), read()
        self._check(
            "full_refresh_reads_identical",
            first == second,
            f"{len(first)} vs {len(second)} records",
        )

    def test_incremental_two_sequential_reads(self) -> None:
        """test_incremental.py:113 — every first-read record is <= the
        first read's final state; a second read seeded with that state
        produces exactly the records past it (here: none, since the
        source didn't move — the strictly-greater arm is pinned by
        seeding an artificially lowered state)."""
        msgs = self.test_read()
        latest = self._states(msgs)[-1]
        for name, cursor, mode in self._stream_specs():
            if mode != "incremental":
                continue
            wm = self._latest_cursor(latest, name)
            self._check(f"incremental_{name}_state_set", wm is not None)
            vals = [
                r["data"][cursor]
                for r in self._records(msgs)
                if r["stream"] == name and r["data"].get(cursor) is not None
            ]
            self._check(
                f"incremental_{name}_records_covered_by_state",
                all(v <= wm for v in vals),
                f"max record {max(vals)} vs state {wm}" if vals else "no records",
            )
        # unchanged source + latest state => zero new records
        msgs2 = self._invoke(
            "read", ("--config", self.config),
            ("--catalog", self.catalog), ("--state", {"type": "STATE",
                                                      "state": latest}),
        )
        self._check(
            "incremental_second_read_empty",
            len(self._records(msgs2)) == 0,
            f"{len(self._records(msgs2))} dupes",
        )
        # lowered state => exactly the tail past it, all strictly greater
        for name, cursor, mode in self._stream_specs():
            if mode != "incremental":
                continue
            wm = self._latest_cursor(latest, name)
            if not isinstance(wm, (int, float)):
                continue
            lowered = {
                "type": "STATE",
                "state": {
                    "state_type": "PER_STREAM",
                    "streams": [
                        {"name": name, "state": {"lsn_watermark": int(wm) // 2}}
                    ],
                },
            }
            msgs3 = self._invoke(
                "read", ("--config", self.config),
                ("--catalog", self.catalog), ("--state", lowered),
            )
            tail = [
                r["data"][cursor]
                for r in self._records(msgs3)
                if r["stream"] == name
            ]
            self._check(
                f"incremental_{name}_resume_strictly_greater",
                all(v > int(wm) // 2 for v in tail),
                f"min {min(tail)} vs seed {int(wm)//2}" if tail else "empty",
            )
            firsts = [
                r["data"][cursor]
                for r in self._records(msgs)
                if r["stream"] == name and r["data"][cursor] > int(wm) // 2
            ]
            self._check(
                f"incremental_{name}_resume_exact_tail",
                sorted(tail) == sorted(firsts),
                f"{len(tail)} vs {len(firsts)}",
            )

    # ----------------------------------------------------------- the suite

    def run_all(self) -> list:
        """The full certification battery, in the reference's order."""
        self.test_spec()
        self.test_check()
        self.test_discover()
        self.test_read()
        self.test_full_refresh_sequential_reads()
        self.test_incremental_two_sequential_reads()
        return self.results
