"""Destination acceptance-test harness — the reference's
`standard-destination-test` battery re-expressed over the CLI `write`
subcommand.

Reference: `airbyte-integrations/bases/standard-destination-test/.../
DestinationAcceptanceTest.java` —
  :339 testGetSpec              :348/:357 testCheckConnection both arms
  :367 testSync                 :409 testSecondSync (overwrite replaces)
  :452 testLineBreakCharacters  :508 testIncrementalSync (append grows)
  :586 testIncrementalDedupeSync (one active row per PK)
  :680 testSyncVeryBigRecords   (multi-MB record through the pipe)

The reference drives the destination docker image with messages piped
to stdin and asserts by re-reading the warehouse. Here the same
battery drives `entrypoint.run(["write", ...])` with the messages file
and asserts by re-reading the lake table — the identical protocol
boundary, black-box: nothing below the LakeTable read API is
inspected, so the battery certifies any stream the write CLI accepts.
"""

from __future__ import annotations

import io
import json
import os
import tempfile
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from airbyte_integrations_spark.entrypoint import run

_DDL = (
    "url string, _ab_cdc_lsn bigint, _ab_cdc_updated_at timestamp, "
    "payload string, _ab_cdc_deleted_at timestamp"
)


def _record(stream: str, url: str, lsn: int, payload: str = "",
            deleted: bool = False) -> str:
    ts = f"2024-01-01T00:00:{lsn:02d}"
    return json.dumps({"type": "RECORD", "record": {
        "stream": stream, "emitted_at": 0, "data": {
            "url": url, "_ab_cdc_lsn": lsn, "_ab_cdc_updated_at": ts,
            "payload": payload,
            "_ab_cdc_deleted_at": ts if deleted else None,
        }}})


@dataclass
class DestinationAcceptance:
    """One certification run against the lake destination via the
    write CLI. Uses its own small fixture corpus (the reference ships
    edge-case messages files the same way)."""

    spark: SparkSession
    workdir: str | None = None
    results: list = field(default_factory=list)

    def __post_init__(self):
        self.workdir = self.workdir or tempfile.mkdtemp(prefix="dat_")

    # ------------------------------------------------------------ plumbing

    def _check(self, name: str, ok: bool, detail: str = "") -> None:
        self.results.append((name, bool(ok), detail))
        assert ok, f"{name}: {detail}"

    def _write(self, lake: str, lines: list[str], mode: str,
               sync_mode: str = "incremental", stream: str = "pages") -> list:
        cfg = os.path.join(self.workdir, "cfg.json")
        with open(cfg, "w") as fh:
            json.dump({"log_path": self.workdir, "lake_root": lake}, fh)
        cat = os.path.join(self.workdir, "cat.json")
        with open(cat, "w") as fh:
            json.dump({"streams": [{
                "name": stream, "sync_mode": sync_mode,
                "destination_sync_mode": mode, "primary_key": ["url"],
                "cursor_field": ["_ab_cdc_lsn"], "n_buckets": 4,
                "record_schema": _DDL,
            }]}, fh)
        msgs = os.path.join(self.workdir, "messages.jsonl")
        with open(msgs, "w") as fh:
            fh.write("\n".join(lines) + "\n")
        buf = io.StringIO()
        code = run(["write", "--config", cfg, "--catalog", cat,
                    "--input", msgs], spark=self.spark, out=buf)
        assert code == 0
        return [json.loads(ln) for ln in buf.getvalue().splitlines()]

    def _rows(self, lake: str, stream: str = "pages") -> dict:
        from airbyte_integrations_spark.lakehouse.table import LakeTable

        t = LakeTable(self.spark, os.path.join(lake, stream))
        return {
            r.url: (r._ab_cdc_lsn, r.payload) for r in t.read_live().collect()
        }

    def _fresh(self, tag: str) -> str:
        return os.path.join(self.workdir, f"lake_{tag}")

    # -------------------------------------------------------------- checks

    def test_sync(self) -> None:
        """testSync:367 — a basic write lands every live record, and the
        echoed messages are exactly the committed STATEs."""
        lake = self._fresh("sync")
        out = self._write(
            lake,
            [_record("pages", "a", 1, "v1"), _record("pages", "b", 2, "v2")],
            "append_dedup",
        )
        self._check("sync_rows", self._rows(lake) == {
            "a": (1, "v1"), "b": (2, "v2")})
        self._check("sync_echoes_only_state",
                    [m["type"] for m in out] == ["STATE"], str(out)[:200])

    def test_second_sync_overwrite_replaces(self) -> None:
        """testSecondSync:409 — under overwrite, the second sync's rows
        REPLACE the first's."""
        lake = self._fresh("ow")
        self._write(lake, [_record("pages", "a", 1, "old")],
                    "overwrite", sync_mode="full_refresh")
        self._write(lake, [_record("pages", "z", 9, "new")],
                    "overwrite", sync_mode="full_refresh")
        self._check("overwrite_replaces", self._rows(lake) == {
            "z": (9, "new")}, str(self._rows(lake)))

    def test_incremental_append_grows(self) -> None:
        """testIncrementalSync:508 — append accumulates both batches."""
        from airbyte_integrations_spark.lakehouse.table import LakeTable

        lake = self._fresh("app")
        self._write(lake, [_record("pages", "a", 1)], "append")
        self._write(lake, [_record("pages", "a", 2)], "append")
        t = LakeTable(self.spark, os.path.join(lake, "pages"))
        n = t.read().count()
        self._check("append_accumulates", n == 2, f"{n} rows")

    def test_incremental_dedup(self) -> None:
        """testIncrementalDedupeSync:586 — one active row per PK across
        syncs; the tombstone removes its key."""
        lake = self._fresh("dedup")
        self._write(lake, [_record("pages", "a", 1, "v1"),
                           _record("pages", "b", 2, "v2")], "append_dedup")
        self._write(lake, [_record("pages", "a", 3, "v3"),
                           _record("pages", "b", 4, deleted=True)],
                    "append_dedup")
        self._check("dedup_one_active_row_per_pk",
                    self._rows(lake) == {"a": (3, "v3")},
                    str(self._rows(lake)))

    def test_line_break_characters(self) -> None:
        """testLineBreakCharacters:452 — embedded \\n / quotes in a
        value survive the JSONL pipe byte-identically."""
        lake = self._fresh("lb")
        tricky = 'line1\nline2\t"quoted"\\backslash'
        self._write(lake, [_record("pages", "a", 1, tricky)], "append_dedup")
        self._check("line_breaks_roundtrip",
                    self._rows(lake)["a"][1] == tricky,
                    repr(self._rows(lake)["a"][1])[:80])

    def test_very_big_record(self) -> None:
        """testSyncVeryBigRecords:680 — one multi-MB record through the
        pipe, intact."""
        lake = self._fresh("big")
        big = "x" * (3 * 1024 * 1024) + "END"
        self._write(lake, [_record("pages", "a", 1, big)], "append_dedup")
        got = self._rows(lake)["a"][1]
        self._check("very_big_record_intact",
                    len(got) == len(big) and got.endswith("END"),
                    f"len {len(got)}")

    def test_replay_converges(self) -> None:
        """The write CLI analogue of at-least-once delivery: piping the
        SAME messages file twice must not duplicate (idempotent epoch
        keys — the lake's exactly-once commit log)."""
        lake = self._fresh("replay")
        lines = [_record("pages", "a", 1), _record("pages", "b", 2)]
        self._write(lake, lines, "append_dedup")
        first = self._rows(lake)
        self._write(lake, lines, "append_dedup")
        self._check("replay_converges", self._rows(lake) == first)

    def run_all(self) -> list:
        self.test_sync()
        self.test_second_sync_overwrite_replaces()
        self.test_incremental_append_grows()
        self.test_incremental_dedup()
        self.test_line_break_characters()
        self.test_very_big_record()
        self.test_replay_converges()
        self.test_namespace_prefix()
        return self.results

    def test_namespace_prefix(self) -> None:
        """testSyncUsesAirbyteStreamNamespace / NamespacingMapper arms
        (:864-:947): a stream_prefix in the destination config renames
        the landing table while wire records keep their source stream
        name."""
        import io as _io

        lake = self._fresh("ns")
        cfg = os.path.join(self.workdir, "nscfg.json")
        with open(cfg, "w") as fh:
            json.dump({"log_path": self.workdir, "lake_root": lake,
                       "stream_prefix": "dev_"}, fh)
        cat = os.path.join(self.workdir, "nscat.json")
        with open(cat, "w") as fh:
            json.dump({"streams": [{
                "name": "pages", "sync_mode": "incremental",
                "destination_sync_mode": "append_dedup",
                "primary_key": ["url"], "cursor_field": ["_ab_cdc_lsn"],
                "n_buckets": 4, "record_schema": _DDL,
            }]}, fh)
        msgs = os.path.join(self.workdir, "nsmessages.jsonl")
        with open(msgs, "w") as fh:
            fh.write(_record("pages", "a", 1, "v1") + "\n")
        buf = _io.StringIO()
        assert run(["write", "--config", cfg, "--catalog", cat,
                    "--input", msgs], spark=self.spark, out=buf) == 0
        self._check("namespace_prefix_renames_table",
                    self._rows(lake, "dev_pages") == {"a": (1, "v1")},
                    str(self._rows(lake, "dev_pages")))
        self._check("namespace_prefix_no_unprefixed_table",
                    not os.path.exists(os.path.join(lake, "pages")))
