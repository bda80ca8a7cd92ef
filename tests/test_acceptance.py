"""The acceptance battery certifying two source kinds black-box over
the CLI protocol (reference: bases/source-acceptance-test — test_core,
test_full_refresh:39, test_incremental:113)."""

import json

import pytest

from airbyte_integrations_spark.gen import gen_change_events
from airbyte_integrations_spark.testing import SourceAcceptance


@pytest.fixture()
def log_dir(spark, tmp_path):
    p = str(tmp_path / "log")
    gen_change_events(spark, 400, n_urls=100).write.parquet(p)
    return p


def test_cdc_log_source_full_battery(spark, log_dir):
    sat = SourceAcceptance(
        spark,
        config={"log_path": log_dir},
        catalog={
            "streams": [
                {
                    "name": "pages",
                    "sync_mode": "incremental",
                    "destination_sync_mode": "append_dedup",
                    "primary_key": ["url"],
                    "cursor_field": ["_ab_cdc_lsn"],
                    "source": {"kind": "cdc_log", "path": log_dir},
                }
            ]
        },
    )
    results = sat.run_all()
    assert all(ok for _, ok, _ in results), results
    names = [n for n, _, _ in results]
    # the battery actually exercised every family
    for expected in (
        "spec_is_object",
        "check_succeeded",
        "check_fails_as_message",
        "discover_nonempty",
        "read_state_after_records",
        "full_refresh_reads_identical",
        "incremental_second_read_empty",
        "incremental_pages_resume_exact_tail",
    ):
        assert expected in names, expected


def test_files_source_core_battery(spark, log_dir, tmp_path):
    """A second source kind through the same black-box battery (spec /
    check / discover / read / full-refresh arms; its cursor is an
    mtime, not an LSN, so the LSN-shaped incremental arm does not
    apply)."""
    froot = tmp_path / "files"
    froot.mkdir()
    (froot / "a.jsonl").write_text(
        "\n".join(json.dumps({"id": i, "v": f"x{i}"}) for i in range(5)) + "\n"
    )
    (froot / "b.jsonl").write_text(
        "\n".join(json.dumps({"id": i, "v": f"y{i}"}) for i in range(5, 8)) + "\n"
    )
    sat = SourceAcceptance(
        spark,
        config={"log_path": log_dir},
        catalog={
            "streams": [
                {
                    "name": "fdocs",
                    "sync_mode": "full_refresh",
                    "destination_sync_mode": "overwrite",
                    "primary_key": ["id"],
                    "cursor_field": ["id"],
                    "source": {
                        "kind": "files",
                        "root": str(froot),
                        "format": "json",
                        "suffix": ".jsonl",
                        "options": {
                            "schema": "id bigint, v string",
                        },
                    },
                }
            ]
        },
    )
    sat.test_spec()
    sat.test_check()
    sat.test_discover()
    msgs = sat.test_read()
    recs = [m for m in msgs if m["type"] == "RECORD"]
    assert len(recs) == 8
    sat.test_full_refresh_sequential_reads()
    assert all(ok for _, ok, _ in sat.results), sat.results


def test_destination_acceptance_battery(spark, tmp_path):
    """standard-destination-test battery over the write CLI
    (DestinationAcceptanceTest.java:339-680 arms)."""
    from airbyte_integrations_spark.testing.destination_acceptance import (
        DestinationAcceptance,
    )

    dat = DestinationAcceptance(spark, workdir=str(tmp_path))
    results = dat.run_all()
    assert all(ok for _, ok, _ in results), results
    names = [n for n, _, _ in results]
    for expected in (
        "sync_rows", "overwrite_replaces", "append_accumulates",
        "dedup_one_active_row_per_pk", "line_breaks_roundtrip",
        "very_big_record_intact", "replay_converges",
        "namespace_prefix_renames_table",
    ):
        assert expected in names, expected
