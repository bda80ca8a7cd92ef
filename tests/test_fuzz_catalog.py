"""Model-based differential fuzz of the multi-stream catalog loop.

test_fuzz_sync.py fuzzes ONE stream through run_sync; this fuzzes the
ORCHESTRATION layer — read_catalog over several streams with
independent random event logs, a crash injected after a random
stream's durable commit, serial vs concurrent execution — and asserts
every stream's table converges to its own pure-Python latest-wins
model, that the resumed run completes the interrupted/unstarted
streams, and that a third run is a table-version no-op (idempotent
epoch skip across ALL streams, the read_catalog docstring contract).
"""

import datetime as dt
import shutil
import tempfile

from hypothesis import given, settings, strategies as st

from airbyte_integrations_spark.catalog_sync import (
    ConfiguredCatalog,
    ConfiguredStream,
    read_catalog,
    stream_table,
)
from airbyte_integrations_spark.config import SyncConfig

SCHEMA = (
    "url string, text string, _ab_cdc_lsn long, _ab_cdc_updated_at timestamp, "
    "_ab_cdc_deleted_at timestamp, _airbyte_ab_id string, _airbyte_emitted_at timestamp"
)
TS = dt.datetime(2021, 6, 1)


@st.composite
def catalog_scenarios(draw):
    n_streams = draw(st.integers(2, 3))
    streams = []
    for _ in range(n_streams):
        n_urls = draw(st.integers(1, 4))
        n_events = draw(st.integers(2, 12))
        lsns = draw(
            st.lists(st.integers(1, 200), min_size=n_events,
                     max_size=n_events, unique=True)
        )
        streams.append(
            [
                (f"u{draw(st.integers(0, n_urls - 1))}", lsn,
                 draw(st.integers(0, 3)) == 0)
                for lsn in lsns
            ]
        )
    params = {
        "max_events_per_epoch": draw(st.integers(2, 8)),
        "max_concurrency": draw(st.sampled_from([1, 2])),
        # crash after this many stream commits (serial runs only; with
        # n_streams streams, n_streams means "no crash")
        "crash_after": draw(st.integers(0, n_streams)),
    }
    return streams, params


def _df(spark, events):
    rows = [
        (
            url,
            f"t{lsn}",
            lsn,
            TS + dt.timedelta(seconds=lsn),
            TS + dt.timedelta(seconds=lsn) if deleted else None,
            f"ab{lsn}",
            TS + dt.timedelta(seconds=lsn),
        )
        for url, lsn, deleted in events
    ]
    return spark.createDataFrame(rows, SCHEMA)


def _model(events):
    winner = {}
    for url, lsn, deleted in events:
        if url not in winner or lsn > winner[url][0]:
            winner[url] = (lsn, deleted)
    return {(u, lsn) for u, (lsn, deleted) in winner.items() if not deleted}


class _Boom(RuntimeError):
    pass


@given(catalog_scenarios())
@settings(max_examples=6, deadline=None)
def test_catalog_loop_crash_resume_idempotent(spark, scenario):
    streams, params = scenario
    root = tempfile.mkdtemp(prefix="fuzz_catalog_")
    try:
        catalog = ConfiguredCatalog(
            streams=tuple(
                ConfiguredStream(
                    config=SyncConfig(stream=f"s{i}", n_buckets=2),
                    source={"kind": "dataframe", "df": _df(spark, ev)},
                )
                for i, ev in enumerate(streams)
            )
        )

        # run 1: crash after K stream commits (serial only — the
        # concurrent path interleaves commits, so the hook's count is
        # not a stable cut there)
        if params["max_concurrency"] == 1 and params["crash_after"] < len(streams):
            seen = []

            def boom(name):
                seen.append(name)
                if len(seen) > params["crash_after"]:
                    raise _Boom(name)

            try:
                read_catalog(
                    spark, catalog, root,
                    max_events_per_epoch=params["max_events_per_epoch"],
                    on_stream_committed=boom,
                )
                raise AssertionError("crash hook did not fire")
            except _Boom:
                pass

        # run 2: resume/complete
        msgs = read_catalog(
            spark, catalog, root,
            max_events_per_epoch=params["max_events_per_epoch"],
            max_concurrency=params["max_concurrency"],
        )
        assert len(msgs) == len(streams)

        versions = {}
        for i, ev in enumerate(streams):
            table = stream_table(spark, root, f"s{i}")
            got = {
                (r["url"], r["_ab_cdc_lsn"])
                for r in table.read_live().select("url", "_ab_cdc_lsn").collect()
            }
            assert got == _model(ev), f"stream s{i} diverged"
            versions[i] = table.current_version()

        # run 3: pure no-op — no stream commits a new snapshot
        read_catalog(
            spark, catalog, root,
            max_events_per_epoch=params["max_events_per_epoch"],
            max_concurrency=params["max_concurrency"],
        )
        for i in versions:
            assert (
                stream_table(spark, root, f"s{i}").current_version()
                == versions[i]
            ), f"stream s{i} re-committed on an idempotent re-run"
    finally:
        shutil.rmtree(root, ignore_errors=True)
