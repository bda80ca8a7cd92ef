"""Model-based differential fuzz of the whole sync loop.

Hypothesis drives random CDC event streams (random keys, sparse unique
lsns, tombstones) through the REAL `run_sync` pipeline — epoch
planning, dedup, MERGE, commit, crash/resume — under randomly drawn
engine parameters (epoch width, cow/mor layout, every dedup
implementation), and asserts the final live table equals a pure-Python
latest-wins model. This is the acceptance-test idea behind the
reference's CDC scenario suite (insert/update/delete interleavings,
out-of-order delivery, resume-from-checkpoint;
DestinationAcceptanceTest.java + CdcSourceTest.java) generalized from
hand-picked interleavings to generated ones.

Complements test_crash_safety.py (which fuzzes only the winner RULE on
adversarial ties) by fuzzing the full loop: planning determinism,
watermark resume, idempotent re-runs, and layout equivalence all sit
under the assertion.
"""

import datetime as dt
import shutil
import tempfile

from hypothesis import given, settings, strategies as st

from airbyte_integrations_spark.config import SyncConfig
from airbyte_integrations_spark.lakehouse.table import LakeTable
from airbyte_integrations_spark.streaming.microbatch import run_sync

SCHEMA = (
    "url string, text string, _ab_cdc_lsn long, _ab_cdc_updated_at timestamp, "
    "_ab_cdc_deleted_at timestamp, _airbyte_ab_id string, _airbyte_emitted_at timestamp"
)
TS = dt.datetime(2021, 6, 1)


@st.composite
def sync_scenarios(draw):
    n_urls = draw(st.integers(1, 5))
    n_events = draw(st.integers(3, 18))
    # unique lsns over a range 25x the event count: epochs planned on a
    # SPARSE lsn axis, so slice density correction is in play too
    lsns = draw(
        st.lists(st.integers(1, 450), min_size=n_events, max_size=n_events,
                 unique=True)
    )
    events = [
        (
            f"u{draw(st.integers(0, n_urls - 1))}",
            lsn,
            draw(st.integers(0, 3)) == 0,  # ~25% tombstones
        )
        for lsn in lsns
    ]
    params = {
        "max_events_per_epoch": draw(st.integers(2, 8)),
        "write_mode": draw(st.sampled_from(["cow", "mor"])),
        "dedup_impl": draw(st.sampled_from(["agg", "join", "salted", "window"])),
        # first run is killed after this many epochs (0 = dies before
        # applying anything), then a fresh run resumes to completion
        "crash_after": draw(st.integers(0, 2)),
    }
    return events, params


@st.composite
def drift_scenarios(draw):
    n_urls = draw(st.integers(1, 4))
    n_events = draw(st.integers(4, 14))
    lsns = sorted(
        draw(st.lists(st.integers(1, 300), min_size=n_events,
                      max_size=n_events, unique=True))
    )
    events = [
        (
            f"u{draw(st.integers(0, n_urls - 1))}",
            lsn,
            draw(st.integers(0, 4)) == 0,
        )
        for lsn in lsns
    ]
    split = draw(st.integers(1, n_events - 1))  # first `split` events = old schema
    params = {
        "write_mode": draw(st.sampled_from(["cow", "mor"])),
        "max_events_per_epoch": draw(st.integers(2, 6)),
    }
    return events, split, params


@given(drift_scenarios())
@settings(max_examples=6, deadline=None)
def test_sync_loop_with_mid_stream_schema_drift(spark, scenario):
    """Random split point: the second sync's batch ADDS a column
    (extra) and WIDENS another (val: long -> string). The live table
    must null-backfill `extra` for old-schema winners, serve widened
    `val` for every row, and still satisfy the latest-wins model."""
    events, split, params = scenario
    old, new = events[:split], events[split:]

    def row(url, lsn, deleted):
        return (
            url,
            lsn,
            TS + dt.timedelta(seconds=lsn),
            TS + dt.timedelta(seconds=lsn) if deleted else None,
            f"ab{lsn}",
            TS + dt.timedelta(seconds=lsn),
        )

    base = ("url string, _ab_cdc_lsn long, _ab_cdc_updated_at timestamp, "
            "_ab_cdc_deleted_at timestamp, _airbyte_ab_id string, "
            "_airbyte_emitted_at timestamp")
    df_old = spark.createDataFrame(
        [row(*e) + (e[1] % 97,) for e in old], base + ", val long"
    )
    df_new = spark.createDataFrame(
        [row(*e) + (f"x{e[1]}", f"e{e[1]}") for e in new],
        base + ", val string, extra string",
    )

    winner: dict[str, tuple[int, bool]] = {}
    for url, lsn, deleted in events:
        if url not in winner or lsn > winner[url][0]:
            winner[url] = (lsn, deleted)
    old_lsns = {lsn for _, lsn, _ in old}
    expected = {
        (url, lsn,
         str(lsn % 97) if lsn in old_lsns else f"x{lsn}",
         None if lsn in old_lsns else f"e{lsn}")
        for url, (lsn, deleted) in winner.items()
        if not deleted
    }

    cfg = SyncConfig(stream="drift", n_buckets=4,
                     write_mode=params["write_mode"])
    root = tempfile.mkdtemp(prefix="fuzz_drift_")
    try:
        table = LakeTable(spark, root)
        run_sync(spark, df_old, table, cfg,
                 max_events_per_epoch=params["max_events_per_epoch"])
        run_sync(spark, df_new, table, cfg,
                 max_events_per_epoch=params["max_events_per_epoch"])
        got = {
            (r["url"], r["_ab_cdc_lsn"], r["val"], r["extra"])
            for r in table.read_live()
            .select("url", "_ab_cdc_lsn", "val", "extra").collect()
        }
        assert got == expected, (params, split, sorted(events))
    finally:
        shutil.rmtree(root, ignore_errors=True)


@given(sync_scenarios())
@settings(max_examples=8, deadline=None)
def test_sync_loop_matches_latest_wins_model(spark, scenario):
    events, params = scenario
    df = spark.createDataFrame(
        [
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
        ],
        SCHEMA,
    )
    # pure-Python oracle: per key, max-lsn event wins; a winning
    # tombstone removes the key from the live view
    winner: dict[str, tuple[int, bool]] = {}
    for url, lsn, deleted in events:
        if url not in winner or lsn > winner[url][0]:
            winner[url] = (lsn, deleted)
    expected = {
        (url, lsn, f"t{lsn}")
        for url, (lsn, deleted) in winner.items()
        if not deleted
    }

    cfg = SyncConfig(
        stream="fuzz",
        n_buckets=4,
        write_mode=params["write_mode"],
        dedup_impl=params["dedup_impl"],
    )
    root = tempfile.mkdtemp(prefix="fuzz_sync_")
    try:
        table = LakeTable(spark, root)
        # run 1 "crashes" after crash_after epochs; run 2 resumes from
        # the committed watermark and finishes; run 3 must be a no-op
        run_sync(spark, df, table, cfg,
                 max_events_per_epoch=params["max_events_per_epoch"],
                 max_epochs=params["crash_after"])
        done = run_sync(spark, df, table, cfg,
                        max_events_per_epoch=params["max_events_per_epoch"])
        assert run_sync(spark, df, table, cfg,
                        max_events_per_epoch=params["max_events_per_epoch"]) == []
        got = {
            (r["url"], r["_ab_cdc_lsn"], r["text"])
            for r in table.read_live().select("url", "_ab_cdc_lsn", "text").collect()
        }
        assert got == expected, (params, sorted(events))
        # the committed watermark is exactly the stream's max lsn, so a
        # later sync plans strictly above every applied event
        if done or params["crash_after"]:
            assert table.watermark("fuzz") == max(lsn for _, lsn, _ in events)
    finally:
        shutil.rmtree(root, ignore_errors=True)
