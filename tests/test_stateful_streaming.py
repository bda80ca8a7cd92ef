"""Stateful streaming: applyInPandasWithState latest-wins state store
matches the batch winner rule; watermarked windowed metrics drop late
rows from metrics only."""

import os
import time

import pandas as pd

from airbyte_integrations_spark.gen import gen_change_events
from airbyte_integrations_spark.streaming.stateful import (
    event_time_rates,
    latest_wins_stream,
)
from tests.util import duckdb_winners

COLS = [
    "url", "warc_ts", "text", "lang",
    "_ab_cdc_lsn", "_ab_cdc_updated_at", "_ab_cdc_deleted_at",
    "_airbyte_ab_id", "_airbyte_emitted_at",
]


def _write_slices(df, log_dir, slices):
    """Write each slice as exactly one file with strictly increasing
    mtimes so FileStreamSource (maxFilesPerTrigger=1) replays them as
    separate micro-batches in order."""
    for i, cond in enumerate(slices):
        df.filter(cond).coalesce(1).write.mode("append").parquet(log_dir)
        t = time.time() - 60 + i * 10
        for name in os.listdir(log_dir):
            p = os.path.join(log_dir, name)
            if name.endswith(".parquet") and os.path.getmtime(p) > t:
                os.utime(p, (t, t))


def test_latest_wins_state_matches_batch_winner_rule(spark, tmp_path):
    ev = gen_change_events(spark, 1500, n_urls=50).select(*COLS)
    log = str(tmp_path / "log")
    _write_slices(
        ev, log,
        ["_ab_cdc_lsn <= 500",
         "_ab_cdc_lsn > 500 AND _ab_cdc_lsn <= 1000",
         "_ab_cdc_lsn > 1000"],
    )

    stream = (
        spark.readStream.schema(spark.read.parquet(log).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(log)
    )
    q = (
        latest_wins_stream(stream)
        .writeStream.format("memory")
        .queryName("winners_live")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    mem = spark.table("winners_live").toPandas()
    # multi-batch statefulness actually exercised: at least one url was
    # re-emitted after a later batch touched it
    assert len(mem) > mem["url"].nunique()

    # per key, emitted winners are monotone in the ordering, so the
    # winner-rule max over the emitted rows == the final state
    final = duckdb_winners(mem.drop(columns=["is_deleted"]), drop_tombstones=False)
    final = final.merge(
        mem[["url", "_airbyte_ab_id", "is_deleted"]],
        on=["url", "_airbyte_ab_id"],
        how="left",
    ).drop_duplicates(subset=["url"])

    expected = duckdb_winners(ev.toPandas(), drop_tombstones=False)
    exp = expected.sort_values("url").reset_index(drop=True)
    got = final.sort_values("url").reset_index(drop=True)
    assert list(exp["url"]) == list(got["url"])
    assert list(exp["_ab_cdc_lsn"]) == list(got["_ab_cdc_lsn"])
    assert list(exp["_airbyte_ab_id"]) == list(got["_airbyte_ab_id"])
    assert list(exp["text"].fillna("")) == list(got["text"].fillna(""))
    # tombstone flag == deleted_at non-null on the expected winner
    assert list(exp["_ab_cdc_deleted_at"].notna()) == list(got["is_deleted"])

    # live view (tombstones hidden) == batch final table
    live = got[~got["is_deleted"]]
    batch_final = duckdb_winners(ev.toPandas(), drop_tombstones=True)
    assert set(live["url"]) == set(batch_final["url"])


def test_latest_wins_state_out_of_order_slices_converge(spark, tmp_path):
    """Slicing by anything (here: even/odd lsn => interleaved, wildly
    out-of-order delivery) converges to the same state — the fold is
    associative+commutative."""
    ev = gen_change_events(spark, 800, n_urls=30).select(*COLS)
    log = str(tmp_path / "log")
    _write_slices(ev, log, ["_ab_cdc_lsn % 2 = 0", "_ab_cdc_lsn % 2 = 1"])

    stream = (
        spark.readStream.schema(spark.read.parquet(log).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(log)
    )
    q = (
        latest_wins_stream(stream)
        .writeStream.format("memory")
        .queryName("winners_ooo")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    mem = spark.table("winners_ooo").toPandas()
    final = duckdb_winners(mem.drop(columns=["is_deleted"]), drop_tombstones=False)
    expected = duckdb_winners(ev.toPandas(), drop_tombstones=False)
    exp = expected.sort_values("url").reset_index(drop=True)
    got = final.sort_values("url").reset_index(drop=True)
    assert list(exp["url"]) == list(got["url"])
    assert list(exp["_airbyte_ab_id"]) == list(got["_airbyte_ab_id"])


def test_latest_wins_impls_agree(spark, tmp_path):
    """The JVM streaming-aggregation default and the pandas-state fold
    converge to the identical final winner per url on the same sliced
    replay (same associative rule, two state machines)."""
    ev = gen_change_events(spark, 600, n_urls=25).select(*COLS)
    log = str(tmp_path / "log")
    _write_slices(ev, log, ["_ab_cdc_lsn <= 300", "_ab_cdc_lsn > 300"])

    finals = {}
    for impl in ("agg", "pandas_state"):
        stream = (
            spark.readStream.schema(spark.read.parquet(log).schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(log)
        )
        q = (
            latest_wins_stream(stream, impl=impl)
            .writeStream.format("memory")
            .queryName(f"w_{impl}")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / f"ck_{impl}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        mem = spark.table(f"w_{impl}").toPandas()
        fin = duckdb_winners(mem.drop(columns=["is_deleted"]), drop_tombstones=False)
        finals[impl] = fin.sort_values("url").reset_index(drop=True)

    a, p = finals["agg"], finals["pandas_state"]
    assert list(a["url"]) == list(p["url"])
    assert list(a["_airbyte_ab_id"]) == list(p["_airbyte_ab_id"])
    assert list(a["_ab_cdc_lsn"].astype("Int64")) == list(p["_ab_cdc_lsn"].astype("Int64"))


def test_event_time_rates_bounds_state_and_keeps_ontime_counts(spark, tmp_path):
    base = pd.Timestamp("2024-01-01 10:00:00")
    b1 = pd.DataFrame(
        {
            "warc_ts": [base + pd.Timedelta(minutes=m) for m in range(5)],
            "lang": ["en"] * 5,
            "_ab_cdc_deleted_at": [None, None, base, None, None],
        }
    )
    b2 = pd.DataFrame(
        {
            # 9:40 is > 10 min behind the max seen event time (10:04)
            # => beyond the watermark, dropped from metrics
            "warc_ts": [base - pd.Timedelta(minutes=20),
                        base + pd.Timedelta(minutes=6)],
            "lang": ["en", "en"],
            "_ab_cdc_deleted_at": [None, None],
        }
    )
    log = str(tmp_path / "wlog")
    b2["_ab_cdc_deleted_at"] = pd.to_datetime(b2["_ab_cdc_deleted_at"])
    df1 = spark.createDataFrame(b1)
    df2 = spark.createDataFrame(b2, schema=df1.schema)
    df1.coalesce(1).write.mode("append").parquet(log)
    time.sleep(0.05)
    df2.coalesce(1).write.mode("append").parquet(log)
    files = sorted(
        (p for p in os.listdir(log) if p.endswith(".parquet")),
        key=lambda p: os.path.getmtime(os.path.join(log, p)),
    )
    for i, name in enumerate(files):
        os.utime(os.path.join(log, name), (time.time() - 60 + i * 10,) * 2)

    stream = (
        spark.readStream.schema(df1.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(log)
    )
    q = (
        event_time_rates(stream)
        .writeStream.format("memory")
        .queryName("rates")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    rates = spark.table("rates").toPandas()
    # on-time windows are exact: [10:00, 10:05) saw all 5 rows, 1
    # tombstone; the 10:06 row landed in [10:05, 10:10)
    w0 = rates[rates["win_start"] == pd.Timestamp("2024-01-01 10:00:00")]
    assert int(w0["n_events"].max()) == 5
    assert int(w0["n_deletes"].max()) == 1
    w1 = rates[rates["win_start"] == pd.Timestamp("2024-01-01 10:05:00")]
    assert int(w1["n_events"].max()) == 1
    # the late row never contaminated an on-time window
    assert int(w0["n_events"].sum()) == 5

    # the watermark's hard guarantee: bounded state. The 9:40 window
    # (end 9:45 < watermark 9:54 after batch 1) was evicted in the same
    # batch that saw it; only the two on-time windows remain in state.
    removed = sum(p["stateOperators"][0]["numRowsRemoved"] for p in q.recentProgress)
    final_state = q.recentProgress[-1]["stateOperators"][0]["numRowsTotal"]
    assert removed == 1
    assert final_state == 2

    # batch mode: watermark is a no-op; the late row IS counted
    batch = event_time_rates(spark.read.parquet(log)).toPandas()
    assert batch["win_start"].min() < pd.Timestamp("2024-01-01 10:00:00")
    assert int(batch["n_events"].sum()) == 7


class _FakeState:
    """Minimal GroupState double for unit-testing the fold function."""

    def __init__(self, value=None):
        self._v = value

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)


def _fold(pdfs, state):
    from airbyte_integrations_spark.streaming.stateful import _fold_winner

    out = list(_fold_winner(("u",), iter(pdfs), state))
    assert len(out) == 1 and len(out[0]) == 1
    return out[0].iloc[0]


def _mk(rows):
    base = pd.Timestamp("2021-01-01")
    return pd.DataFrame(
        {
            "url": ["u"] * len(rows),
            "warc_ts": [base] * len(rows),
            "text": [r.get("text") for r in rows],
            "lang": ["en"] * len(rows),
            "_ab_cdc_lsn": pd.Series([r.get("lsn") for r in rows], dtype="Int64"),
            "_ab_cdc_updated_at": pd.Series(
                [r.get("upd", base) for r in rows], dtype="datetime64[us]"
            ),
            "_ab_cdc_deleted_at": pd.Series(
                [r.get("del") for r in rows], dtype="datetime64[us]"
            ),
            "_airbyte_ab_id": [r.get("ab", "x") for r in rows],
            "_airbyte_emitted_at": pd.Series(
                [r.get("emit", base) for r in rows], dtype="datetime64[us]"
            ),
        }
    )


def test_fold_unit_null_lsn_loses_and_abid_breaks_ties():
    base = pd.Timestamp("2021-01-01")
    state = _FakeState()
    # null lsn loses to any real lsn even with a later updated_at
    row = _fold([_mk([
        {"lsn": None, "upd": base + pd.Timedelta("2D"), "ab": "b", "text": "null-lsn"},
        {"lsn": 5, "upd": base, "ab": "a", "text": "real-lsn"},
    ])], state)
    assert row["_airbyte_ab_id"] == "a" and row["text"] == "real-lsn"

    # identical (lsn, upd, emit): higher ab_id wins (reference tiebreak)
    state2 = _FakeState()
    row = _fold([_mk([
        {"lsn": 7, "ab": "aa", "text": "lo"},
        {"lsn": 7, "ab": "zz", "text": "hi"},
    ])], state2)
    assert row["_airbyte_ab_id"] == "zz"

    # a later batch with a LOWER lsn cannot displace the state winner
    row = _fold([_mk([{"lsn": 6, "ab": "yy", "text": "stale"}])], state2)
    assert row["_airbyte_ab_id"] == "zz" and row["text"] == "hi"

    # ... but a higher lsn tombstone does, and flags deletion
    row = _fold([_mk([{"lsn": 9, "ab": "dd", "del": base}])], state2)
    assert row["_airbyte_ab_id"] == "dd" and bool(row["is_deleted"])
