"""Zone maps: per-file [min,max] column stats in the manifest (Iceberg
DataFile lower_bounds/upper_bounds analogue), collected from parquet
footers at commit time for key cols + the winner cursor, and the two
pruned read paths built on them — read_since (changed-since feed) and
read_key (point lookup). Pruning must be invisible in values and
visible in files-scanned counts."""

import pytest
from pyspark.sql import functions as F

from airbyte_integrations_spark.config import SyncConfig
from airbyte_integrations_spark.gen import gen_change_events
from airbyte_integrations_spark.lakehouse.merge import merge_into
from airbyte_integrations_spark.lakehouse.table import LakeTable
from airbyte_integrations_spark.streaming.microbatch import run_sync
from tests.util import assert_frames_equal

COLS = [
    "url", "warc_ts", "text", "lang",
    "_ab_cdc_lsn", "_ab_cdc_updated_at", "_ab_cdc_deleted_at",
    "_airbyte_ab_id", "_airbyte_emitted_at",
]


@pytest.fixture()
def events(spark):
    return gen_change_events(spark, 2000, n_urls=80, skew_alpha=2.5).select(*COLS)


def _mor(spark, tmp_path, events, epochs=4):
    table = LakeTable(spark, str(tmp_path / "t"))
    cfg = SyncConfig(stream="pages", n_buckets=4, write_mode="mor")
    run_sync(spark, events, table, cfg,
             max_events_per_epoch=events.count() // epochs + 1,
             extract_missing_text=False, compact_threshold=None)
    return table


def _all_paths(m):
    return [p for ps in m["files"].values() for p in ps] + [
        p for ps in m.get("deltas", {}).values() for p in ps
    ]


def test_every_file_has_stats(spark, tmp_path, events):
    table = _mor(spark, tmp_path, events)
    m = table.manifest()
    stats = m["stats"]
    for p in _all_paths(m):
        assert p in stats
        # url (string key) and _ab_cdc_lsn (long cursor) both tracked
        assert "_ab_cdc_lsn" in stats[p] and "url" in stats[p]
        lo, hi = stats[p]["_ab_cdc_lsn"]
        assert lo <= hi


def test_stats_inherited_not_recomputed(spark, tmp_path, events):
    """Carried-forward files keep their stats entry verbatim (immutable
    files, immutable stats — O(new files) footer reads per commit)."""
    table = _mor(spark, tmp_path, events)
    before = dict(table.manifest()["stats"])
    hi = events.agg(F.max("_ab_cdc_lsn")).first()[0]
    batch = events.limit(50).withColumn("_ab_cdc_lsn", F.col("_ab_cdc_lsn") + hi)
    merge_into(table, batch, stream="pages", epoch=hi + 1, mode="mor")
    after = table.manifest()["stats"]
    for p, entry in before.items():
        if p in after:
            assert after[p] == entry
    assert len(after) > len([p for p in before if p in after]) or set(after) - set(before)


def test_read_since_equals_unpruned_and_prunes(spark, tmp_path, events):
    table = _mor(spark, tmp_path, events)
    cut = int(events.approxQuantile("_ab_cdc_lsn", [0.75], 0.0)[0])
    expect = table.read_live().filter(F.col("_ab_cdc_lsn") > cut)
    got = table.read_since(cut)
    assert_frames_equal(
        got.toPandas().sort_values("url").reset_index(drop=True),
        expect.toPandas().sort_values("url").reset_index(drop=True),
    )
    # pruning actually bit: later epochs' files only
    cursor = "_ab_cdc_lsn"
    base_p, delta_p, total = table._pruned_paths(
        None, lambda e: e.get(cursor) is None or e[cursor][1] > cut
    )
    assert len(base_p) + len(delta_p) < total


def test_read_since_include_deletes_carries_tombstones(spark, tmp_path, events):
    table = _mor(spark, tmp_path, events)
    feed = table.read_since(0, include_deletes=True)
    dead = feed.filter(F.col("_ab_cdc_deleted_at").isNotNull()).count()
    live = table.read_live().count()
    assert dead > 0  # deletes ARE changes in the changelog feed
    assert feed.count() == dead + live


def test_read_key_point_lookup(spark, tmp_path, events):
    table = _mor(spark, tmp_path, events)
    live = table.read_live()
    url = live.select("url").orderBy("url").first()["url"]
    got = table.read_key(url).toPandas()
    expect = live.filter(F.col("url") == url).toPandas()
    assert_frames_equal(
        got.sort_index(axis=1), expect.sort_index(axis=1)
    )
    # bucket pruning alone reduces candidates; zone map can only shrink
    bucket = str(table.key_bucket(url))
    m = table.manifest()
    in_bucket = len(m["files"].get(bucket, [])) + len(
        m.get("deltas", {}).get(bucket, [])
    )
    assert in_bucket < len(_all_paths(m))


def test_read_key_deleted_url_returns_empty(spark, tmp_path, events):
    table = _mor(spark, tmp_path, events)
    gone = (
        table.read_resolved()  # live view
        .select("url")
        .subtract(events.filter(F.col("_ab_cdc_deleted_at").isNotNull())
                  .select("url"))
    )
    deleted_urls = (
        events.filter(F.col("_ab_cdc_deleted_at").isNotNull()).select("url")
        .subtract(table.read_live().select("url"))
        .limit(1).collect()
    )
    if deleted_urls:  # skew gen usually produces at least one dead url
        assert table.read_key(deleted_urls[0]["url"]).count() == 0
    assert gone is not None


def test_stats_survive_compact_and_time_travel(spark, tmp_path, events):
    table = _mor(spark, tmp_path, events)
    v_old = table.current_version()
    cut = int(events.approxQuantile("_ab_cdc_lsn", [0.5], 0.0)[0])
    before = table.read_since(cut).toPandas().sort_values("url").reset_index(drop=True)
    table.compact()
    m = table.manifest()
    for p in _all_paths(m):
        assert p in m["stats"] and "_ab_cdc_lsn" in m["stats"][p]
    after = table.read_since(cut).toPandas().sort_values("url").reset_index(drop=True)
    assert_frames_equal(after, before)
    # the pre-compaction snapshot answers with its own stats
    old = (
        table.read_since(cut, version=v_old)
        .toPandas().sort_values("url").reset_index(drop=True)
    )
    assert_frames_equal(old, before)


def test_truncate_upper_is_a_true_upper_bound():
    t = LakeTable._truncate_upper
    assert t("abc", 10) == "abc"
    assert t("abcdef", 3) == "abd" and "abcdef" < "abd"
    s = "x" * 5 + chr(0x10FFFF)
    assert t(s, 6) == s
    assert t(chr(0x10FFFF) * 4, 2) is None
    long = "url-common-prefix-" + "z" * 200
    up = t(long, 96)
    assert up is not None and long <= up * 3  # up > long lexicographically
    assert long < up
