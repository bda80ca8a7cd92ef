"""Winner rule: window == associative agg == salted two-phase ==
independent DuckDB oracle (SURVEY §7.5 associativity risk)."""

from airbyte_integrations_spark.gen import gen_change_events
from airbyte_integrations_spark.operators.dedup import (
    winner_agg,
    winner_join,
    winner_salted,
    winner_window,
)
from tests.util import assert_frames_equal, duckdb_winners

COLS = [
    "url",
    "lang",
    "text",
    "_ab_cdc_lsn",
    "_ab_cdc_updated_at",
    "_ab_cdc_deleted_at",
    "_airbyte_ab_id",
    "_airbyte_emitted_at",
]


def _events(spark, n=3000, n_urls=80):
    # few urls + heavy skew => hot keys, many updates and deletes per key
    return gen_change_events(spark, n, n_urls=n_urls, skew_alpha=2.5).select(*COLS)


def test_window_matches_duckdb_oracle(spark):
    ev = _events(spark)
    got = winner_window(ev, drop_tombstones=True).toPandas()
    want = duckdb_winners(ev.toPandas())
    assert_frames_equal(got, want)


def test_agg_matches_window(spark):
    ev = _events(spark)
    a = winner_agg(ev, drop_tombstones=True).toPandas()
    w = winner_window(ev, drop_tombstones=True).toPandas()
    assert_frames_equal(a, w)


def test_agg_bucketed_matches_window(spark):
    """The bucket-keyed single-exchange variant (the MoR delta-write
    default) must produce the same winners as the literal window, be
    bucket-consistent with the writer's bucket_expr, and keep rows
    bucket-pure per partition (the aligned-write premise)."""
    from pyspark.sql import functions as F

    from airbyte_integrations_spark.lakehouse.table import bucket_expr
    from airbyte_integrations_spark.operators.dedup import winner_agg_bucketed

    ev = _events(spark)
    b = winner_agg_bucketed(
        ev, ("url",), "_ab_cdc_lsn",
        ("_ab_cdc_updated_at", "_airbyte_emitted_at"), "_airbyte_ab_id",
        bucket_expr(("url",), 16), 16, drop_tombstones=True,
    )
    w = winner_window(ev, drop_tombstones=True).toPandas()
    assert_frames_equal(b.drop("_bucket").toPandas(), w)
    # bucket column agrees with the writer's rule for every winner
    assert (
        b.filter(F.col("_bucket") != bucket_expr(("url",), 16)).count() == 0
    )
    # bucket-pure partitions: no bucket id spans two partitions
    spread = (
        b.select("_bucket", F.spark_partition_id().alias("pid"))
        .distinct()
        .groupBy("_bucket")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert spread == 0


def test_join_matches_window(spark):
    ev = _events(spark)
    j = winner_join(ev, drop_tombstones=True).toPandas()
    w = winner_window(ev, drop_tombstones=True).toPandas()
    assert_frames_equal(j, w)


def test_join_with_duplicate_events(spark):
    """Redelivered identical events (same lsn) must not break the
    candidate-join path."""
    ev = _events(spark, 1000, 30)
    doubled = ev.unionByName(ev)
    j = winner_join(doubled, drop_tombstones=True).toPandas()
    w = winner_window(ev, drop_tombstones=True).toPandas()
    assert_frames_equal(j, w)


def test_salted_matches_window(spark):
    ev = _events(spark)
    s = winner_salted(ev, n_salts=7, drop_tombstones=True).toPandas()
    w = winner_window(ev, drop_tombstones=True).toPandas()
    assert_frames_equal(s, w)


def test_null_cursor_ordering(spark):
    """cursor IS NULL sorts last (a null-lsn row only wins if alone)."""
    import datetime as dt

    rows = [
        ("u", None, dt.datetime(2021, 1, 2), None, "b", dt.datetime(2021, 1, 2)),
        ("u", 5, dt.datetime(2021, 1, 1), None, "a", dt.datetime(2021, 1, 1)),
        ("v", None, dt.datetime(2021, 1, 1), None, "c", dt.datetime(2021, 1, 1)),
    ]
    df = spark.createDataFrame(
        rows,
        "url string, _ab_cdc_lsn long, _ab_cdc_updated_at timestamp, "
        "_ab_cdc_deleted_at timestamp, _airbyte_ab_id string, "
        "_airbyte_emitted_at timestamp",
    )
    for impl in (winner_window, winner_agg, winner_salted, winner_join):
        got = {r["url"]: r["_airbyte_ab_id"] for r in impl(df).collect()}
        assert got == {"u": "a", "v": "c"}, impl.__name__


def test_hot_key_skew(spark):
    """One url owns ~half of all events (the Zipf head at 10^10):
    the join path must agree with the window truth and not collapse
    onto a single reducer (hash-agg partial aggregation)."""
    from pyspark.sql import functions as F

    ev = gen_change_events(spark, 40_000, n_urls=400, skew_alpha=8.0).select(*COLS)
    top = (
        ev.groupBy("url").count().orderBy(F.desc("count")).limit(1).collect()[0]
    )
    assert top["count"] > 10_000  # genuinely hot
    j = winner_join(ev, drop_tombstones=True).toPandas()
    w = winner_window(ev, drop_tombstones=True).toPandas()
    assert_frames_equal(j, w)
