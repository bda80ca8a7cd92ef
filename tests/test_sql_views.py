"""SQL serving surface: register_sql_views — plain spark.sql over the
lake with MoR resolution, snapshot pinning, and as-of-LSN consistency."""

from airbyte_integrations_spark.catalog_sync import (
    ConfiguredCatalog,
    ConfiguredStream,
    read_catalog,
    register_sql_views,
    stream_table,
)
from airbyte_integrations_spark.config import SyncConfig
from tests.test_fuzz_catalog import _df


def _catalog(spark, events_by_stream, write_mode="mor"):
    return ConfiguredCatalog(
        streams=tuple(
            ConfiguredStream(
                config=SyncConfig(stream=s, n_buckets=2, write_mode=write_mode),
                source={"kind": "dataframe", "df": _df(spark, ev)},
            )
            for s, ev in events_by_stream.items()
        )
    )


def test_views_resolve_mor_and_join_across_streams(spark, tmp_path):
    evs = {
        "pages": [("u1", 1, False), ("u1", 5, False), ("u2", 3, True)],
        "links": [("u1", 2, False), ("u3", 4, False)],
    }
    root = str(tmp_path / "lake")
    read_catalog(spark, _catalog(spark, evs), root, max_events_per_epoch=2)
    names = register_sql_views(spark, _catalog(spark, evs), root, metadata=True)
    assert "pages" in names and "links__files" in names

    rows = spark.sql(
        "SELECT p.url, p._ab_cdc_lsn AS plsn, l._ab_cdc_lsn AS llsn "
        "FROM pages p JOIN links l USING (url)"
    ).collect()
    # pages live = {u1@5} (u2 tombstoned); links live = {u1@2, u3@4}
    assert [(r["url"], r["plsn"], r["llsn"]) for r in rows] == [("u1", 5, 2)]
    assert spark.sql("SELECT count(*) FROM pages__history").collect()[0][0] >= 1

    # snapshot pinning: a later sync is invisible until re-register
    evs2 = {"pages": [("u9", 99, False)], "links": []}
    read_catalog(
        spark,
        _catalog(spark, {"pages": evs["pages"] + evs2["pages"]}),
        root,
        max_events_per_epoch=10,
    )
    assert spark.sql("SELECT count(*) FROM pages").collect()[0][0] == 1
    register_sql_views(spark, _catalog(spark, evs), root)
    assert spark.sql("SELECT count(*) FROM pages").collect()[0][0] == 2


def test_views_asof_lsn_cross_stream_consistency(spark, tmp_path):
    evs = {
        "pages": [("u1", 1, False), ("u1", 8, False)],
        "links": [("u1", 2, False), ("u1", 9, False)],
    }
    root = str(tmp_path / "lake")
    # two epochs per stream so an intermediate watermark exists
    read_catalog(spark, _catalog(spark, evs, write_mode="cow"), root,
                 max_events_per_epoch=1)
    names = register_sql_views(
        spark, _catalog(spark, evs), root, prefix="asof_", asof_lsn=5
    )
    assert set(names) == {"asof_pages", "asof_links"}
    # at WAL position 5, neither stream shows the post-5 updates
    assert spark.sql(
        "SELECT max(_ab_cdc_lsn) FROM asof_pages"
    ).collect()[0][0] == 1
    assert spark.sql(
        "SELECT max(_ab_cdc_lsn) FROM asof_links"
    ).collect()[0][0] == 2
    # a position before any commit registers nothing
    assert register_sql_views(
        spark, _catalog(spark, evs), root, prefix="none_", asof_lsn=0
    ) == []
    for t in (stream_table(spark, root, "pages"),):
        assert t.read_live().count() == 1  # live head unaffected
