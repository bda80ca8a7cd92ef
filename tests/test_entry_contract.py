"""Driver-contract regression net: entry() and every queries() entry
execute and return sane shapes at sf0.001 (the smoke scale). Value
parity vs DuckDB is tools/check_oracles.py's job; this keeps the
contract importable and runnable under plain pytest."""

import __spark_entry__ as ent

SF = "/root/testdata/sf0.001"
MUST_BE_NONEMPTY = {
    "cdc_latest_wins",
    "cdc_winner_agg",
    "cdc_scd2_history",
    "cdc_tombstone_stats",
    "cdc_idempotent_replay",
    "cdc_incremental_cursor",
    "cdc_epoch_plan",
    "cdc_schema_evolution",
    "cdc_snapshot_plus_log",
    "cdc_composite_pk_dedup",
    "json_extract_cast",
    "docs_exact_dedup",
    "docs_fingerprint",
    "docs_quality",
    "docs_lang_id",
    "docs_minhash",
    "docs_token_bpe",
    "emb_lsh_buckets",
    "multimodal_binary_meta",
    "multimodal_image_meta",
}


def test_entry_smoke(spark):
    df = ent.entry(spark)
    assert df.count() > 0
    assert df.columns == ["url", "_ab_cdc_lsn", "updated_us", "event_type", "value_m"]


def test_every_query_runs(spark):
    qs = ent.queries()
    oracles = ent.oracle_sql()
    assert set(oracles) <= set(qs)
    for name, fn in qs.items():
        df = fn(spark, SF)
        n = df.count()
        assert n >= 0, name
        if name in MUST_BE_NONEMPTY:
            assert n > 0, f"{name} unexpectedly empty at sf0.001"
        assert df.columns, name


def test_oracle_sql_strings_are_wellformed():
    import duckdb

    con = duckdb.connect()
    # the driver pre-registers ALL testdata tables as views
    for t in (
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    for name, sql in ent.oracle_sql().items():
        con.execute(sql)  # raises on any syntax/binder error
