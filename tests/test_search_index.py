"""Search-index destination (destinations/search_index.py) — the
destination-elasticsearch shape maintained under CDC semantics:
upsert-by-PK (ElasticsearchConnection.java:146-183), tombstone
deletes, idempotent epoch replay, temp-index-swap publish parity
(ElasticsearchAirbyteMessageConsumerFactory.java:40-56,104-117), and
bucket-pruned query scoring vs a brute-force oracle."""

import os

import pytest
from pyspark.sql import functions as F

from airbyte_integrations_spark.destinations.search_index import SearchIndex

CDC = (
    "_ab_cdc_lsn bigint, _ab_cdc_updated_at timestamp, "
    "_ab_cdc_deleted_at timestamp, _airbyte_ab_id string, "
    "_airbyte_emitted_at timestamp"
)


def _batch(spark, rows):
    """rows: (doc_id, text, lsn, deleted?)"""
    data = [
        (
            d, t, lsn,
            "2024-01-01 00:00:00",
            "2024-01-01 00:00:01" if dead else None,
            f"ab-{lsn}",
            "2024-01-01 00:00:02",
        )
        for d, t, lsn, dead in rows
    ]
    df = spark.createDataFrame(
        data,
        "doc_id bigint, text string, _ab_cdc_lsn bigint, u string, "
        "d string, _airbyte_ab_id string, e string",
    )
    return df.select(
        "doc_id", "text", "_ab_cdc_lsn",
        F.col("u").cast("timestamp").alias("_ab_cdc_updated_at"),
        F.col("d").cast("timestamp").alias("_ab_cdc_deleted_at"),
        "_airbyte_ab_id",
        F.col("e").cast("timestamp").alias("_airbyte_emitted_at"),
    )


def _queries(spark, pairs):
    return spark.createDataFrame(pairs, "query_id int, term string")


def test_lifecycle_upsert_update_delete_query(spark, tmp_path):
    idx = SearchIndex(spark, str(tmp_path / "ix"), key=("doc_id",))
    idx.upsert(
        _batch(spark, [
            (1, "spark merge join spark", 10, False),
            (2, "window sort merge", 11, False),
            (3, "spark window", 12, False),
        ]),
        epoch=1, n_buckets=4,
    )
    # update doc 1 (drops 'spark' emphasis), delete doc 2
    idx.upsert(
        _batch(spark, [
            (1, "merge join", 20, False),
            (2, "window sort merge", 21, True),
        ]),
        epoch=2, n_buckets=4,
    )
    idx.publish(n_term_buckets=8)
    out = idx.query(_queries(spark, [(1, "spark"), (1, "merge"), (2, "window")]))
    got = {(r["query_id"], r["doc_id"]): (r["rank"], r["score_m"], r["n_terms_hit"])
           for r in out.collect()}
    # final state: d1="merge join", d3="spark window"; d2 gone.
    # df: spark->1 (d3), merge->1 (d1), window->1 (d3)
    # q1: d1 merge tf1 -> 1e6; d3 spark tf1 -> 1e6; tie -> doc_id asc
    assert got[(1, 1)] == (1, 1_000_000, 1)
    assert got[(1, 3)] == (2, 1_000_000, 1)
    # q2: only d3 has window
    assert got[(2, 3)] == (1, 1_000_000, 1)
    assert (2, 2) not in got and (1, 2) not in got


def test_epoch_replay_is_noop_and_update_replaces_postings(spark, tmp_path):
    idx = SearchIndex(spark, str(tmp_path / "ix"))
    b1 = _batch(spark, [(1, "alpha beta", 5, False)])
    idx.upsert(b1, epoch=1, n_buckets=2)
    v = idx.table.current_version()
    idx.upsert(b1, epoch=1, n_buckets=2)  # replay: exact no-op
    assert idx.table.current_version() == v
    idx.upsert(_batch(spark, [(1, "gamma", 9, False)]), epoch=2, n_buckets=2)
    idx.publish(n_term_buckets=4)
    # old terms must be gone from the index — the _id upsert replaced
    # the whole stored document (indexDocuments index-op semantics)
    out = idx.query(_queries(spark, [(7, "alpha"), (7, "gamma")]))
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["doc_id"] == 1
    assert rows[0]["n_terms_hit"] == 1


def test_publish_swap_is_atomic_and_versioned(spark, tmp_path):
    idx = SearchIndex(spark, str(tmp_path / "ix"))
    idx.upsert(_batch(spark, [(1, "one two", 1, False)]), epoch=1, n_buckets=2)
    v1 = idx.publish(n_term_buckets=4)
    m1 = idx._serving()
    idx.upsert(_batch(spark, [(2, "two three", 2, False)]), epoch=2, n_buckets=2)
    v2 = idx.publish(n_term_buckets=4)
    m2 = idx._serving()
    # versioned snapshot dirs; the pointer moved; the old snapshot is
    # still intact (a reader mid-query keeps a consistent view)
    assert v2 > v1 and m2["path"] != m1["path"]
    assert os.path.isdir(m1["path"]) and os.path.isdir(m2["path"])
    out = idx.query(_queries(spark, [(1, "three")]))
    assert [r["doc_id"] for r in out.collect()] == [2]


def test_query_prunes_to_term_buckets(spark, tmp_path):
    """The postings scan must touch ONLY the query terms' bucket
    partitions — partition pruning is the scale contract."""
    idx = SearchIndex(spark, str(tmp_path / "ix"))
    rows = [(i, f"term{i} shared", 100 + i, False) for i in range(20)]
    idx.upsert(_batch(spark, rows), epoch=1, n_buckets=2)
    idx.publish(n_term_buckets=16)
    q = _queries(spark, [(1, "term3")])
    out = idx.query(q)
    # correctness
    assert [r["doc_id"] for r in out.collect()] == [3]
    # pruning: the executed plan's parquet scan carries a partition
    # filter on bucket
    m = idx._serving()
    b = (
        spark.createDataFrame([("term3",)], "term string")
        .select(F.pmod(F.xxhash64("term"), F.lit(16)).alias("b"))
        .collect()[0]["b"]
    )
    post = spark.read.parquet(os.path.join(m["path"], "postings")).filter(
        F.col("bucket").isin([int(b)]) & F.col("term").isin(["term3"])
    )
    phys = post._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in phys and "bucket" in phys


def test_composite_key_and_missing_text_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="one key"):
        SearchIndex(spark, str(tmp_path / "a"), key=("a", "b"))
    idx = SearchIndex(spark, str(tmp_path / "b"))
    with pytest.raises(ValueError, match="text"):
        idx.upsert(spark.createDataFrame([(1,)], "doc_id bigint"), epoch=1)


def test_scores_match_brute_force_oracle(spark, tmp_path):
    import duckdb

    idx = SearchIndex(spark, str(tmp_path / "ix"))
    texts = [
        (1, "spark join merge window spark"),
        (2, "merge merge sort group"),
        (3, "customer query table spark"),
        (4, "table table table join"),
    ]
    idx.upsert(
        _batch(spark, [(d, t, 50 + d, False) for d, t in texts]),
        epoch=1, n_buckets=2,
    )
    idx.publish(n_term_buckets=8)
    q = [(1, "spark"), (1, "merge"), (2, "table"), (2, "join")]
    got = idx.query(_queries(spark, q), k=10).toPandas()
    con = duckdb.connect()
    con.execute("CREATE TABLE d(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", texts)
    con.execute("CREATE TABLE q(query_id INT, term VARCHAR)")
    con.executemany("INSERT INTO q VALUES (?, ?)", q)
    want = con.execute(r"""
        WITH tok AS (
          SELECT doc_id,
                 unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
          FROM d
        ),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        scored AS (
          SELECT q.query_id, tf.doc_id,
                 sum((tf.tf * 1000000) // dfreq.df) AS score_m,
                 count(*) AS n_terms_hit
          FROM tf JOIN dfreq USING (term) JOIN q USING (term)
          GROUP BY 1, 2
        )
        SELECT query_id, CAST(row_number() OVER (
                 PARTITION BY query_id ORDER BY score_m DESC, doc_id ASC)
               AS INTEGER) AS rank,
               doc_id, CAST(score_m AS BIGINT) AS score_m,
               CAST(n_terms_hit AS BIGINT) AS n_terms_hit
        FROM scored
    """).df()
    g = got.sort_values(["query_id", "rank"]).reset_index(drop=True)
    w = want.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert g[["query_id", "rank", "doc_id", "score_m", "n_terms_hit"]].astype(
        "int64"
    ).equals(w[["query_id", "rank", "doc_id", "score_m", "n_terms_hit"]].astype("int64"))
