"""JDBC destination writeback, live on embedded Derby — the
DestinationAcceptanceTest trio (destination-jdbc's
JdbcBufferedConsumerFactory staged-write lifecycle):

- second-sync overwrite replaces the first        (:409)
- incremental append = union of syncs             (:508-552)
- incremental dedup  = latest row per PK          (:586-660)

plus atomicity (a failed publish leaves final untouched) and additive
schema evolution."""

import pytest
from pyspark.sql import functions as F

from airbyte_integrations_spark.destinations.jdbc import (
    JdbcDestination,
    JdbcDestinationConfig,
)

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"
# Derby's default Spark string mapping is CLOB (non-comparable);
# acceptance frames pin VARCHAR for the PK + payload strings
COLTYPES = "pk VARCHAR(64), name VARCHAR(200)"


@pytest.fixture()
def derby_url(spark, tmp_path):
    db = str(tmp_path / "destdb")
    url = f"jdbc:derby:{db};create=true"
    jvm = spark._jvm
    jvm.java.lang.Class.forName(DERBY_DRIVER)
    conn = jvm.java.sql.DriverManager.getConnection(url)
    conn.close()
    return f"jdbc:derby:{db}"


def _dest(spark, url):
    return JdbcDestination(spark, JdbcDestinationConfig(url=url, driver=DERBY_DRIVER))


def _read_back(spark, url, table):
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("driver", DERBY_DRIVER)
        .option("dbtable", table.upper())
        .load()
    )


def _batch(spark, rows):
    return spark.createDataFrame(rows, "pk string, ver long, name string")


def test_overwrite_second_sync_replaces_first(spark, derby_url):
    dest = _dest(spark, derby_url)
    first = _batch(spark, [("a", 1, "first-a"), ("b", 1, "first-b")])
    dest.write(first, "users", mode="overwrite",
               create_table_column_types=COLTYPES)
    assert _read_back(spark, derby_url, "users").count() == 2

    second = _batch(spark, [("c", 2, "second-c")])
    dest.write(second, "users", mode="overwrite",
               create_table_column_types=COLTYPES)
    rows = _read_back(spark, derby_url, "users").collect()
    # the overwrite sync REPLACED everything (acceptance :409)
    assert len(rows) == 1 and rows[0]["pk"] == "c"
    # no tmp tables left behind
    conn = spark._jvm.java.sql.DriverManager.getConnection(derby_url)
    rs = conn.getMetaData().getTables(None, None, "AIRBYTE_TMP_%", None)
    assert not rs.next()
    rs.close()
    conn.close()


def test_incremental_append_unions_syncs(spark, derby_url):
    dest = _dest(spark, derby_url)
    dest.write(_batch(spark, [("a", 1, "x")]), "events", mode="append",
               create_table_column_types=COLTYPES)
    dest.write(_batch(spark, [("a", 2, "y"), ("b", 1, "z")]), "events",
               mode="append", create_table_column_types=COLTYPES)
    got = _read_back(spark, derby_url, "events")
    # append keeps every record from every sync (acceptance :508-552)
    assert got.count() == 3
    assert got.filter("pk = 'a'").count() == 2


def test_incremental_dedup_latest_per_pk(spark, derby_url):
    dest = _dest(spark, derby_url)
    # sync 1: a@1, b@1 (with an in-batch duplicate a@2 that must win)
    s1 = _batch(spark, [("a", 1, "a-old"), ("a", 2, "a-mid"), ("b", 1, "b-v1")])
    dest.write(s1, "accounts", mode="append_dedup",
               primary_key=("pk",), cursor="ver",
               create_table_column_types=COLTYPES)
    got = _read_back(spark, derby_url, "accounts").toPandas().set_index("pk")
    assert len(got) == 2 and got.loc["a", "name"] == "a-mid"

    # sync 2: newer a beats final; older b loses to final; new c inserts
    s2 = _batch(spark, [("a", 5, "a-new"), ("b", 0, "b-stale"), ("c", 1, "c-v1")])
    dest.write(s2, "accounts", mode="append_dedup",
               primary_key=("pk",), cursor="ver",
               create_table_column_types=COLTYPES)
    got = _read_back(spark, derby_url, "accounts").toPandas().set_index("pk")
    # ONE row per PK, max-cursor winner (acceptance :586-660)
    assert len(got) == 3
    assert got.loc["a", "name"] == "a-new" and got.loc["a", "ver"] == 5
    assert got.loc["b", "name"] == "b-v1" and got.loc["b", "ver"] == 1
    assert got.loc["c", "name"] == "c-v1"

    # replaying sync 2 converges (tie -> staged row, same values)
    dest.write(s2, "accounts", mode="append_dedup",
               primary_key=("pk",), cursor="ver",
               create_table_column_types=COLTYPES)
    again = _read_back(spark, derby_url, "accounts").toPandas().set_index("pk")
    assert len(again) == 3 and again.loc["a", "name"] == "a-new"


def test_publish_failure_leaves_final_untouched(spark, derby_url):
    """Atomicity: the tmp->final copy is ONE transaction — a failure
    mid-publish must roll back, keeping the previous final state
    (JdbcBufferedConsumerFactory:173-197 contract)."""
    dest = _dest(spark, derby_url)
    dest.write(_batch(spark, [("a", 1, "keep")]), "t", mode="overwrite",
               create_table_column_types=COLTYPES)

    # incompatible batch: same column name, uncastable type => the
    # INSERT INTO final SELECT FROM tmp fails inside the transaction
    bad = spark.createDataFrame([("x", 1, 9)], "pk string, ver long, name long")
    with pytest.raises(Exception):
        dest.write(bad, "t", mode="overwrite",
                   create_table_column_types="pk VARCHAR(64)")
    got = _read_back(spark, derby_url, "t").collect()
    assert len(got) == 1 and got[0]["name"] == "keep"  # rollback held


def test_additive_schema_evolution(spark, derby_url):
    dest = _dest(spark, derby_url)
    dest.write(_batch(spark, [("a", 1, "x")]), "grow", mode="append",
               create_table_column_types=COLTYPES)
    wider = spark.createDataFrame(
        [("b", 2, "y", 7.5)], "pk string, ver long, name string, score double"
    )
    dest.write(wider, "grow", mode="append",
               create_table_column_types=COLTYPES + ", score DOUBLE")
    got = _read_back(spark, derby_url, "grow").toPandas().set_index("pk")
    assert "score" in got.columns
    assert got.loc["b", "score"] == 7.5
    import math
    assert math.isnan(got.loc["a", "score"]) or got.loc["a", "score"] is None


def test_dedup_null_final_cursor_always_loses(spark, derby_url):
    """A final row whose cursor is NULL carries no order information:
    any staged winner for that PK must replace it (the bare >= would
    evaluate NULL, keeping the stale row AND blocking the insert)."""
    dest = _dest(spark, derby_url)
    s1 = spark.createDataFrame(
        [("a", None, "a-nullver"), ("b", 7, "b-v7")],
        "pk string, ver long, name string",
    )
    dest.write(s1, "nullcur", mode="append_dedup",
               primary_key=("pk",), cursor="ver",
               create_table_column_types=COLTYPES)
    s2 = _batch(spark, [("a", 1, "a-real")])
    dest.write(s2, "nullcur", mode="append_dedup",
               primary_key=("pk",), cursor="ver",
               create_table_column_types=COLTYPES)
    got = _read_back(spark, derby_url, "nullcur").toPandas().set_index("pk")
    assert len(got) == 2
    assert got.loc["a", "name"] == "a-real" and got.loc["a", "ver"] == 1
    assert got.loc["b", "name"] == "b-v7"


def test_check_create_drop_probe(spark, derby_url):
    """AbstractJdbcDestination.check (:57-91) parity: create+drop a
    random probe table -> SUCCEEDED; unreachable database -> FAILED."""
    from airbyte_integrations_spark.destinations.jdbc import (
        JdbcDestination,
        JdbcDestinationConfig,
    )

    dest = JdbcDestination(spark, JdbcDestinationConfig(url=derby_url))
    assert dest.check() == {"status": "SUCCEEDED"}
    bad = JdbcDestination(
        spark, JdbcDestinationConfig(url="jdbc:derby:/nonexistent/nope")
    )
    out = bad.check()
    assert out["status"] == "FAILED" and out["message"]
