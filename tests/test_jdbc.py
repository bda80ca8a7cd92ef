"""JDBC source: type-mapping matrix parity + a REAL spark JDBC read
against the embedded Derby database bundled with Spark (no server
needed — the driver runs in the same JVM), including cursor pushdown
reaching the database as a pushed predicate."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from airbyte_integrations_spark.sources.jdbc import (
    JDBC_TO_JSON,
    JDBC_TO_SPARK,
    JdbcSource,
    JdbcSourceConfig,
    cursor_literal,
    jdbc_json_schema,
    jdbc_schema,
    jdbc_type_to_spark,
    quote_identifier,
)


# ---------------------------------------------------------------- mapping

def test_type_matrix_mirrors_reference_switch_arms():
    """Every arm of JdbcSourceOperations.setJsonField (java:46-58) has a
    mapping, grouped identically."""
    assert jdbc_type_to_spark("BIT") == jdbc_type_to_spark("BOOLEAN") == T.BooleanType()
    assert jdbc_type_to_spark("TINYINT") == jdbc_type_to_spark("SMALLINT") == T.ShortType()
    assert jdbc_type_to_spark("INTEGER") == T.IntegerType()
    assert jdbc_type_to_spark("BIGINT") == T.LongType()
    assert jdbc_type_to_spark("FLOAT") == jdbc_type_to_spark("DOUBLE") == T.DoubleType()
    assert jdbc_type_to_spark("REAL") == T.FloatType()
    assert jdbc_type_to_spark("NUMERIC") == jdbc_type_to_spark("DECIMAL") == T.DecimalType(38, 18)
    for t in ("CHAR", "NCHAR", "NVARCHAR", "VARCHAR", "LONGVARCHAR", "TIME"):
        assert jdbc_type_to_spark(t) == T.StringType()
    assert jdbc_type_to_spark("DATE") == T.DateType()
    assert jdbc_type_to_spark("TIMESTAMP") == T.TimestampType()
    for t in ("BLOB", "BINARY", "VARBINARY", "LONGVARBINARY"):
        assert jdbc_type_to_spark(t) == T.BinaryType()
    assert jdbc_type_to_spark("ARRAY") == T.ArrayType(T.StringType())
    # default -> VARCHAR (safeGetJdbcType:30-36, getJsonType:121-122)
    assert jdbc_type_to_spark("SQLXML") == T.StringType()
    assert jdbc_type_to_spark("no_such_type") == T.StringType()
    # JSON advertisement matrix covers the same keys
    assert set(JDBC_TO_JSON) == set(JDBC_TO_SPARK)
    assert JDBC_TO_JSON["BLOB"]["contentEncoding"] == "base64"
    assert JDBC_TO_JSON["TIMESTAMP"] == {"type": ["null", "string"]}


def test_schema_builders():
    cols = {"id": "BIGINT", "name": "VARCHAR", "ok": "BOOLEAN", "blob": "BLOB"}
    st = jdbc_schema(cols)
    assert [f.dataType for f in st.fields] == [
        T.LongType(), T.StringType(), T.BooleanType(), T.BinaryType()
    ]
    js = jdbc_json_schema(cols)
    assert js["properties"]["id"] == {"type": ["null", "number"]}
    assert js["properties"]["blob"]["contentEncoding"] == "base64"


def test_cursor_literal_strict_typing():
    """setStatementField parity: comparable types render; anything else
    errors (JdbcSourceOperations.java:85-87)."""
    assert cursor_literal(42, "BIGINT") == "42"
    assert cursor_literal(1.5, "DOUBLE") == "1.5"
    assert cursor_literal("o'brien", "VARCHAR") == "'o''brien'"
    # JDBC escape syntax: driver-rewritten to the dialect's literal
    # (PostgreSQL rejects TIMESTAMP('...'), Derby rejects TIMESTAMP
    # '...'; {ts '...'} works on both — pinned live on Derby below)
    assert cursor_literal("2024-01-02", "DATE") == "{d '2024-01-02'}"
    assert cursor_literal("2024-01-02 03:04:05", "TIMESTAMP") == "{ts '2024-01-02 03:04:05'}"
    assert cursor_literal(True, "BOOLEAN") == "TRUE"
    # numeric path validates: a string checkpoint that isn't a number
    # (e.g. injection) must raise, never reach the database
    assert cursor_literal("42", "BIGINT") == "42"
    assert cursor_literal("1.5", "DOUBLE") == "1.5"
    for inj in ("1 OR 1=1", "42; DROP TABLE users", ""):
        with pytest.raises(ValueError):
            cursor_literal(inj, "BIGINT")
    with pytest.raises(ValueError):
        cursor_literal(True, "INTEGER")  # bools are not numeric cursors
    for bad in ("BLOB", "BINARY", "ARRAY", "OTHER"):
        with pytest.raises(ValueError):
            cursor_literal("x", bad)
    assert quote_identifier('we"ird') == '"we""ird"'


# ---------------------------------------------------- live Derby round trip

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby(spark, tmp_path_factory):
    """Create an embedded Derby database with a typed table via the
    Spark JVM's DriverManager (same JVM => embedded driver works)."""
    db = str(tmp_path_factory.mktemp("derby") / "srcdb")
    url = f"jdbc:derby:{db};create=true"
    jvm = spark._jvm
    jvm.java.lang.Class.forName(DERBY_DRIVER)
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.execute(
        "CREATE TABLE users (id BIGINT NOT NULL, name VARCHAR(50), "
        "score DOUBLE, active BOOLEAN, updated_at TIMESTAMP)"
    )
    ins = conn.prepareStatement(
        "INSERT INTO users VALUES (?, ?, ?, ?, "
        "TIMESTAMP('2024-01-01 00:00:00'))"
    )
    for i in range(1, 101):
        ins.setLong(1, i)
        ins.setString(2, f"user{i}")
        ins.setDouble(3, i * 0.5)
        ins.setBoolean(4, i % 2 == 0)
        ins.executeUpdate()
    st.close()
    conn.close()
    return f"jdbc:derby:{db}"


def test_jdbc_full_refresh_reads_and_maps_types(spark, derby):
    src = JdbcSource(spark, JdbcSourceConfig(url=derby, table="users", driver=DERBY_DRIVER))
    df = src.read_full()
    assert df.count() == 100
    dt = dict(df.dtypes)
    assert dt["ID"] == "bigint" and dt["SCORE"] == "double"
    assert dt["ACTIVE"] == "boolean" and dt["UPDATED_AT"].startswith("timestamp")


def test_jdbc_incremental_cursor_pushdown_reaches_db(spark, derby):
    """`WHERE cursor > ?` (AbstractJdbcSource.java:275) must run in the
    DATABASE: the scan node advertises the GreaterThan pushed filter,
    and the strictly-greater bound is honored."""
    src = JdbcSource(
        spark,
        JdbcSourceConfig(url=derby, table="users", driver=DERBY_DRIVER,
                         columns=("ID", "NAME")),
    )
    inc = src.read_incremental("ID", 80)
    plan = inc._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThan(ID,80)" in plan.replace(" ", "").replace("*", "")
    rows = inc.orderBy("ID").collect()
    assert [r["ID"] for r in rows] == list(range(81, 101))  # strictly >
    # column pruning reached the scan too: only the projected columns
    assert inc.columns == ["ID", "NAME"]
    # None checkpoint => full read from the beginning
    assert src.read_incremental("ID", None).count() == 100


def test_jdbc_partitioned_parallel_read(spark, derby):
    """Range-partitioned scan: num_partitions connections, disjoint
    range predicates, union == full table (the 10^10-row shape)."""
    src = JdbcSource(
        spark,
        JdbcSourceConfig(
            url=derby, table="users", driver=DERBY_DRIVER,
            partition_column="ID", num_partitions=4,
            lower_bound=1, upper_bound=101,
        ),
    )
    df = src.read_full()
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 100
    assert df.select(F.sum("ID")).first()[0] == 5050


def test_jdbc_discover_catalog(spark, derby):
    """DatabaseMetaData discovery (AbstractJdbcSource.discoverInternal
    analogue): columns with JDBCType names, PK ordering, and the
    AirbyteCatalog-shaped stream list."""
    from airbyte_integrations_spark.sources.jdbc import discover_tables, jdbc_catalog

    tables = discover_tables(spark, derby, driver=DERBY_DRIVER)
    # streams are schema-qualified: same-named tables in two schemas
    # must stay distinct (discoverInternal keys by namespace+name)
    (users_key,) = [k for k in tables if k.endswith(".USERS") or k == "USERS"]
    info = tables[users_key]
    assert info["table"] == "USERS"
    cols = info["columns"]
    assert cols["ID"] == "BIGINT" and cols["SCORE"] == "DOUBLE"
    assert cols["NAME"] == "VARCHAR" and cols["UPDATED_AT"] == "TIMESTAMP"

    cat = jdbc_catalog(spark, derby, driver=DERBY_DRIVER)
    (users,) = [s for s in cat["streams"] if s["name"] == users_key]
    assert users["json_schema"]["properties"]["ID"] == {"type": ["null", "number"]}
    assert "incremental" in users["supported_sync_modes"]
    # highest-priority candidate type becomes the default cursor
    assert users["default_cursor_field"] == ["UPDATED_AT"]


def test_jdbc_incremental_sync_to_lake_end_to_end(spark, derby, tmp_path):
    """Database -> lake: a JDBC incremental read adapted to change
    events replays through run_sync; a second batch of DB rows resumes
    from the committed watermark and latest-wins per key."""
    from airbyte_integrations_spark.config import SyncConfig
    from airbyte_integrations_spark.lakehouse.table import LakeTable
    from airbyte_integrations_spark.sources.jdbc import as_change_events
    from airbyte_integrations_spark.streaming.microbatch import run_sync

    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(derby)
    st = conn.createStatement()
    st.execute(
        "CREATE TABLE pages_src (page_url VARCHAR(100) NOT NULL, "
        "body VARCHAR(200), change_seq BIGINT NOT NULL)"
    )
    for i in range(1, 41):
        st.execute(
            f"INSERT INTO pages_src VALUES ('https://ex.com/{i % 10}', 'v{i}', {i})"
        )
    st.close()

    src = JdbcSource(spark, JdbcSourceConfig(url=derby, table="pages_src", driver=DERBY_DRIVER))
    table = LakeTable(spark, str(tmp_path / "lake"))
    cfg = SyncConfig(stream="pages", n_buckets=4, secondary_order=())

    ev1 = as_change_events(src.read_incremental("CHANGE_SEQ", None), "PAGE_URL", "CHANGE_SEQ")
    eps1 = run_sync(spark, ev1, table, cfg, max_events_per_epoch=25,
                    extract_missing_text=False)
    assert len(eps1) == 2 and table.watermark("pages") == 40
    live = {r["url"]: r["BODY"] for r in table.read_live().collect()}
    assert len(live) == 10 and live["https://ex.com/9"] == "v39"  # max seq per key

    # new DB rows arrive; resume reads only cursor > watermark
    st = conn.createStatement()
    for i in range(41, 51):
        st.execute(
            f"INSERT INTO pages_src VALUES ('https://ex.com/{i % 10}', 'v{i}', {i})"
        )
    st.close()
    conn.close()
    ev2 = as_change_events(
        src.read_incremental("CHANGE_SEQ", table.watermark("pages")),
        "PAGE_URL", "CHANGE_SEQ",
    )
    assert ev2.count() == 10
    eps2 = run_sync(spark, ev2, table, cfg, max_events_per_epoch=25,
                    extract_missing_text=False)
    assert len(eps2) == 1 and table.watermark("pages") == 50
    live2 = {r["url"]: r["BODY"] for r in table.read_live().collect()}
    assert live2["https://ex.com/9"] == "v49" and len(live2) == 10


def test_jdbc_read_slices_predicates(spark, derby):
    """Explicit per-slice predicates (Airbyte slice analogue), rendered
    with the strict cursor literal."""
    from airbyte_integrations_spark.sources.jdbc import cursor_literal as cl

    src = JdbcSource(spark, JdbcSourceConfig(url=derby, table="users", driver=DERBY_DRIVER))
    df = src.read_slices(
        [f"ID <= {cl(50, 'BIGINT')}", f"ID > {cl(50, 'BIGINT')}"]
    )
    assert df.rdd.getNumPartitions() == 2
    assert df.count() == 100

    # the ANSI typed literal executes database-side
    ts = cl("2023-12-31 00:00:00", "TIMESTAMP")
    assert src.read_slices([f"UPDATED_AT > {ts}"]).count() == 100
    assert src.read_slices([f"UPDATED_AT < {ts}"]).count() == 0
