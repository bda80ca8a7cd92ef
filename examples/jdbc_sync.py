"""Example: JDBC database -> lake table sync, packaged for spark-submit.

    zip -qr ais.zip airbyte_integrations_spark
    spark-submit --master local[8] --py-files ais.zip examples/jdbc_sync.py \
        "jdbc:derby:/tmp/exampledb;create=true"

Seeds an embedded Derby table, full-syncs it into a LakeTable, inserts
more rows, then resumes from the committed watermark — the
reference's JDBC-source incremental loop re-expressed on Spark
(AbstractJdbcSource.queryTableIncremental -> pushed cursor predicate).
"""

import sys
import tempfile

from pyspark.sql import SparkSession

from airbyte_integrations_spark import JdbcSource, JdbcSourceConfig, SyncConfig, run_sync
from airbyte_integrations_spark.lakehouse.table import LakeTable
from airbyte_integrations_spark.sources.jdbc import as_change_events

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def seed(spark, url, lo, hi):
    jvm = spark._jvm
    jvm.java.lang.Class.forName(DRIVER)
    conn = jvm.java.sql.DriverManager.getConnection(url + ";create=true")
    st = conn.createStatement()
    if lo == 1:
        st.execute(
            "CREATE TABLE pages_src (page_url VARCHAR(100) NOT NULL, "
            "body VARCHAR(200), change_seq BIGINT NOT NULL)"
        )
    for i in range(lo, hi):
        st.execute(f"INSERT INTO pages_src VALUES ('https://ex.com/{i % 25}', 'v{i}', {i})")
    st.close()
    conn.close()


def main() -> None:
    url = sys.argv[1] if len(sys.argv) > 1 else "jdbc:derby:/tmp/exampledb"
    spark = SparkSession.builder.appName("jdbc_sync_example").getOrCreate()
    seed(spark, url, 1, 201)

    src = JdbcSource(spark, JdbcSourceConfig(url=url, table="pages_src", driver=DRIVER))
    table = LakeTable(spark, tempfile.mkdtemp(prefix="jdbc_lake_") + "/pages")
    cfg = SyncConfig(stream="pages", n_buckets=8, secondary_order=())

    ev = as_change_events(src.read_incremental("CHANGE_SEQ", None), "PAGE_URL", "CHANGE_SEQ")
    run_sync(spark, ev, table, cfg, max_events_per_epoch=100, extract_missing_text=False)
    print("after full sync:", table.read_live().count(), "rows, watermark",
          table.watermark("pages"))

    seed(spark, url, 201, 251)
    ev2 = as_change_events(
        src.read_incremental("CHANGE_SEQ", table.watermark("pages")),
        "PAGE_URL", "CHANGE_SEQ",
    )
    run_sync(spark, ev2, table, cfg, max_events_per_epoch=100, extract_missing_text=False)
    print("after resume:", table.read_live().count(), "rows, watermark",
          table.watermark("pages"))
    spark.stop()


if __name__ == "__main__":
    main()
