"""Example partial-image (updateDescription) change-stream sync — run:

    zip -qr ais.zip airbyte_integrations_spark
    spark-submit --master <cluster-or-local[N]> \
        --py-files ais.zip examples/patch_stream_sync.py \
        <change_stream_jsonl_dir> <lake_root> <value_schema_ddl>

Tails a directory of MongoDB change-stream JSONL in its DEFAULT form —
updates carry only ``updateDescription.updatedFields`` ($set) and
``removedFields`` ($unset), no fullDocument — and applies each epoch
through the patch-overlay MERGE (lakehouse/patch_apply.py): per-key
per-COLUMN latest writes, where an explicit $unset null wins over an
earlier value and deletes reset the key. Kill it anywhere and re-run
to converge: epochs are lsn-keyed and idempotent.

Example value_schema_ddl: "text string, lang string"
"""

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from airbyte_integrations_spark.catalog_sync import (
    ConfiguredCatalog,
    ConfiguredStream,
    read_catalog,
    stream_table,
)
from airbyte_integrations_spark.config import SyncConfig
from airbyte_integrations_spark.session import tune_session


def main() -> None:
    stream_dir, lake_root, ddl = sys.argv[1], sys.argv[2], sys.argv[3]
    spark = SparkSession.builder.config(
        "spark.sql.session.timeZone", "UTC"
    ).getOrCreate()
    tune_session(spark)
    cat = ConfiguredCatalog(
        streams=(
            ConfiguredStream(
                config=SyncConfig(
                    stream="coll", primary_key=("_id",), n_buckets=64,
                    write_mode="mor",
                ),
                source={
                    "kind": "mongo_cdc",
                    "path": stream_dir,
                    "value_schema": ddl,
                    "update_description": True,
                },
            ),
        )
    )
    for msg in read_catalog(spark, cat, lake_root):
        print("STATE", msg)
    t = stream_table(spark, lake_root, "coll")
    live = t.read_live()
    print("live rows:", live.count(), "watermark:", t.watermark("coll"))
    live.orderBy(F.col("_ab_cdc_lsn").desc()).show(5, truncate=40)


if __name__ == "__main__":
    main()
