"""Per-partition lineage + metrics (north rule requirement).

Mirrors the replication worker's per-stream emitted/committed counts
(DefaultReplicationWorker.java:197-228) at partition granularity:
for every (epoch, source partition) — offset range (min/max lsn),
event count, delete count. Written as parquet under
`<table root>/_lineage/epoch=<id>/` BEFORE the snapshot commit;
re-running an epoch overwrites the same directory, so lineage stays
exactly-once together with the data.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_DIR = "_lineage"


def compute_lineage(
    batch: DataFrame, stream: str, epoch: int, lsn_col: str = "_ab_cdc_lsn"
) -> DataFrame:
    return (
        batch.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(
            F.min(lsn_col).alias("from_lsn"),
            F.max(lsn_col).alias("to_lsn"),
            F.count("*").alias("n_events"),
            F.sum(
                F.col("_ab_cdc_deleted_at").isNotNull().cast("long")
            ).alias("n_deletes"),
        )
        .select(
            F.lit(stream).alias("stream"),
            F.lit(epoch).cast("long").alias("epoch"),
            F.col("_pid").alias("partition_id"),
            "from_lsn",
            "to_lsn",
            "n_events",
            "n_deletes",
        )
    )


def write_lineage(lineage: DataFrame, table_root: str, epoch: int) -> None:
    out = os.path.join(table_root, LINEAGE_DIR, f"epoch={epoch}")
    lineage.drop("epoch").write.mode("overwrite").parquet(out)


def read_lineage(spark: SparkSession, table_root: str) -> DataFrame:
    return spark.read.option("basePath", os.path.join(table_root, LINEAGE_DIR)).parquet(
        os.path.join(table_root, LINEAGE_DIR)
    )
