"""Deterministic CDC view over the driver's `events` parquet table.

The driver's correctness gate runs each queries() entry in Spark AND
its oracle_sql() in DuckDB over the same parquet tables. This module
defines ONE derivation of a change-event log from the `events` table —
implemented twice with identical semantics: a DataFrame builder (used
by queries()) and an ANSI-SQL CTE string (embedded in every oracle).

Derivation (engine-agnostic arithmetic only — no engine hash funcs):
  url         = 'https://site-' || (user_id % 97) || '.example/page/'
                 || (user_id * 13 + event_id % 13)
  _ab_cdc_lsn = event_id + 1              (unique, strictly increasing)
  _ab_cdc_updated_at = ts
  _ab_cdc_deleted_at = ts when event_id % 17 = 3 else NULL (~6% deletes)
  _airbyte_ab_id     = md5(event_id)      (identical hex in both engines)
  _airbyte_emitted_at = ts + 2 seconds
payload: event_type, value_m = floor(value*1000) (exact integer — no
float-formatting hazards in hash comparison), props.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ANSI SQL CTE — runnable verbatim by DuckDB (and by Spark SQL).
CE_SQL = """
ce AS (
  SELECT
    'https://site-' || CAST(user_id % 97 AS VARCHAR) || '.example/page/'
      || CAST(user_id * 13 + event_id % 13 AS VARCHAR) AS url,
    event_id + 1 AS _ab_cdc_lsn,
    ts AS _ab_cdc_updated_at,
    CASE WHEN event_id % 17 = 3 THEN ts END AS _ab_cdc_deleted_at,
    md5(CAST(event_id AS VARCHAR)) AS _airbyte_ab_id,
    ts + INTERVAL 2 SECOND AS _airbyte_emitted_at,
    event_type,
    CAST(floor(value * 1000) AS BIGINT) AS value_m
  FROM events
)
"""


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def change_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.select(
        F.concat(
            F.lit("https://site-"),
            (F.col("user_id") % 97).cast("string"),
            F.lit(".example/page/"),
            (F.col("user_id") * 13 + F.col("event_id") % 13).cast("string"),
        ).alias("url"),
        (F.col("event_id") + 1).alias("_ab_cdc_lsn"),
        F.col("ts").alias("_ab_cdc_updated_at"),
        F.when(F.col("event_id") % 17 == 3, F.col("ts")).alias("_ab_cdc_deleted_at"),
        F.md5(F.col("event_id").cast("string")).alias("_airbyte_ab_id"),
        (F.col("ts") + F.expr("INTERVAL 2 SECOND")).alias("_airbyte_emitted_at"),
        F.col("event_type"),
        F.floor(F.col("value") * 1000).cast("long").alias("value_m"),
    )
