"""CDC log-tail source — the Debezium-embedded-engine analogue.

The reference tails a WAL/binlog via Debezium, bounded by a target
position captured at sync start (AirbyteDebeziumHandler.java:68-112,
CdcTargetPosition.java:16-20, DebeziumRecordIterator.java:62-117).
Here the log is itself a table (parquet/lake event log, strictly
increasing `_ab_cdc_lsn`), and a "sync" reads the half-open slice
(from_lsn, target] where target = max(lsn) snapshotted at sync start —
Catalyst pushes the lsn range predicate into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class LogTailSource:
    def __init__(self, events: DataFrame, lsn_col: str = "_ab_cdc_lsn"):
        self.events = events
        self.lsn_col = lsn_col

    @classmethod
    def from_parquet(cls, spark: SparkSession, path: str, lsn_col: str = "_ab_cdc_lsn"):
        return cls(spark.read.parquet(path), lsn_col)

    def target_position(self) -> int | None:
        """max(lsn) at sync start (PostgresCdcTargetPosition.java:42-63)."""
        row = self.events.agg(F.max(self.lsn_col).alias("m")).collect()[0]
        return None if row["m"] is None else int(row["m"])

    def slice(self, from_lsn: int | None, to_lsn: int) -> DataFrame:
        df = self.events.filter(F.col(self.lsn_col) <= F.lit(to_lsn))
        if from_lsn is not None:
            df = df.filter(F.col(self.lsn_col) > F.lit(from_lsn))
        return df

    def snapshot_then_tail(
        self,
        snapshot: DataFrame,
        snapshot_lsn: int = 0,
        key_col: str = "url",
        ts_col: str = "warc_ts",
    ) -> DataFrame:
        """Initial snapshot as epoch 0 (SnapshotMetadata analogue): the
        base-table image is stamped with lsn=snapshot_lsn so all log
        events (lsn > snapshot_lsn) win over it. `key_col`/`ts_col`
        name the snapshot's primary-key and row-timestamp columns
        (defaults are the web-page shape); a snapshot without a
        timestamp column stamps the epoch floor instead."""
        ts = (
            F.col(ts_col)
            if ts_col in snapshot.columns
            else F.lit("1970-01-01 00:00:00").cast("timestamp")
        )
        snap = (
            snapshot.withColumn("_ab_cdc_lsn", F.lit(snapshot_lsn).cast("long"))
            .withColumn("_ab_cdc_updated_at", ts)
            .withColumn("_ab_cdc_deleted_at", F.lit(None).cast("timestamp"))
            .withColumn(
                "_airbyte_ab_id",
                F.md5(F.concat(F.lit("snap:"), F.col(key_col))),
            )
            .withColumn("_airbyte_emitted_at", F.current_timestamp())
        )
        return snap.unionByName(self.events, allowMissingColumns=True)
