"""SparkSession builder tuned for the engine.

Local-mode knobs follow the public Spark tuning guidance: AQE on
(runtime coalesce + skew-join splitting), shuffle partitions sized to
cores, Arrow enabled for the pandas-UDF extraction path, UTC session
timezone so timestamp semantics match the DuckDB oracles.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "airbyte_integrations_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(cores, 8)
    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Long-running-driver hygiene: ContextCleaner only releases
        # dead shuffle files / broadcasts / localCheckpoint blocks
        # after a driver GC, and the default periodic-GC interval
        # (30min) is longer than a whole bench sweep — on a large
        # mostly-idle heap organic GCs are rare, so executor storage
        # and local disk fill with dead blocks and later queries
        # degrade (measured: up to 3-5x on late-sweep queries).
        # 90s bounds the garbage window at a sub-second GC cost.
        .config(
            "spark.cleaner.periodicGC.interval",
            os.environ.get("SPARK_GRAFT_PERIODIC_GC", "90s"),
        )
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


# DataFrames persisted by THIS engine's queries (e.g. the near-dup
# shingle relation). Tracked so inter-query hygiene unpersists only
# what we own — spark.catalog.clearCache() is session-global and would
# silently drop caller-owned caches every time an engine query runs.
_ENGINE_PERSISTED: list = []


def register_persist(df):
    """Persist a DataFrame and track it as engine-owned; released by
    the next tune_session() call (or release_engine_persists())."""
    df.persist()
    _ENGINE_PERSISTED.append(df)
    return df


def release_engine_persists() -> None:
    while _ENGINE_PERSISTED:
        df = _ENGINE_PERSISTED.pop()
        try:
            df.unpersist()
        except Exception:
            pass


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply engine defaults to an externally-created session (the
    driver's verify harness creates its own)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Hygiene between driver-contract queries: drop DataFrames a
    # previous ENGINE query left cached — and only those.
    release_engine_persists()
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    except Exception:
        pass  # immutable at runtime on some builds; defaults are fine
    return spark
