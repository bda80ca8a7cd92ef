"""Driver contract for the spark-graft builder (PySpark target).

queries() exercises the engine's operator inventory (SURVEY.md §2) over
the driver's parquet tables; every CDC query runs on a change-event log
derived deterministically from the `events` table by
airbyte_integrations_spark.testdata (one derivation, implemented
identically as a DataFrame builder and as the SQL CTE embedded in each
oracle). Timestamps are surfaced as epoch microseconds (unix_micros /
epoch_us) and doubles as floor(x*1000) integers so value hashes are
exact across engines.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from airbyte_integrations_spark.operators.dedup import winner_agg, winner_window
from airbyte_integrations_spark.operators.scd import scd2
from airbyte_integrations_spark.session import register_persist, tune_session
from airbyte_integrations_spark.testdata import CE_SQL, change_events, load

def _us(col: str) -> F.Column:
    """Epoch microseconds of a (possibly NTZ) timestamp column; the
    session is UTC so this matches DuckDB's epoch_us on naive ts."""
    return F.unix_micros(F.col(col).cast("timestamp"))


def _spread(df: DataFrame) -> DataFrame:
    """Scale-adaptive scan parallelization (guide §2: derive the
    partitioning from the input, not a constant). The driver's small
    scale factors land whole tables in ONE parquet row group, so the
    scan is a single task and every expression-heavy pass (per-bigram
    md5, trigram explosion, vector arithmetic, pandas UDFs) serializes
    on one core of a 32-core session. When the scan has fewer
    partitions than half the session cores, round-robin repartition to
    the core count (the shuffled bytes are by construction tiny — the
    table fit in one row group); at production scale the scan is
    already wide and this returns the frame unchanged, adding no
    exchange. Applied only to queries whose pre-exchange compute
    dominates — for cheap scan->agg queries the extra stage costs more
    than the parallelism buys (measured)."""
    sc = df.sparkSession.sparkContext
    p = sc.defaultParallelism
    if df.rdd.getNumPartitions() * 2 <= p:
        return df.repartition(p)
    return df


# Reference winner ordering (stream_processor.py:832-846 + ab_id tiebreak)
ORDER_SQL = (
    "_ab_cdc_lsn IS NULL ASC, _ab_cdc_lsn DESC, _ab_cdc_updated_at DESC, "
    "_airbyte_emitted_at DESC, _airbyte_ab_id DESC"
)

WINNERS_SQL = f"""
w AS (
  SELECT *, row_number() OVER (PARTITION BY url ORDER BY {ORDER_SQL}) AS rn
  FROM ce
)
"""


# ---------------------------------------------------------------- CDC core

def q_cdc_latest_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-replay final table: per-url winner, tombstones removed
    (the MERGE-apply end state; SURVEY §2.6/2.8)."""
    tune_session(spark)
    ce = change_events(spark, sf_dir)
    w = winner_window(ce, drop_tombstones=True)
    return w.select(
        "url",
        "_ab_cdc_lsn",
        _us("_ab_cdc_updated_at").alias("updated_us"),
        "event_type",
        "value_m",
    )


O_CDC_LATEST_WINS = f"""
WITH {CE_SQL}, {WINNERS_SQL}
SELECT url, _ab_cdc_lsn, epoch_us(_ab_cdc_updated_at) AS updated_us,
       event_type, value_m
FROM w WHERE rn = 1 AND _ab_cdc_deleted_at IS NULL
"""


def q_cdc_winner_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same final state computed by the associative/salted aggregation
    path (the 10^10-scale plan) — proves agg == window == oracle."""
    tune_session(spark)
    ce = change_events(spark, sf_dir)
    w = winner_agg(ce, drop_tombstones=True)
    return w.select("url", "_ab_cdc_lsn", "event_type", "value_m")


O_CDC_WINNER_AGG = f"""
WITH {CE_SQL}, {WINNERS_SQL}
SELECT url, _ab_cdc_lsn, event_type, value_m
FROM w WHERE rn = 1 AND _ab_cdc_deleted_at IS NULL
"""


def q_cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 2 history table: validity intervals + active-row flag
    (stream_processor.py:698-959)."""
    tune_session(spark)
    ce = change_events(spark, sf_dir)
    s = scd2(ce)
    return s.select(
        "url",
        F.col("_airbyte_start_at").alias("start_lsn"),
        F.col("_airbyte_end_at").alias("end_lsn"),
        F.col("_airbyte_active_row").alias("active_row"),
        _us("_airbyte_emitted_at").alias("emitted_us"),
    )


O_CDC_SCD2 = f"""
WITH {CE_SQL}
SELECT url,
       _ab_cdc_lsn AS start_lsn,
       lag(_ab_cdc_lsn) OVER (PARTITION BY url ORDER BY {ORDER_SQL}) AS end_lsn,
       CASE WHEN row_number() OVER (PARTITION BY url ORDER BY {ORDER_SQL}) = 1
                 AND _ab_cdc_deleted_at IS NULL THEN 1 ELSE 0 END AS active_row,
       epoch_us(_airbyte_emitted_at) AS emitted_us
FROM ce
"""


def q_cdc_tombstone_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delivery accounting: raw/delete counts and final-table size
    (row-count oracles, simple_streams_first_run_row_counts.sql)."""
    tune_session(spark)
    ce = change_events(spark, sf_dir)
    w = winner_window(ce)
    return (
        w.agg(
            F.count("*").alias("n_urls"),
            F.sum(F.col("_ab_cdc_deleted_at").isNotNull().cast("long")).alias("n_dead"),
            F.sum(F.col("_ab_cdc_deleted_at").isNull().cast("long")).alias("n_live"),
        )
        .crossJoin(
            ce.agg(
                F.count("*").alias("n_events"),
                F.sum(F.col("_ab_cdc_deleted_at").isNotNull().cast("long")).alias(
                    "n_delete_events"
                ),
            )
        )
        .select("n_events", "n_delete_events", "n_urls", "n_live", "n_dead")
    )


O_CDC_TOMBSTONE_STATS = f"""
WITH {CE_SQL}, {WINNERS_SQL}
SELECT
  (SELECT count(*) FROM ce) AS n_events,
  (SELECT count(*) FROM ce WHERE _ab_cdc_deleted_at IS NOT NULL) AS n_delete_events,
  count(*) AS n_urls,
  CAST(sum(CASE WHEN _ab_cdc_deleted_at IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_live,
  CAST(sum(CASE WHEN _ab_cdc_deleted_at IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dead
FROM w WHERE rn = 1
"""


def q_cdc_idempotent_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At-least-once transport: the log delivered twice (UNION ALL)
    converges to the same final state (BufferedStreamConsumer.java:39-57
    idempotence)."""
    tune_session(spark)
    ce = change_events(spark, sf_dir)
    doubled = ce.unionByName(ce)
    return winner_agg(doubled, drop_tombstones=True).select(
        "url", "_ab_cdc_lsn", "event_type", "value_m"
    )


O_CDC_IDEMPOTENT_REPLAY = f"""
WITH {CE_SQL},
dbl AS (SELECT * FROM ce UNION ALL SELECT * FROM ce),
w AS (
  SELECT *, row_number() OVER (PARTITION BY url ORDER BY {ORDER_SQL}) AS rn
  FROM dbl
)
SELECT url, _ab_cdc_lsn, event_type, value_m
FROM w WHERE rn = 1 AND _ab_cdc_deleted_at IS NULL
"""


def q_cdc_mor_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read replay through the real lake layer: the log is
    applied as 4 epoch commits of per-key winner deltas (equality-
    delete markers for tombstones; Iceberg v2 analogue — lakehouse/
    table.append_deltas), then live state is resolved across
    base ∪ deltas at read. Must equal the plain winner-rule oracle."""
    import tempfile

    from airbyte_integrations_spark.config import SyncConfig
    from airbyte_integrations_spark.lakehouse.table import LakeTable
    from airbyte_integrations_spark.streaming.microbatch import run_sync

    tune_session(spark)
    ce = change_events(spark, sf_dir)
    hi = ce.agg(F.max("_ab_cdc_lsn")).collect()[0][0]
    # scratch lake on tmpfs when available: the query measures the MoR
    # read/apply path, not the sandbox's single shared virtual disk
    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    table = LakeTable(
        spark, tempfile.mkdtemp(prefix="mor_entry_", dir=scratch) + "/t"
    )
    run_sync(
        spark, ce, table, SyncConfig(stream="pages", write_mode="mor"),
        max_events_per_epoch=max(int(hi) // 4, 1),
        extract_missing_text=False,
        compact_threshold=None,  # keep deltas: the read must resolve them
    )
    return table.read_live().select("url", "_ab_cdc_lsn", "event_type", "value_m")


O_CDC_MOR_REPLAY = f"""
WITH {CE_SQL}, {WINNERS_SQL}
SELECT url, _ab_cdc_lsn, event_type, value_m
FROM w WHERE rn = 1 AND _ab_cdc_deleted_at IS NULL
"""


def q_cdc_maintenance_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full table-maintenance lifecycle over a merge-on-read replay:
    apply the log as 4 MoR epochs (deltas kept), then run every
    maintenance operation the lake layer offers — compact() (fold
    deltas into base via the winner rule; Iceberg rewrite_data_files
    analogue), rebucket() (partition-spec evolution to a different
    hash-bucket count), expire_snapshots(keep_last=1) (history GC) —
    and read the surviving live state. Each step commits a new
    snapshot; none may change the answer: the result must still equal
    the plain winner-rule oracle. Pins the maintenance path the 10^10
    design point depends on (delta fold-in keeps MoR read cost O(1) in
    sync count; rebucketing re-sizes write parallelism as the table
    grows; expiry bounds manifest/file growth)."""
    import tempfile

    from airbyte_integrations_spark.config import SyncConfig
    from airbyte_integrations_spark.lakehouse.table import LakeTable
    from airbyte_integrations_spark.streaming.microbatch import run_sync

    tune_session(spark)
    ce = change_events(spark, sf_dir)
    hi = ce.agg(F.max("_ab_cdc_lsn")).collect()[0][0]
    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    table = LakeTable(
        spark, tempfile.mkdtemp(prefix="maint_entry_", dir=scratch) + "/t"
    )
    run_sync(
        spark, ce, table, SyncConfig(stream="pages", write_mode="mor"),
        max_events_per_epoch=max(int(hi) // 4, 1),
        extract_missing_text=False,
        compact_threshold=None,  # leave all 4 delta sets for compact()
    )
    table.compact(max_files_per_bucket=1)  # fold deltas into base
    m = table.manifest()
    assert not any(ps for ps in m.get("deltas", {}).values()), "compact left deltas"
    table.rebucket(int(m["n_buckets"]) * 2)  # partition evolution
    gone = table.expire_snapshots(keep_last=1)
    # 4 epochs + compact + rebucket left >=5 superseded manifests; the
    # GC must actually reclaim them (and their unreferenced data files)
    assert gone["manifests_removed"] >= 5, gone
    assert gone["data_files_removed"] > 0, gone
    return table.read_live().select("url", "_ab_cdc_lsn", "event_type", "value_m")


O_CDC_MAINTENANCE_REPLAY = f"""
WITH {CE_SQL}, {WINNERS_SQL}
SELECT url, _ab_cdc_lsn, event_type, value_m
FROM w WHERE rn = 1 AND _ab_cdc_deleted_at IS NULL
"""


def q_cdc_field_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog field selection through the real catalog loop
    (AbstractDbSource.java:229-233: only the configured catalog's
    fields are queried): the stream deselects `event_type`, so it must
    never land, while the key/cursor/system columns and the selected
    payload ride. The projection is applied to the declarative frame
    BEFORE epoch planning (catalog_sync.select_fields), so Catalyst
    prunes the scan — deselected columns are never read. Final state
    must equal the plain winner-rule oracle over the kept columns."""
    import tempfile

    from airbyte_integrations_spark.catalog_sync import (
        ConfiguredCatalog,
        ConfiguredStream,
        read_catalog,
        stream_table,
    )
    from airbyte_integrations_spark.config import SyncConfig

    tune_session(spark)
    ce = change_events(spark, sf_dir)
    hi = ce.agg(F.max("_ab_cdc_lsn")).collect()[0][0]
    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    lake = tempfile.mkdtemp(prefix="fsel_entry_", dir=scratch)
    cfg = SyncConfig(stream="pages", selected_fields=("value_m",), n_buckets=16)
    cat = ConfiguredCatalog(
        streams=(
            ConfiguredStream(config=cfg, source={"kind": "dataframe", "df": ce}),
        )
    )
    read_catalog(
        spark, cat, lake, max_events_per_epoch=max(int(hi) // 4, 1)
    )
    live = stream_table(spark, lake, "pages").read_live()
    assert "event_type" not in live.columns, live.columns  # deselected
    return live.select("url", "_ab_cdc_lsn", "value_m")


O_CDC_FIELD_SELECTION = f"""
WITH {CE_SQL}, {WINNERS_SQL}
SELECT url, _ab_cdc_lsn, value_m
FROM w WHERE rn = 1 AND _ab_cdc_deleted_at IS NULL
"""


def q_cdc_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point lookups + GDPR hard delete over a MoR replay, value-oracled
    (lakehouse/table.read_key + purge_key): the log is applied as 4 MoR
    epochs (deltas kept so lookups must resolve base ∪ deltas), ONE
    sampled key is physically purged (every version, history expired —
    Iceberg's DELETE + rewrite_data_files + expire_snapshots erasure
    recipe), then the serving path reads a CONSTANT budget of 8
    deterministically-sampled urls (distinct urls ordered by md5 — the
    fixed-budget trick, independent of corpus size) via read_key.
    Oracle = the plain winner rule over the same 7 surviving keys; the
    purged key must come back empty.

    Scale shape: each lookup prunes to the key's hash bucket via the
    manifest (no listing) and inside it to files whose key zone map
    covers the value — with the writer's within-bucket key clustering a
    lookup touches O(versions of this key) files on the 10^10-row
    table, not O(bucket); the in-query assert pins that pruning
    engaged. The purge rewrites only covering files of one bucket."""
    import tempfile

    from airbyte_integrations_spark.config import SyncConfig
    from airbyte_integrations_spark.lakehouse.table import LakeTable
    from airbyte_integrations_spark.streaming.microbatch import run_sync

    tune_session(spark)
    ce = change_events(spark, sf_dir)
    hi = ce.agg(F.max("_ab_cdc_lsn")).collect()[0][0]
    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    table = LakeTable(
        spark, tempfile.mkdtemp(prefix="lookup_entry_", dir=scratch) + "/t"
    )
    run_sync(
        spark, ce, table, SyncConfig(stream="pages", write_mode="mor"),
        max_events_per_epoch=max(int(hi) // 4, 1),
        extract_missing_text=False,
        compact_threshold=None,  # keep deltas: lookups must resolve them
    )
    urls = [
        r["url"]
        for r in ce.select("url").distinct().orderBy(F.md5("url")).limit(8).collect()
    ]
    purged, served = urls[0], urls[1:]
    table.purge_key(purged)
    assert table.read_key(purged).count() == 0

    # pruning sanity: a lookup's candidate file set is a strict subset
    # of the table's files (manifest bucket pruning + key zone maps)
    m = table.manifest()
    total_files = sum(len(ps) for ps in m.get("files", {}).values()) + sum(
        len(ps) for ps in m.get("deltas", {}).values()
    )
    probe = served[0]
    bucket = str(table.key_bucket(probe))
    in_bucket = len(m.get("files", {}).get(bucket, [])) + len(
        m.get("deltas", {}).get(bucket, [])
    )
    assert in_bucket < total_files, (in_bucket, total_files)

    out = None
    for u in served:  # constant budget: 7 driver-side unions
        rows = table.read_key(u).select(
            "url", "_ab_cdc_lsn", "event_type", "value_m"
        )
        out = rows if out is None else out.unionByName(rows)
    return out.localCheckpoint(eager=True)


O_CDC_POINT_LOOKUP = f"""
WITH {CE_SQL}, {WINNERS_SQL},
keys AS (
  SELECT url FROM (SELECT DISTINCT url, md5(url) AS h FROM ce)
  ORDER BY h LIMIT 7 OFFSET 1
)
SELECT w.url, w._ab_cdc_lsn, w.event_type, w.value_m
FROM w JOIN keys ON w.url = keys.url
WHERE w.rn = 1 AND w._ab_cdc_deleted_at IS NULL
"""


def q_cdc_balanced_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-balanced epoch planning on a BURSTY log (first half of the
    lsn space dense, second half stretched 997x): boundaries are exact
    order statistics at ranks i*target (streaming/microbatch.
    plan_epochs_balanced — coarse arithmetic histogram + per-bucket
    rank pick, no global sort), so every epoch except the last carries
    exactly `target` events no matter how skewed the lsn density. The
    oracle recomputes the same partition INDEPENDENTLY via SQL
    row_number ranks — the per-epoch (to_lsn, n_events) must agree,
    cross-validating the distributed order-statistics planner against
    a rank-based reference."""
    from airbyte_integrations_spark.streaming.microbatch import (
        plan_epochs_balanced,
    )

    tune_session(spark)
    ce = change_events(spark, sf_dir)
    n = ce.count()
    h, target = n // 2, max(n // 8, 1)
    bursty = ce.withColumn(
        "_ab_cdc_lsn",
        F.when(F.col("_ab_cdc_lsn") <= h, F.col("_ab_cdc_lsn")).otherwise(
            (F.col("_ab_cdc_lsn") - h) * 997 + h
        ),
    )
    eps = plan_epochs_balanced(bursty, None, target)
    # assign every event to its planned epoch and MEASURE the balance
    # (the boundary array is metadata-sized: k-1 literals)
    barr = F.array(*[F.lit(int(e.to_lsn)) for e in eps[:-1]])
    idx = F.size(F.filter(barr, lambda x: x < F.col("_ab_cdc_lsn")))
    return (
        bursty.groupBy(idx.alias("epoch_idx"))
        .agg(
            F.max("_ab_cdc_lsn").alias("to_lsn"),
            F.count("*").alias("n_events"),
        )
        .select(F.col("epoch_idx").cast("long"), "to_lsn", "n_events")
    )


O_CDC_BALANCED_EPOCHS = f"""
WITH {CE_SQL},
p AS (SELECT count(*) AS n FROM ce),
b AS (
  SELECT CASE WHEN _ab_cdc_lsn <= n // 2 THEN _ab_cdc_lsn
              ELSE (_ab_cdc_lsn - n // 2) * 997 + n // 2 END AS lsn,
         greatest(n // 8, 1) AS target
  FROM ce, p
),
r AS (
  SELECT lsn, target, row_number() OVER (ORDER BY lsn) AS rn FROM b
)
SELECT (rn - 1) // target AS epoch_idx,
       max(lsn) AS to_lsn,
       count(*) AS n_events
FROM r GROUP BY 1
"""


def q_cdc_incremental_cursor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cursor scan: strictly-greater filter + new max-cursor state
    (AbstractJdbcSource.java:261-286, StateDecoratingIterator.java:50-60).
    State = floor(max(lsn)/2) so the query is scale-independent."""
    tune_session(spark)
    ce = change_events(spark, sf_dir)
    state = ce.agg(F.floor(F.max("_ab_cdc_lsn") / 2).cast("long").alias("s"))
    new = ce.join(state, ce["_ab_cdc_lsn"] > state["s"], "inner")
    return new.agg(
        F.count("*").alias("n_new"),
        F.max("_ab_cdc_lsn").alias("new_state"),
        F.min("_ab_cdc_lsn").alias("first_lsn"),
    )


O_CDC_INCREMENTAL_CURSOR = f"""
WITH {CE_SQL},
st AS (SELECT CAST(floor(max(_ab_cdc_lsn) / 2.0) AS BIGINT) AS s FROM ce)
SELECT count(*) AS n_new, max(_ab_cdc_lsn) AS new_state, min(_ab_cdc_lsn) AS first_lsn
FROM ce, st WHERE ce._ab_cdc_lsn > st.s
"""


def q_cdc_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch slicing `(from, to]` of the log into
    1000-lsn micro-batches (streaming/microbatch.plan_epochs semantics;
    CdcTargetPosition bounding)."""
    tune_session(spark)
    ce = change_events(spark, sf_dir)
    epoch = (F.floor((F.col("_ab_cdc_lsn") - 1) / 1000) * 1000).cast("long")
    return (
        ce.groupBy(epoch.alias("epoch_from"))
        .agg(
            F.count("*").alias("n_events"),
            F.min("_ab_cdc_lsn").alias("min_lsn"),
            F.max("_ab_cdc_lsn").alias("max_lsn"),
            F.sum(F.col("_ab_cdc_deleted_at").isNotNull().cast("long")).alias("n_deletes"),
        )
    )


O_CDC_EPOCH_PLAN = f"""
WITH {CE_SQL}
SELECT CAST(floor((_ab_cdc_lsn - 1) / 1000.0) * 1000 AS BIGINT) AS epoch_from,
       count(*) AS n_events, min(_ab_cdc_lsn) AS min_lsn,
       max(_ab_cdc_lsn) AS max_lsn,
       CAST(sum(CASE WHEN _ab_cdc_deleted_at IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_deletes
FROM ce GROUP BY 1
"""


def q_cdc_heartbeat_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC heartbeat / offset-advance contract (Debezium
    heartbeat.interval.ms; DebeziumRecordPublisher offset commits):
    after half the log applies, the source's WAL position advances to
    mid + hi/10 with NO tracked-table changes — run_sync commits a
    zero-row `hb:<pos>` marker epoch that moves the watermark. A full
    replay of the log then treats everything at or below the offset as
    already consumed, so events in (mid, hb] never apply. Exercises
    lakehouse/table.commit_marker_epoch + streaming/microbatch.run_sync
    heartbeat_position through a REAL 3-sync lifecycle."""
    import tempfile

    from airbyte_integrations_spark.config import SyncConfig
    from airbyte_integrations_spark.lakehouse.table import LakeTable
    from airbyte_integrations_spark.streaming.microbatch import run_sync

    tune_session(spark)
    ce = change_events(spark, sf_dir)
    hi = int(ce.agg(F.max("_ab_cdc_lsn")).collect()[0][0])
    mid, hb = hi // 2, hi // 2 + hi // 10
    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    table = LakeTable(
        spark, tempfile.mkdtemp(prefix="hb_entry_", dir=scratch) + "/t"
    )
    cfg = SyncConfig(stream="pages")
    run_sync(
        spark, ce.filter(F.col("_ab_cdc_lsn") <= mid), table, cfg,
        extract_missing_text=False, compact_threshold=None,
    )
    # WAL moved (other tables' traffic); nothing for this stream
    run_sync(
        spark, ce.filter(F.lit(False)), table, cfg,
        heartbeat_position=hb,
        extract_missing_text=False, compact_threshold=None,
    )
    assert table.watermark("pages") == hb
    # at-least-once transport replays the whole log; the offset rules
    run_sync(
        spark, ce, table, cfg,
        extract_missing_text=False, compact_threshold=None,
    )
    return table.read_live().select(
        "url", "_ab_cdc_lsn", "event_type", "value_m"
    )


O_CDC_HEARTBEAT_OFFSETS = f"""
WITH {CE_SQL},
b AS (
  SELECT CAST(floor(max(_ab_cdc_lsn) / 2) AS BIGINT) AS mid,
         CAST(floor(max(_ab_cdc_lsn) / 2) + floor(max(_ab_cdc_lsn) / 10)
              AS BIGINT) AS hb
  FROM ce
),
vis AS (
  SELECT ce.* FROM ce, b
  WHERE ce._ab_cdc_lsn <= b.mid OR ce._ab_cdc_lsn > b.hb
),
w AS (
  SELECT *, row_number() OVER (PARTITION BY url ORDER BY {ORDER_SQL}) AS rn
  FROM vis
)
SELECT url, _ab_cdc_lsn, event_type, value_m
FROM w WHERE rn = 1 AND _ab_cdc_deleted_at IS NULL
"""


def q_cdc_changelog_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-diff changelog (Delta CDF / Iceberg
    create_changelog_view): after syncing the first half of the log
    and then the rest, LakeTable.changes(v_mid) classifies every key
    whose live image moved — insert / update_postimage carry the new
    winner, delete carries the BEFORE image. Exercises the real lake
    layer end to end (two syncs, version pin, resolved-view diff)."""
    import tempfile

    from airbyte_integrations_spark.config import SyncConfig
    from airbyte_integrations_spark.lakehouse.table import LakeTable
    from airbyte_integrations_spark.streaming.microbatch import run_sync

    tune_session(spark)
    ce = change_events(spark, sf_dir)
    hi = int(ce.agg(F.max("_ab_cdc_lsn")).collect()[0][0])
    mid = hi // 2
    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    table = LakeTable(
        spark, tempfile.mkdtemp(prefix="cdf_entry_", dir=scratch) + "/t"
    )
    cfg = SyncConfig(stream="pages")
    run_sync(
        spark, ce.filter(F.col("_ab_cdc_lsn") <= mid), table, cfg,
        extract_missing_text=False, compact_threshold=None,
    )
    v_mid = table.current_version()
    run_sync(
        spark, ce, table, cfg,
        extract_missing_text=False, compact_threshold=None,
    )
    return table.changes(v_mid).select(
        "url", "_change_type", "_ab_cdc_lsn", "value_m"
    )


O_CDC_CHANGELOG_DIFF = f"""
WITH {CE_SQL},
b AS (SELECT CAST(floor(max(_ab_cdc_lsn) / 2) AS BIGINT) AS mid FROM ce),
wo AS (
  SELECT *, row_number() OVER (PARTITION BY url ORDER BY {ORDER_SQL}) AS rn
  FROM ce, b WHERE _ab_cdc_lsn <= b.mid
),
old AS (SELECT url, _ab_cdc_lsn, value_m FROM wo
        WHERE rn = 1 AND _ab_cdc_deleted_at IS NULL),
wn AS (
  SELECT *, row_number() OVER (PARTITION BY url ORDER BY {ORDER_SQL}) AS rn
  FROM ce
),
new AS (SELECT url, _ab_cdc_lsn, value_m FROM wn
        WHERE rn = 1 AND _ab_cdc_deleted_at IS NULL)
SELECT coalesce(new.url, old.url) AS url,
       CASE WHEN old.url IS NULL THEN 'insert'
            WHEN new.url IS NULL THEN 'delete'
            ELSE 'update_postimage' END AS _change_type,
       CASE WHEN new.url IS NULL THEN old._ab_cdc_lsn
            ELSE new._ab_cdc_lsn END AS _ab_cdc_lsn,
       CASE WHEN new.url IS NULL THEN old.value_m
            ELSE new.value_m END AS value_m
FROM old FULL OUTER JOIN new ON old.url = new.url
WHERE old.url IS NULL OR new.url IS NULL
   OR old._ab_cdc_lsn IS DISTINCT FROM new._ab_cdc_lsn
"""


def q_cdc_ivm_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance (lakehouse/ivm.py):
    a per-event_type (count, sum(value_m)) view is materialized after
    syncing the first half of the CDC log, then maintained — NOT
    recomputed — through the second half by folding the signed
    Delta-CDF-style change feed (update pre/post images, deletes,
    inserts) from table.changes(include_update_preimage=True), which
    is bucket-pruned via the manifests' file-list diff. The in-query
    asserts pin that the incremental path actually ran (two view
    versions; the second records the final table version as its
    base). Oracle: the same aggregate computed directly over the
    winner-resolved final state — exact because measures are longs."""
    import tempfile

    from airbyte_integrations_spark.config import SyncConfig
    from airbyte_integrations_spark.lakehouse.ivm import MaterializedAggView
    from airbyte_integrations_spark.lakehouse.table import LakeTable
    from airbyte_integrations_spark.streaming.microbatch import run_sync

    tune_session(spark)
    ce = change_events(spark, sf_dir)
    hi = int(ce.agg(F.max("_ab_cdc_lsn")).collect()[0][0])
    mid = hi // 2
    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    base = tempfile.mkdtemp(prefix="ivm_entry_", dir=scratch)
    table = LakeTable(spark, base + "/t")
    cfg = SyncConfig(stream="pages")
    run_sync(
        spark, ce.filter(F.col("_ab_cdc_lsn") <= mid), table, cfg,
        extract_missing_text=False, compact_threshold=None,
    )
    view = MaterializedAggView(
        spark, base + "/view", dims=("event_type",), sums=("value_m",)
    )
    view.refresh(table)  # full materialization at v_mid
    v_mid_view = view.current_version()
    run_sync(
        spark, ce, table, cfg,
        extract_missing_text=False, compact_threshold=None,
    )
    view.refresh(table)  # incremental fold of the change feed
    assert view.current_version() == v_mid_view + 1, "incremental path skipped"
    assert view.base_version() == table.current_version()
    return view.read().select("event_type", "n_rows", "sum_value_m")


O_CDC_IVM_REFRESH = f"""
WITH {CE_SQL},
w AS (
  SELECT *, row_number() OVER (PARTITION BY url ORDER BY {ORDER_SQL}) AS rn
  FROM ce
)
SELECT event_type, count(*) AS n_rows,
       CAST(sum(value_m) AS BIGINT) AS sum_value_m
FROM w WHERE rn = 1 AND _ab_cdc_deleted_at IS NULL
GROUP BY event_type
"""


def q_cdc_rollback_resync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot rollback lifecycle (Iceberg rollback_to_snapshot):
    sync half the log, sync the rest, ROLL BACK to the half-way
    snapshot (metadata-only commit restoring files + schema + the
    committed-epoch log, so the stream watermark rolls back too —
    asserted in-query), then re-sync. The undone epochs re-commit
    (their keys left the log with the rollback; a naive epoch-skip
    would silently drop the range) and the final live state must equal
    the plain full winner replay — which is the oracle."""
    import tempfile

    from airbyte_integrations_spark.config import SyncConfig
    from airbyte_integrations_spark.lakehouse.table import LakeTable
    from airbyte_integrations_spark.streaming.microbatch import run_sync

    tune_session(spark)
    ce = change_events(spark, sf_dir)
    hi = int(ce.agg(F.max("_ab_cdc_lsn")).collect()[0][0])
    mid = hi // 2
    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    table = LakeTable(
        spark, tempfile.mkdtemp(prefix="rb_entry_", dir=scratch) + "/t"
    )
    cfg = SyncConfig(stream="pages")
    run_sync(
        spark, ce.filter(F.col("_ab_cdc_lsn") <= mid), table, cfg,
        extract_missing_text=False, compact_threshold=None,
    )
    v_mid = table.current_version()
    wm_mid = table.watermark("pages")
    run_sync(
        spark, ce, table, cfg,
        extract_missing_text=False, compact_threshold=None,
    )
    table.rollback(v_mid)
    assert table.watermark("pages") == wm_mid, "watermark did not roll back"
    eps = run_sync(
        spark, ce, table, cfg,
        extract_missing_text=False, compact_threshold=None,
    )
    assert eps, "resync after rollback applied nothing (false epoch-skip)"
    return table.read_live().select(
        "url", "_ab_cdc_lsn", _us("_ab_cdc_updated_at").alias("updated_us")
    )


O_CDC_ROLLBACK_RESYNC = f"""
WITH {CE_SQL},
{WINNERS_SQL}
SELECT url, _ab_cdc_lsn, epoch_us(_ab_cdc_updated_at) AS updated_us
FROM w WHERE rn = 1 AND _ab_cdc_deleted_at IS NULL
"""


def q_cdc_reset_resync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reset-connection lifecycle (the platform RESET_CONNECTION job,
    DefaultJobCreator.java:93-118: wipe destination data AND
    connection state, then the next scheduled sync re-syncs from
    scratch): full sync, reset() as ONE metadata-only commit (zero-row
    live view and a cleared watermark asserted in-query, pre-reset
    snapshot still time-travel readable), then resync. Every epoch
    must RE-commit (the log was cleared — a false epoch-skip here
    silently leaves the table empty) and the final live state must
    equal the plain full winner replay — the oracle."""
    import tempfile

    from airbyte_integrations_spark.config import SyncConfig
    from airbyte_integrations_spark.lakehouse.table import LakeTable
    from airbyte_integrations_spark.streaming.microbatch import run_sync

    tune_session(spark)
    ce = change_events(spark, sf_dir)
    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    table = LakeTable(
        spark, tempfile.mkdtemp(prefix="reset_entry_", dir=scratch) + "/t"
    )
    cfg = SyncConfig(stream="pages")
    eps1 = run_sync(
        spark, ce, table, cfg,
        extract_missing_text=False, compact_threshold=None,
    )
    v_pre = table.current_version()
    n_pre = table.read_live().count()
    table.reset()
    assert table.read_live().count() == 0, "reset left live rows"
    assert table.watermark("pages") is None, "reset kept the watermark"
    assert table.read_live(version=v_pre).count() == n_pre, (
        "pre-reset snapshot no longer time-travel readable"
    )
    eps2 = run_sync(
        spark, ce, table, cfg,
        extract_missing_text=False, compact_threshold=None,
    )
    assert len(eps2) == len(eps1), "resync after reset must re-apply all epochs"
    return table.read_live().select(
        "url", "_ab_cdc_lsn", _us("_ab_cdc_updated_at").alias("updated_us")
    )


O_CDC_RESET_RESYNC = f"""
WITH {CE_SQL},
{WINNERS_SQL}
SELECT url, _ab_cdc_lsn, epoch_us(_ab_cdc_updated_at) AS updated_us
FROM w WHERE rn = 1 AND _ab_cdc_deleted_at IS NULL
"""


def q_cdc_wap_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-audit-publish lifecycle (Iceberg branch + fast-forward):
    half the log syncs to main; the rest syncs into a metadata BRANCH
    (sharing main's immutable data files, resuming from main's
    watermark via the forked epoch log); main is asserted untouched
    while the branch holds the full state (isolation); an audit
    invariant (one live row per key) is checked on the branch; then
    publish_branch fast-forwards main in ONE O(1) metadata commit.
    Final main live state must equal the plain full winner replay —
    the oracle — and the published epochs must epoch-skip a re-sync
    (asserted in-query)."""
    import tempfile

    from airbyte_integrations_spark.config import SyncConfig
    from airbyte_integrations_spark.lakehouse.table import LakeTable
    from airbyte_integrations_spark.streaming.microbatch import run_sync

    tune_session(spark)
    ce = change_events(spark, sf_dir)
    hi = int(ce.agg(F.max("_ab_cdc_lsn")).collect()[0][0])
    mid = hi // 2
    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    table = LakeTable(
        spark, tempfile.mkdtemp(prefix="wap_entry_", dir=scratch) + "/t"
    )
    cfg = SyncConfig(stream="pages")
    run_sync(
        spark, ce.filter(F.col("_ab_cdc_lsn") <= mid), table, cfg,
        extract_missing_text=False, compact_threshold=None,
    )
    v_main = table.current_version()
    audit = table.create_branch("audit")
    run_sync(
        spark, ce, audit, cfg,
        extract_missing_text=False, compact_threshold=None,
    )
    assert table.current_version() == v_main, "branch write leaked to main"
    live = audit.read_live()
    assert live.count() == live.select("url").distinct().count(), "audit failed"
    table.publish_branch(audit)
    assert (
        run_sync(spark, ce, table, cfg, extract_missing_text=False,
                 compact_threshold=None) == []
    ), "published epochs must epoch-skip a re-sync"
    return table.read_live().select(
        "url", "_ab_cdc_lsn", _us("_ab_cdc_updated_at").alias("updated_us")
    )


O_CDC_WAP_PUBLISH = f"""
WITH {CE_SQL},
{WINNERS_SQL}
SELECT url, _ab_cdc_lsn, epoch_us(_ab_cdc_updated_at) AS updated_us
FROM w WHERE rn = 1 AND _ab_cdc_deleted_at IS NULL
"""


def q_cdc_clustered_range_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort-order clustering + zone-map file skipping (Iceberg
    rewrite-with-sort-order): after the CDC replay the table is
    re-clustered by value_m (compact(sort_by=...) — per-bucket
    sortWithinPartitions, range-disjoint files via target_file_rows,
    value_m joins the per-file zone maps), then a range read over the
    [max/4, max/2] window is served by read_range, which PRUNES files
    on the manifest stats before any scan — asserted in-query
    (kept < total). Oracle: winners filtered to the same range.
    Winner-soundness of pruning is guaranteed by the compacted
    one-version-per-key base (uncompacted MoR is rejected by
    read_range; pinned in tests/test_sort_order.py)."""
    import tempfile

    from airbyte_integrations_spark.config import SyncConfig
    from airbyte_integrations_spark.lakehouse.table import LakeTable
    from airbyte_integrations_spark.streaming.microbatch import run_sync

    tune_session(spark)
    ce = change_events(spark, sf_dir)
    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    table = LakeTable(
        spark, tempfile.mkdtemp(prefix="cluster_entry_", dir=scratch) + "/t"
    )
    cfg = SyncConfig(stream="pages")
    run_sync(
        spark, ce, table, cfg,
        extract_missing_text=False, compact_threshold=None,
    )
    # sandbox file-size knob: ~8 range-disjoint files per bucket at
    # sf0.01 (production would use Iceberg-style byte targets)
    n_live = table.read_live().count()
    table.compact(
        sort_by="value_m",
        target_file_rows=max(n_live // (32 * 8), 8),
    )
    vmax = int(
        table.read_live().agg(F.max("value_m")).collect()[0][0]
    )
    lo, hi = vmax // 4, vmax // 2
    kept, total = table.range_prune_counts("value_m", lo, hi)
    assert kept < total, f"clustered range read did not prune ({kept}/{total})"
    return table.read_range("value_m", lo, hi).select(
        "url", "_ab_cdc_lsn", "value_m"
    )


O_CDC_CLUSTERED_RANGE_READ = f"""
WITH {CE_SQL},
{WINNERS_SQL},
live AS (
  SELECT url, _ab_cdc_lsn, value_m FROM w
  WHERE rn = 1 AND _ab_cdc_deleted_at IS NULL
),
b AS (SELECT max(value_m) // 4 AS lo, max(value_m) // 2 AS hi FROM live)
SELECT url, _ab_cdc_lsn, value_m
FROM live, b WHERE value_m >= b.lo AND value_m <= b.hi
"""


def q_cdc_partitioned_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kafka-shaped partitioned-log consume (source-kafka's
    {partition: offset} vector state): the log is key-hash split into 4
    partitions, consumed in two rounds (first everything at or below
    mid, then the rest) with per-partition offset resume — the final
    live state must equal the plain winner replay (partitioning and
    round boundaries are invisible to the result). Exercises
    sources/partitioned_log.sync_partitioned_log end to end."""
    import tempfile

    from airbyte_integrations_spark.config import SyncConfig
    from airbyte_integrations_spark.lakehouse.table import LakeTable
    from airbyte_integrations_spark.sources.partitioned_log import (
        PART_COL,
        sync_partitioned_log,
    )

    tune_session(spark)
    ce = change_events(spark, sf_dir)
    plog = ce.withColumn(
        PART_COL, F.pmod(F.xxhash64("url"), F.lit(4)).cast("int")
    )
    hi = int(ce.agg(F.max("_ab_cdc_lsn")).collect()[0][0])
    mid = hi // 2
    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    table = LakeTable(
        spark, tempfile.mkdtemp(prefix="plog_entry_", dir=scratch) + "/t"
    )
    cfg = SyncConfig(stream="pages")
    sync_partitioned_log(
        spark, plog.filter(F.col("_ab_cdc_lsn") <= mid), table, cfg,
        compact_threshold=None,
    )
    sync_partitioned_log(spark, plog, table, cfg, compact_threshold=None)
    return table.read_live().select(
        "url", "_ab_cdc_lsn", "event_type", "value_m"
    )


O_CDC_PARTITIONED_OFFSETS = f"""
WITH {CE_SQL}, {WINNERS_SQL}
SELECT url, _ab_cdc_lsn, event_type, value_m
FROM w WHERE rn = 1 AND _ab_cdc_deleted_at IS NULL
"""


def q_cdc_lineage_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(epoch, shard) offset ranges + counts — the lineage/metrics
    table shape (DefaultReplicationWorker.java:197-228)."""
    tune_session(spark)
    ce = change_events(spark, sf_dir)
    epoch = (F.floor((F.col("_ab_cdc_lsn") - 1) / 1000) * 1000).cast("long")
    shard = (F.col("_ab_cdc_lsn") % 8).cast("long")
    return ce.groupBy(epoch.alias("epoch_from"), shard.alias("shard")).agg(
        F.min("_ab_cdc_lsn").alias("from_lsn"),
        F.max("_ab_cdc_lsn").alias("to_lsn"),
        F.count("*").alias("n_events"),
        F.sum(F.col("_ab_cdc_deleted_at").isNotNull().cast("long")).alias("n_deletes"),
    )


O_CDC_LINEAGE_OFFSETS = f"""
WITH {CE_SQL}
SELECT CAST(floor((_ab_cdc_lsn - 1) / 1000.0) * 1000 AS BIGINT) AS epoch_from,
       _ab_cdc_lsn % 8 AS shard,
       min(_ab_cdc_lsn) AS from_lsn, max(_ab_cdc_lsn) AS to_lsn,
       count(*) AS n_events,
       CAST(sum(CASE WHEN _ab_cdc_deleted_at IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_deletes
FROM ce GROUP BY 1, 2
"""


def q_cdc_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mid-stream schema change: odd-lsn slice has the OLD schema (no
    event_type/value_m), even-lsn slice the NEW one; union-by-name
    null-backfills, then the winner rule applies (star_intersect.sql:9-47;
    FIXTURES.md F3.5)."""
    tune_session(spark)
    ce = change_events(spark, sf_dir)
    old = ce.filter(F.col("_ab_cdc_lsn") % 2 == 1).drop("event_type", "value_m")
    new = ce.filter(F.col("_ab_cdc_lsn") % 2 == 0)
    both = old.unionByName(new, allowMissingColumns=True)
    return winner_window(both, drop_tombstones=True).select(
        "url", "_ab_cdc_lsn", "event_type", "value_m"
    )


O_CDC_SCHEMA_EVOLUTION = f"""
WITH {CE_SQL},
u AS (
  SELECT url, _ab_cdc_lsn, _ab_cdc_updated_at, _ab_cdc_deleted_at,
         _airbyte_ab_id, _airbyte_emitted_at,
         CAST(NULL AS VARCHAR) AS event_type, CAST(NULL AS BIGINT) AS value_m
  FROM ce WHERE _ab_cdc_lsn % 2 = 1
  UNION ALL
  SELECT * FROM ce WHERE _ab_cdc_lsn % 2 = 0
),
w AS (
  SELECT *, row_number() OVER (PARTITION BY url ORDER BY {ORDER_SQL}) AS rn
  FROM u
)
SELECT url, _ab_cdc_lsn, event_type, value_m
FROM w WHERE rn = 1 AND _ab_cdc_deleted_at IS NULL
"""


def q_cdc_snapshot_plus_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Initial snapshot (lsn=0 image per url) + log tail in one sync;
    log events win over the snapshot (DebeziumRecordIterator snapshot
    phase; sources/cdc.snapshot_then_tail)."""
    tune_session(spark)
    ce = change_events(spark, sf_dir)
    t0 = F.lit("2020-01-01 00:00:00").cast("timestamp")
    snap = ce.select("url").distinct().select(
        "url",
        F.lit(0).cast("long").alias("_ab_cdc_lsn"),
        t0.alias("_ab_cdc_updated_at"),
        F.lit(None).cast("timestamp").alias("_ab_cdc_deleted_at"),
        F.md5(F.col("url")).alias("_airbyte_ab_id"),
        t0.alias("_airbyte_emitted_at"),
        F.lit("snapshot").alias("event_type"),
        F.lit(0).cast("long").alias("value_m"),
    )
    both = snap.unionByName(ce)
    return winner_window(both, drop_tombstones=True).select(
        "url", "_ab_cdc_lsn", "event_type"
    )


O_CDC_SNAPSHOT_PLUS_LOG = f"""
WITH {CE_SQL},
snap AS (
  SELECT DISTINCT url, CAST(0 AS BIGINT) AS _ab_cdc_lsn,
         TIMESTAMP '2020-01-01 00:00:00' AS _ab_cdc_updated_at,
         CAST(NULL AS TIMESTAMP) AS _ab_cdc_deleted_at,
         md5(url) AS _airbyte_ab_id,
         TIMESTAMP '2020-01-01 00:00:00' AS _airbyte_emitted_at,
         'snapshot' AS event_type, CAST(0 AS BIGINT) AS value_m
  FROM ce
),
u AS (SELECT * FROM snap UNION ALL SELECT * FROM ce),
w AS (
  SELECT *, row_number() OVER (PARTITION BY url ORDER BY {ORDER_SQL}) AS rn
  FROM u
)
SELECT url, _ab_cdc_lsn, event_type FROM w WHERE rn = 1 AND _ab_cdc_deleted_at IS NULL
"""


def q_cdc_composite_pk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-CDC incremental dedup with a composite PK and a non-lsn
    cursor — the dedup_exchange_rate shape (FIXTURES.md F3.3): key
    (url, event_type), cursor _ab_cdc_updated_at."""
    tune_session(spark)
    ce = change_events(spark, sf_dir)
    w = winner_window(
        ce,
        key=("url", "event_type"),
        cursor="_ab_cdc_updated_at",
        secondary=("_airbyte_emitted_at",),
    )
    return w.select(
        "url",
        "event_type",
        _us("_ab_cdc_updated_at").alias("updated_us"),
        "_ab_cdc_lsn",
    )


O_CDC_COMPOSITE_PK_DEDUP = f"""
WITH {CE_SQL},
w AS (
  SELECT *, row_number() OVER (
    PARTITION BY url, event_type
    ORDER BY _ab_cdc_updated_at IS NULL ASC, _ab_cdc_updated_at DESC,
             _airbyte_emitted_at DESC, _airbyte_ab_id DESC
  ) AS rn
  FROM ce
)
SELECT url, event_type, epoch_us(_ab_cdc_updated_at) AS updated_us, _ab_cdc_lsn
FROM w WHERE rn = 1
"""


def q_json_extract_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON blob field extraction + cast + empty-string-to-null — the
    ab1/ab2 normalization steps (stream_processor.py:382-463, 499-569;
    json_operations.sql) over the events.props JSON column."""
    tune_session(spark)
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k")
    k = F.when(k == "", None).otherwise(k).cast("long")  # empty_string_to_null
    return (
        ev.select(F.col("event_type"), k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


O_JSON_EXTRACT_CAST = """
SELECT event_type, count(*) AS n,
       CAST(sum(k) AS BIGINT) AS sum_k, min(k) AS min_k, max(k) AS max_k
FROM (
  SELECT event_type,
         CAST(nullif(json_extract_string(props, '$.k'), '') AS BIGINT) AS k
  FROM events
)
GROUP BY event_type
"""


# ------------------------------------------------- training-data pipeline

def q_docs_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash over documents (hash-groupBy)."""
    tune_session(spark)
    docs = load(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5(F.col("text")).alias("text_md5"))
        .agg(F.count("*").alias("n_copies"), F.min("doc_id").alias("canonical_id"))
    )


O_DOCS_EXACT_DEDUP = """
SELECT md5(text) AS text_md5, count(*) AS n_copies, min(doc_id) AS canonical_id
FROM documents GROUP BY 1
"""


def q_docs_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized document fingerprint: md5(lower + whitespace-collapse)."""
    tune_session(spark)
    docs = load(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    return docs.select("doc_id", F.md5(norm).alias("fingerprint"), "n_chars")


O_DOCS_FINGERPRINT = r"""
SELECT doc_id,
       md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint,
       n_chars
FROM documents
"""


def q_docs_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: token count, punctuation count, punct ratio
    (per-mille) — the length/punct heuristics of a webtext filter."""
    tune_session(spark)
    docs = load(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    t = F.col("text")
    n_tokens = F.size(F.split(F.trim(t), r"\s+"))
    n_punct = F.length(t) - F.length(F.regexp_replace(t, r"[.,!?;:]", ""))
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_punct.alias("n_punct"),
        F.floor(n_punct * 1000.0 / F.length(t)).cast("long").alias("punct_ratio_pm"),
        F.length(t).alias("n_chars_live"),
    )


O_DOCS_QUALITY = r"""
SELECT doc_id,
       len(string_split_regex(trim(text), '\s+')) AS n_tokens,
       length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct,
       CAST(floor((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
            * 1000.0 / length(text)) AS BIGINT) AS punct_ratio_pm,
       length(text) AS n_chars_live
FROM documents WHERE n_chars > 0
"""


def q_docs_c4_line_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 line-level cleaning (functions/curation.c4_line_filter):
    keep lines ending in terminal punctuation with >=5 words and no
    blocklisted word; keep documents with >=3 surviving lines. The
    corpus words are single-line, so line structure is synthesized
    deterministically first (8-token lines; every (doc_id+i)%4==0 line
    is left without terminal punctuation so rule (a) actually fires);
    'slow'/'big' stand in for the C4 badword list. clean_sig pins the
    exact cleaned text, not just the counters. Entirely Catalyst
    higher-order functions — zero Python, zero shuffle, zero explode."""
    from airbyte_integrations_spark.functions.curation import c4_line_filter

    tune_session(spark)
    docs = _spread(load(spark, sf_dir, "documents")).filter(F.col("n_chars") > 0)
    toks = F.split(F.col("text"), " ")
    idx = F.sequence(
        F.lit(0), F.floor((F.size(toks) - F.lit(1)) / 8).cast("int")
    )
    line = lambda i: F.concat(  # noqa: E731
        F.array_join(F.slice(toks, i * 8 + 1, 8), " "),
        F.when(((F.col("doc_id") + i) % 4) != 0, F.lit(".")).otherwise(
            F.lit("")
        ),
    )
    synth = docs.withColumn("text", F.array_join(F.transform(idx, line), "\n"))
    out = c4_line_filter(
        synth, min_words_per_line=5, min_kept_lines=3, badwords=("slow", "big")
    )
    return out.select(
        "doc_id",
        F.col("n_lines").cast("long").alias("n_lines"),
        F.col("n_kept_lines").cast("long").alias("n_kept_lines"),
        F.col("kept_words").cast("long").alias("kept_words"),
        "doc_kept",
        F.md5(F.col("clean_text").cast("binary")).alias("clean_sig"),
    )


O_DOCS_C4_LINE_FILTER = r"""
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS toks
  FROM documents WHERE n_chars > 0
),
synth AS (
  SELECT doc_id,
    list_transform(
      range(CAST(floor((len(toks) - 1) / 8.0) AS BIGINT) + 1),
      i -> array_to_string(toks[(i*8+1):(i*8+8)], ' ')
           || CASE WHEN (doc_id + i) % 4 <> 0 THEN '.' ELSE '' END
    ) AS lines
  FROM base
),
filt AS (
  SELECT doc_id, lines,
    list_filter(lines, ln ->
      right(ln, 1) IN ('.', '!', '?', '"')
      AND len(string_split(ln, ' ')) >= 5
      AND NOT regexp_matches(ln, '\b(slow|big)\b')
    ) AS kept
  FROM synth
)
SELECT doc_id,
       CAST(len(lines) AS BIGINT) AS n_lines,
       CAST(len(kept) AS BIGINT) AS n_kept_lines,
       CAST(coalesce(list_sum(list_transform(kept, ln -> len(string_split(ln, ' ')))), 0) AS BIGINT) AS kept_words,
       len(kept) >= 3 AS doc_kept,
       md5(coalesce(array_to_string(kept, chr(10)), '')) AS clean_sig
FROM filt
"""


def q_docs_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capstone training-data curation composition: quality gate
    (token count + punctuation ratio) -> normalized-fingerprint exact
    dedup keeping the lowest doc_id as canonical. One declarative plan:
    Catalyst fuses the scoring projections into the scan and the dedup
    is a single hash aggregation (map-side combined)."""
    tune_session(spark)
    docs = load(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    t = F.col("text")
    norm = F.trim(F.regexp_replace(F.lower(t), r"\s+", " "))
    n_tokens = F.size(F.split(F.trim(t), r"\s+"))
    n_punct = F.length(t) - F.length(F.regexp_replace(t, r"[.,!?;:]", ""))
    punct_pm = F.floor(n_punct * 1000.0 / F.length(t)).cast("long")
    scored = docs.select(
        "doc_id", "lang", F.md5(norm).alias("fingerprint"),
        n_tokens.alias("n_tokens"), punct_pm.alias("punct_pm"),
    )
    filtered = scored.filter((F.col("n_tokens") >= 5) & (F.col("punct_pm") < 300))
    return filtered.groupBy("fingerprint").agg(
        F.min("doc_id").alias("doc_id"),
        F.count(F.lit(1)).alias("n_dupes"),
        F.min_by("lang", "doc_id").alias("lang"),
    )


O_DOCS_CURATION_PIPELINE = r"""
WITH scored AS (
  SELECT doc_id, lang,
         md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint,
         len(string_split_regex(trim(text), '\s+')) AS n_tokens,
         CAST(floor((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
              * 1000.0 / length(text)) AS BIGINT) AS punct_pm
  FROM documents WHERE n_chars > 0
),
filtered AS (
  SELECT * FROM scored WHERE n_tokens >= 5 AND punct_pm < 300
)
SELECT fingerprint, min(doc_id) AS doc_id, count(*) AS n_dupes,
       arg_min(lang, doc_id) AS lang
FROM filtered GROUP BY 1
"""


_LANG_MARKERS = [
    ("en", " the "),
    ("de", " der "),
    ("fr", " le "),
    ("es", " los "),
    ("zh", "的"),
]


def q_docs_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition quality gate (Gopher/C4-style):
    duplicate-3gram and top-3gram per-mille shares per doc
    (functions/neardup.repetition_stats; two chained map-side-combining
    hash aggs — skew-safe even on pathologically repetitive docs)."""
    tune_session(spark)
    from airbyte_integrations_spark.functions.neardup import repetition_stats

    docs = _spread(load(spark, sf_dir, "documents")).filter(F.col("n_chars") > 0)
    return repetition_stats(docs, "doc_id", "text", k=3)


O_DOCS_REPETITION = r"""
WITH w AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ws
  FROM documents WHERE n_chars > 0
),
ms AS (
  SELECT doc_id, array_to_string(ws[p:p + 2], ' ') AS shingle
  FROM (
    SELECT doc_id, ws,
           unnest(generate_series(1, greatest(len(ws) - 2, 1))) AS p
    FROM w
  )
),
per AS (
  SELECT doc_id, shingle, count(*) AS c FROM ms GROUP BY 1, 2
)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_ngrams,
       count(*) AS n_distinct_ngrams,
       CAST(floor((1.0 - count(*) * 1.0 / sum(c)) * 1000.0) AS BIGINT) AS dup_ngram_pm,
       CAST(floor(max(c) * 1000.0 / sum(c)) AS BIGINT) AS top_ngram_pm
FROM per GROUP BY doc_id
"""


def q_docs_sparse_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse keyword retrieval (the BM25/TF-IDF inverted-index shape a
    curation pipeline uses to mine topical subsets or audit
    decontamination): given a FIXED query set, score every document by
    sum over query terms of an integer-exact df-normalized term weight
    (floor(tf*1e6/df) via integer division — no ln()/double ULP
    hazards), and return the top-10 documents per query with rank.

    Scale shape: the token stream is filtered to the query vocabulary
    BEFORE any aggregation (a broadcast isin over <=9 literals — the
    corpus never shuffles on anything wider), tf is a map-side-combined
    hash agg over (doc, term) restricted to matching tokens, df is a
    second tiny agg over that, the query map joins by broadcast, and
    the final top-k is one window per query id over already-reduced
    (query, doc) scores. Query count is a constant (the |Q| knob is
    independent of corpus size), so total cost is O(matching tokens).
    """
    tune_session(spark)
    from airbyte_integrations_spark.functions.neardup import words

    queries = spark.createDataFrame(
        [
            (1, "spark"), (1, "join"), (1, "merge"),
            (2, "window"), (2, "sort"), (2, "group"),
            (3, "customer"), (3, "query"), (3, "table"),
        ],
        "query_id int, term string",
    )
    vocab = [r.term for r in queries.select("term").distinct().collect()]
    docs = load(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    tok = docs.select(
        "doc_id", F.explode(words("text")).alias("term")
    ).filter(F.col("term").isin(vocab))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    weighted = tf.join(F.broadcast(dfreq), "term").withColumn(
        "w", F.expr("(tf * 1000000L) div df")
    )
    scored = (
        weighted.join(F.broadcast(queries), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.sum("w").alias("score_m"), F.count("*").alias("n_terms_hit"))
    )
    win = Window.partitionBy("query_id").orderBy(
        F.col("score_m").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= 10)
        .select(
            F.col("query_id").cast("int").alias("query_id"),
            F.col("rank").cast("int").alias("rank"),
            "doc_id",
            F.col("score_m").cast("long").alias("score_m"),
            F.col("n_terms_hit").cast("long").alias("n_terms_hit"),
        )
    )


O_DOCS_SPARSE_RETRIEVAL = r"""
WITH q(query_id, term) AS (
  VALUES (1,'spark'),(1,'join'),(1,'merge'),
         (2,'window'),(2,'sort'),(2,'group'),
         (3,'customer'),(3,'query'),(3,'table')
),
tok AS (
  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
  FROM documents WHERE n_chars > 0
),
tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM tok WHERE term IN (SELECT DISTINCT term FROM q)
  GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT q.query_id, tf.doc_id,
         sum((tf.tf * 1000000) // dfreq.df) AS score_m,
         count(*) AS n_terms_hit
  FROM tf JOIN dfreq USING (term) JOIN q USING (term)
  GROUP BY 1, 2
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY score_m DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT CAST(query_id AS INTEGER) AS query_id, CAST(rank AS INTEGER) AS rank,
       doc_id, CAST(score_m AS BIGINT) AS score_m,
       CAST(n_terms_hit AS BIGINT) AS n_terms_hit
FROM ranked WHERE rank <= 10
"""


def q_docs_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-weighted salient terms: top-3 tokens per doc by an
    integer-exact tf-over-df score (TF-IDF-style; exact integer
    arithmetic so the DuckDB oracle hash-matches — ln() ulp differences
    between engines could flip a floor at the boundary).

    Scale shape: token explode -> (doc, token) hash agg (map-side
    combine) -> token-keyed document-frequency agg -> shuffle join on
    token (both sides already reduced: |tf| = distinct doc-token pairs,
    |df| = vocabulary) -> per-doc top-k window over ~unique-terms-sized
    partitions. No driver-side collect, no corpus-count scan (a
    constant factor cannot change the per-doc ranking)."""
    tune_session(spark)
    from pyspark.sql import Window

    from airbyte_integrations_spark.functions.neardup import words

    docs = load(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    tok = docs.select(
        "doc_id", F.explode(words("text")).alias("token")
    ).filter(F.length("token") > 0)
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    # tf-over-df is already df-normalized; a corpus-size factor would
    # scale every score by the same constant and change no ranking, so
    # there is deliberately NO n_docs scan/join here.
    scored = tf.join(dfreq, "token").select(
        "doc_id",
        "token",
        "tf",
        "df",
        F.floor(F.col("tf") * 1000000 / F.col("df")).cast("long").alias("score_m"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_m").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "rank", "token", "tf", "df", "score_m")
    )


O_DOCS_TFIDF_TOP_TERMS = r"""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
  FROM documents WHERE n_chars > 0
),
tf AS (
  SELECT doc_id, token, count(*) AS tf FROM tok WHERE len(token) > 0 GROUP BY 1, 2
),
dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
         CAST(floor(tf.tf * 1000000 / dfreq.df) AS BIGINT) AS score_m
  FROM tf JOIN dfreq USING (token)
)
SELECT doc_id, CAST(rank AS INTEGER) AS rank, token,
       CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, score_m
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY score_m DESC, token ASC
  ) AS rank
  FROM scored
)
WHERE rank <= 3
"""


def q_docs_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID heuristic, scored against the labeled
    lang column. (The driver's synthetic documents carry English-ish
    token soup under every label, so absolute accuracy is meaningless
    here — the gate is Spark/DuckDB parity of the heuristic itself.)"""
    tune_session(spark)
    docs = _spread(load(spark, sf_dir, "documents")).filter(F.col("n_chars") > 0)
    low = F.lower(F.col("text"))
    counts = {}
    for code, marker in _LANG_MARKERS:
        c = (F.length(low) - F.length(F.replace(low, F.lit(marker), F.lit("")))) / len(marker)
        counts[code] = c.cast("long")
    guess = F.lit("other")
    best = F.lit(0).cast("long")
    for code, _m in _LANG_MARKERS:
        cond = counts[code] > best
        guess = F.when(cond, F.lit(code)).otherwise(guess)
        best = F.when(cond, counts[code]).otherwise(best)
    return docs.select(
        "doc_id",
        "lang",
        guess.alias("lang_guess"),
        (guess == F.col("lang")).cast("int").alias("correct"),
    )


def _o_lang_sql() -> str:
    cnt = {
        code: (
            f"CAST((length(lower(text)) - length(replace(lower(text), '{m}', '')))"
            f" / {len(m)} AS BIGINT)"
        )
        for code, m in _LANG_MARKERS
    }
    # sequential argmax with strict > , same priority order as the Spark side
    guess = "'other'"
    best = "CAST(0 AS BIGINT)"
    for code, _m in _LANG_MARKERS:
        guess = f"CASE WHEN {cnt[code]} > {best} THEN '{code}' ELSE {guess} END"
        best = f"CASE WHEN {cnt[code]} > {best} THEN {cnt[code]} ELSE {best} END"
    return f"""
SELECT doc_id, lang, {guess} AS lang_guess,
       CASE WHEN {guess} = lang THEN 1 ELSE 0 END AS correct
FROM documents WHERE n_chars > 0
"""


def q_emb_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucketing of embeddings (8 fixed hyperplane axes) — the
    scale path for ANN candidate generation."""
    tune_session(spark)
    emb = load(spark, sf_dir, "embeddings")
    dims = [1, 9, 17, 25, 33, 41, 49, 57]
    bits = [
        F.when(F.element_at(F.col("embedding"), d) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for d in dims
    ]
    return (
        emb.groupBy(F.concat(*bits).alias("bucket"))
        .agg(F.count("*").alias("n_vecs"), F.min("vec_id").alias("min_vec_id"))
    )


O_EMB_LSH_BUCKETS = """
SELECT (CASE WHEN embedding[1] >= 0 THEN '1' ELSE '0' END ||
        CASE WHEN embedding[9] >= 0 THEN '1' ELSE '0' END ||
        CASE WHEN embedding[17] >= 0 THEN '1' ELSE '0' END ||
        CASE WHEN embedding[25] >= 0 THEN '1' ELSE '0' END ||
        CASE WHEN embedding[33] >= 0 THEN '1' ELSE '0' END ||
        CASE WHEN embedding[41] >= 0 THEN '1' ELSE '0' END ||
        CASE WHEN embedding[49] >= 0 THEN '1' ELSE '0' END ||
        CASE WHEN embedding[57] >= 0 THEN '1' ELSE '0' END) AS bucket,
       count(*) AS n_vecs, min(vec_id) AS min_vec_id
FROM embeddings GROUP BY 1
"""


def q_emb_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 neighbors for a CONSTANT-BUDGET query
    sample — the eval oracle for the ANN paths (emb_ann_lsh_topk /
    emb_ann_ivf_topk are the production shapes). The query set is the
    min(1000, ceil(n/10)) vectors with the smallest md5(vec_id)
    (deterministic sample, TakeOrderedAndProject — constant driver/
    executor memory): at scale the budget is the CONSTANT 1,000, so
    eval cost is O(n·|Q|) with |Q| fixed (a %-based query set made
    even the eval harness O(n²)); the ceil(n/10) arm only trims small
    local sweeps, where a 1,000-query budget would cost more than the
    corpus itself. Similarity coarsened to floor(cos*100) and ranked
    by (sim_c DESC, neighbor id ASC) so ordering is
    float-rounding-proof across engines."""
    tune_session(spark)
    emb = _spread(load(spark, sf_dir, "embeddings"))
    budget = min(1000, -(-emb.count() // 10))  # one bounded scalar agg
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = emb.select(
        F.col("vec_id"),
        dbl.alias("v"),
        F.sqrt(F.aggregate(dbl, F.lit(0.0), lambda a, x: a + x * x)).alias("nrm"),
    )
    q = (
        base.withColumn(
            "qkey", F.md5(F.col("vec_id").cast("string").cast("binary"))
        )
        .orderBy(F.col("qkey").asc(), F.col("vec_id").asc())
        .limit(budget)
        .select(
            F.col("vec_id").alias("qid"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
        )
    )
    c = base.select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv"), F.col("nrm").alias("cn")
    )
    dot = F.aggregate(
        F.zip_with(F.col("qv"), F.col("cv"), lambda a, b: a * b),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    pairs = (
        q.crossJoin(c)
        .filter(F.col("qid") != F.col("cid"))
        .select(
            "qid",
            "cid",
            F.floor(dot / (F.col("qn") * F.col("cn")) * 100).cast("long").alias("sim_c"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim_c").desc(), F.col("cid").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("qid", "cid", "sim_c", "rank")
    )


O_EMB_KNN_COSINE = """
WITH base AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
base2 AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM base),
b AS (SELECT least(1000, CAST(ceil(count(*) / 10.0) AS BIGINT)) AS n
      FROM embeddings),
q AS (SELECT qid, qv, qn FROM (
        SELECT vec_id AS qid, v AS qv, nrm AS qn,
               row_number() OVER (
                 ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC) AS qrn
        FROM base2
      ) WHERE qrn <= (SELECT n FROM b)),
pairs AS (
  SELECT q.qid, c.vec_id AS cid,
         CAST(floor(list_dot_product(q.qv, c.v) / (q.qn * c.nrm) * 100) AS BIGINT) AS sim_c
  FROM q, base2 c WHERE q.qid != c.vec_id
)
SELECT qid, cid, sim_c, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim_c DESC, cid ASC) AS rank
  FROM pairs
) WHERE rank <= 5
"""


def q_emb_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: candidates restricted to
    the same sign-LSH bucket, kept when floor(cos*100) >= 35 (the synthetic
    embeddings are near-orthogonal — max pairwise cos ~0.45 — so the
    threshold sits in the real tail) — the
    embedding-space analogue of MinHash near-dup dedup."""
    tune_session(spark)
    emb = load(spark, sf_dir, "embeddings")
    dims = [1, 9, 17, 25, 33, 41, 49, 57]
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    bits = [
        F.when(F.element_at(F.col("embedding"), d) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for d in dims
    ]
    base = emb.select(
        "vec_id",
        dbl.alias("v"),
        F.sqrt(F.aggregate(dbl, F.lit(0.0), lambda a, x: a + x * x)).alias("nrm"),
        F.concat(*bits).alias("bucket"),
    )
    a = base.select(
        F.col("vec_id").alias("id_a"), F.col("v").alias("va"),
        F.col("nrm").alias("na"), "bucket",
    )
    b = base.select(
        F.col("vec_id").alias("id_b"), F.col("v").alias("vb"),
        F.col("nrm").alias("nb"), "bucket",
    )
    dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.floor(dot / (F.col("na") * F.col("nb")) * 100).cast("long").alias("sim_c"),
        )
        .filter(F.col("sim_c") >= 35)
    )


O_EMB_COSINE_NEARDUP = """
WITH base AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
         (CASE WHEN embedding[1] >= 0 THEN '1' ELSE '0' END ||
          CASE WHEN embedding[9] >= 0 THEN '1' ELSE '0' END ||
          CASE WHEN embedding[17] >= 0 THEN '1' ELSE '0' END ||
          CASE WHEN embedding[25] >= 0 THEN '1' ELSE '0' END ||
          CASE WHEN embedding[33] >= 0 THEN '1' ELSE '0' END ||
          CASE WHEN embedding[41] >= 0 THEN '1' ELSE '0' END ||
          CASE WHEN embedding[49] >= 0 THEN '1' ELSE '0' END ||
          CASE WHEN embedding[57] >= 0 THEN '1' ELSE '0' END) AS bucket
  FROM embeddings
),
base2 AS (SELECT vec_id, v, bucket, sqrt(list_dot_product(v, v)) AS nrm FROM base)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       CAST(floor(list_dot_product(a.v, b.v) / (a.nrm * b.nrm) * 100) AS BIGINT) AS sim_c
FROM base2 a JOIN base2 b USING (bucket)
WHERE a.vec_id < b.vec_id
  AND CAST(floor(list_dot_product(a.v, b.v) / (a.nrm * b.nrm) * 100) AS BIGINT) >= 35
"""


def q_multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: documents as opaque binary payloads run
    through an Arrow mapInPandas metadata extractor (the decode step a
    real image/audio pipeline would plug in here — see
    functions/multimodal.py for the stubbed decoder)."""
    tune_session(spark)
    import pandas as pd

    docs = load(spark, sf_dir, "documents")
    payload = docs.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("blob"))

    def meta(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["blob"].map(lambda b: len(b) if b is not None else 0),
                }
            )

    return payload.mapInPandas(meta, "doc_id long, n_bytes long")


O_MULTIMODAL_BINARY_META = """
SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes FROM documents
"""


def q_docs_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (4 lexicographic-min md5 'permutations' over
    distinct 3-word shingles) — engine-independent by construction;
    the LSH building block for near-dup dedup at 100TB."""
    tune_session(spark)
    from airbyte_integrations_spark.functions.neardup import minhash_signature

    docs = _spread(load(spark, sf_dir, "documents")).filter(F.col("n_chars") > 0)
    return minhash_signature(docs, "doc_id", "text", k=3, n_hashes=4)


O_DOCS_MINHASH = r"""
WITH w AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ws
  FROM documents WHERE n_chars > 0
),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(ws[p:p + 2], ' ') AS shingle
  FROM (
    SELECT doc_id, ws,
           unnest(generate_series(1, greatest(len(ws) - 2, 1))) AS p
    FROM w
  )
)
SELECT doc_id,
       min(md5(shingle || '#0')) AS mh0, min(md5(shingle || '#1')) AS mh1,
       min(md5(shingle || '#2')) AS mh2, min(md5(shingle || '#3')) AS mh3
FROM sh GROUP BY doc_id
"""


def _neardup_verified_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared pipeline: minhash (8 hashes) -> LSH banding (4 bands of
    2) -> candidate pairs -> exact-Jaccard verification, keeping pairs
    with jaccard_m = floor(j*1000) >= 500."""
    from airbyte_integrations_spark.functions.neardup import (
        jaccard_pairs,
        lsh_candidate_pairs,
        minhash_signature,
        shingles,
    )

    docs = _spread(load(spark, sf_dir, "documents")).filter(F.col("n_chars") > 0)
    # The shingle explosion feeds minhash + both verification branches
    # + sizes, and the signature feeds 4 band self-joins: cache both
    # once instead of recomputing the lineage per branch (~8x scans
    # otherwise). register_persist tracks them as engine-owned so the
    # next tune_session releases exactly these, never caller caches.
    from airbyte_integrations_spark.session import register_persist
    sh = register_persist(shingles(docs, "doc_id", "text"))
    sig = register_persist(minhash_signature(docs, "doc_id", "text", shingles_df=sh))
    pairs = lsh_candidate_pairs(sig, "doc_id")
    jac = jaccard_pairs(docs, pairs, "doc_id", "text", shingles_df=sh)
    # multiply-then-divide on the INTEGER columns, the same op order as
    # the DuckDB oracle — divide-then-multiply can land one ulp below
    # an exact integer and flip the floor at the >= 500 cut.
    return jac.select(
        "id_a",
        "id_b",
        F.floor(F.col("n_inter") * 1000.0 / F.col("n_union")).cast("long").alias("jaccard_m"),
    ).filter(F.col("jaccard_m") >= 500)


def q_docs_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full near-dup pipeline: minhash (8 hashes) -> LSH banding
    (4 bands of 2) -> candidate pairs -> exact-Jaccard verification,
    keeping pairs with jaccard_m = floor(j*1000) >= 500."""
    tune_session(spark)
    return _neardup_verified_pairs(spark, sf_dir)


def q_docs_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate CLUSTERS from verified near-dup pairs: connected
    components by min-label propagation (a~b, b~c => one cluster), the
    transitive-closure step that turns pairwise LSH output into a
    keep-one-per-cluster dedup decision. cluster_id = min doc_id of the
    component; is_canonical marks the survivor."""
    tune_session(spark)
    from airbyte_integrations_spark.functions.neardup import connected_components

    pairs = _neardup_verified_pairs(spark, sf_dir)
    comp = connected_components(pairs, "id_a", "id_b")
    sizes = comp.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return comp.join(sizes, "component").select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        F.col("cluster_size"),
        (F.col("node") == F.col("component")).alias("is_canonical"),
    )


_MH = ", ".join(f"min(md5(shingle || '#{i}')) AS mh{i}" for i in range(8))
_BANDS = "\n  UNION ALL ".join(
    f"SELECT doc_id, {b} AS idx, md5(mh{2*b} || '|' || mh{2*b+1}) AS band FROM sig"
    for b in range(4)
)

O_DOCS_NEARDUP_PAIRS = rf"""
WITH w AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ws
  FROM documents WHERE n_chars > 0
),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(ws[p:p + 2], ' ') AS shingle
  FROM (
    SELECT doc_id, ws,
           unnest(generate_series(1, greatest(len(ws) - 2, 1))) AS p
    FROM w
  )
),
sig AS (SELECT doc_id, {_MH} FROM sh GROUP BY doc_id),
bands AS (
  {_BANDS}
),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.idx = b.idx AND a.band = b.band
  WHERE a.doc_id < b.doc_id
),
inter AS (
  SELECT p.id_a, p.id_b, count(*) AS n_inter
  FROM pairs p
  JOIN sh sa ON sa.doc_id = p.id_a
  JOIN sh sb ON sb.doc_id = p.id_b AND sb.shingle = sa.shingle
  GROUP BY 1, 2
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1)
SELECT id_a, id_b,
       CAST(floor(n_inter * 1000.0 / (za.n_sh + zb.n_sh - n_inter)) AS BIGINT) AS jaccard_m
FROM inter
JOIN sizes za ON za.doc_id = id_a
JOIN sizes zb ON zb.doc_id = id_b
WHERE CAST(floor(n_inter * 1000.0 / (za.n_sh + zb.n_sh - n_inter)) AS BIGINT) >= 500
"""

# Duplicate clusters = connected components over the verified pairs.
# Oracle closure via recursive CTE: reach(id, r) = "id can reach r";
# min(r) per id is the component label (matches min-label propagation).
_O_PAIRS_BODY = O_DOCS_NEARDUP_PAIRS.strip().removeprefix("WITH")

O_DOCS_DUP_CLUSTERS = rf"""
WITH RECURSIVE {_O_PAIRS_BODY.split("SELECT id_a, id_b,")[0].rstrip().rstrip(",")},
vpairs AS (
  SELECT id_a, id_b
  FROM inter
  JOIN sizes za ON za.doc_id = id_a
  JOIN sizes zb ON zb.doc_id = id_b
  WHERE CAST(floor(n_inter * 1000.0 / (za.n_sh + zb.n_sh - n_inter)) AS BIGINT) >= 500
),
edges AS (
  SELECT id_a AS a, id_b AS b FROM vpairs
  UNION ALL
  SELECT id_b AS a, id_a AS b FROM vpairs
),
reach(id, r) AS (
  SELECT DISTINCT a, a FROM edges
  UNION
  SELECT e.a, reach.r FROM edges e JOIN reach ON reach.id = e.b
),
comp AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id)
SELECT doc_id, cluster_id,
       count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
       doc_id = cluster_id AS is_canonical
FROM comp
"""


def q_docs_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style duplicated-span removal stats: chunk each document into
    consecutive 10-word spans, find each span's corpus-wide first
    occurrence (the minimum (doc_id, span_idx) encoded as one key), and
    report per doc its span count, how many spans duplicate an earlier
    occurrence, and the kept ratio (per-mille).

    Scale shape: the chunking is a flatMap (rows = tokens/10, no
    driver state), the first-occurrence pass is one hash aggregation
    with map-side combine on the span string, and the verdict join is
    span-keyed — the same dataflow C4 runs over Common Crawl. No
    all-pairs anywhere."""
    tune_session(spark)
    docs = _spread(load(spark, sf_dir, "documents")).filter(F.col("n_chars") > 0)
    words = F.split(F.col("text"), " ")
    n_spans = F.ceil(F.size(words) / F.lit(10.0)).cast("int")
    spans = F.transform(
        F.sequence(F.lit(0), n_spans - F.lit(1)),
        lambda i: F.concat_ws(" ", F.slice(words, i * 10 + 1, 10)),
    )
    sp = docs.select(
        "doc_id", F.posexplode(spans).alias("span_idx", "span")
    ).withColumn("k", F.col("doc_id") * 1_000_000 + F.col("span_idx"))
    first = sp.groupBy("span").agg(F.min("k").alias("first_k"))
    dup = F.sum((F.col("k") != F.col("first_k")).cast("long")).alias("n_dup_spans")
    return (
        sp.join(first, "span")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_spans"), dup)
        .select(
            "doc_id",
            "n_spans",
            "n_dup_spans",
            F.floor(
                (F.col("n_spans") - F.col("n_dup_spans"))
                * F.lit(1000.0)
                / F.col("n_spans")
            ).alias("kept_pm"),
        )
    )


O_DOCS_SPAN_DEDUP = """
WITH d AS (
  SELECT doc_id, str_split(text, ' ') AS ws FROM documents WHERE n_chars > 0
),
e AS (
  SELECT doc_id, ws,
         unnest(range(0, CAST(ceil(len(ws) / 10.0) AS BIGINT))) AS i
  FROM d
),
sp AS (
  SELECT doc_id,
         doc_id * 1000000 + i AS k,
         array_to_string(list_slice(ws, i * 10 + 1, i * 10 + 10), ' ') AS span
  FROM e
),
f AS (SELECT span, min(k) AS first_k FROM sp GROUP BY span)
SELECT doc_id,
       count(*) AS n_spans,
       CAST(sum(CASE WHEN sp.k <> f.first_k THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_spans,
       CAST(floor((count(*) - sum(CASE WHEN sp.k <> f.first_k THEN 1 ELSE 0 END))
                  * 1000.0 / count(*)) AS BIGINT) AS kept_pm
FROM sp JOIN f USING (span)
GROUP BY doc_id
"""


def q_docs_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup with EXCISION (Lee et al. 2022 ExactSubstr):
    unlike docs_span_dedup (stats only), this REWRITES the corpus —
    every 10-word span keeps only its corpus-wide first occurrence
    (ordered by (doc_id, position)); later occurrences are cut out of
    the document text. Output pins the cleaned text byte-exactly via
    md5 so the oracle verifies the rewrite, not just the counts.

    Scale shape (functions/neardup.remove_duplicate_spans): flatMap
    chunking, ONE map-side-combining hash agg for first occurrence,
    span-keyed verdict join, bounded per-document regroup. No
    all-pairs, no global sort."""
    tune_session(spark)
    from airbyte_integrations_spark.functions.neardup import (
        remove_duplicate_spans,
    )

    docs = _spread(load(spark, sf_dir, "documents")).filter(F.col("n_chars") > 0)
    out = remove_duplicate_spans(docs, "doc_id", "text", span_words=10)
    return out.select(
        "doc_id", "n_spans", "n_kept", F.md5("clean_text").alias("clean_sig")
    )


O_DOCS_SPAN_REMOVAL = """
WITH d AS (
  SELECT doc_id, str_split(text, ' ') AS ws FROM documents WHERE n_chars > 0
),
e AS (
  SELECT doc_id, ws,
         unnest(range(0, CAST(ceil(len(ws) / 10.0) AS BIGINT))) AS i
  FROM d
),
sp AS (
  SELECT doc_id, i, doc_id * 1000000 + i AS k,
         array_to_string(list_slice(ws, i * 10 + 1, i * 10 + 10), ' ') AS span
  FROM e
),
f AS (SELECT span, min(k) AS first_k FROM sp GROUP BY span)
SELECT sp.doc_id AS doc_id,
       count(*) AS n_spans,
       CAST(sum(CASE WHEN sp.k = f.first_k THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       md5(coalesce(string_agg(CASE WHEN sp.k = f.first_k THEN sp.span END,
                               ' ' ORDER BY sp.i), '')) AS clean_sig
FROM sp JOIN f USING (span)
GROUP BY sp.doc_id
"""


def q_docs_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style hashed-linear quality classifier (the CCNet /
    GPT-3 keep-vs-drop page filter): word bigrams -> hashing-trick
    weight buckets (dim=1024) -> summed linear score -> keep verdict.
    Weights are a deterministic Knuth-hash stand-in for trained
    parameters (integer-exact, oracle-checkable); swapping in real
    weights is a one-line broadcast-literal lookup with the same plan.

    Scale shape (functions/curation.hashed_linear_score): the bigram
    expansion, bucketing, and weighted sum run inside ONE higher-order
    `aggregate` fold — zero explode, zero Exchange, zero Python; the
    whole classifier is a narrow codegen projection at scan speed."""
    tune_session(spark)
    from airbyte_integrations_spark.functions.curation import (
        hashed_linear_score,
    )

    docs = _spread(load(spark, sf_dir, "documents")).filter(F.col("n_chars") > 0)
    s = hashed_linear_score("text", dim=1024)
    return docs.select(
        "doc_id",
        s["n_bigrams"].alias("n_bigrams"),
        s["score"].alias("score"),
        (s["score"] > 0).alias("keep"),
    )


O_DOCS_QUALITY_CLASSIFIER = """
WITH d AS (
  SELECT doc_id, str_split(text, ' ') AS ws FROM documents WHERE n_chars > 0
),
b AS (
  SELECT doc_id,
         CASE WHEN len(ws) >= 2
              THEN list_transform(range(1, len(ws)),
                                  i -> ws[i] || ' ' || ws[i + 1])
              ELSE CAST([] AS VARCHAR[]) END AS bigrams
  FROM d
)
SELECT doc_id,
       CAST(len(bigrams) AS BIGINT) AS n_bigrams,
       CAST(coalesce(list_sum(list_transform(bigrams,
            bg -> ((('0x' || substr(md5(bg), 1, 6))::BIGINT % 1024)
                   * 2654435761) % 2147483648 % 2001 - 1000)), 0) AS BIGINT)
         AS score,
       CAST(coalesce(list_sum(list_transform(bigrams,
            bg -> ((('0x' || substr(md5(bg), 1, 6))::BIGINT % 1024)
                   * 2654435761) % 2147483648 % 2001 - 1000)), 0) AS BIGINT)
         > 0 AS keep
FROM b
"""


def q_tpch_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: the distribution of customers by order count,
    INCLUDING zero-order customers (the left-join histogram no inner
    join can produce). The classic formulation joins the full customer
    table to orders then double-aggregates; here orders pre-aggregate
    to (custkey, n) FIRST — a map-side-combining count on the fact —
    so the join carries one row per customer key instead of one per
    order, and the second aggregate is over the tiny count domain.

    Scale shape: one Exchange on o_custkey for the pre-agg, one
    key-aligned left join (AQE picks the strategy; both sides are
    already custkey-reduced), and a final histogram agg whose key
    cardinality is O(max orders per customer). No row explosion at any
    corpus size."""
    tune_session(spark)
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    oc = o.groupBy("o_custkey").agg(F.count("*").alias("n"))
    per = c.join(oc, c["c_custkey"] == oc["o_custkey"], "left").select(
        F.coalesce(F.col("n"), F.lit(0)).alias("c_count")
    )
    return per.groupBy("c_count").agg(F.count("*").alias("custdist"))


O_TPCH_CUSTOMER_DISTRIBUTION = """
WITH oc AS (
  SELECT o_custkey, count(*) AS n
  FROM orders WHERE o_orderpriority <> '1-URGENT'
  GROUP BY o_custkey
)
SELECT coalesce(n, 0) AS c_count, count(*) AS custdist
FROM customer LEFT JOIN oc ON c_custkey = o_custkey
GROUP BY 1
"""


def q_events_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative-frame window (ROWS UNBOUNDED PRECEDING — the running
    total / burn-up shape): per event type, daily event counts and
    exact integer cents folded into running totals ordered by day.

    Scale shape: the raw events collapse to (type, day) with ONE
    map-side-combining agg before any window — the window then runs
    over O(types × days) rows, partitioned by type, so the ordered
    frame never sees raw-event cardinality. One Exchange total (the
    day agg's, reused by the window via the type-keyed repartition
    Catalyst aligns)."""
    tune_session(spark)
    ev = load(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    daily = ev.groupBy(
        F.col("event_type"),
        F.unix_micros(day.cast("timestamp")).alias("day_us"),
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.floor(F.col("value") * 100).cast("long")).alias("cents"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return daily.select(
        "event_type",
        "day_us",
        F.sum("n").over(w).alias("cum_events"),
        F.sum("cents").over(w).alias("cum_cents"),
    )


O_EVENTS_RUNNING_TOTAL = """
WITH d AS (
  SELECT event_type, epoch_us(date_trunc('day', ts)) AS day_us,
         count(*) AS n,
         CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
)
SELECT event_type, day_us,
       CAST(sum(n) OVER (PARTITION BY event_type ORDER BY day_us
                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_events,
       CAST(sum(cents) OVER (PARTITION BY event_type ORDER BY day_us
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
FROM d
"""


def q_docs_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified downsampling — the training-mix
    rebalancer: per-language keep rates applied via a content-stable
    hash threshold (hex prefix of md5(doc_id)), so the same document
    always gets the same verdict across runs and machines. 'en' keeps
    ~1/2 (prefix < '800'), every other language ~1/4 (< '400').

    Scale shape: a pure narrow filter — no shuffle, no state, fully
    pushed into the scan stage; the standard way to downsample a
    100 TB corpus without a sort or a global count."""
    tune_session(spark)
    docs = load(spark, sf_dir, "documents")
    h3 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 3)
    thr = F.when(F.col("lang") == "en", F.lit("800")).otherwise(F.lit("400"))
    return docs.filter(h3 < thr).select(
        "doc_id", "lang", h3.alias("h3"), "n_chars"
    )


O_DOCS_SAMPLE_STRATIFIED = """
SELECT doc_id, lang, substr(md5(CAST(doc_id AS VARCHAR)), 1, 3) AS h3, n_chars
FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 3)
      < CASE WHEN lang = 'en' THEN '800' ELSE '400' END
"""


def q_emb_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via IVF-Flat: a deterministic coarse codebook (every 97th
    vector — k-means refinement is an offline concern, the search
    dataflow is identical), every vector assigned to its argmax-cosine
    cell in ONE pass against the broadcast codebook, queries probe
    their top-2 cells (nprobe=2) and rank candidates only within them.
    At 10^10 scale the codebook is a broadcast table and the cell
    assignment is the partition key — candidate sets shrink
    ~n_cells/nprobe-fold vs brute force. Rounding-proof ranking:
    floor(cos*1000) with id tiebreaks, as the other ANN queries."""
    tune_session(spark)
    emb = load(spark, sf_dir, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = emb.select(
        "vec_id",
        dbl.alias("v"),
        F.sqrt(F.aggregate(dbl, F.lit(0.0), lambda a, x: a + x * x)).alias("nrm"),
    )
    cents = F.broadcast(
        base.withColumn(
            "_skey", F.md5(F.col("vec_id").cast("string").cast("binary"))
        )
        .orderBy(F.col("_skey").asc(), F.col("vec_id").asc())
        .limit(16)
        .select(
            F.col("vec_id").alias("cent_id"), F.col("v").alias("cv"),
            F.col("nrm").alias("cn"),
        )
    )
    qids = F.broadcast(
        base.withColumn(
            "_qkey", F.md5(F.col("vec_id").cast("string").cast("binary"))
        )
        .orderBy(F.col("_qkey").asc(), F.col("vec_id").asc())
        .limit(1000)
        .select("vec_id")
    )

    def cos(av, an, bv, bn):
        dot = F.aggregate(
            F.zip_with(av, bv, lambda a, b: a * b), F.lit(0.0), lambda a, x: a + x
        )
        return F.floor(dot / (an * bn) * 1000).cast("long")

    scored = base.crossJoin(cents).select(
        "vec_id", "v", "nrm", "cent_id",
        cos(F.col("v"), F.col("nrm"), F.col("cv"), F.col("cn")).alias("csim"),
    )
    wa = Window.partitionBy("vec_id").orderBy(F.col("csim").desc(), F.col("cent_id").asc())
    assign = (
        scored.withColumn("r", F.row_number().over(wa))
        .filter(F.col("r") == 1)
        .select("vec_id", "v", "nrm", F.col("cent_id").alias("cell"))
    )
    probes = (
        scored.join(qids, "vec_id")
        .withColumn("r", F.row_number().over(wa))
        .filter(F.col("r") <= 2)
        .select(F.col("vec_id").alias("qid"), F.col("v").alias("qv"),
                F.col("nrm").alias("qn"), F.col("cent_id").alias("cell"))
    )
    cands = probes.join(
        assign.select(F.col("vec_id").alias("cid"), F.col("v").alias("cv2"),
                      F.col("nrm").alias("cn2"), "cell"),
        "cell",
    ).filter(F.col("qid") != F.col("cid"))
    pairs = cands.select(
        "qid", "cid",
        cos(F.col("qv"), F.col("qn"), F.col("cv2"), F.col("cn2")).alias("sim_c"),
    ).distinct()  # a candidate can appear via both probed cells
    wr = Window.partitionBy("qid").orderBy(F.col("sim_c").desc(), F.col("cid").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= 3)
        .select("qid", "cid", "sim_c", "rank")
    )


O_EMB_ANN_IVF_TOPK = """
WITH base AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
nb AS (
  SELECT vec_id, v, sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS nrm
  FROM base
),
cents AS (
  SELECT vec_id AS cent_id, v AS cv, nrm AS cn FROM nb
  ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC LIMIT 16
),
scored AS (
  SELECT nb.vec_id, nb.v, nb.nrm, c.cent_id,
         CAST(floor(list_reduce(list_transform(range(1, len(nb.v) + 1),
                  i -> nb.v[i] * c.cv[i]), (a, b) -> a + b)
               / (nb.nrm * c.cn) * 1000) AS BIGINT) AS csim
  FROM nb CROSS JOIN cents c
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cent_id ASC) AS r
  FROM scored
),
assign AS (SELECT vec_id, v, nrm, cent_id AS cell FROM ranked WHERE r = 1),
qids AS (SELECT vec_id FROM nb ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC LIMIT 1000),
probes AS (
  SELECT vec_id AS qid, v AS qv, nrm AS qn, cent_id AS cell
  FROM ranked WHERE vec_id IN (SELECT vec_id FROM qids) AND r <= 2
),
pairs AS (
  SELECT DISTINCT p.qid, a.vec_id AS cid,
         CAST(floor(list_reduce(list_transform(range(1, len(p.qv) + 1),
                  i -> p.qv[i] * a.v[i]), (x, y) -> x + y)
               / (p.qn * a.nrm) * 1000) AS BIGINT) AS sim_c
  FROM probes p JOIN assign a USING (cell)
  WHERE p.qid <> a.vec_id
),
final AS (
  SELECT qid, cid, sim_c,
         row_number() OVER (PARTITION BY qid ORDER BY sim_c DESC, cid ASC) AS rank
  FROM pairs
)
SELECT qid, cid, sim_c, rank FROM final WHERE rank <= 3
"""


def q_docs_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-on-ingest — the CDC x curation fusion: a new batch of
    documents (doc_id % 10 >= 8 stands in for the incoming micro-batch)
    is deduplicated against the already-ingested corpus (% 10 < 8, the
    lake's fingerprint index) AND within itself. Statuses mirror the
    MERGE taxonomy: dup_of_corpus (anti-join hit), dup_in_batch (lost
    the winner window to a lower doc_id), new (insert). At 10^10 docs
    the corpus side is the bucketed lake fingerprint column — the join
    hash-partitions by fingerprint exactly like the MERGE's PK join,
    and the within-batch winner is the same winner_window idiom the
    CDC path equivalence-tests.

    The ingest key is the LEADING-SPAN fingerprint — md5 of the first
    50 normalized chars — not the whole-document hash: crawl dedup
    keys on document heads (boilerplate/title region) so re-crawled
    pages with churned tails still collide, and the synthetic corpus
    (which has zero whole-document duplicates at sf0.01) exercises
    all three statuses under it."""
    tune_session(spark)
    docs = load(spark, sf_dir, "documents")
    norm = F.substring(
        F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")), 1, 50
    )
    fp = docs.select("doc_id", F.md5(norm).alias("fingerprint"))
    corpus = (
        fp.filter(F.col("doc_id") % 10 < 8)
        .select("fingerprint").distinct()
        .withColumn("in_corpus", F.lit(True))
    )
    batch = fp.filter(F.col("doc_id") % 10 >= 8)
    w = Window.partitionBy("fingerprint").orderBy(F.col("doc_id").asc())
    return (
        batch.withColumn("rn", F.row_number().over(w))
        .join(corpus, "fingerprint", "left")
        .select(
            "doc_id",
            "fingerprint",
            F.when(F.col("in_corpus"), F.lit("dup_of_corpus"))
            .when(F.col("rn") > 1, F.lit("dup_in_batch"))
            .otherwise(F.lit("new"))
            .alias("status"),
        )
    )


O_DOCS_INCREMENTAL_DEDUP = r"""
WITH fp AS (
  SELECT doc_id,
         md5(substr(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), 1, 50))
           AS fingerprint
  FROM documents
),
corpus AS (
  SELECT DISTINCT fingerprint, TRUE AS in_corpus FROM fp WHERE doc_id % 10 < 8
),
batch AS (
  SELECT doc_id, fingerprint,
         row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id ASC) AS rn
  FROM fp WHERE doc_id % 10 >= 8
)
SELECT b.doc_id, b.fingerprint,
       CASE WHEN c.in_corpus THEN 'dup_of_corpus'
            WHEN b.rn > 1 THEN 'dup_in_batch'
            ELSE 'new' END AS status
FROM batch b LEFT JOIN corpus c ON b.fingerprint = c.fingerprint
"""


def q_docs_trigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-trigram language-model quality proxy: train trigram counts
    on the whole corpus (one hash agg with map-side combine), then
    score each document by the summed floor-log2 frequency of its
    trigrams — natural text reuses common trigrams, gibberish doesn't.
    Exact-integer contract: floor(log2(count)) is computed as
    length(bin(count)) - 1, so no transcendental function whose last
    ulp differs between engines ever reaches a comparison; per-doc
    sums are long-exact and order-independent. Scale shape: the model
    is a trigram->count table joined trigram-keyed (skew-safe: the
    hottest trigram is a bounded fraction of a uniform 3-char space),
    both aggs reduce map-side."""
    tune_session(spark)
    docs = _spread(load(spark, sf_dir, "documents"))
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    base = docs.select("doc_id", norm.alias("nt")).filter(F.length("nt") >= 3)
    tri = base.select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(1, length(nt) - 2), i -> substring(nt, i, 3))")
        ).alias("tg"),
    )
    model = tri.groupBy("tg").agg(F.count(F.lit(1)).alias("cnt"))
    bits = (F.length(F.bin(F.col("cnt"))) - 1).cast("long")
    return (
        tri.join(model, "tg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.sum(bits).alias("sum_bits"),
        )
        .select(
            "doc_id",
            "n_trigrams",
            "sum_bits",
            F.floor(F.col("sum_bits") * 1000 / F.col("n_trigrams"))
            .cast("long")
            .alias("avg_bits_pm"),
        )
    )


O_DOCS_TRIGRAM_LM_SCORE = r"""
WITH base AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nt
  FROM documents
),
tri AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(nt) - 1), i -> substr(nt, i, 3))) AS tg
  FROM base WHERE len(nt) >= 3
),
model AS (SELECT tg, count(*) AS cnt FROM tri GROUP BY tg),
scored AS (
  SELECT t.doc_id, count(*) AS n_trigrams,
         CAST(SUM(CAST(length(bin(m.cnt)) - 1 AS BIGINT)) AS BIGINT) AS sum_bits
  FROM tri t JOIN model m ON t.tg = m.tg
  GROUP BY t.doc_id
)
SELECT doc_id, n_trigrams, sum_bits,
       CAST(floor(sum_bits * 1000 / n_trigrams) AS BIGINT) AS avg_bits_pm
FROM scored
"""


def q_cdc_unnest_children(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-array explosion into a child stream
    (stream_processor.py:78-82,343-380 + array.sql unnest macros):
    documents' word arrays unnest through operators/unnest.unnest_stream
    into (parent hashid, 0-based index, element) rows plus the per-
    element child hashid md5(parent ~ index) — the reference's
    `_airbyte_<child>_hashid` linkage (stream_processor.py:631-660).
    Scale shape: one narrow Generate (lateral view), zero shuffle."""
    from airbyte_integrations_spark.operators.unnest import unnest_stream

    tune_session(spark)
    docs = load(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    parent = docs.select(
        F.md5(F.col("doc_id").cast("string")).alias("_airbyte_ab_id"),
        F.split(F.trim(F.col("text")), r"\s+").alias("words"),
    )
    child = unnest_stream(parent)["words"]
    return child.select(
        F.col("_airbyte_parent_id").alias("parent_hashid"),
        F.col("_airbyte_index").cast("long").alias("idx"),
        F.col("words").alias("word"),
        F.md5(
            F.concat_ws(
                "~",
                F.col("_airbyte_parent_id"),
                F.col("_airbyte_index").cast("string"),
            )
        ).alias("child_hashid"),
    )


O_CDC_UNNEST_CHILDREN = r"""
WITH p AS (
  SELECT md5(CAST(doc_id AS VARCHAR)) AS parent_hashid,
         string_split_regex(trim(text), '\s+') AS arr
  FROM documents WHERE n_chars > 0
)
SELECT parent_hashid,
       CAST(unnest(range(len(arr))) AS BIGINT) AS idx,
       unnest(arr) AS word,
       md5(parent_hashid || '~' ||
           CAST(unnest(range(len(arr))) AS VARCHAR)) AS child_hashid
FROM p
"""


def q_docs_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style document chunking: fixed 200-char windows with a
    50-char overlap (stride 150), the retrieval-index preprocessing
    every embedding pipeline runs before ingestion. Scale shape:
    a narrow Generate (sequence+posexplode) expansion — constant ~n/
    stride fan-out per doc, NO shuffle, no UDF; chunk text leaves as an
    md5 so the result stays hash-comparable without shipping bodies."""
    tune_session(spark)
    width, stride = 200, 150
    docs = load(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    starts = F.sequence(
        F.lit(0), F.length("text") - 1, F.lit(stride)
    )
    chunk = F.substring(F.col("text"), F.col("s") + 1, width)
    ex = docs.select(
        "doc_id",
        F.col("text"),
        F.length("text").alias("n"),
        F.posexplode(starts).alias("chunk_idx", "s"),
    )
    return ex.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("s").cast("long").alias("start_off"),
        F.md5(chunk).alias("chunk_md5"),
        F.least(F.lit(width), F.col("n") - F.col("s"))
        .cast("long")
        .alias("chunk_len"),
    )


O_DOCS_CHUNK_OVERLAP = """
WITH s AS (
  SELECT CAST(g AS BIGINT) AS s
  FROM generate_series(0, 9999, 150) t(g)
),
ex AS (
  SELECT d.doc_id, d.text, len(d.text) AS n, s.s AS start_off,
         CAST(s.s / 150 AS BIGINT) AS chunk_idx
  FROM documents d JOIN s ON s.s < len(d.text)
  WHERE d.n_chars > 0
)
SELECT doc_id, chunk_idx, start_off,
       md5(substr(text, CAST(start_off AS INT) + 1, 200)) AS chunk_md5,
       least(200, n - start_off) AS chunk_len
FROM ex
"""


def q_docs_pack_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for pretraining: documents are concatenated in
    doc_id order and cut into fixed 8192-token windows — each doc gets
    the byte-offset-style (start_offset, window_id, offset_in_window)
    of where it lands in the packed stream. Packing is SHARD-LOCAL
    (shard = doc_id div 256): every shard packs independently, so the
    plan is one hash exchange on shard + an in-partition sort — no
    global ordering, which is what makes the op embarrassingly
    parallel at 10^10 docs (real packers pack within shards for
    exactly this reason; cross-shard continuity is not a training
    requirement). Integer-only arithmetic end to end."""
    tune_session(spark)
    docs = load(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    base = docs.select(
        "doc_id",
        (F.col("doc_id") / 256).cast("long").alias("shard"),
        toks.alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    start = (cum - F.col("n_tokens")).alias("start_offset")
    return base.select(
        "doc_id",
        "shard",
        "n_tokens",
        start,
        F.floor((cum - F.col("n_tokens")) / 8192).cast("long").alias("window_id"),
        ((cum - F.col("n_tokens")) % 8192).alias("offset_in_window"),
    )


O_DOCS_PACK_WINDOWS = r"""
WITH base AS (
  SELECT doc_id,
         CAST(floor(doc_id / 256) AS BIGINT) AS shard,
         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
  FROM documents WHERE n_chars > 0
),
packed AS (
  SELECT doc_id, shard, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id ASC
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM base
)
SELECT doc_id, shard, n_tokens,
       CAST(cum - n_tokens AS BIGINT) AS start_offset,
       CAST(floor((cum - n_tokens) / 8192) AS BIGINT) AS window_id,
       CAST((cum - n_tokens) % 8192 AS BIGINT) AS offset_in_window
FROM packed
"""


def q_docs_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-composition mixing weights — the temperature-resampling
    step that decides how much of each (lang, source) slice a training
    run samples: per-slice doc/token counts, alpha=0.5 temperature
    weight (floor(sqrt(tokens)) — sqrt is IEEE-exact in every engine,
    unlike log), and the slice's per-mille share of the reweighted
    corpus. Dataflow: one map-side-combining hash agg to slice stats
    (k rows), then a broadcast of the single-row weight total — the
    same broadcast-scalar shape the TF-IDF query uses. Scales as the
    agg; the slice table is metadata-sized at any corpus size."""
    tune_session(spark)
    docs = load(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    slices = (
        docs.select("lang", "source", toks.alias("t"))
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("t").alias("n_tokens"),
        )
        .withColumn(
            "weight_sqrt", F.floor(F.sqrt(F.col("n_tokens"))).cast("long")
        )
    )
    total = slices.agg(F.sum("weight_sqrt").alias("w_total"))
    return (
        slices.crossJoin(F.broadcast(total))
        .select(
            "lang", "source", "n_docs", "n_tokens", "weight_sqrt",
            F.floor(F.col("weight_sqrt") * 1000 / F.col("w_total"))
            .cast("long")
            .alias("share_pm"),
        )
    )


O_DOCS_SOURCE_MIX = r"""
WITH slices AS (
  SELECT lang, source,
         count(*) AS n_docs,
         CAST(SUM(CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)) AS BIGINT) AS n_tokens
  FROM documents WHERE n_chars > 0
  GROUP BY lang, source
),
w AS (
  SELECT *, CAST(floor(sqrt(n_tokens)) AS BIGINT) AS weight_sqrt FROM slices
),
tot AS (SELECT CAST(SUM(weight_sqrt) AS BIGINT) AS w_total FROM w)
SELECT lang, source, n_docs, n_tokens, weight_sqrt,
       CAST(floor(weight_sqrt * 1000 / w_total) AS BIGINT) AS share_pm
FROM w CROSS JOIN tot
"""


def q_docs_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data-selection importance weights (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    score every document by how much its hashed unigram features look
    like a target domain (here sources src0/src1 standing in for
    wiki+books) versus the raw corpus. Features are md5-prefix hash
    buckets (4,096 of them — DSIR's hashed n-gram trick), so the
    feature-stats table is BOUNDED at any corpus size and broadcasts;
    the per-doc score is one explode + broadcast join + map-side-
    combining sum. Integer-exact scoring: per-token contribution is
    floor(log2(cnt_target+1)) - floor(log2(cnt_raw+1)) computed as
    length(bin(n))-1, so the log-likelihood-ratio sum is a BIGINT and
    hash-stable cross-engine (the raw/target normalization constants
    shift every token equally — a rank-preserving offset per token,
    as in the trigram-LM query). At 10^10 docs: token explode is
    narrow, the stats agg is one map-side-combined shuffle of <=4096
    groups, and the scoring join is broadcast — no corpus-sized
    shuffle anywhere."""
    tune_session(spark)
    docs = load(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    tok = (
        docs.select(
            "doc_id",
            F.col("source").isin("src0", "src1").alias("tgt"),
            F.explode(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+")
            ).alias("w"),
        )
        .filter(F.col("w") != "")
        .select("doc_id", "tgt", F.substring(F.md5("w"), 1, 3).alias("feat"))
    )
    bits = lambda c: (F.length(F.bin(c + F.lit(1))) - 1).cast("long")  # noqa: E731
    stats = tok.groupBy("feat").agg(
        (
            bits(F.sum(F.when(F.col("tgt"), 1).otherwise(0)))
            - bits(F.count(F.lit(1)))
        ).alias("b")
    )
    return (
        tok.join(F.broadcast(stats), "feat")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("b").alias("dsir_bits"),
        )
    )


O_DOCS_DSIR_WEIGHTS = r"""
WITH toks AS (
  SELECT doc_id, source IN ('src0', 'src1') AS tgt,
         unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
  FROM documents WHERE n_chars > 0
),
tok AS (
  SELECT doc_id, tgt, substr(md5(w), 1, 3) AS feat FROM toks WHERE w <> ''
),
stats AS (
  SELECT feat,
         CAST(length(bin(SUM(CASE WHEN tgt THEN 1 ELSE 0 END) + 1)) - 1 AS BIGINT)
       - CAST(length(bin(COUNT(*) + 1)) - 1 AS BIGINT) AS b
  FROM tok GROUP BY feat
)
SELECT tok.doc_id, COUNT(*) AS n_tokens, CAST(SUM(stats.b) AS BIGINT) AS dsir_bits
FROM tok JOIN stats USING (feat)
GROUP BY tok.doc_id
"""


def q_emb_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic spherical k-means (2 Lloyd rounds) — the offline
    refinement the IVF-Flat query's codebook points at. Seeds are the
    FIXED-k md5-smallest rule (k=16 — decoupled from corpus size, so
    the codebook broadcast and the O(n*k) assignment hold at 10^10
    vectors); the Lloyd update keeps centroids as
    exact long sums of floor(v*1000) so the distributed groupBy is
    order-independent and the whole loop hash-matches the SQL oracle.
    Per-round dataflow at 10^10 vectors: one broadcast-codebook pass +
    one (cell, pos) hash agg with map-side combine -> k*dim rows;
    assignment cost is O(n*k) with k FIXED."""
    from airbyte_integrations_spark.functions.kmeans import (
        embeddings_base,
        spherical_kmeans,
    )

    tune_session(spark)
    base = embeddings_base(load(spark, sf_dir, "embeddings"))
    a2 = spherical_kmeans(base, seed_k=16, iters=2)
    return a2.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_members"), F.sum("csim").alias("sum_csim")
    )


def q_emb_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup: cluster with the deterministic
    k-means, then mark a vector duplicate iff a lower-id vector in the
    SAME cell has floor(cos*100) >= 35 (the corpus' real similarity
    tail). The pair join never leaves a cell — per-cluster blocks
    instead of all-pairs, the shape that survives 10^10 vectors."""
    from airbyte_integrations_spark.functions.kmeans import (
        embeddings_base,
        semantic_dedup,
        spherical_kmeans,
    )

    tune_session(spark)
    base = embeddings_base(_spread(load(spark, sf_dir, "embeddings")))
    a2 = spherical_kmeans(base, seed_k=16, iters=2)
    return semantic_dedup(a2, threshold_pct=35)


_O_KMEANS_CTE = """
WITH base AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
),
nb AS (
  SELECT vec_id, v,
         sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS nrm
  FROM base
),
seeds AS (SELECT vec_id AS cent_id, v AS cv, nrm AS cn FROM nb
          ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC LIMIT 16),
s1 AS (
  SELECT nb.vec_id, nb.v, nb.nrm, s.cent_id,
    CAST(floor(list_reduce(list_transform(range(1, len(nb.v) + 1),
            i -> nb.v[i] * s.cv[i]), (a, b) -> a + b)
          / (nb.nrm * s.cn) * 1000) AS BIGINT) AS csim
  FROM nb CROSS JOIN seeds s
),
a1 AS (
  SELECT vec_id, v, nrm, cent_id AS cell, csim FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cent_id ASC) AS r
    FROM s1
  ) WHERE r = 1
),
ex AS (
  SELECT cell,
         unnest(range(1, len(v) + 1)) AS pos,
         unnest(list_transform(v, x -> CAST(floor(x * 1000) AS BIGINT))) AS sv
  FROM a1
),
sums AS (SELECT cell, pos, SUM(sv) AS s FROM ex GROUP BY cell, pos),
arrs AS (SELECT cell, list(s ORDER BY pos) AS sums FROM sums GROUP BY cell),
cnts AS (SELECT cell, count(*) AS cnt FROM a1 GROUP BY cell),
c1 AS (
  SELECT arrs.cell AS cent_id,
         list_transform(arrs.sums, s -> s / cnts.cnt) AS cv
  FROM arrs JOIN cnts ON arrs.cell = cnts.cell
),
c1n AS (
  SELECT cent_id, cv,
         sqrt(list_reduce(list_transform(cv, x -> x * x), (a, b) -> a + b)) AS cn
  FROM c1
),
s2 AS (
  SELECT nb.vec_id, nb.v, nb.nrm, c.cent_id,
    CAST(floor(list_reduce(list_transform(range(1, len(nb.v) + 1),
            i -> nb.v[i] * c.cv[i]), (a, b) -> a + b)
          / (nb.nrm * c.cn) * 1000) AS BIGINT) AS csim
  FROM nb CROSS JOIN c1n c
),
a2 AS (
  SELECT vec_id, v, nrm, cent_id AS cell, csim FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cent_id ASC) AS r
    FROM s2
  ) WHERE r = 1
)
"""

O_EMB_KMEANS = _O_KMEANS_CTE + """
SELECT cell, count(*) AS n_members, CAST(SUM(csim) AS BIGINT) AS sum_csim
FROM a2 GROUP BY cell
"""

O_EMB_SEMANTIC_DEDUP = _O_KMEANS_CTE + """
, pairs AS (
  SELECT b.vec_id AS dup_id
  FROM a2 a JOIN a2 b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE CAST(floor(list_reduce(list_transform(range(1, len(a.v) + 1),
            i -> a.v[i] * b.v[i]), (x, y) -> x + y)
          / (a.nrm * b.nrm) * 100) AS BIGINT) >= 35
),
dups AS (SELECT DISTINCT dup_id FROM pairs)
SELECT a2.vec_id, a2.cell, dups.dup_id IS NULL AS is_kept
FROM a2 LEFT JOIN dups ON a2.vec_id = dups.dup_id
"""


def q_docs_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash sketches (vectorized pandas UDF), Charikar '02: 64-bit,
    whitespace tokens, bit source = first 8 bytes of md5(token).
    Oracled bit-exactly in SQL (md5-hex nibble votes reassembled into a
    signed 64-bit value)."""
    tune_session(spark)
    from airbyte_integrations_spark.functions.neardup import simhash64

    docs = load(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    return docs.select("doc_id", simhash64("text").alias("simhash"))


O_DOCS_SIMHASH = r"""
WITH tok AS (
  SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS tok
  FROM documents WHERE n_chars > 0
),
tb AS (SELECT doc_id, substr(md5(tok), 1, 16) AS h16 FROM tok),
votes AS (
  SELECT doc_id, r.range AS i,
         SUM(CASE WHEN ((instr('0123456789abcdef',
                   substr(h16, CAST(16 - r.range // 4 AS INT), 1)) - 1)
                  >> CAST(r.range % 4 AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS acc
  FROM tb CROSS JOIN range(64) r GROUP BY 1, 2
),
halves AS (
  -- SUM(BIGINT) is HUGEINT in DuckDB; cast back so the final value
  -- stays an exact int64 (pandas renders HUGEINT as float64, which
  -- rounds magnitudes near 2^63)
  SELECT doc_id,
         CAST(SUM(CASE WHEN acc > 0 AND i < 32 THEN (CAST(1 AS BIGINT) << CAST(i AS INT)) ELSE 0 END) AS BIGINT) AS lo,
         CAST(SUM(CASE WHEN acc > 0 AND i >= 32 THEN (CAST(1 AS BIGINT) << CAST(i - 32 AS INT)) ELSE 0 END) AS BIGINT) AS hi
  FROM votes GROUP BY 1
)
SELECT d.doc_id,
       CAST(COALESCE((CASE WHEN h.hi >= 2147483648 THEN h.hi - 4294967296 ELSE h.hi END) * 4294967296 + h.lo, 0) AS BIGINT) AS simhash
FROM documents d LEFT JOIN halves h ON d.doc_id = h.doc_id
WHERE d.n_chars > 0
"""


_BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def q_docs_token_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish pre-tokenization counts (letters / digit runs /
    punctuation singletons) — the token-budget estimator of a
    training-data pipeline."""
    tune_session(spark)
    docs = load(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    toks = F.regexp_extract_all(F.col("text"), F.lit(_BPE_RE), 0)
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
    )


O_DOCS_TOKEN_BPE = rf"""
SELECT doc_id,
       len(regexp_extract_all(text, '{_BPE_RE}')) AS n_bpe_tokens,
       len(list_distinct(regexp_extract_all(text, '{_BPE_RE}'))) AS n_unique_tokens
FROM documents WHERE n_chars > 0
"""


def q_emb_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via LSH bucketing: top-3 cosine neighbors searched only
    within the query's sign-LSH bucket (the scale path: candidate set
    shrinks ~2^bits-fold vs brute force; same rounding-proof ranking
    as emb_knn_cosine). Query set = the constant 1,000-query md5
    budget, so total search cost is O(|Q| * n / 2^bits) with |Q|
    fixed — it no longer grows with the corpus."""
    tune_session(spark)
    emb = load(spark, sf_dir, "embeddings")
    dims = [1, 9, 17, 25, 33, 41, 49, 57]
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    bits = [
        F.when(F.element_at(F.col("embedding"), d) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for d in dims
    ]
    base = emb.select(
        "vec_id",
        dbl.alias("v"),
        F.sqrt(F.aggregate(dbl, F.lit(0.0), lambda a, x: a + x * x)).alias("nrm"),
        F.concat(*bits).alias("bucket"),
    )
    q = (
        base.withColumn(
            "_qkey", F.md5(F.col("vec_id").cast("string").cast("binary"))
        )
        .orderBy(F.col("_qkey").asc(), F.col("vec_id").asc())
        .limit(1000)
        .select(
            F.col("vec_id").alias("qid"), F.col("v").alias("qv"),
            F.col("nrm").alias("qn"), F.col("bucket"),
        )
    )
    c = base.select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv"),
        F.col("nrm").alias("cn"), F.col("bucket"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("qv"), F.col("cv"), lambda a, b: a * b),
        F.lit(0.0), lambda a, x: a + x,
    )
    pairs = (
        q.join(c, "bucket")
        .filter(F.col("qid") != F.col("cid"))
        .select(
            "qid", "cid",
            F.floor(dot / (F.col("qn") * F.col("cn")) * 100).cast("long").alias("sim_c"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim_c").desc(), F.col("cid").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("qid", "cid", "sim_c", "rank")
    )


O_EMB_ANN_LSH_TOPK = """
WITH base AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
         (CASE WHEN embedding[1] >= 0 THEN '1' ELSE '0' END ||
          CASE WHEN embedding[9] >= 0 THEN '1' ELSE '0' END ||
          CASE WHEN embedding[17] >= 0 THEN '1' ELSE '0' END ||
          CASE WHEN embedding[25] >= 0 THEN '1' ELSE '0' END ||
          CASE WHEN embedding[33] >= 0 THEN '1' ELSE '0' END ||
          CASE WHEN embedding[41] >= 0 THEN '1' ELSE '0' END ||
          CASE WHEN embedding[49] >= 0 THEN '1' ELSE '0' END ||
          CASE WHEN embedding[57] >= 0 THEN '1' ELSE '0' END) AS bucket
  FROM embeddings
),
base2 AS (SELECT vec_id, v, bucket, sqrt(list_dot_product(v, v)) AS nrm FROM base),
q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn, bucket FROM base2
      ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC LIMIT 1000),
pairs AS (
  SELECT q.qid, c.vec_id AS cid,
         CAST(floor(list_dot_product(q.qv, c.v) / (q.qn * c.nrm) * 100) AS BIGINT) AS sim_c
  FROM q JOIN base2 c USING (bucket) WHERE q.qid != c.vec_id
)
SELECT qid, cid, sim_c, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY sim_c DESC, cid ASC) AS rank
  FROM pairs
) WHERE rank <= 3
"""


def q_multimodal_image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-decode plumbing over synthetic binary payloads derived
    from doc_ids (functions/multimodal.py; decode stubbed — rows-only
    check, structure tested in tests/test_multimodal.py)."""
    tune_session(spark)
    from airbyte_integrations_spark.functions.multimodal import (
        decode_image_meta,
        fake_image_payload,
    )

    docs = load(spark, sf_dir, "documents")
    payloads = docs.select(
        "doc_id",
        fake_image_payload(
            F.col("doc_id"),
            (F.col("doc_id") % 512 + 1).cast("int"),
            (F.col("doc_id") % 384 + 1).cast("int"),
        ).alias("blob"),
    )
    return decode_image_meta(payloads, strict=False)


def q_multimodal_audio_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-decode plumbing over synthetic AUD1 payloads derived from
    doc_ids (functions/multimodal.decode_audio_meta, mapInPandas);
    sample_rate/n_samples/duration all oracle-derivable from doc_id."""
    tune_session(spark)
    from airbyte_integrations_spark.functions.multimodal import (
        decode_audio_meta,
        fake_audio_payload,
    )

    docs = load(spark, sf_dir, "documents")
    rates = F.element_at(
        F.array(F.lit(16000), F.lit(22050), F.lit(44100)),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    payloads = docs.select(
        "doc_id",
        fake_audio_payload(
            F.col("doc_id"),
            rates.cast("int"),
            (F.col("doc_id") * 320 + 16000).cast("long"),
        ).alias("blob"),
    )
    return decode_audio_meta(payloads, strict=False)


# AUD1 payload: 4 + 6 + 12 + 32 = 54 bytes; rate cycles {16000, 22050,
# 44100} by doc_id % 3; n_samples = doc_id*320 + 16000; duration_ms =
# n_samples * 1000 // rate — all derivable, so the oracle fully values-
# checks the Arrow decode path.
O_MULTIMODAL_AUDIO_META = """
SELECT doc_id,
       CAST(54 AS BIGINT) AS n_bytes,
       'aud1' AS format,
       CAST(rate AS INTEGER) AS sample_rate,
       CAST(ns AS BIGINT) AS n_samples,
       CAST(floor(ns * 1000 / rate) AS BIGINT) AS duration_ms
FROM (
  SELECT doc_id,
         CASE doc_id % 3 WHEN 0 THEN 16000 WHEN 1 THEN 22050 ELSE 44100 END AS rate,
         doc_id * 320 + 16000 AS ns
  FROM documents
)
"""


def q_multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling (1->N mapInPandas expansion) over synthetic
    VID1 payloads: duration = (doc_id % 7 + 1) seconds, sampled every
    1000 ms -> doc_id % 7 + 1 frames per doc, all timestamps and sizes
    derivable, so the oracle value-checks the expansion shape."""
    tune_session(spark)
    from airbyte_integrations_spark.functions.multimodal import (
        fake_video_payload,
        frame_sample,
    )

    docs = load(spark, sf_dir, "documents")
    payloads = docs.select(
        "doc_id",
        fake_video_payload(
            F.col("doc_id"),
            ((F.col("doc_id") % 7 + 1) * 1000).cast("long"),
            F.lit(30).cast("int"),
        ).alias("blob"),
    )
    return frame_sample(payloads, every_ms=1000)


# VID1 payload: 4 + 8 + 4 + 32 = 48 bytes; duration (doc_id%7+1)*1000 ms
# at 1000 ms sampling -> frames 0..doc_id%7 with ts_ms = frame_idx*1000.
O_MULTIMODAL_VIDEO_FRAMES = """
SELECT doc_id,
       CAST(f AS INTEGER) AS frame_idx,
       CAST(f * 1000 AS BIGINT) AS ts_ms,
       CAST(48 AS BIGINT) AS n_bytes
FROM (
  SELECT doc_id, unnest(generate_series(0, CAST(doc_id % 7 AS INTEGER))) AS f
  FROM documents
)
"""


# The fake payload is deterministic in doc_id (IMG1 + 4-digit width +
# 4-digit height + 32-hex md5 => 44 bytes), so the oracle derives the
# exact metadata the decoder must produce — a full value check on the
# Arrow plumbing even though real codecs are stubbed.
O_MULTIMODAL_IMAGE_META = """
SELECT doc_id,
       CAST(44 AS BIGINT) AS n_bytes,
       'img1' AS format,
       CAST(doc_id % 512 + 1 AS INTEGER) AS width,
       CAST(doc_id % 384 + 1 AS INTEGER) AS height
FROM documents
"""


# ------------------------------------------------------------- contract

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full CDC replay -> final table on sf0.001."""
    return q_cdc_latest_wins(spark, "/root/testdata/sf0.001")


def q_cdc_event_time_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed delivery metrics (batch form of
    streaming/stateful.event_time_rates): events + tombstones per
    (5-minute event-time window, event_type). In the stream this agg
    runs watermarked (state-bounded); the batch form is its exact
    SQL-expressible semantics (tests pin the streaming behavior)."""
    from airbyte_integrations_spark.streaming.stateful import event_time_rates

    tune_session(spark)
    ce = change_events(spark, sf_dir)
    r = event_time_rates(
        ce, window_duration="5 minutes", watermark_delay="10 minutes",
        time_col="_ab_cdc_updated_at", group_col="event_type",
    )
    return r.select(
        _us("win_start").alias("win_start_us"),
        _us("win_end").alias("win_end_us"),
        "event_type",
        "n_events",
        "n_deletes",
    )


O_CDC_EVENT_TIME_RATES = f"""
WITH {CE_SQL}
SELECT
  epoch_us(time_bucket(INTERVAL '5 minutes', _ab_cdc_updated_at)) AS win_start_us,
  epoch_us(time_bucket(INTERVAL '5 minutes', _ab_cdc_updated_at)
           + INTERVAL '5 minutes') AS win_end_us,
  event_type,
  count(*) AS n_events,
  count(_ab_cdc_deleted_at) AS n_deletes
FROM ce
GROUP BY 1, 2, 3
"""


def q_cdc_catalog_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-stream catalog orchestration through the REAL read loop
    (catalog_sync.read_catalog — AbstractSource.read /
    AbstractDbSource.java:135-140 parity): one incremental
    append_dedup stream and one full-refresh overwrite stream over the
    same change-event log, synced into per-stream LakeTables with the
    incremental-first ordering and a combined PER_STREAM STATE per
    commit. Result: per-stream row count + lsn checksum of the synced
    tables — must equal the winner-rule / full-log oracles."""
    import tempfile

    from airbyte_integrations_spark.catalog_sync import (
        ConfiguredCatalog,
        ConfiguredStream,
        read_catalog,
        stream_table,
    )
    from airbyte_integrations_spark.config import (
        DestinationSyncMode,
        SyncConfig,
        SyncMode,
    )

    tune_session(spark)
    ce = change_events(spark, sf_dir)
    hi = ce.agg(F.max("_ab_cdc_lsn")).collect()[0][0]
    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    lake_root = tempfile.mkdtemp(prefix="catalog_entry_", dir=scratch)
    cat = ConfiguredCatalog(
        streams=(
            # full-refresh listed FIRST in the catalog but ordered last
            ConfiguredStream(
                config=SyncConfig(
                    stream="snap",
                    sync_mode=SyncMode.FULL_REFRESH,
                    destination_sync_mode=DestinationSyncMode.OVERWRITE,
                    n_buckets=8,
                ),
                source={"kind": "dataframe", "df": ce},
            ),
            ConfiguredStream(
                config=SyncConfig(stream="pages", n_buckets=8),
                source={"kind": "dataframe", "df": ce},
            ),
        )
    )
    msgs = read_catalog(
        spark, cat, lake_root, max_events_per_epoch=max(int(hi) // 4, 1)
    )
    assert len(msgs) == len(cat.streams)  # one combined STATE per stream
    pages = stream_table(spark, lake_root, "pages").read()
    snap = stream_table(spark, lake_root, "snap").read()
    return pages.agg(
        F.lit("pages").alias("stream"),
        F.count("*").alias("n_rows"),
        F.sum("_ab_cdc_lsn").alias("sum_lsn"),
    ).unionByName(
        snap.agg(
            F.lit("snap").alias("stream"),
            F.count("*").alias("n_rows"),
            F.sum("_ab_cdc_lsn").alias("sum_lsn"),
        )
    )


O_CDC_CATALOG_SYNC = f"""
WITH {CE_SQL}, {WINNERS_SQL}
SELECT 'pages' AS stream, count(*) AS n_rows,
       CAST(sum(_ab_cdc_lsn) AS BIGINT) AS sum_lsn
FROM w WHERE rn = 1 AND _ab_cdc_deleted_at IS NULL
UNION ALL
SELECT 'snap' AS stream, count(*) AS n_rows,
       CAST(sum(_ab_cdc_lsn) AS BIGINT) AS sum_lsn
FROM ce
"""


def q_cdc_global_state_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared-WAL multi-stream sync with GLOBAL state through the REAL
    lock-step loop (catalog_sync.sync_shared_log): the change log is
    tagged into two member streams (md5-prefix url routing — one total
    lsn order across both, the Debezium one-WAL-many-tables shape,
    PostgresCdcStateHandler.java:29-37 / CdcStateManager), synced into
    per-member LakeTables with SHARED lsn-bounded epoch keys, the
    derived GLOBAL offset emitted after each epoch's last member
    commit. In-query assertions pin the protocol invariants (lock-step
    epoch keys identical across members, final GLOBAL offset == max
    WAL lsn, monotone per-epoch offsets); the returned per-member
    row-count / lsn-checksum / watermark must equal the per-member
    winner-rule oracles."""
    import tempfile

    from airbyte_integrations_spark.catalog_sync import (
        ConfiguredStream,
        stream_table,
        sync_shared_log,
    )
    from airbyte_integrations_spark.config import SyncConfig

    tune_session(spark)
    ce = change_events(spark, sf_dir).withColumn(
        "stream",
        F.when(
            F.substring(F.md5("url"), 1, 1) < F.lit("8"), F.lit("pages_a")
        ).otherwise(F.lit("pages_b")),
    )
    hi, n = ce.agg(F.max("_ab_cdc_lsn"), F.count("*")).collect()[0]
    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    lake_root = tempfile.mkdtemp(prefix="global_entry_", dir=scratch)
    streams = [
        ConfiguredStream(
            config=SyncConfig(stream=name, n_buckets=8, write_mode=mode),
            source={"kind": "cdc_shared", "group": "wal", "df": ce},
        )
        for name, mode in (("pages_a", "cow"), ("pages_b", "mor"))
    ]
    msgs = sync_shared_log(
        spark, streams, lake_root, max_events_per_epoch=max(int(n) // 4, 1)
    )
    # protocol invariants, asserted in-query
    ta = stream_table(spark, lake_root, "pages_a")
    tb = stream_table(spark, lake_root, "pages_b")
    assert set(ta.committed_epochs("pages_a")) == set(tb.committed_epochs("pages_b"))
    offsets = [m["state"]["global"]["lsn_watermark"] for m in msgs]
    assert offsets == sorted(offsets) and offsets[-1] == int(hi)
    assert sync_shared_log(  # derived offset is durable: re-run plans nothing
        spark, streams, lake_root, max_events_per_epoch=max(int(n) // 4, 1)
    ) == []

    def summarize(table, name):
        return table.read_live().agg(
            F.lit(name).alias("stream"),
            F.count("*").alias("n_rows"),
            F.sum("_ab_cdc_lsn").alias("sum_lsn"),
            F.lit(table.watermark(name)).cast("long").alias("watermark"),
        )

    return summarize(ta, "pages_a").unionByName(summarize(tb, "pages_b"))


O_CDC_GLOBAL_STATE_SYNC = f"""
WITH {CE_SQL}, {WINNERS_SQL}
SELECT CASE WHEN substr(md5(url), 1, 1) < '8'
            THEN 'pages_a' ELSE 'pages_b' END AS stream,
       count(*) AS n_rows,
       CAST(sum(_ab_cdc_lsn) AS BIGINT) AS sum_lsn,
       (SELECT max(_ab_cdc_lsn) FROM ce) AS watermark
FROM w WHERE rn = 1 AND _ab_cdc_deleted_at IS NULL
GROUP BY 1
"""


def q_cdc_incremental_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunked incremental snapshot (DBLog watermark algorithm;
    Debezium incremental snapshots) through the REAL interleaved loop
    (sources/incremental_snapshot.py): 4 PK-hash chunks of a simulated
    live source read BETWEEN WAL epochs, each chunk window-deduped
    against the events that landed during its select, stamped at the
    low watermark, and merged as its own `chunk:<i>` epoch; the tail
    drains afterwards. Final PAYLOAD must equal the monolithic
    snapshot-then-tail replay — the convergence theorem the algorithm
    promises (the reference's monolithic phase is pinned at
    DebeziumRecordIterator.java:114-139 / SnapshotMetadata.java)."""
    import tempfile

    from airbyte_integrations_spark.config import SyncConfig
    from airbyte_integrations_spark.lakehouse.table import LakeTable
    from airbyte_integrations_spark.sources.cdc import LogTailSource
    from airbyte_integrations_spark.sources.incremental_snapshot import (
        incremental_snapshot_sync,
    )

    tune_session(spark)
    ce = change_events(spark, sf_dir).cache()
    hi = int(ce.agg(F.max("_ab_cdc_lsn")).collect()[0][0])
    t0 = F.lit("2020-01-01 00:00:00").cast("timestamp")
    snap = ce.select("url").distinct().select(
        "url",
        F.lit(0).cast("long").alias("_ab_cdc_lsn"),
        t0.alias("_ab_cdc_updated_at"),
        F.lit(None).cast("timestamp").alias("_ab_cdc_deleted_at"),
        F.md5(F.col("url")).alias("_airbyte_ab_id"),
        t0.alias("_airbyte_emitted_at"),
        F.lit("snapshot").alias("event_type"),
        F.lit(0).cast("long").alias("value_m"),
    )
    log = LogTailSource(ce)
    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    table = LakeTable(
        spark, tempfile.mkdtemp(prefix="isnap_entry_", dir=scratch) + "/pages"
    )
    cfg = SyncConfig(stream="pages", n_buckets=8)
    payload = ["url", "event_type", "value_m"]

    def select_chunk(pred):
        # live source at `seen` = applied watermark + arrivals that land
        # during the select (exercises the watermark-window dedup)
        lw = table.watermark("pages") or 0
        seen = min(lw + max(hi // 8, 1), hi)
        state = winner_window(
            snap.unionByName(
                ce.filter(F.col("_ab_cdc_lsn") <= F.lit(seen))
            ),
            drop_tombstones=True,
        )
        return state.select(*payload).filter(pred), seen

    incremental_snapshot_sync(
        spark,
        select_chunk,
        log,
        table,
        cfg,
        n_chunks=4,
        wal_step_events=max(hi // 6, 1),
    )
    # the lifecycle is fully materialized into the lake table above;
    # release the cached log now (a leaked cache accumulates heap
    # pressure across the driver's 140-query bench sweep)
    ce.unpersist()
    return table.read_live().select(*payload)


O_CDC_INCREMENTAL_SNAPSHOT = f"""
WITH {CE_SQL},
snap AS (
  SELECT DISTINCT url, CAST(0 AS BIGINT) AS _ab_cdc_lsn,
         TIMESTAMP '2020-01-01 00:00:00' AS _ab_cdc_updated_at,
         CAST(NULL AS TIMESTAMP) AS _ab_cdc_deleted_at,
         md5(url) AS _airbyte_ab_id,
         TIMESTAMP '2020-01-01 00:00:00' AS _airbyte_emitted_at,
         'snapshot' AS event_type, CAST(0 AS BIGINT) AS value_m
  FROM ce
),
u AS (SELECT * FROM snap UNION ALL SELECT * FROM ce),
w AS (
  SELECT *, row_number() OVER (PARTITION BY url ORDER BY {ORDER_SQL}) AS rn
  FROM u
)
SELECT url, event_type, value_m FROM w WHERE rn = 1 AND _ab_cdc_deleted_at IS NULL
"""


def q_cdc_replication_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-epoch replication-lag metrics — the heartbeat/monitoring
    surface (DebeziumRecordIterator's heartbeat + first-record wait
    bound the same quantity operationally): for each 1000-lsn epoch,
    how far pipeline time (emitted_at) trails source transaction time
    (updated_at), and the tombstone share. Integer microseconds so the
    value hash is exact; one map-side-combining hash agg — the metrics
    stream costs one pass at any WAL rate."""
    tune_session(spark)
    ce = change_events(spark, sf_dir)
    epoch = (F.floor((F.col("_ab_cdc_lsn") - 1) / 1000) * 1000).cast("long")
    lag = _us("_airbyte_emitted_at") - _us("_ab_cdc_updated_at")
    return ce.groupBy(epoch.alias("epoch_from")).agg(
        F.count("*").alias("n_events"),
        F.min(lag).alias("min_lag_us"),
        F.max(lag).alias("max_lag_us"),
        F.floor(F.avg(lag)).cast("long").alias("avg_lag_us"),
        F.floor(
            F.sum(F.col("_ab_cdc_deleted_at").isNotNull().cast("long"))
            * 1000
            / F.count("*")
        )
        .cast("long")
        .alias("tombstone_pm"),
    )


O_CDC_REPLICATION_LAG = f"""
WITH {CE_SQL}
SELECT CAST(floor((_ab_cdc_lsn - 1) / 1000.0) * 1000 AS BIGINT) AS epoch_from,
       count(*) AS n_events,
       min(epoch_us(_airbyte_emitted_at) - epoch_us(_ab_cdc_updated_at)) AS min_lag_us,
       max(epoch_us(_airbyte_emitted_at) - epoch_us(_ab_cdc_updated_at)) AS max_lag_us,
       CAST(floor(avg(epoch_us(_airbyte_emitted_at) - epoch_us(_ab_cdc_updated_at))) AS BIGINT) AS avg_lag_us,
       CAST(floor(sum(CASE WHEN _ab_cdc_deleted_at IS NOT NULL THEN 1 ELSE 0 END) * 1000.0 / count(*)) AS BIGINT) AS tombstone_pm
FROM ce GROUP BY 1
"""


def q_cdc_tx_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transaction-aligned epoch plan (streaming/microbatch.py
    plan_epochs_tx — Debezium transaction-metadata contract: a commit
    boundary never exposes half a transaction, INCLUDING transactions
    whose lsns interleave across a naive boundary). Transactions are
    7-event lsn runs; each density-derived naive boundary extends
    OUTWARD to a straddle-free fixpoint (the end of any transaction it
    would split) — the rule that stays correct when concurrent
    transactions interleave in a real WAL. The planner's aggregates
    are metadata-sized (per-tx span agg + K-row boundary work on the
    driver); per-epoch stats are then a broadcast interval join of tx
    ends into the K planned epochs (a tx belongs to the epoch that
    contains its END — well-defined because boundaries never split a
    tx). Returns per epoch: bounds, event count, transaction count."""
    tune_session(spark)
    from airbyte_integrations_spark.streaming.microbatch import plan_epochs_tx

    ce = change_events(spark, sf_dir)
    txid = F.floor((F.col("_ab_cdc_lsn") - 1) / 7).cast("long")
    eps = plan_epochs_tx(ce.withColumn("txid", txid), None, 1000, "txid")
    bounds = spark.createDataFrame(
        [(e.from_lsn, e.to_lsn) for e in eps], "from_lsn long, to_lsn long"
    )
    spans = ce.groupBy(txid.alias("txid")).agg(
        F.max("_ab_cdc_lsn").alias("e"), F.count("*").alias("n_ev")
    )
    return (
        spans.join(
            F.broadcast(bounds),
            (F.col("e") > F.col("from_lsn")) & (F.col("e") <= F.col("to_lsn")),
        )
        .groupBy("from_lsn", "to_lsn")
        .agg(F.sum("n_ev").alias("n_events"), F.count("*").alias("n_txs"))
        .select("from_lsn", "to_lsn", "n_events", "n_txs")
    )


# Oracle: the same outward-snap rule declaratively. The fixture's
# transactions are contiguous disjoint 7-lsn runs, so the straddle-free
# extension of an edge b is simply the end of the run containing b —
# least(ceil(b/7)*7, hi) — and one pass reaches the fixpoint.
O_CDC_TX_EPOCHS = f"""
WITH {CE_SQL},
p AS (SELECT min(_ab_cdc_lsn) - 1 AS start, max(_ab_cdc_lsn) AS hi,
             count(*) AS n FROM ce),
w AS (SELECT start, hi, greatest((hi - start) * 1000 // n, 1) AS width FROM p),
edges AS (
  SELECT DISTINCT least(start + j.j * width, hi) AS b, hi
  FROM w, (SELECT unnest(range(1, CAST(ceil((SELECT (hi - start) * 1.0 / width FROM w)) AS BIGINT) + 1)) AS j) j
),
snapped AS (SELECT DISTINCT least(((b + 6) // 7) * 7, hi) AS to_lsn FROM edges),
eps AS (
  SELECT coalesce(lag(to_lsn) OVER (ORDER BY to_lsn),
                  (SELECT start FROM p)) AS from_lsn,
         to_lsn
  FROM snapped
),
spans AS (SELECT (_ab_cdc_lsn - 1) // 7 AS txid, max(_ab_cdc_lsn) AS e,
                 count(*) AS n_ev FROM ce GROUP BY 1)
SELECT from_lsn, to_lsn, CAST(sum(n_ev) AS BIGINT) AS n_events,
       count(*) AS n_txs
FROM eps JOIN spans ON spans.e > eps.from_lsn AND spans.e <= eps.to_lsn
GROUP BY 1, 2
"""


def q_docs_topk_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped top-k selection: the 3 longest documents per language
    (doc_id tiebreak) — the "best docs per stratum under a budget"
    curation step. The window partitions by lang, so the shuffle is
    one lang-keyed Exchange; at 10^10 docs per-group top-k would be
    computed with the same window after a per-partition pre-top-k
    (Spark's TakeOrderedAndProject shape per group)."""
    tune_session(spark)
    docs = load(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    return (
        docs.withColumn("rank_in_lang", F.row_number().over(w))
        .filter(F.col("rank_in_lang") <= 3)
        .select("lang", "rank_in_lang", "doc_id", "n_chars")
    )


O_DOCS_TOPK_PER_LANG = """
WITH r AS (
  SELECT lang, doc_id, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id ASC)
           AS rank_in_lang
  FROM documents
)
SELECT lang, CAST(rank_in_lang AS INT) AS rank_in_lang, doc_id, n_chars
FROM r WHERE rank_in_lang <= 3
"""


def q_cdc_patch_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-image (patch) CDC fold (operators/patch.py): some CDC
    sources emit sparse after-images — only touched fields are non-NULL
    (MongoDB update descriptions; the reference's Debezium Mongo
    connector surfaces this shape). Final state is per-key, per-column
    LATEST NON-NULL, with deletes as hard resets (a pre-delete write
    never leaks past a re-insert). Sparse columns are derived
    deterministically from the log (event_type nulled when lsn%3==0,
    value_m when lsn%2==0). ONE aggregation with map-side combine —
    every term an associative max-by-ordering-struct (partial_max below
    the key exchange); hot keys cost O(n_mappers)."""
    from airbyte_integrations_spark.operators.patch import coalesce_patches

    tune_session(spark)
    ce = change_events(spark, sf_dir)
    sparse = ce.withColumn(
        "event_type",
        F.when(F.col("_ab_cdc_lsn") % 3 != 0, F.col("event_type")),
    ).withColumn(
        "value_m", F.when(F.col("_ab_cdc_lsn") % 2 != 0, F.col("value_m"))
    )
    out = coalesce_patches(sparse, patch_cols=("event_type", "value_m"))
    return out.select("url", "_ab_cdc_lsn", "event_type", "value_m")


O_CDC_PATCH_COALESCE = f"""
WITH {CE_SQL},
sp AS (
  SELECT url, _ab_cdc_lsn, _ab_cdc_deleted_at,
         CASE WHEN _ab_cdc_lsn % 3 <> 0 THEN event_type END AS pa,
         CASE WHEN _ab_cdc_lsn % 2 <> 0 THEN value_m END AS pb
  FROM ce
),
d AS (
  SELECT url, max(_ab_cdc_lsn) AS dlsn
  FROM sp WHERE _ab_cdc_deleted_at IS NOT NULL GROUP BY 1
),
live AS (
  SELECT sp.* FROM sp LEFT JOIN d USING (url)
  WHERE d.dlsn IS NULL OR sp._ab_cdc_lsn > d.dlsn
),
f AS (
  SELECT url, _ab_cdc_lsn,
         last_value(pa IGNORE NULLS) OVER (
           PARTITION BY url ORDER BY _ab_cdc_lsn ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS event_type,
         last_value(pb IGNORE NULLS) OVER (
           PARTITION BY url ORDER BY _ab_cdc_lsn ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_m,
         row_number() OVER (PARTITION BY url ORDER BY _ab_cdc_lsn DESC) AS rn
  FROM live
)
SELECT url, _ab_cdc_lsn, event_type, value_m FROM f WHERE rn = 1
"""


def q_docs_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end corpus dedup DECISION: near-dup clusters
    (LSH pairs -> exact-Jaccard verify -> connected components) joined
    back to the full corpus; within each cluster exactly one KEEP — the
    longest document (doc_id tiebreak), the standard keep-best heuristic.
    Singletons keep themselves. Scale shape: the cluster labels are
    metadata-sized relative to the corpus, the join is key-hashed, the
    keep rank is one cluster-keyed window over (tiny) clusters."""
    tune_session(spark)
    from airbyte_integrations_spark.functions.neardup import connected_components

    pairs = _neardup_verified_pairs(spark, sf_dir)
    comp = connected_components(pairs, "id_a", "id_b")
    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    labeled = docs.join(
        comp.withColumnRenamed("node", "doc_id"), "doc_id", "left"
    ).select(
        "doc_id",
        F.coalesce(F.col("component"), F.col("doc_id")).alias("cluster_id"),
        "n_chars",
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    return labeled.select(
        "doc_id",
        "cluster_id",
        "n_chars",
        (F.row_number().over(w) == 1).alias("keep"),
    )


O_DOCS_DEDUP_KEEP_BEST = (
    O_DOCS_DUP_CLUSTERS.split("SELECT doc_id, cluster_id,")[0]
    + """,
allc AS (
  SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id, d.n_chars
  FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
)
SELECT doc_id, cluster_id, n_chars,
       row_number() OVER (
         PARTITION BY cluster_id ORDER BY n_chars DESC, doc_id ASC) = 1 AS keep
FROM allc
"""
)


def q_docs_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-shard assignment: shard = md5-prefix hash
    of doc_id mod 64 (stable across runs/partitionings — the property a
    resumable shard writer needs), position = rank within the shard by
    (md5, doc_id) — a reproducible within-shard shuffle order. One
    shard-keyed Exchange + per-shard sort; at 10^10 docs each shard
    sorts independently (exactly the write-side dataflow of a sharded
    training-data exporter)."""
    tune_session(spark)
    docs = load(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    shard = (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % 64).cast("int")
    out = docs.select("doc_id", shard.alias("shard_id"), h.alias("_h"))
    w = Window.partitionBy("shard_id").orderBy(F.col("_h").asc(), F.col("doc_id").asc())
    return out.select(
        "doc_id", "shard_id", F.row_number().over(w).alias("pos")
    )


O_DOCS_SHARD_ASSIGN = """
WITH h AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 64
              AS INT) AS shard_id,
         md5(CAST(doc_id AS VARCHAR)) AS hh
  FROM documents
)
SELECT doc_id, shard_id,
       CAST(row_number() OVER (
         PARTITION BY shard_id ORDER BY hh ASC, doc_id ASC) AS INT) AS pos
FROM h
"""


def q_cdc_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source↔replica reconciliation checksum (functions/checksum.py —
    the pt-table-checksum dataflow; the reference's acceptance tests
    diff full record sets, DestinationAcceptanceTest.retrieveRecords,
    which cannot run at production scale). Per logical bucket:
    count + bit_xor of a 60-bit md5-derived row hash over the FINAL
    live state. XOR is commutative/associative ⇒ one map-side-combining
    hash agg, order- and partitioning-independent, overflow-free;
    output is n_buckets rows, so comparing source vs replica moves
    O(n_buckets) data regardless of table size, and a mismatch re-reads
    only its bucket."""
    from airbyte_integrations_spark.functions.checksum import table_checksum

    tune_session(spark)
    ce = change_events(spark, sf_dir)
    final = winner_window(ce, drop_tombstones=True).select(
        "url", "_ab_cdc_lsn", "event_type", "value_m"
    )
    out = table_checksum(final, ["url"], ["_ab_cdc_lsn", "event_type", "value_m"])
    return out.select("bucket", "n_rows", "xor_hash")


O_CDC_TABLE_CHECKSUM = f"""
WITH {CE_SQL}, {WINNERS_SQL},
f AS (
  SELECT url, _ab_cdc_lsn, event_type, value_m
  FROM w WHERE rn = 1 AND _ab_cdc_deleted_at IS NULL
),
h AS (
  SELECT
    CAST(('0x' || substr(md5(url), 1, 8))::BIGINT % 16 AS INT) AS bucket,
    ('0x' || substr(md5(url || '~' || CAST(_ab_cdc_lsn AS VARCHAR) || '~'
       || event_type || '~' || CAST(value_m AS VARCHAR)), 1, 15))::BIGINT AS rh
  FROM f
)
SELECT bucket, count(*) AS n_rows, bit_xor(rh) AS xor_hash
FROM h GROUP BY 1
"""


def q_cdc_host_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host crawl/replication accounting over the CDC final state:
    live pages, tombstoned pages, last source-update time, and a
    popularity rank — the per-domain summary a crawl scheduler or
    replication monitor reads (host = the url authority, extracted
    with the same rule as functions/curation.url_host). Dataflow:
    winner replay (kept tombstones) → ONE host-keyed map-side-combining
    agg over ~#hosts groups → DISTRIBUTED total rank over the
    aggregate. #hosts is ~10^8 at the 10^10-page design point, so a
    bare `Window.orderBy` (every host row into ONE reducer) is the
    single-reducer scale-killer; instead the rank uses the same
    range-sharded local-rank + P-row offset-map technique as
    q_docs_length_deciles: repartitionByRange on the rank key → P
    parallel per-shard windows → driver-side P-row offsets inlined as
    a literal map (bounded metadata, P = shuffle partitions)."""
    tune_session(spark)
    ce = change_events(spark, sf_dir)
    w = winner_window(ce, drop_tombstones=False)
    host = F.regexp_extract(F.col("url"), r"^https?://([^/]+)", 1)
    agg = w.groupBy(host.alias("host")).agg(
        F.sum(F.when(F.col("_ab_cdc_deleted_at").isNull(), 1).otherwise(0)).alias(
            "n_live"
        ),
        F.sum(F.when(F.col("_ab_cdc_deleted_at").isNotNull(), 1).otherwise(0)).alias(
            "n_deleted"
        ),
        F.max(_us("_ab_cdc_updated_at")).alias("last_update_us"),
    )
    key = [F.col("n_live").desc(), F.col("host").asc()]
    # persist so the offset count and the ranked pass see the SAME pid
    # assignment (AQE may re-coalesce otherwise); engine-tracked so the
    # next query's tune_session releases it — the returned frame is
    # consumed before the next driver-contract query runs
    loc = register_persist(
        agg.repartitionByRange(32, *key)
        .withColumn("pid", F.spark_partition_id())
        .withColumn(
            "lrn", F.row_number().over(Window.partitionBy("pid").orderBy(*key))
        )
    )
    sizes = sorted(
        (r["pid"], r["c"])
        for r in loc.groupBy("pid").agg(F.count(F.lit(1)).alias("c")).collect()
    )
    offs, acc = {}, 0
    for pid, c in sizes:
        offs[pid] = acc
        acc += c
    off_map = F.create_map(
        *[F.lit(x) for pid_off in offs.items() for x in pid_off]
    )
    return loc.select(
        "host", "n_live", "n_deleted", "last_update_us",
        (off_map[F.col("pid")] + F.col("lrn")).cast("int").alias("rank"),
    )


O_CDC_HOST_STATS = f"""
WITH {CE_SQL}, {WINNERS_SQL},
f AS (SELECT * FROM w WHERE rn = 1),
a AS (
  SELECT regexp_extract(url, '^https?://([^/]+)', 1) AS host,
         CAST(sum(CASE WHEN _ab_cdc_deleted_at IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_live,
         CAST(sum(CASE WHEN _ab_cdc_deleted_at IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_deleted,
         max(epoch_us(_ab_cdc_updated_at)) AS last_update_us
  FROM f GROUP BY 1
)
SELECT host, n_live, n_deleted, last_update_us,
       CAST(row_number() OVER (ORDER BY n_live DESC, host ASC) AS INT) AS rank
FROM a
"""


def q_events_hopping_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping-window event rates (1 h window sliding every 15 min),
    per event type — the sliding-rate surface every monitoring view
    needs (Structured Streaming's windowed aggregation; F.window with
    a slideDuration). Spark expands each event into window/slide = 4
    slots and folds ONE map-side-combining hash agg — no self-join, no
    sort; at 10^10 events the expansion is a constant factor 4 and the
    agg output is O(#windows × #types). value folded as exact integer
    cents so the hash comparison is float-free."""
    from airbyte_integrations_spark.operators.sessionize import hopping_rates

    tune_session(spark)
    ev = load(spark, sf_dir, "events")
    agg = hopping_rates(ev, value_col="value")
    return agg.select(
        F.unix_timestamp(F.col("window_start")).alias("window_start_s"),
        "event_type",
        "n_events",
        "value_cents",
    )


O_EVENTS_HOPPING_RATES = """
WITH k AS (SELECT unnest([0, 1, 2, 3]) AS k),
x AS (
  SELECT (epoch_us(ts) // 900000000) * 900 - k.k * 900 AS window_start_s,
         event_type,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events CROSS JOIN k
)
SELECT window_start_s, event_type,
       count(*) AS n_events, CAST(sum(cents) AS BIGINT) AS value_cents
FROM x GROUP BY 1, 2
"""


def q_tpch_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shape pricing summary over `lineitem` — the canonical
    scan+filter+aggregate: shipdate predicate pushed to the parquet
    scan, ONE map-side-combining hash agg over 6 groups. Money folded
    as exact integer cents (floor(x*100) is the same IEEE double op in
    every engine) so sums are order-independent and hash-stable —
    the discipline every money aggregate in this repo follows."""
    tune_session(spark)
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2000-09-02")
    )
    cents = F.floor(F.col("l_extendedprice") * 100).cast("long")
    disc = F.floor(F.col("l_discount") * 100).cast("long")
    tax = F.floor(F.col("l_tax") * 100).cast("long")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.sum(cents).alias("sum_base_cents"),
            F.sum(cents * (100 - disc)).alias("sum_disc_price_c2"),
            F.sum(cents * (100 - disc) * (100 + tax)).alias("sum_charge_c3"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .select(
            "l_returnflag", "l_linestatus", "sum_qty", "sum_base_cents",
            "sum_disc_price_c2", "sum_charge_c3", "count_order",
        )
    )


O_TPCH_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(floor(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
       CAST(sum(CAST(floor(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(floor(l_discount*100) AS BIGINT))) AS BIGINT)
         AS sum_disc_price_c2,
       CAST(sum(CAST(floor(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(floor(l_discount*100) AS BIGINT))
                * (100 + CAST(floor(l_tax*100) AS BIGINT))) AS BIGINT)
         AS sum_charge_c3,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02'
GROUP BY 1, 2
"""


def q_tpch_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shape shipping priority — the canonical dim⋈fact⋈fact
    top-k: customer (filtered to one segment) BROADCAST to orders, the
    surviving orders key-joined to lineitem, revenue agg, top-10 via
    orderBy+limit (Spark plans TakeOrderedAndProject — a per-partition
    heap + driver merge of 10 rows, never a full sort). The dim-side
    broadcast is explicit so no orders-sized shuffle exists for the
    first join at any scale."""
    tune_session(spark)
    cust = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1999-03-15")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1999-03-15")
    )
    rev = (F.floor(F.col("l_extendedprice") * 100).cast("long")
           * (100 - F.floor(F.col("l_discount") * 100).cast("long")))
    j = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
    )
    agg = j.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        F.sum(rev).alias("revenue_c2")
    )
    return (
        agg.orderBy(F.col("revenue_c2").desc(), F.col("l_orderkey").asc())
        .limit(10)
        .select(
            "l_orderkey",
            _us("o_orderdate").alias("orderdate_us"),
            "o_orderpriority",
            "revenue_c2",
        )
    )


O_TPCH_SHIPPING_PRIORITY = """
SELECT l_orderkey, epoch_us(o_orderdate) AS orderdate_us, o_orderpriority,
       CAST(sum(CAST(floor(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(floor(l_discount*100) AS BIGINT))) AS BIGINT)
         AS revenue_c2
FROM customer
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1999-03-15'
  AND l_shipdate  > TIMESTAMP '1999-03-15'
GROUP BY 1, 2, 3
ORDER BY revenue_c2 DESC, l_orderkey ASC
LIMIT 10
"""


def q_tpch_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shape local-supplier volume — the 6-way star join
    (region→nation→{customer,supplier}→orders→lineitem with the
    c_nationkey = s_nationkey locality condition). Declared as plain
    joins: Catalyst reorders, broadcasts every dim side
    (region/nation/customer/supplier at this fan-in), and leaves one
    key-hashed fact join — the shape that survives 100× scale because
    only orders⋈lineitem ever shuffles. Money in exact cents."""
    tune_session(spark)
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nation = load(spark, sf_dir, "nation")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    li = load(spark, sf_dir, "lineitem")
    rev = (F.floor(F.col("l_extendedprice") * 100).cast("long")
           * (100 - F.floor(F.col("l_discount") * 100).cast("long")))
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(nation, F.col("s_nationkey") == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
    )
    return (
        j.groupBy("n_name")
        .agg(F.sum(rev).alias("revenue_c2"))
        .select("n_name", "revenue_c2")
    )


O_TPCH_LOCAL_SUPPLIER_VOLUME = """
SELECT n_name,
       CAST(sum(CAST(floor(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(floor(l_discount*100) AS BIGINT))) AS BIGINT)
         AS revenue_c2
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND r_name = 'EUROPE'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY 1
"""


def q_tpch_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shape order-priority check — the EXISTS/semi-join
    surface: orders in a quarter that have at least one late lineitem,
    counted per priority. Declared as a LEFT SEMI join so the probe
    side never duplicates (an inner join + distinct would shuffle the
    match multiplicity; semi stops at first match) — the plan Catalyst
    keeps at any fact size."""
    tune_session(spark)
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-04-01"))
    )
    # (the synthetic lineitem has no l_commitdate; the "late" predicate
    # is a shipdate threshold — the join/aggregation shape is Q4's)
    late = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-01-01")
    )
    j = orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
    return (
        j.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .select("o_orderpriority", "order_count")
    )


O_TPCH_ORDER_PRIORITY = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1997-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > TIMESTAMP '1997-01-01'
  )
GROUP BY 1
"""


def q_events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregation (event_type → grand total) over the event
    log — the subtotal lattice every BI layer asks for. Spark plans
    rollup as ONE Expand (2 rows per input) + one map-side-combining
    hash agg — no second pass over the data for the totals.
    grouping_id disambiguates real NULL keys from subtotal markers
    (emitted so the oracle comparison is exact)."""
    tune_session(spark)
    ev = load(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    return (
        ev.select(day.alias("day"), "event_type", F.col("value"))
        .rollup("day", "event_type")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("value_cents"),
        )
        .select(
            _us("day").alias("day_us"),
            "event_type",
            "gid",
            "n_events",
            "value_cents",
        )
    )


O_EVENTS_ROLLUP = """
SELECT epoch_us(date_trunc('day', ts)) AS day_us,
       event_type,
       CAST(GROUPING(date_trunc('day', ts)) * 2 + GROUPING(event_type) AS INT) AS gid,
       count(*) AS n_events,
       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events
GROUP BY ROLLUP (date_trunc('day', ts), event_type)
"""


def q_events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: per-day event counts with one column per event type —
    groupBy().pivot() with the value list GIVEN explicitly, so Spark
    skips the extra distinct-values job and plans a single hash agg of
    conditional counts (the same shape the SQL oracle writes by hand).
    An unpinned pivot would scan twice; at 10^10 events the value list
    is schema knowledge the caller should supply."""
    tune_session(spark)
    ev = load(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    types = ["click", "error", "purchase", "signup", "view"]
    out = (
        ev.select(day.alias("day"), "event_type")
        .groupBy("day")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
    )
    cols = [F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in types]
    return out.select(_us("day").alias("day_us"), *cols)


O_EVENTS_PIVOT = """
SELECT epoch_us(date_trunc('day', ts)) AS day_us,
       CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_click,
       CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS n_error,
       CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
       CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS n_signup,
       CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS n_view
FROM events GROUP BY 1
"""


def q_tpch_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS / anti-join surface: customers with no order in a
    window, counted per market segment. LEFT ANTI discards probe rows
    at first match — the complement of the Q4 semi-join — and the
    orders side is reduced to DISTINCT keys before the join, so the
    anti probe carries no payload at any fact size."""
    tune_session(spark)
    cust = load(spark, sf_dir, "customer")
    active = (
        load(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1999-01-01"))
            & (F.col("o_orderdate") < F.lit("2000-01-01"))
        )
        .select("o_custkey")
        .distinct()
    )
    j = cust.join(active, cust.c_custkey == active.o_custkey, "left_anti")
    return (
        j.groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_inactive"))
        .select("c_mktsegment", "n_inactive")
    )


O_TPCH_INACTIVE_CUSTOMERS = """
SELECT c_mktsegment, count(*) AS n_inactive
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey
    AND o_orderdate >= TIMESTAMP '1999-01-01'
    AND o_orderdate <  TIMESTAMP '2000-01-01'
)
GROUP BY 1
"""


def q_tpch_above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-scalar-subquery shape ("orders above their own
    customer's average"), run through the SQL surface (spark.sql over a
    registered view) to exercise Catalyst's subquery decorrelation —
    the rewrite to an aggregate+join every engine needs for this class.
    The comparison is cross-multiplied into exact integers
    (cents·count > sum_cents) so no float mean ever reaches a
    predicate — distributed float summation order would otherwise make
    the boundary rows engine-dependent."""
    tune_session(spark)
    load(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT o_orderkey,
               o_custkey,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS price_cents
        FROM v_orders o
        WHERE CAST(floor(o_totalprice * 100) AS BIGINT) * (
                SELECT count(*) FROM v_orders i WHERE i.o_custkey = o.o_custkey
              ) > (
                SELECT sum(CAST(floor(i.o_totalprice * 100) AS BIGINT))
                FROM v_orders i WHERE i.o_custkey = o.o_custkey
              )
        """
    )


O_TPCH_ABOVE_AVG_ORDERS = """
SELECT o_orderkey,
       o_custkey,
       CAST(floor(o_totalprice * 100) AS BIGINT) AS price_cents
FROM orders o
WHERE CAST(floor(o_totalprice * 100) AS BIGINT) * (
        SELECT count(*) FROM orders i WHERE i.o_custkey = o.o_custkey
      ) > (
        SELECT CAST(sum(CAST(floor(i.o_totalprice * 100) AS BIGINT)) AS BIGINT)
        FROM orders i WHERE i.o_custkey = o.o_custkey
      )
"""


def q_docs_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distributed quantiles (p50/p90/p99 of doc length per
    language) — the corpus-profiling op behind length-filter
    thresholds. approx_percentile is not cross-engine reproducible, so
    this computes EXACT order statistics with an explicit rule (value
    at rank ceil(q·n), doc_id tiebreak): rank + per-group count are two
    windows over the SAME lang partitioning — one Exchange — and the
    quantile pick is a conditional agg over that frame. At 10^10 rows
    the per-group sort is the unavoidable cost of exactness; the
    approximate path for monitoring dashboards stays approx_percentile."""
    tune_session(spark)
    docs = load(spark, sf_dir, "documents")
    wo = Window.partitionBy("lang").orderBy(
        F.col("n_chars").asc(), F.col("doc_id").asc()
    )
    wn = Window.partitionBy("lang")
    r = docs.select(
        "lang", "n_chars",
        F.row_number().over(wo).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    def pick(q_num: int, q_den: int) -> F.Column:
        target = F.ceil(F.col("n") * q_num / q_den)
        return F.max(F.when(F.col("rn") == target, F.col("n_chars")))
    return r.groupBy("lang").agg(
        F.max("n").alias("n_docs"),
        pick(1, 2).alias("p50"),
        pick(9, 10).alias("p90"),
        pick(99, 100).alias("p99"),
    )


O_DOCS_LENGTH_QUANTILES = """
WITH r AS (
  SELECT lang, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY n_chars ASC, doc_id ASC) AS rn,
         count(*) OVER (PARTITION BY lang) AS n
  FROM documents
)
SELECT lang,
       CAST(max(n) AS BIGINT) AS n_docs,
       max(CASE WHEN rn = CAST(ceil(n * 1.0 / 2) AS BIGINT) THEN n_chars END) AS p50,
       max(CASE WHEN rn = CAST(ceil(n * 9.0 / 10) AS BIGINT) THEN n_chars END) AS p90,
       max(CASE WHEN rn = CAST(ceil(n * 99.0 / 100) AS BIGINT) THEN n_chars END) AS p99
FROM r GROUP BY 1
"""


def q_events_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection with EXACT integer arithmetic: days
    where an event type's daily count deviates from its own mean by
    more than 2σ. The textbook test (|c−μ| > 2σ) is cross-multiplied
    into integers — (c·D − S)² > 4·(D·Q − S²) with S=Σc, Q=Σc², D=#days
    — so no float mean/variance ever reaches a comparison and the
    verdict is bit-identical on any engine and any partitioning.
    Validity bound: all terms stay inside int64 while |c·D − S| < 3·10⁹
    and D·Q < 2·10¹⁸ (a 10⁹-events/day stream over years exceeds it —
    there, pre-scale counts to thousands or widen to DECIMAL; engines
    diverge on overflow, Spark wraps while DuckDB promotes, so the
    bound is part of the contract, not a footnote).
    Dataflow: one map-side-combining daily agg, then S/Q/D as a window
    over the metadata-sized (type, day) frame."""
    tune_session(spark)
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type"), F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("event_type")
    st = daily.select(
        "event_type", "day", "c",
        F.sum("c").over(w).alias("s"),
        F.sum(F.col("c") * F.col("c")).over(w).alias("q"),
        F.count(F.lit(1)).over(w).alias("d"),
    )
    lhs = (F.col("c") * F.col("d") - F.col("s"))
    rhs = F.lit(4) * (F.col("d") * F.col("q") - F.col("s") * F.col("s"))
    return st.select(
        "event_type",
        _us("day").alias("day_us"),
        "c",
        (lhs * lhs > rhs).alias("is_anomaly"),
    )


O_EVENTS_ANOMALY_DAYS = """
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS day, count(*) AS c
  FROM events GROUP BY 1, 2
),
st AS (
  SELECT event_type, day, c,
         CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS s,
         CAST(sum(c*c) OVER (PARTITION BY event_type) AS BIGINT) AS q,
         count(*) OVER (PARTITION BY event_type) AS d
  FROM daily
)
SELECT event_type, epoch_us(day) AS day_us, c,
       (c*d - s)*(c*d - s) > 4*(d*q - s*s) AS is_anomaly
FROM st
"""


def q_docs_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-governance blocklist filter: docs whose registered domain
    is on a blocklist are dropped, the rest pass with their domain —
    the robots/denylist gate in front of every web-corpus pipeline.
    The blocklist is metadata-sized at any corpus size, so the filter
    is a BROADCAST anti-join (plan keeps the corpus un-shuffled);
    urls synthesized like docs_url_canonical."""
    from airbyte_integrations_spark.functions.curation import (
        url_canonicalize,
        url_registered_domain,
    )

    tune_session(spark)
    docs = load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    url = F.concat(
        F.lit("http://WWW."), F.col("source"), F.lit("-site.COM/p/"),
        did.cast("string"),
        F.when(did % 7 == 0, F.lit("?utm_source=x")).otherwise(F.lit("")),
    )
    with_dom = docs.select(
        "doc_id", "lang",
        url_canonicalize(url).alias("canon_url"),
        url_registered_domain(url).alias("domain"),
    )
    block = spark.createDataFrame(
        [("src1-site.com",), ("spam-site.org",)], "domain string"
    )
    kept = with_dom.join(F.broadcast(block), "domain", "left_anti")
    return kept.select("doc_id", "lang", "canon_url", "domain")


O_DOCS_BLOCKLIST_FILTER = r"""
WITH u AS (
  SELECT doc_id, lang,
         'http://WWW.' || source || '-site.COM/p/' || CAST(doc_id AS VARCHAR)
         || CASE WHEN doc_id % 7 = 0 THEN '?utm_source=x' ELSE '' END AS url
  FROM documents
),
parts AS (
  SELECT doc_id, lang, url,
         regexp_replace(lower(regexp_extract(url, '^https?://([^/?#]+)', 1)), '^www\.', '') AS host,
         regexp_extract(url, '^https?://[^/?#]+([^?#]*)', 1) AS path,
         array_to_string(
           list_filter(
             string_split(regexp_extract(url, '\?([^#]*)', 1), '&'),
             x -> x <> '' AND NOT regexp_matches(x, '^(utm_[a-z]+|ref|fbclid|gclid)=')
           ), '&') AS kept
  FROM u
)
SELECT doc_id, lang,
       'https://' || host || path ||
         CASE WHEN kept <> '' THEN '?' || kept ELSE '' END AS canon_url,
       regexp_extract(host, '([^.]+\.[^.]+)$', 1) AS domain
FROM parts
WHERE regexp_extract(host, '([^.]+\.[^.]+)$', 1)
      NOT IN ('src1-site.com', 'spam-site.org')
"""


def q_docs_length_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile binning (exact ntile semantics) for corpus curation
    thresholds: docs ranked by length into 10 equal-count bins, then
    per-bin stats. ntile is deterministic only under a TOTAL order, so
    doc_id breaks length ties (the ordering discipline every window op
    in this repo follows).

    Scale shape — NO global unpartitioned window (a corpus-wide
    `Window.orderBy` funnels every row into ONE reducer task, the
    textbook single-reducer scale-killer at 10^10 docs). Instead:
      1. repartitionByRange on (n_chars, doc_id): Spark's parallel
         range partitioner — P sorted shards, not one.
      2. local rank per shard: Window.partitionBy(pid) — P independent
         window groups running in parallel.
      3. shard offsets: a P-row groupBy collected driver-side (bounded
         metadata, P = shuffle partitions) and inlined as a literal
         map; global_rank = offset[pid] + local_rank.
      4. decile from global rank by Spark's exact ntile rule (first
         n%10 buckets get one extra row), then the final hash agg.
    The frame is persisted so the offset count and the ranked pass see
    the SAME pid assignment (AQE may re-coalesce otherwise)."""
    tune_session(spark)
    docs = load(spark, sf_dir, "documents").select("n_chars", "doc_id")
    key = [F.col("n_chars").asc(), F.col("doc_id").asc()]
    # engine-tracked persist: released by the next query's tune_session
    # (the returned frame is consumed before the next query runs)
    loc = register_persist(
        docs.repartitionByRange(32, *key)
        .withColumn("pid", F.spark_partition_id())
        .withColumn(
            "lrn", F.row_number().over(Window.partitionBy("pid").orderBy(*key))
        )
    )
    sizes = sorted(
        (r["pid"], r["c"])
        for r in loc.groupBy("pid").agg(F.count(F.lit(1)).alias("c")).collect()
    )
    n = sum(c for _, c in sizes)
    base, rem = n // 10, n % 10
    offs, acc = {}, 0
    for pid, c in sizes:
        offs[pid] = acc
        acc += c
    off_map = F.create_map(
        *[F.lit(x) for pid_off in offs.items() for x in pid_off]
    )
    rn = (off_map[F.col("pid")] + F.col("lrn")).cast("long")
    # Spark ntile: buckets 1..rem hold base+1 rows, the rest hold base
    head = F.lit((base + 1) * rem)
    decile = F.when(
        rn <= head, (rn + base) / F.lit(base + 1)  # == ceil(rn/(base+1))
    ).otherwise(
        F.lit(rem) + (rn - head + F.lit(max(base, 1)) - 1) / F.lit(max(base, 1))
    )
    binned = loc.select(
        "n_chars", F.floor(decile).cast("int").alias("decile")
    )
    return binned.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.sum("n_chars").alias("sum_chars"),
    )


O_DOCS_LENGTH_DECILES = """
WITH b AS (
  SELECT n_chars,
         ntile(10) OVER (ORDER BY n_chars ASC, doc_id ASC) AS decile
  FROM documents
)
SELECT decile, count(*) AS n_docs,
       min(n_chars) AS min_chars, max(n_chars) AS max_chars,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM b GROUP BY 1
"""


# ------------------------------------------------- curation / eventlog (r3)

def q_docs_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training docs flagged by 5-gram
    overlap with a held-out eval split (doc_id % 17 == 0 — the
    deterministic stand-in for a benchmark suite).

    Scale shape: eval grams are benchmark-sized -> DISTINCT + broadcast;
    the training shingle explosion joins map-side and aggregates with
    map-side combine — no shuffle of the 10^10-doc side beyond the
    final per-doc agg."""
    tune_session(spark)
    from airbyte_integrations_spark.functions.curation import decontaminate

    docs = _spread(load(spark, sf_dir, "documents")).filter(F.col("n_chars") > 0)
    eval_df = docs.filter(F.col("doc_id") % 17 == 0)
    train = docs.filter(F.col("doc_id") % 17 != 0)
    return decontaminate(train, eval_df, "doc_id", "text", k=5)


O_DOCS_DECONTAMINATE = r"""
WITH w AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ws
  FROM documents WHERE n_chars > 0
),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(ws[p:p + 4], ' ') AS shingle
  FROM (
    SELECT doc_id, ws,
           unnest(generate_series(1, greatest(len(ws) - 4, 1))) AS p
    FROM w
  )
),
ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 17 = 0),
tr AS (SELECT * FROM sh WHERE doc_id % 17 <> 0)
SELECT tr.doc_id,
       count(*) AS n_grams,
       count(ev.shingle) AS n_hits,
       CAST(count(ev.shingle) > 0 AS INTEGER) AS is_contaminated
FROM tr LEFT JOIN ev USING (shingle)
GROUP BY tr.doc_id
"""


def q_docs_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub: count + mask emails/phones. The synthetic corpus
    carries no PII, so the query plants deterministic contacts first
    (doc_id-derived — both engines synthesize the identical string),
    then runs the shared-regex redactor; the md5 of the masked text is
    the parity check. Pure codegen projection — scales linearly."""
    tune_session(spark)
    from airbyte_integrations_spark.functions.curation import redact_pii

    docs = load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    planted = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(
                did % 3 == 0,
                F.concat(F.lit(" contact user"), did.cast("string"),
                         F.lit("@example.com")),
            ).otherwise(F.lit("")),
            F.when(
                did % 5 == 0,
                F.concat(F.lit(" call +1 (555) 010-"),
                         F.lpad((did % 10000).cast("string"), 4, "0")),
            ).otherwise(F.lit("")),
        ),
    )
    return redact_pii(planted, "text").select(
        "doc_id",
        "n_emails",
        "n_phones",
        F.md5(F.col("redacted").cast("binary")).alias("redacted_md5"),
        F.length("redacted").cast("long").alias("redacted_len"),
    )


O_DOCS_PII_REDACT = r"""
WITH planted AS (
  SELECT doc_id,
         text ||
         CASE WHEN doc_id % 3 = 0
              THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
              ELSE '' END ||
         CASE WHEN doc_id % 5 = 0
              THEN ' call +1 (555) 010-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              ELSE '' END AS text
  FROM documents
),
masked AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
         CAST(len(regexp_extract_all(text, '\+[0-9]{1,2} \([0-9]{3}\) [0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
         regexp_replace(
           regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           '\+[0-9]{1,2} \([0-9]{3}\) [0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS redacted
  FROM planted
)
SELECT doc_id, n_emails, n_phones,
       md5(redacted) AS redacted_md5,
       CAST(len(redacted) AS BIGINT) AS redacted_len
FROM masked
"""


def q_docs_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization — the normalizer in front of exact URL
    dedup (utm-tagged duplicates defeat a raw hash-groupBy). URLs are
    synthesized deterministically from (source, doc_id) with messy
    case, www, tracking params, and a fragment; the query emits the
    canonical form + host + registered domain per doc. Projection-only
    plan; the dedup that follows it is the existing hash-groupBy."""
    tune_session(spark)
    from airbyte_integrations_spark.functions.curation import (
        url_canonicalize,
        url_host,
        url_registered_domain,
    )

    docs = load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    url = F.concat(
        F.lit("http://WWW."), F.col("source"), F.lit(".Example.COM/p/"),
        did.cast("string"),
        F.lit("?utm_source=feed&id="), (did % 50).cast("string"),
        F.lit("&ref=r"), (did % 3).cast("string"),
        F.lit("&q=x#frag"),
    )
    with_url = docs.select("doc_id", url.alias("url"))
    return with_url.select(
        "doc_id",
        url_canonicalize(F.col("url")).alias("canon_url"),
        url_host(F.col("url")).alias("host"),
        url_registered_domain(F.col("url")).alias("domain"),
    )


O_DOCS_URL_CANONICAL = r"""
WITH u AS (
  SELECT doc_id,
         'http://WWW.' || source || '.Example.COM/p/' || CAST(doc_id AS VARCHAR)
         || '?utm_source=feed&id=' || CAST(doc_id % 50 AS VARCHAR)
         || '&ref=r' || CAST(doc_id % 3 AS VARCHAR) || '&q=x#frag' AS url
  FROM documents
),
parts AS (
  SELECT doc_id, url,
         regexp_replace(lower(regexp_extract(url, '^https?://([^/?#]+)', 1)), '^www\.', '') AS host,
         regexp_extract(url, '^https?://[^/?#]+([^?#]*)', 1) AS path,
         array_to_string(
           list_filter(
             string_split(regexp_extract(url, '\?([^#]*)', 1), '&'),
             x -> x <> '' AND NOT regexp_matches(x, '^(utm_[a-z]+|ref|fbclid|gclid)=')
           ), '&') AS kept
  FROM u
)
SELECT doc_id,
       'https://' || host || path ||
         CASE WHEN kept <> '' THEN '?' || kept ELSE '' END AS canon_url,
       host,
       regexp_extract(host, '([^.]+\.[^.]+)$', 1) AS domain
FROM parts
"""


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min) of the event log, collapsed to
    per-session stats. ONE user-keyed shuffle feeds the lag window, the
    running-sum window, and the final agg (same partitioning reused);
    value summed as exact integer cents so the hash is order-stable."""
    tune_session(spark)
    from airbyte_integrations_spark.operators.sessionize import (
        session_stats,
        sessionize,
    )

    ev = load(spark, sf_dir, "events")
    sess = sessionize(ev, "user_id", "ts", gap_s=1800, tiebreak_col="event_id")
    return session_stats(sess, "user_id", "ts", "value")


O_EVENTS_SESSIONIZE = r"""
WITH o AS (
  SELECT user_id, ts, value, event_id,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
s AS (
  SELECT user_id, ts, value,
         sum(CASE WHEN prev_ts IS NULL
                   OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM o
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       count(*) AS n_events,
       min(epoch_us(ts)) AS start_us,
       max(epoch_us(ts)) AS end_us,
       CAST(floor((max(epoch_us(ts)) - min(epoch_us(ts))) / 1000000) AS BIGINT) AS duration_s,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM s GROUP BY user_id, session_id
"""


def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen day, retention at
    day offset d = share of the cohort active d days later — the
    engagement-analytics staple. ONE user-keyed exchange produces both
    the cohort day (min) and the distinct active-day set (collect_set
    — bounded by the retention horizon in days, so per-user state is
    O(horizon) at any event volume, never O(events)); the exploded set
    feeds one cohort-keyed agg, and cohort sizes broadcast (cohorts
    are date-cardinality — metadata-sized forever). Per-mille shares
    via integer floor; cohort day emitted as a yyyy-MM-dd string so
    the value hash is dtype-stable cross-engine."""
    tune_session(spark)
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_day"),
        F.collect_set(F.to_date("ts")).alias("days"),
    )
    x = per_user.select(
        "cohort_day", F.explode("days").alias("day")
    )
    ret = x.groupBy(
        "cohort_day", F.datediff("day", "cohort_day").alias("day_offset")
    ).agg(F.count(F.lit(1)).alias("n_active"))
    sizes = per_user.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("n_cohort")
    )
    return (
        ret.join(F.broadcast(sizes), "cohort_day")
        .select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort"),
            F.col("day_offset").cast("long").alias("day_offset"),
            "n_active",
            "n_cohort",
            F.floor(F.col("n_active") * 1000 / F.col("n_cohort"))
            .cast("long")
            .alias("retention_pm"),
        )
    )


O_EVENTS_RETENTION = """
WITH pu AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
  FROM events GROUP BY user_id
),
ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
r AS (
  SELECT pu.cohort_day,
         CAST(date_diff('day', pu.cohort_day, ud.day) AS BIGINT) AS day_offset,
         count(*) AS n_active
  FROM ud JOIN pu USING (user_id) GROUP BY 1, 2
),
s AS (SELECT cohort_day, count(*) AS n_cohort FROM pu GROUP BY 1)
SELECT strftime(r.cohort_day, '%Y-%m-%d') AS cohort, r.day_offset,
       r.n_active, s.n_cohort,
       CAST(floor(r.n_active * 1000 / s.n_cohort) AS BIGINT) AS retention_pm
FROM r JOIN s USING (cohort_day)
"""


def q_cdc_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (as-of) join: every 7th change event probes the
    page state just before its own LSN — "what did this url look like
    when the event fired?", the temporal lookup CDC consumers run
    against the SCD interval table (stream_processor.py:698-959's
    active-row read generalized to any cursor position). Spark-first
    shape: NOT an inequality join (O(p x v) per key, nested-loop) —
    both sides UNION into ONE url-keyed window that carries the last
    version payload forward (sort-merge as-of; one Exchange, zero
    joins, linear per key). Oracle: DuckDB's native ASOF LEFT JOIN."""
    tune_session(spark)
    from airbyte_integrations_spark.operators.asof import asof_join

    ce = change_events(spark, sf_dir)
    versions = ce.select(
        "url",
        F.col("_ab_cdc_lsn").alias("lsn"),
        "value_m",
        F.col("_ab_cdc_deleted_at").isNotNull().cast("long").alias("deleted"),
    )
    probes = ce.select(
        "url", (F.col("_ab_cdc_lsn") - 1).alias("probe_lsn")
    ).filter(F.col("probe_lsn") % 7 == 0)
    return asof_join(
        probes, versions, ["url"], "probe_lsn", "lsn", ["value_m", "deleted"]
    )


O_CDC_ASOF_JOIN = f"""
WITH {CE_SQL},
v AS (
  SELECT url, _ab_cdc_lsn AS lsn, value_m,
         CASE WHEN _ab_cdc_deleted_at IS NOT NULL
              THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS deleted
  FROM ce
),
p AS (
  SELECT url, _ab_cdc_lsn - 1 AS probe_lsn FROM ce
  WHERE (_ab_cdc_lsn - 1) % 7 = 0
)
SELECT p.url, p.probe_lsn, v.lsn AS asof_lsn,
       v.value_m AS asof_value_m, v.deleted AS asof_deleted
FROM p ASOF LEFT JOIN v ON p.url = v.url AND p.probe_lsn >= v.lsn
"""


def q_cdc_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot time travel (Iceberg `VERSION AS OF` parity): the log
    is applied as two MERGE epochs split at the mid LSN; the query
    reads the table AS OF the first commit's snapshot version — the
    second epoch must be invisible. Every commit is an immutable
    manifest, so old versions stay readable until compaction GC; the
    oracle recomputes winners over the lsn <= mid prefix. This is the
    read side of the exactly-once contract (resume/debug tooling reads
    the pre-crash snapshot)."""
    import tempfile

    from airbyte_integrations_spark.lakehouse.merge import merge_into
    from airbyte_integrations_spark.lakehouse.table import LakeTable

    tune_session(spark)
    ce = change_events(spark, sf_dir)
    hi = int(ce.agg(F.max("_ab_cdc_lsn")).collect()[0][0])
    mid = hi // 2
    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    table = LakeTable(
        spark, tempfile.mkdtemp(prefix="tt_entry_", dir=scratch) + "/t"
    )
    v_mid = merge_into(table, ce.filter(F.col("_ab_cdc_lsn") <= mid), epoch=1)
    merge_into(table, ce.filter(F.col("_ab_cdc_lsn") > mid), epoch=2)
    return table.read_live(version=v_mid).select(
        "url", "_ab_cdc_lsn", "event_type", "value_m"
    )


O_CDC_TIME_TRAVEL = f"""
WITH {CE_SQL},
st AS (SELECT CAST(floor(max(_ab_cdc_lsn) / 2.0) AS BIGINT) AS b FROM ce),
w AS (
  SELECT ce.*, row_number() OVER (PARTITION BY url ORDER BY {ORDER_SQL}) AS rn
  FROM ce, st WHERE _ab_cdc_lsn <= st.b
)
SELECT url, _ab_cdc_lsn, event_type, value_m
FROM w WHERE rn = 1 AND _ab_cdc_deleted_at IS NULL
"""


def q_cdc_changed_since(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changed-since scan over manifest zone maps (Iceberg changelog /
    incremental-scan analogue): the log lands as two MoR epochs split
    at the mid LSN, then a downstream consumer whose watermark is the
    mid LSN asks for everything that changed since. `read_since`
    prunes every file whose per-file max cursor (recorded from parquet
    footers into the manifest at commit — zone maps) is <= the
    watermark BEFORE the scan: here the whole epoch-1 base drops out
    and only epoch-2 delta files are read; at the 10^10-event point a
    consumer one epoch behind reads one epoch's files, not the table.
    Value-equality with the unpruned live view filter is the oracle;
    pruning file counts are pinned in tests/test_zonemap.py."""
    import tempfile

    from airbyte_integrations_spark.lakehouse.merge import merge_into
    from airbyte_integrations_spark.lakehouse.table import LakeTable

    tune_session(spark)
    ce = change_events(spark, sf_dir)
    hi = int(ce.agg(F.max("_ab_cdc_lsn")).collect()[0][0])
    mid = hi // 2
    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    table = LakeTable(
        spark, tempfile.mkdtemp(prefix="zs_entry_", dir=scratch) + "/t"
    )
    merge_into(table, ce.filter(F.col("_ab_cdc_lsn") <= mid), epoch=1, mode="mor")
    merge_into(table, ce.filter(F.col("_ab_cdc_lsn") > mid), epoch=2, mode="mor")
    return table.read_since(mid).select(
        "url", "_ab_cdc_lsn", "event_type", "value_m"
    )


O_CDC_CHANGED_SINCE = f"""
WITH {CE_SQL},
st AS (SELECT CAST(floor(max(_ab_cdc_lsn) / 2.0) AS BIGINT) AS b FROM ce),
w AS (
  SELECT ce.*, row_number() OVER (PARTITION BY url ORDER BY {ORDER_SQL}) AS rn
  FROM ce
)
SELECT url, _ab_cdc_lsn, event_type, value_m
FROM w, st
WHERE rn = 1 AND _ab_cdc_deleted_at IS NULL AND _ab_cdc_lsn > st.b
"""


def q_docs_bloom_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered dedup-on-ingest: the corpus fingerprint index
    (doc_id % 10 < 8) folds into a broadcast Bloom bitmap; batch rows
    that miss the bitmap are definitively new (no false negatives) and
    SKIP the join, only bitmap-positives flow into the exact
    verification join that removes Bloom false positives — so the
    result equals the plain join (the SQL oracle) while the shuffle
    sees a sliver of the batch. At 10^10 corpus rows this is the only
    affordable per-micro-batch membership test; the bitmap build is a
    shuffle-free mapInPandas fold (partial bitmap per partition,
    driver ORs). Fingerprint = md5 of the first 64 normalized chars
    (crawl dedup keys on document heads; 64 != the 50 of
    docs_incremental_dedup so the two indexes are distinct)."""
    tune_session(spark)
    from airbyte_integrations_spark.functions.bloom import (
        build_bloom,
        might_contain,
    )

    docs = load(spark, sf_dir, "documents")
    norm = F.substring(
        F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")), 1, 64
    )
    fp = docs.select("doc_id", F.md5(norm).alias("fingerprint"))
    corpus = fp.filter(F.col("doc_id") % 10 < 8).select("fingerprint").distinct()
    batch = fp.filter(F.col("doc_id") % 10 >= 8)
    bloom = build_bloom(corpus, "fingerprint", m_bits=1 << 17, k=5)
    hit = might_contain(bloom, "fingerprint")
    maybe = batch.filter(hit).join(
        corpus.withColumn("in_corpus", F.lit(True)), "fingerprint", "left"
    )
    definitely_new = batch.filter(~hit).withColumn(
        "in_corpus", F.lit(None).cast("boolean")
    )
    return maybe.unionByName(definitely_new).select(
        "doc_id",
        "fingerprint",
        F.when(F.col("in_corpus"), F.lit("dup_of_corpus"))
        .otherwise(F.lit("new"))
        .alias("status"),
    )


O_DOCS_BLOOM_DEDUP = r"""
WITH fp AS (
  SELECT doc_id,
         md5(substr(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), 1, 64))
           AS fingerprint
  FROM documents
),
corpus AS (
  SELECT DISTINCT fingerprint, TRUE AS in_corpus FROM fp WHERE doc_id % 10 < 8
)
SELECT b.doc_id, b.fingerprint,
       CASE WHEN c.in_corpus THEN 'dup_of_corpus' ELSE 'new' END AS status
FROM fp b LEFT JOIN corpus c ON b.fingerprint = c.fingerprint
WHERE b.doc_id % 10 >= 8
"""


def q_docs_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-200 BPE-ish pre-tokens by frequency with
    rank and cumulative per-mille coverage — the token-budget /
    vocab-building step of a training-data pipeline (what fraction of
    the corpus the first k vocab entries cover). Scale shape: one
    map-side-combining hash agg over the token explosion, then
    TakeOrderedAndProject (top-k, never a full sort) and a window over
    only the 200 survivors; the corpus total rides in as a broadcast
    1-row scalar. Integer-exact: coverage = (cum * 1000) div total —
    no float division reaches the comparison."""
    tune_session(spark)
    docs = load(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    toks = F.explode(
        F.regexp_extract_all(F.col("text"), F.lit(_BPE_RE), 0)
    ).alias("token")
    counts = docs.select(toks).groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("total"))
    top = counts.orderBy(F.col("cnt").desc(), F.col("token").asc()).limit(200)
    w = Window.orderBy(F.col("cnt").desc(), F.col("token").asc())
    return (
        top.crossJoin(F.broadcast(total))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .withColumn(
            "cum",
            F.sum("cnt").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .select(
            "token",
            "cnt",
            "rank",
            F.expr("(cum * 1000) div total").alias("cum_pm"),
        )
    )


O_DOCS_VOCAB_TOPK = rf"""
WITH t AS (
  SELECT unnest(regexp_extract_all(text, '{_BPE_RE}')) AS token
  FROM documents WHERE n_chars > 0
),
c AS (SELECT token, count(*) AS cnt FROM t GROUP BY token),
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM c),
top AS (SELECT token, cnt FROM c ORDER BY cnt DESC, token ASC LIMIT 200),
r AS (
  SELECT token, cnt,
         row_number() OVER (ORDER BY cnt DESC, token ASC) AS rank,
         CAST(sum(cnt) OVER (ORDER BY cnt DESC, token ASC
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM top
)
SELECT token, cnt, rank,
       CAST((cum * 1000) // (SELECT total FROM tot) AS BIGINT) AS cum_pm
FROM r
"""


def q_docs_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup-on-ingest: a NEW batch (doc_id % 10 >= 8) looked up
    against the already-ingested corpus's LSH band index (% 10 < 8) —
    the incremental counterpart of docs_bloom_dedup's exact-fingerprint
    arm, and what a crawl pipeline actually runs per micro-batch
    (re-banding the 10^10-doc corpus each sync, as the self-join
    variant would, is not affordable; the index is persisted and the
    join is band-bucket-keyed). Candidates are verified with exact
    shingle-Jaccard (>= 0.5); per batch doc: candidate count, verified
    near-dup count, status."""
    tune_session(spark)
    from airbyte_integrations_spark.functions.neardup import (
        jaccard_pairs,
        lsh_candidates_vs_index,
        minhash_signature,
        shingles,
    )
    from airbyte_integrations_spark.session import register_persist

    docs = _spread(load(spark, sf_dir, "documents")).filter(F.col("n_chars") > 0)
    sh = register_persist(shingles(docs, "doc_id", "text"))
    sig = register_persist(
        minhash_signature(docs, "doc_id", "text", shingles_df=sh)
    )
    batch_sigs = sig.filter(F.col("doc_id") % 10 >= 8)
    index_sigs = sig.filter(F.col("doc_id") % 10 < 8)
    cand = lsh_candidates_vs_index(batch_sigs, index_sigs, "doc_id")
    jac = jaccard_pairs(
        docs,
        cand.select(
            F.col("batch_id").alias("id_a"), F.col("index_id").alias("id_b")
        ),
        "doc_id",
        "text",
        shingles_df=sh,
    )
    per_batch = (
        jac.select(
            F.col("id_a").alias("doc_id"),
            (
                F.floor(F.col("n_inter") * 1000.0 / F.col("n_union")).cast("long")
                >= 500
            ).cast("long").alias("is_dup"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.sum("is_dup").alias("n_near_dup"),
        )
    )
    base = docs.filter(F.col("doc_id") % 10 >= 8).select("doc_id")
    return base.join(per_batch, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_candidates"), F.lit(0).cast("long")).alias(
            "n_candidates"
        ),
        F.coalesce(F.col("n_near_dup"), F.lit(0).cast("long")).alias(
            "n_near_dup"
        ),
        F.when(F.coalesce(F.col("n_near_dup"), F.lit(0)) > 0,
               F.lit("near_dup_of_corpus"))
        .otherwise(F.lit("unique"))
        .alias("status"),
    )


O_DOCS_MINHASH_INCREMENTAL = rf"""
WITH w AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ws
  FROM documents WHERE n_chars > 0
),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(ws[p:p + 2], ' ') AS shingle
  FROM (
    SELECT doc_id, ws,
           unnest(generate_series(1, greatest(len(ws) - 2, 1))) AS p
    FROM w
  )
),
sig AS (SELECT doc_id, {_MH} FROM sh GROUP BY doc_id),
bands AS (
  {_BANDS}
),
cand AS (
  SELECT DISTINCT b.doc_id AS batch_id, c.doc_id AS index_id
  FROM bands b JOIN bands c ON b.idx = c.idx AND b.band = c.band
  WHERE b.doc_id % 10 >= 8 AND c.doc_id % 10 < 8
),
inter AS (
  SELECT p.batch_id, p.index_id, count(*) AS n_inter
  FROM cand p
  JOIN sh sa ON sa.doc_id = p.batch_id
  JOIN sh sb ON sb.doc_id = p.index_id AND sb.shingle = sa.shingle
  GROUP BY 1, 2
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
agg AS (
  SELECT batch_id,
         count(*) AS n_candidates,
         CAST(sum(CASE WHEN CAST(floor(n_inter * 1000.0 /
                (za.n_sh + zb.n_sh - n_inter)) AS BIGINT) >= 500
              THEN 1 ELSE 0 END) AS BIGINT) AS n_near_dup
  FROM inter
  JOIN sizes za ON za.doc_id = batch_id
  JOIN sizes zb ON zb.doc_id = index_id
  GROUP BY 1
)
SELECT d.doc_id,
       COALESCE(a.n_candidates, 0) AS n_candidates,
       COALESCE(a.n_near_dup, 0) AS n_near_dup,
       CASE WHEN COALESCE(a.n_near_dup, 0) > 0 THEN 'near_dup_of_corpus'
            ELSE 'unique' END AS status
FROM (SELECT doc_id FROM documents WHERE n_chars > 0 AND doc_id % 10 >= 8) d
LEFT JOIN agg a ON a.batch_id = d.doc_id
"""


def q_emb_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality measurement — recall@3 of the sign-LSH bucketed
    search against exact brute-force top-3, per query ("measure, don't
    guess": the eval harness that justifies the bucket-bit / nprobe
    choice before a 10^10-vector rollout). The brute-force side is the
    labeled oracle baseline restricted to the min(1000, ceil(n/10))
    md5 query budget (constant 1,000 at scale — |Q| x N with |Q|
    FIXED, the eval shape, never the serving path; the ceil(n/10) arm
    only trims small local sweeps); the ANN side is the same
    bucket-keyed join the serving query uses. Integer floor(cos*100)
    scoring + cid tiebreak keep both rankings engine-exact. Bucket
    width here is 2 bits (vs the serving query's 8): the synthetic
    embeddings are near-orthogonal, so at 8 bits recall@3 is 0 for
    every query — a true but signal-free measurement; 2 bits puts the
    operating point where the recall/candidate-count tradeoff is
    visible, which is exactly what the harness exists to show."""
    tune_session(spark)
    emb = _spread(load(spark, sf_dir, "embeddings"))
    dims = [1, 33]
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    bits = [
        F.when(F.element_at(F.col("embedding"), d) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for d in dims
    ]
    base = emb.select(
        "vec_id",
        dbl.alias("v"),
        F.sqrt(F.aggregate(dbl, F.lit(0.0), lambda a, x: a + x * x)).alias("nrm"),
        F.concat(*bits).alias("bucket"),
    )
    budget = min(1000, -(-emb.count() // 10))  # one bounded scalar agg
    q = (
        base.withColumn(
            "_qkey", F.md5(F.col("vec_id").cast("string").cast("binary"))
        )
        .orderBy(F.col("_qkey").asc(), F.col("vec_id").asc())
        .limit(budget)
        .select(
            F.col("vec_id").alias("qid"), F.col("v").alias("qv"),
            F.col("nrm").alias("qn"), F.col("bucket"),
        )
    )
    c = base.select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv"),
        F.col("nrm").alias("cn"), F.col("bucket").alias("cbucket"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("qv"), F.col("cv"), lambda a, b: a * b),
        F.lit(0.0), lambda a, x: a + x,
    )
    sim = F.floor(dot / (F.col("qn") * F.col("cn")) * 100).cast("long")
    w = Window.partitionBy("qid").orderBy(F.col("sim_c").desc(), F.col("cid").asc())

    def top3(pairs: DataFrame) -> DataFrame:
        return (
            pairs.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 3)
            .select("qid", "cid")
        )

    exact = top3(
        q.crossJoin(c)
        .filter(F.col("qid") != F.col("cid"))
        .select("qid", "cid", sim.alias("sim_c"))
    )
    ann = top3(
        q.join(c, F.col("bucket") == F.col("cbucket"))
        .filter(F.col("qid") != F.col("cid"))
        .select("qid", "cid", sim.alias("sim_c"))
    )
    return (
        exact.join(ann.withColumn("hit", F.lit(1)), ["qid", "cid"], "left")
        .groupBy("qid")
        .agg(F.count("hit").alias("n_hits"))
        .select(
            "qid",
            "n_hits",
            F.expr("(n_hits * 1000) div 3").alias("recall_pm"),
        )
    )


O_EMB_ANN_RECALL = """
WITH base AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
         (CASE WHEN embedding[1] >= 0 THEN '1' ELSE '0' END ||
          CASE WHEN embedding[33] >= 0 THEN '1' ELSE '0' END) AS bucket
  FROM embeddings
),
base2 AS (SELECT vec_id, v, bucket, sqrt(list_dot_product(v, v)) AS nrm FROM base),
b AS (SELECT least(1000, CAST(ceil(count(*) / 10.0) AS BIGINT)) AS n
      FROM embeddings),
q AS (SELECT qid, qv, qn, bucket FROM (
        SELECT vec_id AS qid, v AS qv, nrm AS qn, bucket,
               row_number() OVER (
                 ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC) AS qrn
        FROM base2
      ) WHERE qrn <= (SELECT n FROM b)),
exact AS (
  SELECT qid, cid FROM (
    SELECT q.qid, c.vec_id AS cid,
           row_number() OVER (
             PARTITION BY q.qid
             ORDER BY CAST(floor(list_dot_product(q.qv, c.v) / (q.qn * c.nrm) * 100)
                           AS BIGINT) DESC, c.vec_id ASC) AS rank
    FROM q, base2 c WHERE q.qid != c.vec_id
  ) WHERE rank <= 3
),
ann AS (
  SELECT qid, cid FROM (
    SELECT q.qid, c.vec_id AS cid,
           row_number() OVER (
             PARTITION BY q.qid
             ORDER BY CAST(floor(list_dot_product(q.qv, c.v) / (q.qn * c.nrm) * 100)
                           AS BIGINT) DESC, c.vec_id ASC) AS rank
    FROM q JOIN base2 c USING (bucket) WHERE q.qid != c.vec_id
  ) WHERE rank <= 3
)
SELECT e.qid,
       count(a.cid) AS n_hits,
       CAST((count(a.cid) * 1000) // 3 AS BIGINT) AS recall_pm
FROM exact e LEFT JOIN ann a ON a.qid = e.qid AND a.cid = e.cid
GROUP BY e.qid
"""


def q_emb_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization: each 64-dim vector is split into 4
    16-dim subvectors, each assigned to its nearest sub-centroid from
    a 4-entry codebook (seeded deterministically as the 4 lowest
    vec_ids — the same seeding rule as the IVF codebook), emitting the
    4 codes + total quantized error. This is the PQ half of IVF-PQ:
    at 10^10 vectors the codes are bytes instead of 256-byte floats.
    Scale shape: the codebook is metadata (k x dim ints), collected
    once and inlined as literal arrays — assignment is a pure narrow
    projection, zero Exchange/join at any corpus size (the zero-shuffle
    k-means assignment pattern). Exactness: vectors are integer-scaled
    (floor(x*1000)) BEFORE distances, so argmin compares exact longs —
    no float summation order ever reaches a comparison; ties break to
    the lowest centroid index in both engines. (Implementation lives
    in functions/pq.py, shared with the ADC search query.)"""
    from airbyte_integrations_spark.functions.pq import (
        int_vectors,
        pq_code_columns,
        seed_codebook,
    )

    tune_session(spark)
    emb = load(spark, sf_dir, "embeddings")
    base = int_vectors(emb)
    cents = seed_codebook(base, k=4)
    return pq_code_columns(base, cents, m=4, width=16, with_err=True)


O_EMB_PQ_CODES = """
WITH iv AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
  FROM embeddings
),
cent AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cidx, v AS cv
  FROM iv ORDER BY vec_id LIMIT 4
),
pos AS (SELECT unnest(generate_series(1, 64)) AS p),
d AS (
  SELECT i.vec_id, c.cidx, (pos.p - 1) // 16 AS sub,
         sum((i.v[pos.p] - c.cv[pos.p]) * (i.v[pos.p] - c.cv[pos.p])) AS dist
  FROM iv i, cent c, pos
  GROUP BY 1, 2, 3
),
best AS (
  SELECT vec_id, sub, cidx, dist,
         row_number() OVER (PARTITION BY vec_id, sub
                            ORDER BY dist ASC, cidx ASC) AS rn
  FROM d
)
SELECT vec_id,
       max(CASE WHEN sub = 0 THEN cidx END) AS code0,
       max(CASE WHEN sub = 1 THEN cidx END) AS code1,
       max(CASE WHEN sub = 2 THEN cidx END) AS code2,
       max(CASE WHEN sub = 3 THEN cidx END) AS code3,
       CAST(sum(dist) AS BIGINT) AS err_q
FROM best WHERE rn = 1 GROUP BY vec_id
"""


def q_emb_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance (ADC) top-k search — the search half of
    IVF-PQ (emb_pq_codes is the storage half): a constant 8-query md5
    budget keeps its vectors uncompressed, per-query LUTs (m*k longs,
    metadata) are broadcast, and the approximate distance to every
    database vector is m code-indexed LUT lookups summed — the scan
    touches only the narrow code table, never the float vectors.
    Top-5 per query is exact under (adist ASC, cid ASC); the rank
    window compiles to WindowGroupLimit with a map-side Partial pass
    (plan-pinned), so no per-query single-reducer partition exists at
    any corpus size. All distances are exact longs over int-scaled
    vectors; Jégou et al. TPAMI 2011 §III."""
    from airbyte_integrations_spark.functions.pq import (
        adc_luts,
        adc_topk,
        int_vectors,
        pq_code_columns,
        seed_codebook,
    )

    tune_session(spark)
    emb = load(spark, sf_dir, "embeddings")
    base = int_vectors(emb)
    cents = seed_codebook(base, k=4)
    codes = pq_code_columns(base, cents, m=4, width=16, with_err=False)
    q = (
        base.withColumn(
            "_qkey", F.md5(F.col("vec_id").cast("string").cast("binary"))
        )
        .orderBy(F.col("_qkey").asc(), F.col("vec_id").asc())
        .limit(8)
        .select("vec_id", "v")
    )
    luts = adc_luts(q, cents, m=4, width=16)
    return adc_topk(codes, luts, k=5, m=4)


O_EMB_PQ_ADC_TOPK = """
WITH iv AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
  FROM embeddings
),
cent AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cidx, v AS cv
  FROM iv ORDER BY vec_id LIMIT 4
),
pos AS (SELECT unnest(generate_series(1, 64)) AS p),
d AS (
  SELECT i.vec_id, c.cidx, (pos.p - 1) // 16 AS sub,
         sum((i.v[pos.p] - c.cv[pos.p]) * (i.v[pos.p] - c.cv[pos.p])) AS dist
  FROM iv i, cent c, pos
  GROUP BY 1, 2, 3
),
codes AS (
  SELECT vec_id, sub, cidx FROM (
    SELECT vec_id, sub, cidx,
           row_number() OVER (PARTITION BY vec_id, sub
                              ORDER BY dist ASC, cidx ASC) AS rn
    FROM d
  ) WHERE rn = 1
),
q AS (SELECT vec_id AS qid, v AS qv FROM iv
      ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC LIMIT 8),
lut AS (
  SELECT q.qid, (pos.p - 1) // 16 AS sub, c.cidx,
         sum((q.qv[pos.p] - c.cv[pos.p]) * (q.qv[pos.p] - c.cv[pos.p])) AS dist
  FROM q, cent c, pos
  GROUP BY 1, 2, 3
),
adist AS (
  SELECT l.qid, x.vec_id AS cid, CAST(sum(l.dist) AS BIGINT) AS adist
  FROM codes x JOIN lut l ON l.sub = x.sub AND l.cidx = x.cidx
  WHERE l.qid != x.vec_id
  GROUP BY 1, 2
)
SELECT qid, cid, adist, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY qid ORDER BY adist ASC, cid ASC) AS rank
  FROM adist
) WHERE rank <= 5
"""


def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view -> click -> purchase) per user, each step
    within a 24 h conversion window of the previous one (24 h chosen so
    the sandbox corpus shows all stages: 90/35/25 at sf0.01). ONE
    user-keyed Exchange feeds three stacked full-partition windows and
    the final collapse (Catalyst reuses the partitioning — the
    sessionize plan idiom); per-user event counts are human-bounded so
    no skew handling is needed at any corpus size."""
    tune_session(spark)
    win_us = 86_400 * 1_000_000
    ev = load(spark, sf_dir, "events")
    wfull = Window.partitionBy("user_id")
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))
    step1 = ev.withColumn(
        "t_view", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(wfull)
    )
    step2 = step1.withColumn(
        "t_click",
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("ts") >= F.col("t_view"))
                & (us("ts") - us("t_view") <= win_us),
                F.col("ts"),
            )
        ).over(wfull),
    )
    step3 = step2.withColumn(
        "t_purchase",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") >= F.col("t_click"))
                & (us("ts") - us("t_click") <= win_us),
                F.col("ts"),
            )
        ).over(wfull),
    )
    return step3.groupBy("user_id").agg(
        F.unix_micros(F.first("t_view").cast("timestamp")).alias("view_us"),
        F.unix_micros(F.first("t_click").cast("timestamp")).alias("click_us"),
        F.unix_micros(F.first("t_purchase").cast("timestamp")).alias("purchase_us"),
        (
            F.first("t_view").isNotNull().cast("long")
            + F.first("t_click").isNotNull().cast("long")
            + F.first("t_purchase").isNotNull().cast("long")
        ).alias("stage"),
    )


O_EVENTS_FUNNEL = """
WITH v AS (
  SELECT user_id, min(ts) AS t FROM events WHERE event_type = 'view' GROUP BY 1
),
c AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN v ON v.user_id = e.user_id AND e.ts >= v.t
    AND epoch_us(e.ts) - epoch_us(v.t) <= 86400000000
  WHERE e.event_type = 'click' GROUP BY 1
),
p AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN c ON c.user_id = e.user_id AND e.ts >= c.t
    AND epoch_us(e.ts) - epoch_us(c.t) <= 86400000000
  WHERE e.event_type = 'purchase' GROUP BY 1
)
SELECT u.user_id,
       epoch_us(v.t) AS view_us,
       epoch_us(c.t) AS click_us,
       epoch_us(p.t) AS purchase_us,
       CAST(CASE WHEN v.t IS NOT NULL THEN 1 ELSE 0 END
          + CASE WHEN c.t IS NOT NULL THEN 1 ELSE 0 END
          + CASE WHEN p.t IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS stage
FROM (SELECT DISTINCT user_id FROM events) u
LEFT JOIN v ON v.user_id = u.user_id
LEFT JOIN c ON c.user_id = u.user_id
LEFT JOIN p ON p.user_id = u.user_id
"""



def q_http_paged_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paginated HTTP/API source value-oracled against the same table
    read whole (sources/http.py — the reference's HttpStream family:
    airbyte-cdk http.py:70-454, rate_limiting.py): a local fixture API
    (the test-harness analogue of the Derby fixture the JDBC queries
    use) serves the documents table with offset pagination; the engine
    reads it via read_http_stream — 4 cursor-window slices fanned out
    to executor tasks, each task running its own pagination+backoff
    loop, records parsed JVM-side with from_json. Eagerly materialized
    (localCheckpoint) so the fixture server can shut down before the
    driver collects. Oracle = the parquet read whole: equality proves
    the paged protocol loses and duplicates nothing.

    Scale shape: slices are the distribution unit (N executor tasks x
    independent HTTP pagination, Retry-After-aware backoff per task);
    records go straight to Arrow batches on the executors — the driver
    only plans slice boundaries."""
    import json as _json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import parse_qs, urlparse

    import pyarrow.parquet as _pq
    from pyspark.sql import types as T

    from airbyte_integrations_spark.sources.http import (
        HttpStreamConfig,
        plan_window_slices,
        read_http_stream,
    )

    tune_session(spark)
    tbl = _pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "n_chars"],
    )
    rows = sorted(tbl.to_pylist(), key=lambda r: r["doc_id"])
    hi = rows[-1]["doc_id"] if rows else 0

    class _H(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            u = urlparse(self.path)
            q = {k: v[0] for k, v in parse_qs(u.query).items()}
            rs = [
                r for r in rows
                if r["doc_id"] > int(q.get("since", -(2**62)))
                and r["doc_id"] <= int(q.get("until", 2**62))
            ]
            off, lim = int(q.get("offset", 0)), int(q.get("limit", 100))
            data = _json.dumps({"data": rs[off : off + lim]}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), _H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        cfg = HttpStreamConfig(
            url_base=f"http://127.0.0.1:{srv.server_port}",
            path="docs",
            records_field="data",
            page_size=199,  # not a divisor of the row count: real pagination
            pagination="offset",
        )
        slices = [
            {"since": lo, "until": hi_}
            for lo, hi_ in plan_window_slices(None, hi, max(hi // 4, 1))
        ]
        schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("lang", T.StringType()),
                T.StructField("n_chars", T.LongType()),
            ]
        )
        out = read_http_stream(spark, cfg, slices, schema)
        return out.localCheckpoint(eager=True)
    finally:
        srv.shutdown()


O_HTTP_PAGED_READ = """
SELECT doc_id, lang, n_chars FROM documents
"""


def q_http_declarative_substream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative (low-code) parent->child source value-oracled
    against the table read whole (sources/declarative.py — reference:
    airbyte-cdk declarative_stream.py:14-80 + substream_slicer.py:16-66
    + extractors/jq.py). A local fixture API serves the documents
    table as a two-level REST hierarchy: ``/langs`` lists the parent
    records (one per distinct lang), ``/langs/<lang>/docs`` pages that
    lang's documents under a nested ``response.results`` body (dotted
    record selector). The manifest declares the child's path with
    ``{{ stream_slice.lang }}`` interpolation and a substream slicer
    over the parent; the engine resolves one slice per parent record
    DRIVER-side (parents are metadata-sized) and fans the child reads
    out one executor task per parent, each running its own pagination
    loop — records parse JVM-side with from_json. Oracle = the parquet
    read whole: equality proves parent fan-out x interpolation x
    pagination x dotted selection loses and duplicates nothing.

    Scale shape: the distribution unit is the parent record (10k
    parents = 10k parallel paginated reads); the driver touches only
    the parent list, never child records."""
    import json as _json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import parse_qs, urlparse

    import pyarrow.parquet as _pq

    from airbyte_integrations_spark.sources.declarative import (
        DeclarativeSource,
    )

    tune_session(spark)
    tbl = _pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "n_chars"],
    )
    rows = sorted(tbl.to_pylist(), key=lambda r: r["doc_id"])
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    langs = [{"lang": lg} for lg in sorted(by_lang)]

    class _H(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _json_resp(self, body):
            data = _json.dumps(body).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            u = urlparse(self.path)
            q = {k: v[0] for k, v in parse_qs(u.query).items()}
            parts = [p for p in u.path.split("/") if p]
            off, lim = int(q.get("offset", 0)), int(q.get("limit", 100))
            if parts == ["langs"]:
                return self._json_resp({"data": langs[off : off + lim]})
            if len(parts) == 3 and parts[0] == "langs" and parts[2] == "docs":
                rs = by_lang.get(parts[1], [])
                return self._json_resp(
                    {"response": {"results": rs[off : off + lim]}}
                )
            return self._json_resp({"data": []})

    srv = ThreadingHTTPServer(("127.0.0.1", 0), _H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        manifest = {
            "version": "0.1.0",
            "streams": [
                {
                    "name": "langs",
                    "requester": {
                        "url_base": "{{ config.api_url }}",
                        "path": "langs",
                    },
                    "record_selector": "data",
                    "primary_key": "lang",
                    "json_schema": {"properties": {"lang": {"type": "string"}}},
                },
                {
                    "name": "docs",
                    "requester": {
                        "url_base": "{{ config.api_url }}",
                        "path": "langs/{{ stream_slice.lang }}/docs",
                    },
                    "record_selector": "response.results",
                    "primary_key": "doc_id",
                    # page size chosen NOT to divide per-lang counts:
                    # real multi-page pagination inside each parent
                    "paginator": {"type": "offset", "page_size": 37},
                    "slicer": {
                        "type": "substream",
                        "parent_stream": "langs",
                        "slice_definition": {
                            "lang": "{{ parent_record.lang }}"
                        },
                    },
                    "json_schema": {
                        "properties": {
                            "doc_id": {"type": "integer"},
                            "lang": {"type": "string"},
                            "n_chars": {"type": "integer"},
                        }
                    },
                },
            ],
        }
        src = DeclarativeSource(
            manifest, {"api_url": f"http://127.0.0.1:{srv.server_port}"}
        )
        out = src.streams["docs"].read(spark)
        return out.localCheckpoint(eager=True)
    finally:
        srv.shutdown()


O_HTTP_DECLARATIVE_SUBSTREAM = """
SELECT doc_id, lang, n_chars FROM documents
"""


def q_http_declarative_filter_transform(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Declarative record filter + transformations compiled to Catalyst,
    value-oracled against plain SQL over the table read whole
    (sources/declarative.py compile_condition/build_transformations —
    reference: client-side record filtering in connectors,
    source-bigcommerce/source_bigcommerce/source.py:122 ``record[
    cursor] >= state``; condition language per airbyte-cdk
    declarative/interpolation/interpolated_boolean.py:10-24; record
    reshaping per source-github/source_github/streams.py:174,337
    ``record["repository"] = stream_slice["repository"]``).

    The same two-level fixture as http_declarative_substream (parent
    /langs -> child /langs/<lang>/docs), with the child declaring
    ``record_filter: {{ record.n_chars >= config.min_chars and
    record.lang not in ['de'] }}`` plus AddFields(lang_from_slice <-
    stream_slice.lang) and RemoveFields(lang). The engine compiles the
    filter to a JVM-side Filter over the parsed records (config ->
    literal, record paths -> typed columns) and the enrichment to
    withColumn over the slice map that rides with each record — no
    per-record Python. Oracle = the same predicate and projection in
    ANSI SQL: equality proves the compiled pipeline is exactly the
    declared relational algebra.

    Scale shape: the filter sits ABOVE the fetch tasks as a Catalyst
    Filter (codegen), so post-fetch operators (joins, MERGE) see only
    surviving rows; enrichment is a narrow projection, never a
    shuffle."""
    import json as _json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import parse_qs, urlparse

    import pyarrow.parquet as _pq

    from airbyte_integrations_spark.sources.declarative import (
        DeclarativeSource,
    )

    tune_session(spark)
    tbl = _pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "n_chars"],
    )
    rows = sorted(tbl.to_pylist(), key=lambda r: r["doc_id"])
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    langs = [{"lang": lg} for lg in sorted(by_lang)]

    class _H(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _json_resp(self, body):
            data = _json.dumps(body).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            u = urlparse(self.path)
            q = {k: v[0] for k, v in parse_qs(u.query).items()}
            parts = [p for p in u.path.split("/") if p]
            off, lim = int(q.get("offset", 0)), int(q.get("limit", 100))
            if parts == ["langs"]:
                return self._json_resp({"data": langs[off : off + lim]})
            if len(parts) == 3 and parts[0] == "langs" and parts[2] == "docs":
                rs = by_lang.get(parts[1], [])
                return self._json_resp({"data": rs[off : off + lim]})
            return self._json_resp({"data": []})

    srv = ThreadingHTTPServer(("127.0.0.1", 0), _H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        manifest = {
            "version": "0.1.0",
            "streams": [
                {
                    "name": "langs",
                    "requester": {
                        "url_base": "{{ config.api_url }}",
                        "path": "langs",
                    },
                    "record_selector": "data",
                    "json_schema": {"properties": {"lang": {"type": "string"}}},
                },
                {
                    "name": "docs",
                    "requester": {
                        "url_base": "{{ config.api_url }}",
                        "path": "langs/{{ stream_slice.lang }}/docs",
                    },
                    "record_selector": "data",
                    "primary_key": "doc_id",
                    "paginator": {"type": "offset", "page_size": 41},
                    "slicer": {
                        "type": "substream",
                        "parent_stream": "langs",
                        "slice_definition": {
                            "lang": "{{ parent_record.lang }}"
                        },
                    },
                    "record_filter": (
                        "{{ record.n_chars >= config.min_chars"
                        " and record.lang not in ['de'] }}"
                    ),
                    "transformations": [
                        {
                            "type": "AddFields",
                            "fields": [
                                {
                                    "path": ["lang_from_slice"],
                                    "value": "{{ stream_slice.lang }}",
                                }
                            ],
                        },
                        {"type": "RemoveFields", "field_pointers": [["lang"]]},
                    ],
                    "json_schema": {
                        "properties": {
                            "doc_id": {"type": "integer"},
                            "lang": {"type": "string"},
                            "n_chars": {"type": "integer"},
                        }
                    },
                },
            ],
        }
        src = DeclarativeSource(
            manifest,
            {
                "api_url": f"http://127.0.0.1:{srv.server_port}",
                "min_chars": 120,
            },
        )
        out = src.streams["docs"].read(spark)
        return out.localCheckpoint(eager=True)
    finally:
        srv.shutdown()


O_HTTP_DECLARATIVE_FILTER_TRANSFORM = """
SELECT doc_id, n_chars, lang AS lang_from_slice
FROM documents
WHERE n_chars >= 120 AND lang <> 'de'
"""


def q_http_search_post_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POST/search API with a conditional paginator, value-oracled
    against the table read whole (sources/http.py — reference:
    HttpStream.http_method + request_body_json, airbyte-cdk
    http.py:89,163-189; ConditionalPaginator stop condition,
    declarative/requesters/paginators/conditional_paginator.py:13-41).
    The fixture is a search endpoint that takes its window + paging
    params in a JSON POST body and marks the final page with
    ``is_last`` — the stop CONDITION terminates pagination (a full
    final page never costs a wasted empty-page request; the short-page
    rule is disabled). 4 cursor-window slices fan out to executor
    tasks; records parse JVM-side. Oracle = the parquet read whole:
    equality proves body-routed paging + conditional termination loses
    and duplicates nothing.

    Scale shape: identical to http_paged_read — slices distribute, the
    per-page POST body is built ON the executor, and the conditional
    stop saves one round-trip per slice (material when slices are
    thousands of shard reads against a rate-limited API)."""
    import json as _json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    import pyarrow.parquet as _pq
    from pyspark.sql import types as T

    from airbyte_integrations_spark.sources.http import (
        HttpStreamConfig,
        plan_window_slices,
        read_http_stream,
    )

    tune_session(spark)
    tbl = _pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "n_chars"],
    )
    rows = sorted(tbl.to_pylist(), key=lambda r: r["doc_id"])
    hi = rows[-1]["doc_id"] if rows else 0

    class _H(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_POST(self):
            q = _json.loads(
                self.rfile.read(int(self.headers.get("Content-Length", 0)))
            )
            rs = [
                r for r in rows
                if r["doc_id"] > int(q.get("since", -(2**62)))
                and r["doc_id"] <= int(q.get("until", 2**62))
            ]
            off, lim = int(q.get("offset", 0)), int(q.get("limit", 100))
            body = {
                "results": rs[off : off + lim],
                "is_last": off + lim >= len(rs),
            }
            data = _json.dumps(body).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), _H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        cfg = HttpStreamConfig(
            url_base=f"http://127.0.0.1:{srv.server_port}",
            path="search",
            records_field="results",
            page_size=173,  # not a divisor of the row count: real pagination
            pagination="offset",
            http_method="POST",
            params_in_body=True,
            stop_condition=lambda body, headers, recs: bool(body.get("is_last")),
        )
        slices = [
            {"since": lo, "until": hi_}
            for lo, hi_ in plan_window_slices(None, hi, max(hi // 4, 1))
        ]
        schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("lang", T.StringType()),
                T.StructField("n_chars", T.LongType()),
            ]
        )
        out = read_http_stream(spark, cfg, slices, schema)
        return out.localCheckpoint(eager=True)
    finally:
        srv.shutdown()


O_HTTP_SEARCH_POST_READ = """
SELECT doc_id, lang, n_chars FROM documents
"""


def q_http_link_header_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC5988 Link-header pagination value-oracled against the table
    read whole (sources/http.py — reference: NextPageUrlPaginator +
    the InterpolatedPaginator ``headers`` namespace,
    declarative/requesters/paginators/next_page_url_paginator.py,
    interpolated_paginator.py:21-29). The fixture is the GitHub API
    shape: the response body IS the record list and the next page
    travels ONLY in a ``Link: <url>; rel="next"`` response header —
    termination is link-driven. One slice per lang partition fans out
    to executor tasks, each walking its own link chain. Oracle = the
    parquet read whole: equality proves header-driven link walking
    loses and duplicates nothing.

    Scale shape: link chains are inherently serial PER SLICE, so the
    slice list (here: lang partitions; in production: repos/orgs/
    shards) is what distributes — N chains walk concurrently, records
    parse JVM-side."""
    import json as _json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from urllib.parse import parse_qs, urlparse

    import pyarrow.parquet as _pq
    from pyspark.sql import types as T

    from airbyte_integrations_spark.sources.http import (
        HttpStreamConfig,
        read_http_stream,
    )

    tune_session(spark)
    tbl = _pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "n_chars"],
    )
    rows = sorted(tbl.to_pylist(), key=lambda r: r["doc_id"])
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)

    class _H(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            u = urlparse(self.path)
            q = {k: v[0] for k, v in parse_qs(u.query).items()}
            rs = by_lang.get(q.get("lang", ""), [])
            off = int(q.get("cursor", 0))
            page = rs[off : off + 83]  # fixed server page size
            data = _json.dumps(page).encode()  # body IS the list
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            if off + 83 < len(rs):
                nxt = (
                    f"http://127.0.0.1:{self.server.server_port}/gh"
                    f"?lang={q.get('lang','')}&cursor={off + 83}"
                )
                self.send_header(
                    "Link", f'<{nxt}>; rel="next", <http://x/last>; rel="last"'
                )
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), _H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        cfg = HttpStreamConfig(
            url_base=f"http://127.0.0.1:{srv.server_port}",
            path="gh",
            records_field=None,  # GitHub shape: the body IS the list
            pagination="url",
            token_in_header="Link",
            page_size=10_000,  # deliberately irrelevant: links terminate
        )
        slices = [{"lang": lg} for lg in sorted(by_lang)]
        schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("lang", T.StringType()),
                T.StructField("n_chars", T.LongType()),
            ]
        )
        out = read_http_stream(spark, cfg, slices, schema)
        return out.localCheckpoint(eager=True)
    finally:
        srv.shutdown()


O_HTTP_LINK_HEADER_READ = """
SELECT doc_id, lang, n_chars FROM documents
"""


def q_protocol_cli_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The connector CLI contract end-to-end (entrypoint.run — the
    reference's AirbyteEntrypoint argv + stdout-JSONL protocol,
    airbyte-cdk entrypoint.py / base-java IntegrationRunner): `read
    --config --catalog` over a files-kind stream pointing at the
    documents table, RECORD lines parsed back off the captured pipe and
    value-oracled against the table read whole. Pins the whole chain:
    catalog JSON parsing -> source fan-out -> distributed to_json
    serialization -> protocol envelope -> lossless data blob.

    Scale note: the pipe relay (toLocalIterator) is the protocol's
    single-consumer serialization point, exactly as the reference's
    docker stdout; the serialization itself is distributed codegen.
    Lake-to-lake syncs bypass this path entirely (read_catalog)."""
    import io as _io
    import json as _json
    import tempfile

    from airbyte_integrations_spark.entrypoint import run as cli_run

    tune_session(spark)
    tmp = tempfile.mkdtemp(prefix="cli_read_")
    with open(os.path.join(tmp, "config.json"), "w") as fh:
        _json.dump({"log_path": sf_dir}, fh)  # check() needs a real path
    with open(os.path.join(tmp, "catalog.json"), "w") as fh:
        _json.dump(
            {
                "streams": [
                    {
                        "name": "documents",
                        "sync_mode": "full_refresh",
                        "destination_sync_mode": "overwrite",
                        "primary_key": ["doc_id"],
                        "cursor_field": ["doc_id"],
                        "source": {
                            "kind": "files",
                            "root": sf_dir,
                            "format": "parquet",
                            "path_pattern": "documents.parquet",
                        },
                    }
                ]
            },
            fh,
        )
    buf = _io.StringIO()
    code = cli_run(
        ["read", "--config", os.path.join(tmp, "config.json"),
         "--catalog", os.path.join(tmp, "catalog.json")],
        spark=spark, out=buf,
    )
    assert code == 0
    lines = [ln for ln in buf.getvalue().splitlines()]
    recs = [
        _json.loads(ln)["record"]["data"]
        for ln in lines
        if _json.loads(ln)["type"] == "RECORD"
    ]
    kinds = [_json.loads(ln)["type"] for ln in lines]
    assert "STATE" in kinds and kinds.index("STATE") > kinds.index("RECORD")
    rows = [
        (r["doc_id"], r["lang"], r["source"], r["n_chars"]) for r in recs
    ]
    return spark.createDataFrame(
        rows, "doc_id long, lang string, source string, n_chars long"
    )


O_PROTOCOL_CLI_READ = """
SELECT doc_id, lang, source, n_chars FROM documents
"""


def q_wire_emit_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wire-protocol EMIT + READ roundtrip value-oracled against the
    table read whole (sources/airbyte_wire.py write_messages /
    read_messages — reference: abstract_source.py:288
    ``AirbyteRecordMessage(stream, data, emitted_at=now_millis)``,
    envelope per airbyte_protocol.yaml:13-49). The documents table is
    serialized to RECORD JSONL messages with to_json over nested
    structs (distributed, whole-stage codegen — no driver loop), a
    trailing STATE message lands after the record files commit, and the
    read path parses the envelope + data blob back with from_json.
    Oracle = the parquet read whole: equality proves the protocol
    serialization loses nothing — including explicit nulls — in either
    direction.

    Scale shape: both directions are narrow JVM projections over
    whatever partitioning the input already has; no shuffle, no
    Python."""
    import tempfile

    from pyspark.sql import types as T

    from airbyte_integrations_spark.sources.airbyte_wire import (
        read_messages,
        records_for_stream,
        write_messages,
    )

    tune_session(spark)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "lang", "n_chars"
    )
    out = os.path.join(tempfile.mkdtemp(prefix="wire_emit_"), "msgs")
    write_messages(
        docs,
        out,
        stream="documents",
        emitted_at_millis=1_600_000_000_000,
        state={"documents": {"cursor": 1}},
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    back = records_for_stream(read_messages(spark, out), "documents", schema)
    return back.select("doc_id", "lang", "n_chars").localCheckpoint(eager=True)


O_WIRE_EMIT_ROUNDTRIP = """
SELECT doc_id, lang, n_chars FROM documents
"""


def q_singer_tap_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Singer-tap adapter value-oracled against the table read whole
    (sources/singer.py — reference: airbyte-cdk
    sources/singer/singer_helpers.py:239-265 translates the tap's
    SCHEMA/RECORD/STATE/ACTIVATE_VERSION lines to Airbyte messages one
    record at a time in driver Python). The documents table is
    serialized to Singer RECORD JSONL with to_json over structs
    (distributed, codegen — no driver loop), framed by a SCHEMA line, an
    ACTIVATE_VERSION line, and a trailing STATE bookmark — the three
    non-record message kinds the adapter must drop/route. The read path
    parses everything back with one get_json_object projection into the
    wire landing shape and reuses the shared typed projection
    (records_for_stream). Oracle = the parquet read whole: equality
    proves the Singer framing loses nothing.

    Scale shape: both directions are narrow JVM projections over the
    input's existing partitioning — no shuffle, no per-record Python
    (the reference's adapter is a single-process Python loop)."""
    import json as _json
    import tempfile

    from pyspark.sql import types as T

    from airbyte_integrations_spark.sources.airbyte_wire import (
        records_for_stream,
    )
    from airbyte_integrations_spark.sources.singer import (
        read_singer_messages,
    )

    tune_session(spark)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "lang", "n_chars"
    )
    out = os.path.join(tempfile.mkdtemp(prefix="singer_tap_"), "msgs")
    docs.select(
        F.to_json(
            F.struct(
                F.lit("RECORD").alias("type"),
                F.lit("documents").alias("stream"),
                F.struct("doc_id", "lang", "n_chars").alias("record"),
            )
        ).alias("value")
    ).write.text(out)
    # the tap's framing messages (metadata-sized, appended driver-side:
    # SCHEMA before records in spirit, STATE after — the adapter drops
    # SCHEMA/ACTIVATE_VERSION and routes STATE regardless of position)
    with open(os.path.join(out, "zz_framing.jsonl"), "w") as fh:
        for m in (
            {"type": "SCHEMA", "stream": "documents",
             "schema": {"properties": {"doc_id": {"type": "integer"}}},
             "key_properties": ["doc_id"]},
            {"type": "ACTIVATE_VERSION", "stream": "documents", "version": 1},
            {"type": "STATE",
             "value": {"bookmarks": {"documents": {"doc_id": -1}}}},
        ):
            fh.write(_json.dumps(m) + "\n")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    msgs = read_singer_messages(
        spark, out, default_emitted_at_millis=1_600_000_000_000
    )
    back = records_for_stream(msgs, "documents", schema)
    return back.select("doc_id", "lang", "n_chars").localCheckpoint(eager=True)


O_SINGER_TAP_READ = """
SELECT doc_id, lang, n_chars FROM documents
"""


def q_warc_read_responses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC archive ingest (sources/warc.py — Common Crawl's container
    format, ISO 28500) value-oracled against the documents table: every
    document rendered as an HTTP response record across 4 multi-member
    .warc.gz archives (per-record gzip members, Common Crawl's layout;
    fixture built driver-side like the live HTTP fixtures — the
    distributed surface under test is the READ), parsed back with one
    binaryFile scan + Arrow mapInPandas task per archive. The oracle
    pins url->doc_id linkage, byte-exact payloads (utf-8 text + octet
    length), WARC-Date parsing to the second, and the HTTP status
    split.

    Scale shape: ONE task per archive — Common Crawl is ~10^5 archives
    per monthly crawl, so file-level fan-out saturates a 1000-executor
    cluster with zero shuffle; the record-type filter runs inside the
    splitter so request/metadata records never materialize."""
    import tempfile

    from airbyte_integrations_spark.sources.warc import read_warc, write_warc

    tune_session(spark)
    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id", "text")
        .collect()
    )
    out = tempfile.mkdtemp(prefix="warc_entry_")
    n_files = 4
    shards: list[list[dict]] = [[] for _ in range(n_files)]
    for r in docs:
        shards[r["doc_id"] % n_files].append(
            {
                "url": f"https://example.org/doc/{r['doc_id']}",
                "ts_iso": f"2024-01-01T00:00:{r['doc_id'] % 60:02d}Z",
                "payload": (r["text"] or "").encode("utf-8"),
            }
        )
    for i, recs in enumerate(shards):
        write_warc(recs, os.path.join(out, f"crawl-{i}.warc.gz"))
    pages = read_warc(spark, os.path.join(out, "*.warc.gz"))
    return pages.select(
        F.regexp_extract("url", r"/doc/(\d+)$", 1).cast("long").alias("doc_id"),
        F.decode("payload", "UTF-8").alias("text"),
        F.length("payload").alias("n_bytes"),
        F.col("http_status"),
        _us("warc_ts").alias("warc_us"),
    ).localCheckpoint(eager=True)


O_WARC_READ_RESPONSES = """
SELECT
  doc_id,
  text,
  octet_length(encode(text)) AS n_bytes,
  200 AS http_status,
  epoch_us(TIMESTAMP '2024-01-01 00:00:00'
           + (doc_id % 60) * INTERVAL 1 SECOND) AS warc_us
FROM documents
"""


def q_url_file_csv_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL single-file source (source-file HTTPS provider,
    connectors/source-file/source_file/client.py:32-142) value-oracled
    against the table read whole: the documents table rendered as a
    CSV file behind a live local HTTP fixture, fetched by an executor
    task (sources/url_file.py) and parsed JVM-side with from_csv —
    the reference downloads AND parses the same file with pandas on
    its single worker; here only the download is Python.

    Scale shape: one task per URL (a multi-file config fans out), the
    line parse is codegen'd Catalyst, and the declared schema keeps
    the parse single-pass — no driver-side inference read."""
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    import pyarrow.parquet as _pq
    from pyspark.sql import types as T

    from airbyte_integrations_spark.sources.url_file import read_url_files

    tune_session(spark)
    tbl = _pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "n_chars"],
    )
    lines = ["doc_id,lang,n_chars"] + [
        f"{r['doc_id']},{r['lang']},{r['n_chars']}" for r in tbl.to_pylist()
    ]
    body = ("\n".join(lines) + "\n").encode()

    class _H(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), _H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("lang", T.StringType()),
                T.StructField("n_chars", T.LongType()),
            ]
        )
        out = read_url_files(
            spark,
            f"http://127.0.0.1:{srv.server_port}/documents.csv",
            "csv",
            schema,
        )
        return out.select("doc_id", "lang", "n_chars").localCheckpoint(
            eager=True
        )
    finally:
        srv.shutdown()


def q_cdc_raw_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-tier raw->normalized lifecycle (normalization.py): the CDC
    log lands in the `_airbyte_raw_*` tier as `(_airbyte_ab_id,
    _airbyte_emitted_at, _airbyte_data JSON)` rows
    (JavaBaseConstants.java:19-21) across two epoch commits, and
    normalization builds the typed final table FROM raw — the second
    run incrementally, reading ONLY the data files added between raw
    snapshots (the stream_processor.py:848-898 `new_data` reduction as
    an Iceberg-style file-level snapshot diff). Oracle = the plain
    winner rule over the same events: equality proves the
    to_json/from_json raw roundtrip, the typed projection, and the
    file-diff increment all preserve exact values.

    Scale shape: raw append is a narrow bucketed write; the typed
    projection is ONE codegen'd from_json per row (the reference
    re-parses the blob per column); the increment scans O(new files),
    never the raw history; the apply is the same map-side-combining
    winner MERGE as the direct CDC path."""
    import tempfile

    from airbyte_integrations_spark.config import SyncConfig
    from airbyte_integrations_spark.lakehouse.table import LakeTable
    from airbyte_integrations_spark.normalization import (
        normalize_into,
        write_raw,
    )

    tune_session(spark)
    ce = change_events(spark, sf_dir)
    hi = int(ce.agg(F.max("_ab_cdc_lsn")).collect()[0][0])
    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    base = tempfile.mkdtemp(prefix="rawnorm_entry_", dir=scratch)
    raw = LakeTable(spark, base + "/raw")
    final = LakeTable(spark, base + "/final")
    ddl = (
        "url string, _ab_cdc_lsn bigint, _ab_cdc_updated_at timestamp_ntz, "
        "_ab_cdc_deleted_at timestamp_ntz, event_type string, value_m bigint"
    )
    cfg = SyncConfig(stream="pages", n_buckets=8)
    mid = hi // 2
    write_raw(raw, ce.filter(F.col("_ab_cdc_lsn") <= mid), "pages", epoch=1)
    normalize_into(raw, final, cfg, ddl)
    write_raw(raw, ce.filter(F.col("_ab_cdc_lsn") > mid), "pages", epoch=2)
    normalize_into(raw, final, cfg, ddl)  # file-diff increment
    assert normalize_into(raw, final, cfg, ddl) is None  # converged
    return final.read_live().select(
        "url",
        "_ab_cdc_lsn",
        _us("_ab_cdc_updated_at").alias("updated_us"),
        "event_type",
        "value_m",
    )


O_CDC_RAW_NORMALIZE = f"""
WITH {CE_SQL}, {WINNERS_SQL}
SELECT url, _ab_cdc_lsn, epoch_us(_ab_cdc_updated_at) AS updated_us,
       event_type, value_m
FROM w WHERE rn = 1 AND _ab_cdc_deleted_at IS NULL
"""


O_URL_FILE_CSV_READ = """
SELECT doc_id, lang, n_chars FROM documents
"""


def q_emb_index_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-index destination lifecycle (destinations/vector_index.py
    — the Airbyte vector-DB destination family shape): two CDC epochs
    of embedding records (insert / reversed-embedding update /
    tombstone delete) upserted through the engine's MERGE apply into
    the IVF-bucketed index, codebook trained on the FIRST batch and
    frozen, live state published as the cell-partitioned serving
    snapshot, then a fixed 200-query probe (nprobe=2, top-3 cosine).

    Oracled end to end: DuckDB recomputes the final vector set from
    the update/delete rules, the frozen batch-1 codebook, the cell
    assignment, and the probed top-k — so upsert semantics, codebook
    freezing, publish, and the serve dataflow all sit under one value
    hash. Scale shape: upserts are O(batch) MERGEs, cell assignment is
    the zero-Exchange literal-codebook projection, serving scans prune
    to probed cells, k and |Q| are constants."""
    import tempfile

    tune_session(spark)
    from airbyte_integrations_spark.destinations.vector_index import VectorIndex

    emb = load(spark, sf_dir, "embeddings")
    nulls = [
        F.lit(None).cast("timestamp").alias("_ab_cdc_updated_at"),
        F.lit(None).cast("timestamp").alias("_airbyte_emitted_at"),
    ]

    def rec(df, lsn, deleted=False, flip=False):
        e = F.reverse(F.col("embedding")) if flip else F.col("embedding")
        d = (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            if deleted
            else F.lit(None).cast("timestamp")
        )
        return df.select(
            "vec_id",
            e.alias("embedding"),
            lsn.alias("_ab_cdc_lsn"),
            *nulls,
            F.md5(lsn.cast("string")).alias("_airbyte_ab_id"),
            d.alias("_ab_cdc_deleted_at"),
        )

    batch1 = rec(emb.filter(F.col("vec_id") % 3 != 2), F.col("vec_id") + 1)
    batch2 = (
        rec(emb.filter(F.col("vec_id") % 3 == 2), F.col("vec_id") + 1)
        .unionByName(
            rec(
                emb.filter(F.col("vec_id") % 5 == 0),
                F.col("vec_id") + 1_000_000,
                flip=True,
            )
        )
        .unionByName(
            rec(
                emb.filter(F.col("vec_id") % 11 == 7),
                F.col("vec_id") + 2_000_000,
                deleted=True,
            )
        )
    )
    idx = VectorIndex(spark, tempfile.mkdtemp(prefix="vidx_q_"))
    idx.upsert(batch1, epoch=0, k=16)
    idx.upsert(batch2, epoch=1)
    idx.publish()
    queries = (
        emb.withColumn(
            "_qkey", F.md5(F.col("vec_id").cast("string").cast("binary"))
        )
        .orderBy(F.col("_qkey").asc(), F.col("vec_id").asc())
        .limit(200)
        .select(F.col("vec_id").alias("qid"), "embedding")
    )
    return idx.query(queries, k=3, nprobe=2)


O_EMB_INDEX_LIFECYCLE = """
WITH final AS (
  SELECT vec_id,
         CASE WHEN vec_id % 5 = 0
              THEN list_reverse(list_transform(embedding, x -> CAST(x AS DOUBLE)))
              ELSE list_transform(embedding, x -> CAST(x AS DOUBLE)) END AS v
  FROM embeddings WHERE vec_id % 11 <> 7
),
fn AS (
  SELECT vec_id, v,
         sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS nrm
  FROM final
),
b1 AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings WHERE vec_id % 3 <> 2
),
b1n AS (
  SELECT vec_id, v,
         sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS nrm
  FROM b1
),
cents AS (
  SELECT vec_id AS cent_id, v AS cv, nrm AS cn FROM b1n
  ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC LIMIT 16
),
scored AS (
  SELECT f.vec_id, f.v, f.nrm, c.cent_id,
         CAST(floor(list_reduce(list_transform(range(1, len(f.v) + 1),
                  i -> f.v[i] * c.cv[i]), (a, b) -> a + b)
               / (f.nrm * c.cn) * 1000) AS BIGINT) AS csim
  FROM fn f CROSS JOIN cents c
),
assign AS (
  SELECT vec_id, v, nrm, cent_id AS cell FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY csim DESC, cent_id ASC) AS r
    FROM scored
  ) WHERE r = 1
),
q AS (
  SELECT vec_id AS qid, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
  FROM embeddings
  ORDER BY md5(CAST(vec_id AS VARCHAR)) ASC, vec_id ASC LIMIT 200
),
qn AS (
  SELECT qid, qv,
         sqrt(list_reduce(list_transform(qv, x -> x * x), (a, b) -> a + b)) AS qnrm
  FROM q
),
qscored AS (
  SELECT qn.qid, qn.qv, qn.qnrm, c.cent_id,
         CAST(floor(list_reduce(list_transform(range(1, len(qn.qv) + 1),
                  i -> qn.qv[i] * c.cv[i]), (a, b) -> a + b)
               / (qn.qnrm * c.cn) * 1000) AS BIGINT) AS csim
  FROM qn CROSS JOIN cents c
),
probes AS (
  SELECT qid, qv, qnrm, cent_id AS cell FROM (
    SELECT *, row_number() OVER (PARTITION BY qid
                                 ORDER BY csim DESC, cent_id ASC) AS r
    FROM qscored
  ) WHERE r <= 2
),
pairs AS (
  SELECT DISTINCT p.qid, a.vec_id,
         CAST(floor(list_reduce(list_transform(range(1, len(p.qv) + 1),
                  i -> p.qv[i] * a.v[i]), (x, y) -> x + y)
               / (p.qnrm * a.nrm) * 1000) AS BIGINT) AS sim
  FROM probes p JOIN assign a USING (cell)
),
ranked AS (
  SELECT qid, vec_id, sim,
         row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id ASC) AS rank
  FROM pairs
)
SELECT qid, vec_id, sim, rank FROM ranked WHERE rank <= 3
"""


def q_pipeline_crawl_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end crawl-refresh -> training-corpus composition — the
    north-star sentence as ONE declarative plan: CDC change events over
    web pages (html payload) -> per-url winner via the associative
    max-struct aggregation (tombstones dropped) -> REAL html->text
    extraction (functions/extract.py Arrow pandas UDF, run on winners
    only — never on superseded versions) -> quality gates (token count
    band) -> corpus-wide exact content dedup keyed on the text
    fingerprint (min-url canonical, duplicate multiplicity kept for
    mixing weights) -> deterministic md5-prefix shard assignment ->
    per-shard accounting with a 60-bit xor content checksum.

    The oracle cannot run the extraction UDF, so the html is
    synthesized IN the query from change-event fields by a fixed
    template (script+style blocks, tags, an &amp; entity) and the
    oracle recomputes the expected extracted text directly from those
    fields — any deviation in the UDF's strip/unescape/collapse rules
    breaks the value hash, which makes this the driver-level pin of
    the input_hint's byte-identical-extraction contract.

    Scale shape: winner selection is one map-side-combining hash agg
    (hot urls emit O(n_mappers) partial rows); extraction is Arrow-
    batched over winners only; the dedup is a second hash agg on the
    fingerprint (uniform md5 keys — no skew); shard stats fold with
    commutative count/sum/xor. Two Exchanges end to end, no window, no
    sort, nothing driver-side."""
    tune_session(spark)
    from airbyte_integrations_spark.functions.extract import extract_text

    ev = load(spark, sf_dir, "events")
    ce = ev.select(
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
        F.encode(
            F.concat(
                F.lit(
                    '<html><head><script type="text/javascript">var t = 1 < 2;'
                    "</script><style>p { color: #333; }</style></head><body><h1>"
                ),
                F.col("event_type"),
                F.lit("</h1><p>"),
                F.col("props"),
                F.lit("</p><p>"),
                F.expr("repeat('lorem ', CAST(floor(value * 1000) AS BIGINT) % 7)"),
                F.lit("</p><p>quality &amp; provenance</p></body></html>"),
            ),
            "utf-8",
        ).alias("html"),
    )
    winners = winner_agg(ce, drop_tombstones=True)
    pages = winners.withColumn("text", extract_text(F.col("html")))
    n_tokens = F.size(F.split(F.col("text"), " "))
    gated = pages.filter((n_tokens >= 8) & (n_tokens <= 64))
    canon = (
        gated.select(
            "url",
            F.md5(F.col("text")).alias("fingerprint"),
            F.length(F.col("text")).alias("n_chars"),
        )
        .groupBy("fingerprint")
        .agg(
            F.min("url").alias("canonical_url"),
            F.count(F.lit(1)).alias("n_dupes"),
            F.max("n_chars").alias("n_chars"),
        )
    )
    shard = (F.conv(F.substring(F.col("fingerprint"), 1, 4), 16, 10).cast("long") % 8).alias("shard")
    rh = F.conv(
        F.substring(
            F.md5(F.concat_ws("~", F.col("fingerprint"), F.col("canonical_url"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    return (
        canon.select(shard, "n_dupes", "n_chars", rh.alias("rh"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_dupes").alias("n_pages"),
            F.sum("n_chars").alias("sum_chars"),
            F.bit_xor("rh").alias("xor_content"),
        )
    )


O_PIPELINE_CRAWL_CORPUS = f"""
WITH ce AS (
  SELECT
    'https://site-' || CAST(user_id % 97 AS VARCHAR) || '.example/page/'
      || CAST(user_id * 13 + event_id % 13 AS VARCHAR) AS url,
    event_id + 1 AS _ab_cdc_lsn,
    ts AS _ab_cdc_updated_at,
    CASE WHEN event_id % 17 = 3 THEN ts END AS _ab_cdc_deleted_at,
    md5(CAST(event_id AS VARCHAR)) AS _airbyte_ab_id,
    ts + INTERVAL 2 SECOND AS _airbyte_emitted_at,
    trim(regexp_replace(
      event_type || ' ' || props || ' '
        || repeat('lorem ', CAST(floor(value * 1000) AS BIGINT) % 7)
        || ' quality & provenance',
      '\\s+', ' ', 'g')) AS text
  FROM events
), {WINNERS_SQL},
pages AS (
  SELECT url, text FROM w WHERE rn = 1 AND _ab_cdc_deleted_at IS NULL
),
gated AS (
  SELECT url, md5(text) AS fingerprint, length(text) AS n_chars
  FROM pages
  WHERE len(string_split(text, ' ')) BETWEEN 8 AND 64
),
canon AS (
  SELECT fingerprint, min(url) AS canonical_url, count(*) AS n_dupes,
         max(n_chars) AS n_chars
  FROM gated GROUP BY 1
)
SELECT ('0x' || substr(fingerprint, 1, 4))::BIGINT % 8 AS shard,
       count(*) AS n_docs,
       CAST(sum(n_dupes) AS BIGINT) AS n_pages,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       bit_xor(('0x' || substr(md5(fingerprint || '~' || canonical_url), 1, 15))::BIGINT)
         AS xor_content
FROM canon GROUP BY 1
"""


def q_docs_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020 §3.3): score
    every document with the corpus-trained char-trigram LM proxy
    (docs_trigram_lm_score's exact-integer avg_bits_pm — higher = more
    natural text), then split EACH LANGUAGE into head/middle/tail at
    the exact tertile edges of the score distribution and report the
    per-(lang, bucket) doc/char accounting a curation run keeps.

    Exactness: tertile edges use the same rank-at-ceil(q*n) rule as
    docs_length_quantiles (value at rank ceil(n/3) / ceil(2n/3) under
    (score ASC, doc_id ASC)); binning compares VALUES against the two
    edges, so rank ties cannot flip a bucket between engines.

    Scale shape: trigram scoring = two map-side-combining hash aggs +
    one trigram-keyed join (the LM table); edge computation is one
    lang-keyed Exchange shared by both windows; the edges table is
    n_langs rows -> broadcast back onto the scored corpus; final
    rollup is one hash agg over (lang, bucket). The corpus is never
    globally sorted."""
    tune_session(spark)
    docs = _spread(load(spark, sf_dir, "documents"))
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    base = docs.select("doc_id", "lang", "n_chars", norm.alias("nt")).filter(
        F.length("nt") >= 3
    )
    tri = base.select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(1, length(nt) - 2), i -> substring(nt, i, 3))")
        ).alias("tg"),
    )
    model = tri.groupBy("tg").agg(F.count(F.lit(1)).alias("cnt"))
    bits = (F.length(F.bin(F.col("cnt"))) - 1).cast("long")
    scored = (
        tri.join(model, "tg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.sum(bits).alias("sum_bits"),
        )
        .select(
            "doc_id",
            F.floor(F.col("sum_bits") * 1000 / F.col("n_trigrams"))
            .cast("long")
            .alias("score_pm"),
        )
        .join(base.select("doc_id", "lang", "n_chars"), "doc_id")
    )
    wo = Window.partitionBy("lang").orderBy(
        F.col("score_pm").asc(), F.col("doc_id").asc()
    )
    wn = Window.partitionBy("lang")
    r = scored.select(
        "lang",
        "score_pm",
        F.row_number().over(wo).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )

    def pick(q_num: int, q_den: int) -> F.Column:
        target = F.ceil(F.col("n") * q_num / q_den)
        return F.max(F.when(F.col("rn") == target, F.col("score_pm")))

    edges = r.groupBy("lang").agg(
        pick(1, 3).alias("e1"), pick(2, 3).alias("e2")
    )
    binned = scored.join(F.broadcast(edges), "lang").select(
        "lang",
        "n_chars",
        "score_pm",
        F.when(F.col("score_pm") <= F.col("e1"), F.lit("tail"))
        .when(F.col("score_pm") <= F.col("e2"), F.lit("middle"))
        .otherwise(F.lit("head"))
        .alias("bucket"),
    )
    return binned.groupBy("lang", "bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.min("score_pm").alias("min_score_pm"),
        F.max("score_pm").alias("max_score_pm"),
    )


O_DOCS_CCNET_BUCKETS = r"""
WITH base AS (
  SELECT doc_id, lang, n_chars,
         trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nt
  FROM documents
),
b AS (SELECT * FROM base WHERE len(nt) >= 3),
tri AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(nt) - 1), i -> substr(nt, i, 3))) AS tg
  FROM b
),
model AS (SELECT tg, count(*) AS cnt FROM tri GROUP BY tg),
scored AS (
  SELECT t.doc_id,
         CAST(floor(SUM(CAST(length(bin(m.cnt)) - 1 AS BIGINT)) * 1000
                    / count(*)) AS BIGINT) AS score_pm
  FROM tri t JOIN model m ON t.tg = m.tg
  GROUP BY t.doc_id
),
sc AS (
  SELECT s.doc_id, s.score_pm, b.lang, b.n_chars
  FROM scored s JOIN b USING (doc_id)
),
r AS (
  SELECT lang, score_pm,
         row_number() OVER (PARTITION BY lang ORDER BY score_pm ASC, doc_id ASC) AS rn,
         count(*) OVER (PARTITION BY lang) AS n
  FROM sc
),
edges AS (
  SELECT lang,
         max(CASE WHEN rn = CAST(ceil(n * 1.0 / 3) AS BIGINT) THEN score_pm END) AS e1,
         max(CASE WHEN rn = CAST(ceil(n * 2.0 / 3) AS BIGINT) THEN score_pm END) AS e2
  FROM r GROUP BY 1
)
SELECT sc.lang,
       CASE WHEN score_pm <= e1 THEN 'tail'
            WHEN score_pm <= e2 THEN 'middle'
            ELSE 'head' END AS bucket,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       min(score_pm) AS min_score_pm,
       max(score_pm) AS max_score_pm
FROM sc JOIN edges USING (lang)
GROUP BY 1, 2
"""


def q_cdc_debezium_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debezium envelope round-trip (sources/debezium.py — the
    reference's per-event Jackson conversion, DebeziumEventUtils
    .java:22-65 + the lsn metadata injector, re-expressed as ONE
    to_json render and ONE from_json parse, both executor-side
    codegen). Every change event is serialized to the raw engine
    envelope (after-image upserts, before-image deletes, micro-exact
    source.ts_us) and decoded back; the oracle computes the same
    event-level projection straight from the log, so value equality
    proves the envelope codec is lossless for payload, position,
    transaction stamp, tombstone rule, and op mapping."""
    from airbyte_integrations_spark.sources.debezium import (
        emit_debezium,
        parse_debezium,
    )

    tune_session(spark)
    ce = change_events(spark, sf_dir)
    lines = emit_debezium(ce, ["url", "event_type", "value_m"])
    parsed = parse_debezium(
        lines, "url string, event_type string, value_m bigint"
    )
    return parsed.select(
        "url",
        "_ab_cdc_lsn",
        F.col("_op").alias("op"),
        _us("_ab_cdc_updated_at").alias("updated_us"),
        _us("_ab_cdc_deleted_at").alias("deleted_us"),
        "event_type",
        "value_m",
    )


O_CDC_DEBEZIUM_ENVELOPE = f"""
WITH {CE_SQL}
SELECT url, _ab_cdc_lsn,
       CASE WHEN _ab_cdc_deleted_at IS NOT NULL THEN 'd' ELSE 'u' END AS op,
       epoch_us(_ab_cdc_updated_at) AS updated_us,
       epoch_us(_ab_cdc_deleted_at) AS deleted_us,
       event_type, value_m
FROM ce
"""


def q_cdc_mysql_binlog_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MySQL-dialect Debezium decode: composite (binlog file, pos)
    positions folded into the engine's one monotone order
    (sources/debezium.py mysql_binlog_lsn — the reference's
    file-name-first-then-offset compare, MySqlCdcTargetPosition
    .java:71-80, and its _ab_cdc_log_file/_ab_cdc_log_pos injector
    columns, MySqlCdcConnectorMetadataInjector.java:17-20). The log is
    rendered with binlog_file_size=1000, forcing thousands of file
    rollovers at sf0.01+, then replayed to the final latest-wins state
    on the FOLDED position; the oracle picks winners by the source lsn
    directly and re-derives (file, pos) arithmetically, so value
    equality proves the fold is order-isomorphic across every rollover
    boundary. Scale shape: decode is one from_json codegen projection;
    winner selection is the same map-side-combining agg as the
    headline path."""
    from airbyte_integrations_spark.sources.debezium import (
        emit_debezium,
        parse_debezium,
    )

    tune_session(spark)
    ce = change_events(spark, sf_dir)
    lines = emit_debezium(
        ce,
        ["url", "event_type", "value_m"],
        dialect="mysql",
        binlog_file_size=1000,
    )
    parsed = parse_debezium(
        lines, "url string, event_type string, value_m bigint", dialect="mysql"
    )
    w = winner_window(parsed, drop_tombstones=True)
    return w.select(
        "url",
        F.col("_ab_cdc_log_file").alias("log_file"),
        F.col("_ab_cdc_log_pos").alias("log_pos"),
        _us("_ab_cdc_updated_at").alias("updated_us"),
        "event_type",
        "value_m",
    )


O_CDC_MYSQL_BINLOG_ORDER = f"""
WITH {CE_SQL}, {WINNERS_SQL}
SELECT url,
       printf('mysql-bin.%06d', _ab_cdc_lsn // 1000) AS log_file,
       _ab_cdc_lsn % 1000 AS log_pos,
       epoch_us(_ab_cdc_updated_at) AS updated_us,
       event_type, value_m
FROM w WHERE rn = 1 AND _ab_cdc_deleted_at IS NULL
"""


def q_cdc_mssql_lsn_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-Server-dialect Debezium decode: 10-byte Lsn positions as
    colon-separated fixed-width hex (sources/debezium.py mssql_lsn —
    the reference's Lsn.compareTo target-position rule,
    MssqlCdcTargetPosition.java:32-47, with the commit hex riding as
    the reference's string _ab_cdc_lsn injector value,
    MssqlCdcConnectorMetadataInjector.java:17-18). Events are grouped
    into transactions (commit = next multiple of 7), rendered to the
    envelope wire, decoded back through the hex fold, and replayed to
    the final latest-wins state on the folded position; the oracle
    picks winners by the source lsn directly and re-derives the commit
    hex arithmetically, so value equality proves the fold is
    order-isomorphic and the commit/change split survives the round
    trip. Scale shape: one from_json codegen projection (split + conv
    arithmetic inline), map-side-combining winner agg."""
    from airbyte_integrations_spark.sources.debezium import (
        emit_debezium,
        parse_debezium,
    )

    tune_session(spark)
    ce = change_events(spark, sf_dir).withColumn(
        "commit", (F.floor(F.col("_ab_cdc_lsn") / 7) + 1) * 7
    )
    lines = emit_debezium(
        ce,
        ["url", "event_type", "value_m"],
        dialect="mssql",
        commit_lsn_col="commit",
    )
    parsed = parse_debezium(
        lines, "url string, event_type string, value_m bigint", dialect="mssql"
    )
    w = winner_window(parsed, drop_tombstones=True)
    return w.select(
        "url",
        F.col("_ab_cdc_commit_lsn").alias("commit_lsn"),
        F.col("_ab_cdc_event_serial_no").alias("serial_no"),
        _us("_ab_cdc_updated_at").alias("updated_us"),
        "event_type",
        "value_m",
    )


O_CDC_MSSQL_LSN_ORDER = f"""
WITH {CE_SQL}, {WINNERS_SQL}
SELECT url,
       printf('%08x:%08x:%04x',
              ((_ab_cdc_lsn // 7 + 1) * 7) >> 36,
              (((_ab_cdc_lsn // 7 + 1) * 7) >> 10) % (1 << 26),
              ((_ab_cdc_lsn // 7 + 1) * 7) % 1024) AS commit_lsn,
       CAST(1 AS BIGINT) AS serial_no,
       epoch_us(_ab_cdc_updated_at) AS updated_us,
       event_type, value_m
FROM w WHERE rn = 1 AND _ab_cdc_deleted_at IS NULL
"""


def q_mongo_schemaless_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schemaless-collection discovery + typed read (sources/mongo.py —
    source-mongodb-v2's sampled field/type discovery, MongoUtils
    .getUniqueFields:202-214, with the mixed-type `_aibyte_transform`
    string rule :224-226 and read-side stringification :138-147).
    Every documents row is rendered as a JSON document whose `size`
    field alternates int/string by parity (a genuinely mixed-typed
    field), `extra` appears only on doc_id%7==0 (field-union
    semantics), `meta` is a nested object and `tags` a string array.
    Discovery runs as one distributed variant_explode aggregation per
    nesting level; the read is ONE codegen projection of typed
    try_variant_get extractions — zero per-row Python. The oracle
    recomputes every output straight from `documents`, so value
    equality proves union, mixed-rule naming, stringification, nested
    and array typing, and null-for-missing all at once."""
    import tempfile

    from airbyte_integrations_spark.sources.mongo import (
        discover_collection,
        read_collection,
    )

    tune_session(spark)
    docs = load(spark, sf_dir, "documents")
    stable = lambda size_col: F.to_json(  # noqa: E731
        F.struct(
            F.concat(F.lit("doc-"), F.col("doc_id").cast("string")).alias("_id"),
            F.col("lang").alias("lang"),
            F.struct(
                F.col("n_chars").alias("chars"), F.col("source").alias("src")
            ).alias("meta"),
            F.when(F.col("doc_id") % 7 == 0, F.col("lang")).alias("extra"),
            F.array(F.col("lang"), F.col("source")).alias("tags"),
            size_col.alias("size"),
            F.col("doc_id").alias("seq"),
        )
    )
    lines = docs.select(
        F.when(
            F.col("doc_id") % 2 == 0, stable(F.col("n_chars"))
        ).otherwise(stable(F.col("n_chars").cast("string"))).alias("value")
    )
    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    path = tempfile.mkdtemp(prefix="mongo_entry_", dir=scratch) + "/coll"
    lines.write.text(path)
    fields = discover_collection(spark, path)
    out = read_collection(spark, path, fields)
    return out.select(
        "_id",
        "lang",
        F.col("size_aibyte_transform").alias("size_str"),
        F.col("meta.chars").alias("meta_chars"),
        F.col("meta.src").alias("meta_src"),
        "extra",
        F.element_at("tags", 1).alias("tag0"),
        F.size("tags").alias("n_tags"),
        "seq",
    )


def q_mongo_change_stream_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native change-stream CDC replay (sources/mongo.py): the server
    wire with opaque resume tokens, BsonTimestamp (t, i) positions
    folded as t*2^32+i (BsonTimestamp's own comparable value), and
    KEY-ONLY deletes (no before image — the tombstone reaches the
    winner rule with null payload and the apply deletes by key alone).
    The full log is rendered to change-stream JSONL and decoded back in
    one from_json projection, then replayed to the final latest-wins
    state; the oracle recomputes winners straight from the log and
    re-derives each winner's resume token arithmetically, so value
    equality proves the fold, the key-only tombstone rule, and token
    plumbing end-to-end."""
    import json as _json

    from airbyte_integrations_spark.sources.mongo import (
        discover_collection,
        emit_change_stream,
        parse_change_stream,
    )

    tune_session(spark)
    ce = change_events(spark, sf_dir)
    lines = emit_change_stream(ce, ["event_type", "value_m"])
    sample = spark.createDataFrame(
        [(_json.dumps({"_id": "u", "event_type": "t", "value_m": 1}),)],
        "value string",
    )
    fields = discover_collection(spark, sample)
    parsed = parse_change_stream(lines, fields).withColumnRenamed("_id", "url")
    w = winner_window(parsed, drop_tombstones=True)
    return w.select(
        "url",
        "_ab_cdc_lsn",
        "event_type",
        "value_m",
        F.col("_resume_token").alias("resume_token"),
    )


O_MONGO_CHANGE_STREAM_READ = f"""
WITH {CE_SQL}, {WINNERS_SQL}
SELECT url, _ab_cdc_lsn, event_type, value_m,
       printf('%016X', _ab_cdc_lsn) AS resume_token
FROM w WHERE rn = 1 AND _ab_cdc_deleted_at IS NULL
"""


def q_cdc_publish_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outbound replication (destinations/cdf_publish): the lake table
    publishes its OWN row-level changes to a partitioned log —
    baseline snapshot at the first publish, changed-rows-only deltas
    after (table.changes: metadata-pruned bucket diff), exactly-once
    per version range via the destination's idempotent-producer epoch
    log — and a downstream consumer tails that feed back into a second
    lake table. The log is split at half its lsn range: ingest+publish
    (baseline), ingest the rest, publish (delta), consume the whole
    topic into table B. Returned: table B's live state with each key's
    feed round (1 = arrived in the baseline, 2 = republished in the
    delta); the oracle recomputes both straight from the log — value
    equality proves the diff emits exactly the keys whose live image
    changed, tombstones delete downstream, and the two-hop replication
    converges to the direct winner replay. Scale shape: the delta
    publish reads only buckets whose file lists changed; the feed
    append is one per-partition-sequence job."""
    import tempfile

    from airbyte_integrations_spark.config import SyncConfig
    from airbyte_integrations_spark.destinations.cdf_publish import (
        consume_published,
        publish_changes,
    )
    from airbyte_integrations_spark.destinations.partitioned_log import (
        read_topic,
        resolve_topic,
    )
    from airbyte_integrations_spark.lakehouse.table import LakeTable
    from airbyte_integrations_spark.sources.partitioned_log import (
        sync_partitioned_log,
    )
    from airbyte_integrations_spark.streaming.microbatch import run_sync

    tune_session(spark)
    ce = change_events(spark, sf_dir)
    hi = int(ce.agg(F.max("_ab_cdc_lsn")).collect()[0][0])
    w = hi // 2
    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    root = tempfile.mkdtemp(prefix="pub_entry_", dir=scratch)
    a = LakeTable(spark, root + "/a")
    log = root + "/feed"
    cfg = SyncConfig(stream="pages", n_buckets=8)
    run_sync(
        spark, ce.filter(F.col("_ab_cdc_lsn") <= w), a, cfg,
        max_events_per_epoch=max(w // 2, 1),
        extract_missing_text=False, compact_threshold=None,
    )
    publish_changes(spark, a, log, "pages")
    run_sync(
        spark, ce, a, cfg,
        max_events_per_epoch=max(hi // 2, 1),
        extract_missing_text=False, compact_threshold=None,
    )
    publish_changes(spark, a, log, "pages")
    feed = read_topic(
        spark, log, resolve_topic("{namespace}.{stream}", None, "pages")
    )
    b = LakeTable(spark, root + "/b")
    sync_partitioned_log(
        spark, consume_published(feed), b,
        SyncConfig(stream="pages", n_buckets=8, secondary_order=()),
        compact_threshold=None,
    )
    # feed positions are publication versions (2 distinct values here);
    # a scalar min + projection beats a global-window rank (no
    # single-partition Window — the deciles lesson)
    v0 = int(feed.agg(F.min("_ab_cdc_lsn")).collect()[0][0])
    feed_rounds = feed.groupBy("url").agg(
        F.max(
            F.when(F.col("_ab_cdc_lsn") > F.lit(v0), 2).otherwise(1)
        ).alias("feed_round")
    )
    return (
        b.read_live()
        .select("url", "event_type", "value_m")
        .join(feed_rounds, "url")
    )


O_CDC_PUBLISH_FEED = f"""
WITH {CE_SQL}, {WINNERS_SQL},
hi AS (SELECT max(_ab_cdc_lsn) AS h FROM ce),
final_live AS (
  SELECT url, event_type, value_m FROM w
  WHERE rn = 1 AND _ab_cdc_deleted_at IS NULL
),
delta AS (
  SELECT DISTINCT url FROM ce, hi WHERE _ab_cdc_lsn > h // 2
)
SELECT f.url, f.event_type, f.value_m,
       CASE WHEN d.url IS NULL THEN 1 ELSE 2 END AS feed_round
FROM final_live f LEFT JOIN delta d ON f.url = d.url
"""


def q_mongo_db_watch_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Database-level change stream (db.watch(), sources/mongo.py
    shared_change_stream): ONE stream carries every collection's events
    and ``ns.coll`` routes them — the Mongo analogue of the multi-table
    Debezium envelope log, and what the reference's mongodb CDC
    connector tails with a single resume token per connection. Each url
    is assigned a collection by md5-prefix (engine-portable), the full
    log is rendered to db-level JSONL (per-row ns) and decoded back in
    one from_json projection with ns.coll surfacing as the routing
    column, then replayed to per-collection latest-wins state. The
    oracle recomputes the routing + winners straight from the log, so
    value equality proves ns rendering, routing, the BsonTimestamp
    fold, and key-only tombstones together. Scale shape: one decode
    projection, winner agg map-side partial; routing adds no Exchange."""
    from airbyte_integrations_spark.sources.mongo import (
        emit_change_stream,
        fields_from_schema,
        shared_change_stream,
    )

    tune_session(spark)
    ce = change_events(spark, sf_dir).withColumn(
        "coll",
        F.when(F.substring(F.md5("url"), 1, 1) < "8", "pages_a").otherwise(
            "pages_b"
        ),
    )
    lines = emit_change_stream(
        ce, ["event_type", "value_m"], collection_col="coll"
    )
    log = shared_change_stream(
        spark, lines, fields_from_schema("event_type string, value_m bigint")
    )
    # a url lives in exactly one collection, so the per-url winner rule
    # is unchanged; the routing column rides through the window
    w = winner_window(
        log.withColumnRenamed("_id", "url"), drop_tombstones=True
    )
    return w.select(
        F.col("stream").alias("collection"),
        "url",
        "_ab_cdc_lsn",
        "event_type",
        "value_m",
        F.col("_resume_token").alias("resume_token"),
    )


O_MONGO_DB_WATCH_ROUTE = f"""
WITH {CE_SQL}, {WINNERS_SQL}
SELECT CASE WHEN substr(md5(url), 1, 1) < '8'
            THEN 'pages_a' ELSE 'pages_b' END AS collection,
       url, _ab_cdc_lsn, event_type, value_m,
       printf('%016X', _ab_cdc_lsn) AS resume_token
FROM w WHERE rn = 1 AND _ab_cdc_deleted_at IS NULL
"""


def q_mongo_patch_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-image change-stream replay (sources/mongo.py
    update_description + operators/patch.py mask folds): the DEFAULT
    MongoDB update wire carries only updateDescription.updatedFields
    ($set) and removedFields ($unset) — no fullDocument — so the final
    state is a per-key per-COLUMN overlay, where an explicit $unset
    must null out an earlier value (a plain latest-non-null fold gets
    this wrong). Ops are derived deterministically from the log (first
    event per url = insert/full image; later = sparse updates with
    lsn%3 / lsn%2 field touch rules and $unset value_m on lsn%14),
    rendered to the real wire and decoded back with _w_ write masks,
    then folded in ONE mask-aware hash aggregation (map-side partial;
    hot keys cost O(n_mappers)). The oracle recomputes per-column
    last-write-after-last-delete straight from the log. Scale shape:
    one from_json decode projection + one key-grouped agg — no joins,
    no windows."""
    from airbyte_integrations_spark.operators.patch import coalesce_patches
    from airbyte_integrations_spark.sources.mongo import (
        emit_change_stream,
        fields_from_schema,
        parse_change_stream,
    )

    tune_session(spark)
    ce = change_events(spark, sf_dir)
    lsn = F.col("_ab_cdc_lsn")
    rn = F.row_number().over(
        Window.partitionBy("url").orderBy(lsn.asc())
    )
    ev = (
        ce.withColumn("rn", rn)
        .withColumn(
            "op", F.when(F.col("rn") == 1, "insert").otherwise("update")
        )
        .withColumn(
            "removed",
            F.when(
                (F.col("op") == "update") & (lsn % 14 == 0),
                F.array(F.lit("value_m")),
            ).otherwise(F.array().cast("array<string>")),
        )
        .withColumn(
            "event_type",
            F.when(
                (F.col("op") == "insert") | (lsn % 3 != 0), F.col("event_type")
            ),
        )
        .withColumn(
            "value_m",
            F.when(
                (F.col("op") == "insert")
                | ((lsn % 2 != 0) & (lsn % 14 != 0)),
                F.col("value_m"),
            ),
        )
    )
    lines = emit_change_stream(
        ev, ["event_type", "value_m"], op_col="op", removed_col="removed"
    )
    parsed = parse_change_stream(
        lines,
        fields_from_schema("event_type string, value_m bigint"),
        update_description=True,
    )
    out = coalesce_patches(
        parsed.withColumnRenamed("_id", "url"),
        patch_cols=("event_type", "value_m"),
        mask_cols=("_w_event_type", "_w_value_m"),
    )
    return out.select("url", "_ab_cdc_lsn", "event_type", "value_m")


O_MONGO_PATCH_FOLD = f"""
WITH {CE_SQL},
r AS (
  SELECT url, _ab_cdc_lsn AS lsn, event_type, value_m,
         _ab_cdc_deleted_at IS NOT NULL AS is_del,
         row_number() OVER (PARTITION BY url ORDER BY _ab_cdc_lsn) AS rn
  FROM ce
),
o AS (
  SELECT *, CASE WHEN is_del THEN 'delete'
                 WHEN rn = 1 THEN 'insert' ELSE 'update' END AS op
  FROM r
),
d AS (SELECT url, max(lsn) AS dlsn FROM o WHERE op = 'delete' GROUP BY 1),
etw AS (
  SELECT o.url, max(o.lsn) AS mlsn
  FROM o LEFT JOIN d USING (url)
  WHERE (o.op = 'insert' OR (o.op = 'update' AND o.lsn % 3 <> 0))
    AND (d.dlsn IS NULL OR o.lsn > d.dlsn)
  GROUP BY 1
),
et AS (
  SELECT w.url, o.event_type AS v
  FROM etw w JOIN o ON o.url = w.url AND o.lsn = w.mlsn
),
vmw AS (
  SELECT o.url, max(o.lsn) AS mlsn
  FROM o LEFT JOIN d USING (url)
  WHERE (o.op = 'insert'
         OR (o.op = 'update' AND (o.lsn % 2 <> 0 OR o.lsn % 14 = 0)))
    AND (d.dlsn IS NULL OR o.lsn > d.dlsn)
  GROUP BY 1
),
vm AS (
  SELECT w.url,
         CASE WHEN o.op = 'update' AND o.lsn % 14 = 0 THEN NULL
              ELSE o.value_m END AS v
  FROM vmw w JOIN o ON o.url = w.url AND o.lsn = w.mlsn
),
win AS (
  SELECT url, lsn, is_del,
         row_number() OVER (PARTITION BY url ORDER BY lsn DESC) AS rnw
  FROM o
)
SELECT w.url, w.lsn AS _ab_cdc_lsn, et.v AS event_type, vm.v AS value_m
FROM win w
LEFT JOIN et ON et.url = w.url
LEFT JOIN vm ON vm.url = w.url
WHERE w.rnw = 1 AND NOT w.is_del
"""


def q_kafka_avro_wire_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confluent wire-format topic read (sources/avro_wire.py): every
    message is 0x00 + 4-byte schema id + schemaless Avro body, and the
    topic interleaves TWO registry versions (split by lsn parity — v2
    adds a field). Decode resolves each row under its writer schema
    and projects to the reader schema (added field null on v1 rows) in
    one Arrow-batched mapInPandas pass per side; the oracle recomputes
    the same projection with a CASE, so value equality proves framing,
    binary codec, and reader/writer resolution together. Scale shape:
    decode is embarrassingly parallel per topic partition, per-id
    decoders compile once per task."""
    from airbyte_integrations_spark.sources.avro_wire import (
        read_avro_wire,
        write_avro_wire,
    )

    tune_session(spark)
    v1 = {
        "type": "record",
        "name": "change",
        "fields": [
            {"name": "url", "type": "string"},
            {"name": "_ab_cdc_lsn", "type": "long"},
            {"name": "event_type", "type": ["null", "string"], "default": None},
            {"name": "value_m", "type": ["null", "long"], "default": None},
        ],
    }
    v2 = {
        "type": "record",
        "name": "change",
        "fields": v1["fields"]
        + [{"name": "vm2", "type": ["null", "long"], "default": None}],
    }
    ce = change_events(spark, sf_dir).select(
        "url",
        "_ab_cdc_lsn",
        "event_type",
        "value_m",
        (F.col("value_m") * 2).alias("vm2"),
    )
    old = write_avro_wire(
        ce.filter(F.col("_ab_cdc_lsn") % 2 == 0).drop("vm2"), v1, 1
    )
    new = write_avro_wire(ce.filter(F.col("_ab_cdc_lsn") % 2 == 1), v2, 2)
    return read_avro_wire(old.unionByName(new), {1: v1, 2: v2})


O_KAFKA_AVRO_WIRE_READ = f"""
WITH {CE_SQL}
SELECT url, _ab_cdc_lsn, event_type, value_m,
       CASE WHEN _ab_cdc_lsn % 2 = 1 THEN value_m * 2 END AS vm2
FROM ce
"""


O_MONGO_SCHEMALESS_READ = """
SELECT 'doc-' || CAST(doc_id AS VARCHAR) AS _id,
       lang,
       CAST(n_chars AS VARCHAR) AS size_str,
       n_chars AS meta_chars,
       source AS meta_src,
       CASE WHEN doc_id % 7 = 0 THEN lang END AS extra,
       lang AS tag0,
       2 AS n_tags,
       doc_id AS seq
FROM documents
"""


def q_docs_ndv_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language vocabulary cardinality via a KMV bottom-k sketch
    (functions/sketch.py — Bar-Yossef et al. 2002), with the exact NDV
    alongside as the eval column. Scale shape: distinct (lang, hash)
    pairs collapse map-side before the shuffle; the rank<=k window
    compiles to WindowGroupLimit (map-side partial top-k per group),
    so each task forwards at most k rows per language regardless of
    corpus size — the exact-NDV column is the sf-bounded eval oracle,
    the sketch is the production path. Estimator arithmetic is
    IEEE-double with explicit floor, bit-identical cross-engine."""
    from airbyte_integrations_spark.functions.sketch import kmv_per_group

    tune_session(spark)
    docs = load(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    toks = docs.select(
        "lang",
        F.explode(
            F.regexp_extract_all(F.col("text"), F.lit(_BPE_RE), 0)
        ).alias("token"),
    )
    per = kmv_per_group(toks, "lang", "token", k=64)
    exact = toks.groupBy("lang").agg(
        F.countDistinct("token").alias("ndv_exact")
    )
    return per.join(exact, "lang").select(
        "lang", "n_seen", "ndv_est", "ndv_exact"
    )


O_DOCS_NDV_SKETCH = rf"""
WITH t AS (
  SELECT lang, unnest(regexp_extract_all(text, '{_BPE_RE}')) AS token
  FROM documents WHERE n_chars > 0
),
p AS (
  SELECT DISTINCT lang, ('0x' || substr(md5(token), 1, 15))::BIGINT AS h
  FROM t
),
r AS (
  SELECT lang, h, row_number() OVER (PARTITION BY lang ORDER BY h) AS rank
  FROM p
),
s AS (
  SELECT lang, count(*) AS n_seen,
         max(CASE WHEN rank = 64 THEN h END) AS h_k
  FROM r WHERE rank <= 64 GROUP BY lang
),
e AS (SELECT lang, count(DISTINCT token) AS ndv_exact FROM t GROUP BY lang)
SELECT s.lang, n_seen,
       CASE WHEN n_seen < 64 THEN n_seen
            ELSE CAST(floor(63 * power(2.0, 60) / h_k) AS BIGINT)
       END AS ndv_est,
       ndv_exact
FROM s JOIN e USING (lang)
"""


def q_docs_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional corpus sampling via priority sampling
    (Duffield-Lund-Thorup; functions/curation.priority_sample_key):
    every doc draws a deterministic md5-derived uniform and the
    largest-priority (= smallest u/w) 200 docs form the sample —
    longer docs proportionally likelier, unbiased subset-sum
    estimates, fully reproducible. Scale shape: a narrow projection
    plus TakeOrderedAndProject (each task forwards at most m rows; no
    global sort, no Exchange of the corpus); at 10^10 docs the only
    data movement is m rows per task to the driver-side merge —
    the same plan class as the repo's top-k family."""
    from airbyte_integrations_spark.functions.curation import (
        priority_sample_key,
    )

    tune_session(spark)
    docs = load(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    keyed = docs.select(
        "doc_id",
        "n_chars",
        priority_sample_key(F.col("doc_id"), F.col("n_chars")).alias("k"),
    )
    top = keyed.orderBy(F.col("k").asc(), F.col("doc_id").asc()).limit(200)
    w = Window.orderBy(F.col("k").asc(), F.col("doc_id").asc())
    return top.select(
        "doc_id", "n_chars", F.row_number().over(w).cast("long").alias("rank")
    )


O_DOCS_WEIGHTED_SAMPLE = """
WITH k AS (
  SELECT doc_id, n_chars,
         (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT + 1)::DOUBLE
           / n_chars AS key
  FROM documents WHERE n_chars > 0
),
top AS (SELECT * FROM k ORDER BY key ASC, doc_id ASC LIMIT 200)
SELECT doc_id, n_chars,
       row_number() OVER (ORDER BY key ASC, doc_id ASC) AS rank
FROM top
"""


def q_cdc_zorder_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-dimension file skipping via Z-order clustering
    (lakehouse/zorder.py + compact(zorder_by=...) — Iceberg
    rewrite_data_files zorder / Delta OPTIMIZE ZORDER BY): after the
    CDC replay the table is rewritten clustered on the Morton
    interleave of (value_m, _ab_cdc_lsn), making BOTH columns'
    per-file zone maps narrow; a range read on each dimension is then
    served pruned — asserted in-query (kept < total on BOTH columns,
    which a 1-D sort order cannot do for its second column; pinned in
    tests/test_zorder.py). The z key is pure codegen integer
    arithmetic and the clustering ride is per-bucket
    sortWithinPartitions — no global Exchange at any table size.
    Oracle: winners filtered to each range, unioned with a dim tag."""
    import tempfile

    from airbyte_integrations_spark.config import SyncConfig
    from airbyte_integrations_spark.lakehouse.table import LakeTable
    from airbyte_integrations_spark.streaming.microbatch import run_sync

    tune_session(spark)
    ce = change_events(spark, sf_dir)
    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    table = LakeTable(
        spark, tempfile.mkdtemp(prefix="zorder_entry_", dir=scratch) + "/t"
    )
    cfg = SyncConfig(stream="pages")
    run_sync(
        spark, ce, table, cfg,
        extract_missing_text=False, compact_threshold=None,
    )
    n_live = table.read_live().count()
    table.compact(
        zorder_by=("value_m", "_ab_cdc_lsn"),
        target_file_rows=max(n_live // (32 * 8), 8),
    )
    hi = table.read_live().agg(
        F.max("value_m").alias("vm"), F.max("_ab_cdc_lsn").alias("lm")
    ).collect()[0]
    parts = []
    for dim, top in (("value_m", int(hi["vm"])), ("_ab_cdc_lsn", int(hi["lm"]))):
        lo_b, hi_b = top // 4, top // 2
        kept, total = table.range_prune_counts(dim, lo_b, hi_b)
        assert kept < total, f"z-order did not prune on {dim} ({kept}/{total})"
        parts.append(
            table.read_range(dim, lo_b, hi_b).select(
                F.lit(dim).alias("dim"), "url", "_ab_cdc_lsn", "value_m"
            )
        )
    return parts[0].unionByName(parts[1])


O_CDC_ZORDER_READ = f"""
WITH {CE_SQL},
{WINNERS_SQL},
live AS (
  SELECT url, _ab_cdc_lsn, value_m FROM w
  WHERE rn = 1 AND _ab_cdc_deleted_at IS NULL
),
b AS (
  SELECT max(value_m) // 4 AS vlo, max(value_m) // 2 AS vhi,
         max(_ab_cdc_lsn) // 4 AS llo, max(_ab_cdc_lsn) // 2 AS lhi
  FROM live
)
SELECT 'value_m' AS dim, url, _ab_cdc_lsn, value_m
FROM live, b WHERE value_m BETWEEN vlo AND vhi
UNION ALL
SELECT '_ab_cdc_lsn' AS dim, url, _ab_cdc_lsn, value_m
FROM live, b WHERE _ab_cdc_lsn BETWEEN llo AND lhi
"""


# ------------------------------------------------- destination sinks (r5)

def q_dest_jdbc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JDBC destination staged-write lifecycle live on embedded Derby
    (destinations/jdbc.py — destination-jdbc's buffered-consumer
    lifecycle, JdbcBufferedConsumerFactory.java:119-197): the CDC log
    splits into two append_dedup syncs (tmp-table stage → one-
    transaction publish each), the second sync's winners beating the
    first's published rows through the dialect-minimal delete+insert
    publish, then the FINAL DATABASE TABLE is read back over JDBC.
    Value equality vs the plain winner rule proves staging, the
    transactional publish, cross-sync dedup, and the Spark↔SQL type
    round-trip all preserve exact values (tombstone winners ride as
    flagged rows — the destination has no tombstone concept, matching
    the reference's soft-delete handoff to normalization).

    Scale shape: Spark's JDBC writer opens one connection PER PARTITION
    writing batched inserts in parallel (the reference streams every
    record through one connection); winners reduce Spark-side
    (map-side-combining) before staging, so the publish SQL is two
    statements regardless of batch size."""
    import tempfile

    from airbyte_integrations_spark.destinations.jdbc import (
        JdbcDestination,
        JdbcDestinationConfig,
    )

    tune_session(spark)
    derby = "org.apache.derby.jdbc.EmbeddedDriver"
    ce = change_events(spark, sf_dir).select(
        "url",
        "event_type",
        "value_m",
        F.col("_ab_cdc_lsn").alias("lsn"),
        _us("_ab_cdc_updated_at").alias("updated_us"),
        F.col("_ab_cdc_deleted_at").isNotNull().cast("int").alias("is_deleted"),
    )
    hi = int(ce.agg(F.max("lsn")).collect()[0][0])  # bounded scalar
    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    db = tempfile.mkdtemp(prefix="jdbcdest_entry_", dir=scratch) + "/db"
    dest = JdbcDestination(
        spark,
        JdbcDestinationConfig(url=f"jdbc:derby:{db};create=true", driver=derby),
    )
    coltypes = "url VARCHAR(300), event_type VARCHAR(40)"
    for half in (
        ce.filter(F.col("lsn") <= hi // 2),
        ce.filter(F.col("lsn") > hi // 2),
    ):
        dest.write(
            half,
            "pages_final",
            mode="append_dedup",
            primary_key=("url",),
            cursor="lsn",
            create_table_column_types=coltypes,
        )
    return (
        spark.read.format("jdbc")
        .option("url", f"jdbc:derby:{db}")
        .option("driver", derby)
        .option("dbtable", "PAGES_FINAL")
        .load()
        .select("url", "event_type", "value_m", "lsn", "updated_us", "is_deleted")
    )


O_DEST_JDBC_ROUNDTRIP = f"""
WITH {CE_SQL}, {WINNERS_SQL}
SELECT url, event_type, value_m,
       _ab_cdc_lsn AS lsn,
       epoch_us(_ab_cdc_updated_at) AS updated_us,
       CAST(_ab_cdc_deleted_at IS NOT NULL AS INTEGER) AS is_deleted
FROM w WHERE rn = 1
"""


def q_dest_files_object_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Object-store files destination lifecycle (destinations/files.py
    — destination-s3's template-pathed sync,
    S3StorageOperations.java:69-87 path resolution, :138,197 part-id
    continuation, :240-258 overwrite cleanup by the regex-widened
    template): a decoy prior sync is laid down, an OVERWRITE sync
    cleans it via the template regex and writes gzip JSONL part files
    under the resolved object path, a second APPEND sync at the same
    sync time continues part ids without clobbering, and every written
    object is re-read back through Spark's native reader. In-query
    asserts pin the path⇄regex parity (every written path fullmatches
    object_path_regex; the decoy is physically gone; append never
    reused a part id); the oracle pins value fidelity of the
    write→move→re-read round trip.

    Scale shape: one part file per partition via Spark's native JSON
    writer (JVM, codegen) — the publish is a rename, not a rewrite."""
    import re as _re
    import tempfile
    from datetime import datetime, timezone

    from airbyte_integrations_spark.destinations.files import (
        FilesDestination,
        FilesDestinationConfig,
        object_path_regex,
    )

    tune_session(spark)
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    root = tempfile.mkdtemp(prefix="filesdest_entry_", dir=scratch)
    cfg = FilesDestinationConfig(root=root, format="jsonl", gzip=True)
    dest = FilesDestination(spark, cfg)
    ns, stream = "Crawl", "Pages Corpus"
    dt = datetime(2024, 5, 17, 3, 4, 5, 678000, tzinfo=timezone.utc)
    decoy = dest.write(
        docs.limit(10), stream, namespace=ns, mode="append",
        sync_dt=datetime(2023, 1, 2, tzinfo=timezone.utc),
    )
    w1 = dest.write(
        docs.filter(F.col("doc_id") % 2 == 0).repartition(4),
        stream, namespace=ns, mode="overwrite", sync_dt=dt,
    )
    w2 = dest.write(
        docs.filter(F.col("doc_id") % 2 == 1).repartition(4),
        stream, namespace=ns, mode="append", sync_dt=dt,
    )
    rx = _re.compile(object_path_regex(cfg.path_format, ns, stream))
    for rel in decoy + w1 + w2:
        assert rx.fullmatch(rel), f"path escapes the template regex: {rel}"
    for rel in decoy:
        assert not os.path.exists(
            os.path.join(root, rel)
        ), f"overwrite left a prior-sync object: {rel}"
    assert not (set(w1) & set(w2)), "append reused a part id"
    for rel in w1 + w2:
        assert os.path.exists(os.path.join(root, rel)), rel
    return spark.read.schema(
        "doc_id bigint, lang string, source string, n_chars bigint"
    ).json([os.path.join(root, rel) for rel in w1 + w2])


O_DEST_FILES_OBJECT_PATHS = """
SELECT doc_id, lang, source, n_chars FROM documents
"""


def q_dest_renormalize_rebuild(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full rebuild from the raw tier (normalization.py renormalize()
    — the "drop the final tables and rebuild" operation the raw tier
    exists for; the reference runs it as a full-refresh dbt build over
    `_airbyte_raw_*`, stream_processor.py:234-311): the CDC log lands
    in raw across two epoch commits, the final table builds
    INCREMENTALLY (file-diff normalization), then renormalize()
    rebuilds a FRESH final from one full raw scan. The query asserts
    frame equality of the rebuilt and incrementally-built tables
    (both directions, including the dbt-parity hashid and the pinned
    normalized_at) and returns the REBUILT table's live rows; the
    oracle is the plain winner rule, so equality also proves the raw
    JSON round trip preserved exact values through the rebuild path.

    Scale shape: the rebuild is one embarrassingly-parallel full scan
    + the same map-side-combining winner MERGE as the CDC apply; the
    equality check is two exceptAll counts (hash joins), no collect."""
    import tempfile
    from datetime import datetime

    from airbyte_integrations_spark.config import SyncConfig
    from airbyte_integrations_spark.lakehouse.table import LakeTable
    from airbyte_integrations_spark.normalization import (
        normalize_into,
        renormalize,
        write_raw,
    )

    tune_session(spark)
    ce = change_events(spark, sf_dir)
    hi = int(ce.agg(F.max("_ab_cdc_lsn")).collect()[0][0])
    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    base = tempfile.mkdtemp(prefix="renorm_entry_", dir=scratch)
    raw = LakeTable(spark, base + "/raw")
    final = LakeTable(spark, base + "/final")
    ddl = (
        "url string, _ab_cdc_lsn bigint, _ab_cdc_updated_at timestamp_ntz, "
        "_ab_cdc_deleted_at timestamp_ntz, event_type string, value_m bigint"
    )
    cfg = SyncConfig(stream="pages", n_buckets=8)
    at = datetime(2024, 5, 17, 0, 0, 0)
    mid = hi // 2
    write_raw(raw, ce.filter(F.col("_ab_cdc_lsn") <= mid), "pages", epoch=1)
    normalize_into(raw, final, cfg, ddl, normalized_at=at)
    write_raw(raw, ce.filter(F.col("_ab_cdc_lsn") > mid), "pages", epoch=2)
    normalize_into(raw, final, cfg, ddl, normalized_at=at)
    rebuilt = renormalize(spark, raw, base + "/rebuilt", cfg, ddl, normalized_at=at)
    a = final.read_live().select(*sorted(final.read_live().columns))
    b = rebuilt.read_live().select(*sorted(rebuilt.read_live().columns))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0, (
        "renormalize() rebuild diverged from the incrementally-built final"
    )
    return rebuilt.read_live().select(
        "url",
        "_ab_cdc_lsn",
        _us("_ab_cdc_updated_at").alias("updated_us"),
        "event_type",
        "value_m",
    )


O_DEST_RENORMALIZE_REBUILD = f"""
WITH {CE_SQL}, {WINNERS_SQL}
SELECT url, _ab_cdc_lsn, epoch_us(_ab_cdc_updated_at) AS updated_us,
       event_type, value_m
FROM w WHERE rn = 1 AND _ab_cdc_deleted_at IS NULL
"""


def q_search_index_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Search-index destination lifecycle under CDC
    (destinations/search_index.py — destination-elasticsearch's
    upsert-by-PK text index, ElasticsearchConnection.java:146-183, with
    the temp-index-swap publish,
    ElasticsearchAirbyteMessageConsumerFactory.java:104-117): epoch 1
    indexes every document, epoch 2 UPDATES every doc_id%5==0 document
    (appending two 'spark' tokens — the stored document is wholly
    replaced, so postings must reflect the new text only), epoch 3
    TOMBSTONES every doc_id%7==0 document, epoch 3 replays
    idempotently, then publish() builds the term-bucket-partitioned
    postings and a fixed 3-query set scores top-10 per query. The
    oracle recomputes the final corpus state directly and re-derives
    tf/df/scores, so value equality pins upsert-replace, delete,
    replay, tokenization, publish, bucket-pruned scan, and the
    integer-exact scoring end to end.

    Scale shape: upserts are the engine's MERGE; publish is one
    tokenize scan + map-side-combining (doc, term) agg partitioned by
    term bucket; the query reads ONLY its terms' bucket partitions and
    broadcast-joins the metadata-sized df/query tables."""
    import tempfile

    from airbyte_integrations_spark.destinations.search_index import SearchIndex

    tune_session(spark)
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    idx = SearchIndex(
        spark, tempfile.mkdtemp(prefix="searchix_entry_", dir=scratch) + "/ix"
    )

    def cdcify(df: DataFrame, base: int, dead: bool = False) -> DataFrame:
        lsn = (F.lit(base) + F.col("doc_id")).cast("long")
        ts = F.lit("2024-01-01 00:00:00").cast("timestamp")
        return df.select(
            "doc_id",
            "text",
            lsn.alias("_ab_cdc_lsn"),
            ts.alias("_ab_cdc_updated_at"),
            (ts if dead else F.lit(None).cast("timestamp")).alias(
                "_ab_cdc_deleted_at"
            ),
            F.md5(lsn.cast("string")).alias("_airbyte_ab_id"),
            ts.alias("_airbyte_emitted_at"),
        )

    idx.upsert(cdcify(docs, 1_000_000), epoch=1, n_buckets=8)
    upd = docs.filter(F.col("doc_id") % 5 == 0).withColumn(
        "text", F.concat(F.col("text"), F.lit(" spark spark"))
    )
    idx.upsert(cdcify(upd, 2_000_000), epoch=2, n_buckets=8)
    dead = docs.filter(F.col("doc_id") % 7 == 0)
    idx.upsert(cdcify(dead, 3_000_000, dead=True), epoch=3, n_buckets=8)
    v = idx.table.current_version()
    idx.upsert(cdcify(dead, 3_000_000, dead=True), epoch=3, n_buckets=8)
    assert idx.table.current_version() == v, "epoch replay committed"
    idx.publish(n_term_buckets=32)
    queries_df = spark.createDataFrame(
        [
            (1, "spark"), (1, "join"), (1, "merge"),
            (2, "window"), (2, "sort"), (2, "group"),
            (3, "customer"), (3, "query"), (3, "table"),
        ],
        "query_id int, term string",
    )
    return idx.query(queries_df, k=10)


O_SEARCH_INDEX_LIFECYCLE = r"""
WITH q(query_id, term) AS (
  VALUES (1,'spark'),(1,'join'),(1,'merge'),
         (2,'window'),(2,'sort'),(2,'group'),
         (3,'customer'),(3,'query'),(3,'table')
),
fin AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN text || ' spark spark' ELSE text END AS text
  FROM documents WHERE doc_id % 7 <> 0
),
tok AS (
  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
  FROM fin
),
tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM tok WHERE term IN (SELECT DISTINCT term FROM q) AND term <> ''
  GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT q.query_id, tf.doc_id,
         sum((tf.tf * 1000000) // dfreq.df) AS score_m,
         count(*) AS n_terms_hit
  FROM tf JOIN dfreq USING (term) JOIN q USING (term)
  GROUP BY 1, 2
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY score_m DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT CAST(query_id AS INTEGER) AS query_id, CAST(rank AS INTEGER) AS rank,
       doc_id, CAST(score_m AS BIGINT) AS score_m,
       CAST(n_terms_hit AS BIGINT) AS n_terms_hit
FROM ranked WHERE rank <= 10
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "cdc_latest_wins": q_cdc_latest_wins,
        "cdc_winner_agg": q_cdc_winner_agg,
        "cdc_scd2_history": q_cdc_scd2_history,
        "cdc_tombstone_stats": q_cdc_tombstone_stats,
        "cdc_idempotent_replay": q_cdc_idempotent_replay,
        "cdc_mor_replay": q_cdc_mor_replay,
        "cdc_raw_normalize": q_cdc_raw_normalize,
        "cdc_maintenance_replay": q_cdc_maintenance_replay,
        "cdc_incremental_cursor": q_cdc_incremental_cursor,
        "cdc_epoch_plan": q_cdc_epoch_plan,
        "cdc_balanced_epochs": q_cdc_balanced_epochs,
        "cdc_heartbeat_offsets": q_cdc_heartbeat_offsets,
        "cdc_changelog_diff": q_cdc_changelog_diff,
        "cdc_ivm_refresh": q_cdc_ivm_refresh,
        "cdc_rollback_resync": q_cdc_rollback_resync,
        "cdc_reset_resync": q_cdc_reset_resync,
        "cdc_wap_publish": q_cdc_wap_publish,
        "cdc_clustered_range_read": q_cdc_clustered_range_read,
        "cdc_partitioned_offsets": q_cdc_partitioned_offsets,
        "cdc_unnest_children": q_cdc_unnest_children,
        "cdc_lineage_offsets": q_cdc_lineage_offsets,
        "cdc_schema_evolution": q_cdc_schema_evolution,
        "cdc_snapshot_plus_log": q_cdc_snapshot_plus_log,
        "cdc_composite_pk_dedup": q_cdc_composite_pk_dedup,
        "cdc_event_time_rates": q_cdc_event_time_rates,
        "cdc_catalog_sync": q_cdc_catalog_sync,
        "cdc_global_state_sync": q_cdc_global_state_sync,
        "cdc_debezium_envelope": q_cdc_debezium_envelope,
        "cdc_mysql_binlog_order": q_cdc_mysql_binlog_order,
        "cdc_mssql_lsn_order": q_cdc_mssql_lsn_order,
        "dest_jdbc_roundtrip": q_dest_jdbc_roundtrip,
        "dest_files_object_paths": q_dest_files_object_paths,
        "dest_renormalize_rebuild": q_dest_renormalize_rebuild,
        "search_index_lifecycle": q_search_index_lifecycle,
        "mongo_schemaless_read": q_mongo_schemaless_read,
        "mongo_change_stream_read": q_mongo_change_stream_read,
        "mongo_db_watch_route": q_mongo_db_watch_route,
        "mongo_patch_fold": q_mongo_patch_fold,
        "cdc_publish_feed": q_cdc_publish_feed,
        "kafka_avro_wire_read": q_kafka_avro_wire_read,
        "docs_ndv_sketch": q_docs_ndv_sketch,
        "docs_weighted_sample": q_docs_weighted_sample,
        "cdc_zorder_read": q_cdc_zorder_read,
        "cdc_field_selection": q_cdc_field_selection,
        "cdc_point_lookup": q_cdc_point_lookup,
        "pipeline_crawl_corpus": q_pipeline_crawl_corpus,
        "docs_ccnet_buckets": q_docs_ccnet_buckets,
        "emb_index_lifecycle": q_emb_index_lifecycle,
        "http_paged_read": q_http_paged_read,
        "http_declarative_substream": q_http_declarative_substream,
        "http_declarative_filter_transform": q_http_declarative_filter_transform,
        "http_search_post_read": q_http_search_post_read,
        "http_link_header_read": q_http_link_header_read,
        "wire_emit_roundtrip": q_wire_emit_roundtrip,
        "singer_tap_read": q_singer_tap_read,
        "warc_read_responses": q_warc_read_responses,
        "protocol_cli_read": q_protocol_cli_read,
        "url_file_csv_read": q_url_file_csv_read,
        "json_extract_cast": q_json_extract_cast,
        "docs_exact_dedup": q_docs_exact_dedup,
        "docs_fingerprint": q_docs_fingerprint,
        "docs_quality": q_docs_quality,
        "docs_c4_line_filter": q_docs_c4_line_filter,
        "docs_lang_id": q_docs_lang_id,
        "docs_repetition": q_docs_repetition,
        "docs_tfidf_top_terms": q_docs_tfidf_top_terms,
        "docs_sparse_retrieval": q_docs_sparse_retrieval,
        "docs_curation_pipeline": q_docs_curation_pipeline,
        "docs_decontaminate": q_docs_decontaminate,
        "docs_pii_redact": q_docs_pii_redact,
        "docs_url_canonical": q_docs_url_canonical,
        "events_sessionize": q_events_sessionize,
        "cdc_asof_join": q_cdc_asof_join,
        "cdc_time_travel": q_cdc_time_travel,
        "cdc_changed_since": q_cdc_changed_since,
        "docs_bloom_dedup": q_docs_bloom_dedup,
        "docs_vocab_topk": q_docs_vocab_topk,
        "docs_minhash_incremental": q_docs_minhash_incremental,
        "emb_ann_recall": q_emb_ann_recall,
        "emb_pq_codes": q_emb_pq_codes,
        "emb_pq_adc_topk": q_emb_pq_adc_topk,
        "events_funnel": q_events_funnel,
        "events_retention": q_events_retention,
        "cdc_incremental_snapshot": q_cdc_incremental_snapshot,
        "cdc_replication_lag": q_cdc_replication_lag,
        "cdc_tx_epochs": q_cdc_tx_epochs,
        "cdc_patch_coalesce": q_cdc_patch_coalesce,
        "cdc_table_checksum": q_cdc_table_checksum,
        "cdc_host_stats": q_cdc_host_stats,
        "events_hopping_rates": q_events_hopping_rates,
        "tpch_pricing_summary": q_tpch_pricing_summary,
        "tpch_shipping_priority": q_tpch_shipping_priority,
        "tpch_local_supplier_volume": q_tpch_local_supplier_volume,
        "tpch_order_priority": q_tpch_order_priority,
        "tpch_inactive_customers": q_tpch_inactive_customers,
        "tpch_above_avg_orders": q_tpch_above_avg_orders,
        "tpch_customer_distribution": q_tpch_customer_distribution,
        "events_running_total": q_events_running_total,
        "events_anomaly_days": q_events_anomaly_days,
        "docs_blocklist_filter": q_docs_blocklist_filter,
        "docs_length_deciles": q_docs_length_deciles,
        "events_rollup": q_events_rollup,
        "events_pivot": q_events_pivot,
        "docs_length_quantiles": q_docs_length_quantiles,
        "docs_topk_per_lang": q_docs_topk_per_lang,
        "docs_dedup_keep_best": q_docs_dedup_keep_best,
        "docs_shard_assign": q_docs_shard_assign,
        "emb_lsh_buckets": q_emb_lsh_buckets,
        "emb_knn_cosine": q_emb_knn_cosine,
        "emb_ann_lsh_topk": q_emb_ann_lsh_topk,
        "emb_ann_ivf_topk": q_emb_ann_ivf_topk,
        "emb_cosine_neardup": q_emb_cosine_neardup,
        "emb_kmeans": q_emb_kmeans,
        "emb_semantic_dedup": q_emb_semantic_dedup,
        "docs_minhash": q_docs_minhash,
        "docs_neardup_pairs": q_docs_neardup_pairs,
        "docs_dup_clusters": q_docs_dup_clusters,
        "docs_span_dedup": q_docs_span_dedup,
        "docs_span_removal": q_docs_span_removal,
        "docs_quality_classifier": q_docs_quality_classifier,
        "docs_sample_stratified": q_docs_sample_stratified,
        "docs_incremental_dedup": q_docs_incremental_dedup,
        "docs_trigram_lm_score": q_docs_trigram_lm_score,
        "docs_chunk_overlap": q_docs_chunk_overlap,
        "docs_pack_windows": q_docs_pack_windows,
        "docs_source_mix": q_docs_source_mix,
        "docs_dsir_weights": q_docs_dsir_weights,
        "docs_simhash": q_docs_simhash,
        "docs_token_bpe": q_docs_token_bpe,
        "multimodal_binary_meta": q_multimodal_binary_meta,
        "multimodal_image_meta": q_multimodal_image_meta,
        "multimodal_audio_meta": q_multimodal_audio_meta,
        "multimodal_video_frames": q_multimodal_video_frames,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "http_paged_read": O_HTTP_PAGED_READ,
        "http_declarative_substream": O_HTTP_DECLARATIVE_SUBSTREAM,
        "http_declarative_filter_transform": O_HTTP_DECLARATIVE_FILTER_TRANSFORM,
        "http_search_post_read": O_HTTP_SEARCH_POST_READ,
        "http_link_header_read": O_HTTP_LINK_HEADER_READ,
        "wire_emit_roundtrip": O_WIRE_EMIT_ROUNDTRIP,
        "singer_tap_read": O_SINGER_TAP_READ,
        "warc_read_responses": O_WARC_READ_RESPONSES,
        "protocol_cli_read": O_PROTOCOL_CLI_READ,
        "url_file_csv_read": O_URL_FILE_CSV_READ,
        "cdc_latest_wins": O_CDC_LATEST_WINS,
        "cdc_winner_agg": O_CDC_WINNER_AGG,
        "cdc_scd2_history": O_CDC_SCD2,
        "cdc_tombstone_stats": O_CDC_TOMBSTONE_STATS,
        "cdc_idempotent_replay": O_CDC_IDEMPOTENT_REPLAY,
        "cdc_mor_replay": O_CDC_MOR_REPLAY,
        "cdc_raw_normalize": O_CDC_RAW_NORMALIZE,
        "cdc_maintenance_replay": O_CDC_MAINTENANCE_REPLAY,
        "cdc_point_lookup": O_CDC_POINT_LOOKUP,
        "cdc_incremental_cursor": O_CDC_INCREMENTAL_CURSOR,
        "cdc_epoch_plan": O_CDC_EPOCH_PLAN,
        "cdc_balanced_epochs": O_CDC_BALANCED_EPOCHS,
        "cdc_heartbeat_offsets": O_CDC_HEARTBEAT_OFFSETS,
        "cdc_changelog_diff": O_CDC_CHANGELOG_DIFF,
        "cdc_ivm_refresh": O_CDC_IVM_REFRESH,
        "cdc_rollback_resync": O_CDC_ROLLBACK_RESYNC,
        "cdc_reset_resync": O_CDC_RESET_RESYNC,
        "cdc_wap_publish": O_CDC_WAP_PUBLISH,
        "cdc_clustered_range_read": O_CDC_CLUSTERED_RANGE_READ,
        "cdc_partitioned_offsets": O_CDC_PARTITIONED_OFFSETS,
        "cdc_unnest_children": O_CDC_UNNEST_CHILDREN,
        "cdc_lineage_offsets": O_CDC_LINEAGE_OFFSETS,
        "cdc_schema_evolution": O_CDC_SCHEMA_EVOLUTION,
        "cdc_snapshot_plus_log": O_CDC_SNAPSHOT_PLUS_LOG,
        "cdc_composite_pk_dedup": O_CDC_COMPOSITE_PK_DEDUP,
        "cdc_event_time_rates": O_CDC_EVENT_TIME_RATES,
        "cdc_catalog_sync": O_CDC_CATALOG_SYNC,
        "cdc_global_state_sync": O_CDC_GLOBAL_STATE_SYNC,
        "cdc_debezium_envelope": O_CDC_DEBEZIUM_ENVELOPE,
        "cdc_mysql_binlog_order": O_CDC_MYSQL_BINLOG_ORDER,
        "cdc_mssql_lsn_order": O_CDC_MSSQL_LSN_ORDER,
        "dest_jdbc_roundtrip": O_DEST_JDBC_ROUNDTRIP,
        "dest_files_object_paths": O_DEST_FILES_OBJECT_PATHS,
        "dest_renormalize_rebuild": O_DEST_RENORMALIZE_REBUILD,
        "search_index_lifecycle": O_SEARCH_INDEX_LIFECYCLE,
        "mongo_schemaless_read": O_MONGO_SCHEMALESS_READ,
        "mongo_change_stream_read": O_MONGO_CHANGE_STREAM_READ,
        "mongo_db_watch_route": O_MONGO_DB_WATCH_ROUTE,
        "mongo_patch_fold": O_MONGO_PATCH_FOLD,
        "cdc_publish_feed": O_CDC_PUBLISH_FEED,
        "kafka_avro_wire_read": O_KAFKA_AVRO_WIRE_READ,
        "docs_ndv_sketch": O_DOCS_NDV_SKETCH,
        "docs_weighted_sample": O_DOCS_WEIGHTED_SAMPLE,
        "cdc_zorder_read": O_CDC_ZORDER_READ,
        "cdc_field_selection": O_CDC_FIELD_SELECTION,
        "pipeline_crawl_corpus": O_PIPELINE_CRAWL_CORPUS,
        "docs_ccnet_buckets": O_DOCS_CCNET_BUCKETS,
        "emb_index_lifecycle": O_EMB_INDEX_LIFECYCLE,
        "json_extract_cast": O_JSON_EXTRACT_CAST,
        "docs_exact_dedup": O_DOCS_EXACT_DEDUP,
        "docs_fingerprint": O_DOCS_FINGERPRINT,
        "docs_quality": O_DOCS_QUALITY,
        "docs_c4_line_filter": O_DOCS_C4_LINE_FILTER,
        "docs_lang_id": _o_lang_sql(),
        "docs_repetition": O_DOCS_REPETITION,
        "docs_tfidf_top_terms": O_DOCS_TFIDF_TOP_TERMS,
        "docs_sparse_retrieval": O_DOCS_SPARSE_RETRIEVAL,
        "docs_curation_pipeline": O_DOCS_CURATION_PIPELINE,
        "docs_decontaminate": O_DOCS_DECONTAMINATE,
        "docs_pii_redact": O_DOCS_PII_REDACT,
        "docs_url_canonical": O_DOCS_URL_CANONICAL,
        "events_sessionize": O_EVENTS_SESSIONIZE,
        "cdc_asof_join": O_CDC_ASOF_JOIN,
        "cdc_time_travel": O_CDC_TIME_TRAVEL,
        "cdc_changed_since": O_CDC_CHANGED_SINCE,
        "docs_bloom_dedup": O_DOCS_BLOOM_DEDUP,
        "docs_vocab_topk": O_DOCS_VOCAB_TOPK,
        "docs_minhash_incremental": O_DOCS_MINHASH_INCREMENTAL,
        "emb_ann_recall": O_EMB_ANN_RECALL,
        "emb_pq_codes": O_EMB_PQ_CODES,
        "emb_pq_adc_topk": O_EMB_PQ_ADC_TOPK,
        "events_funnel": O_EVENTS_FUNNEL,
        "events_retention": O_EVENTS_RETENTION,
        "cdc_incremental_snapshot": O_CDC_INCREMENTAL_SNAPSHOT,
        "cdc_replication_lag": O_CDC_REPLICATION_LAG,
        "cdc_tx_epochs": O_CDC_TX_EPOCHS,
        "cdc_patch_coalesce": O_CDC_PATCH_COALESCE,
        "cdc_table_checksum": O_CDC_TABLE_CHECKSUM,
        "cdc_host_stats": O_CDC_HOST_STATS,
        "events_hopping_rates": O_EVENTS_HOPPING_RATES,
        "tpch_pricing_summary": O_TPCH_PRICING_SUMMARY,
        "tpch_shipping_priority": O_TPCH_SHIPPING_PRIORITY,
        "tpch_local_supplier_volume": O_TPCH_LOCAL_SUPPLIER_VOLUME,
        "tpch_order_priority": O_TPCH_ORDER_PRIORITY,
        "tpch_inactive_customers": O_TPCH_INACTIVE_CUSTOMERS,
        "tpch_above_avg_orders": O_TPCH_ABOVE_AVG_ORDERS,
        "tpch_customer_distribution": O_TPCH_CUSTOMER_DISTRIBUTION,
        "events_running_total": O_EVENTS_RUNNING_TOTAL,
        "events_anomaly_days": O_EVENTS_ANOMALY_DAYS,
        "docs_blocklist_filter": O_DOCS_BLOCKLIST_FILTER,
        "docs_length_deciles": O_DOCS_LENGTH_DECILES,
        "events_rollup": O_EVENTS_ROLLUP,
        "events_pivot": O_EVENTS_PIVOT,
        "docs_length_quantiles": O_DOCS_LENGTH_QUANTILES,
        "docs_topk_per_lang": O_DOCS_TOPK_PER_LANG,
        "docs_dedup_keep_best": O_DOCS_DEDUP_KEEP_BEST,
        "docs_shard_assign": O_DOCS_SHARD_ASSIGN,
        "emb_lsh_buckets": O_EMB_LSH_BUCKETS,
        "emb_knn_cosine": O_EMB_KNN_COSINE,
        "emb_ann_lsh_topk": O_EMB_ANN_LSH_TOPK,
        "emb_ann_ivf_topk": O_EMB_ANN_IVF_TOPK,
        "emb_cosine_neardup": O_EMB_COSINE_NEARDUP,
        "emb_kmeans": O_EMB_KMEANS,
        "emb_semantic_dedup": O_EMB_SEMANTIC_DEDUP,
        "docs_minhash": O_DOCS_MINHASH,
        "docs_neardup_pairs": O_DOCS_NEARDUP_PAIRS,
        "docs_dup_clusters": O_DOCS_DUP_CLUSTERS,
        "docs_span_dedup": O_DOCS_SPAN_DEDUP,
        "docs_span_removal": O_DOCS_SPAN_REMOVAL,
        "docs_quality_classifier": O_DOCS_QUALITY_CLASSIFIER,
        "docs_sample_stratified": O_DOCS_SAMPLE_STRATIFIED,
        "docs_dsir_weights": O_DOCS_DSIR_WEIGHTS,
        "docs_incremental_dedup": O_DOCS_INCREMENTAL_DEDUP,
        "docs_trigram_lm_score": O_DOCS_TRIGRAM_LM_SCORE,
        "docs_chunk_overlap": O_DOCS_CHUNK_OVERLAP,
        "docs_pack_windows": O_DOCS_PACK_WINDOWS,
        "docs_source_mix": O_DOCS_SOURCE_MIX,
        "docs_simhash": O_DOCS_SIMHASH,
        "docs_token_bpe": O_DOCS_TOKEN_BPE,
        "multimodal_binary_meta": O_MULTIMODAL_BINARY_META,
        "multimodal_image_meta": O_MULTIMODAL_IMAGE_META,
        "multimodal_audio_meta": O_MULTIMODAL_AUDIO_META,
        "multimodal_video_frames": O_MULTIMODAL_VIDEO_FRAMES,
    }
