"""Micro-batch CDC sync loop: epoch planning, apply, checkpoint, resume.

Mirrors the reference's bounded-sync design: a sync fixes a target log
position at start (CdcTargetPosition.java:16-20 /
PostgresCdcTargetPosition.java:42-63), reads the log up to it, and
emits state only after the destination commit
(BufferedStreamConsumer.java:175-193). Here:

- an epoch is a half-open LSN slice `(from_lsn, to_lsn]`; the slice
  bounds are planned deterministically from (watermark, max lsn,
  max_events_per_epoch), so a crashed-and-restarted run re-plans the
  identical epochs and the commit log makes re-applies no-ops.
- epoch id = from_lsn (unique and deterministic).
- resume = LakeTable watermark(stream): the highest committed to_lsn.
  Because slices are monotone in lsn, an event below the watermark is
  never re-read => a tombstoned key can never be resurrected by a
  stale pre-delete image (SURVEY §2.10: no watermarking of late data
  is needed; ordering is resolved by the winner rule at apply time).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airbyte_integrations_spark.config import SyncConfig
from airbyte_integrations_spark.functions.extract import with_extracted_text
from airbyte_integrations_spark.lakehouse.merge import merge_into
from airbyte_integrations_spark.lakehouse.table import LakeTable
from airbyte_integrations_spark.lineage import (
    compute_lineage,
    compute_lineage_bulk,
    write_lineage,
    write_lineage_rows,
)


@dataclass(frozen=True)
class Epoch:
    epoch_id: int  # == from_lsn
    from_lsn: int  # exclusive
    to_lsn: int  # inclusive


def plan_epochs(
    events: DataFrame,
    from_lsn: int | None,
    max_events_per_epoch: int,
    lsn_col: str = "_ab_cdc_lsn",
) -> list[Epoch]:
    """Deterministic epoch slicing of the unread log tail.

    The LSN-axis slice width is derived from the tail's observed
    density — width = ceil(span * max_events_per_epoch / n) — so the
    epoch COUNT is ~n / max_events_per_epoch regardless of how sparse
    the lsn space is. A naive fixed width of max_events_per_epoch would
    explode on a WAL gap (Postgres lsn advances from unrelated traffic:
    a 10^12 gap above the watermark would mean ~10^6 empty epochs, each
    scanning the log and committing a snapshot). Correctness needs only
    that slices are disjoint, monotone, and above the watermark — the
    boundaries are deterministic in (watermark, min, max, count), so a
    crashed-and-restarted run re-plans identical epochs for the same
    unread tail. Density skew inside the span only unbalances epoch
    SIZES, never correctness (the winner rule is order-free).
    """
    lo = from_lsn if from_lsn is not None else -(2**62)
    tail = events.filter(F.col(lsn_col) > F.lit(lo))
    row = tail.agg(
        F.min(lsn_col).alias("lo"), F.max(lsn_col).alias("hi"), F.count("*").alias("n")
    ).collect()[0]
    if row["n"] == 0:
        return []
    lo_seen, hi, n = int(row["lo"]), int(row["hi"]), int(row["n"])
    start = lo if from_lsn is not None else lo_seen - 1
    span = hi - start
    # Dense tail (span == n): width == max_events_per_epoch exactly —
    # identical plans to the fixed-width scheme. Sparse tail: width
    # scales with span/n so the epoch count stays ~n/max_events.
    width = max(span * max_events_per_epoch // n, 1)
    epochs: list[Epoch] = []
    cur = start
    while cur < hi:
        to = min(cur + width, hi)
        epochs.append(Epoch(epoch_id=cur, from_lsn=cur, to_lsn=to))
        cur = to
    return epochs


def plan_epochs_balanced(
    events: DataFrame,
    from_lsn: int | None,
    max_events_per_epoch: int,
    lsn_col: str = "_ab_cdc_lsn",
) -> list[Epoch]:
    """Row-balanced epoch slicing: every epoch carries ~exactly
    `max_events_per_epoch` events regardless of lsn density.

    Reference: the Debezium engine consumes the log in EVENT-COUNT
    batches, not lsn-width batches — `max.batch.size=2048` set at
    DebeziumRecordPublisher.java:132 (AirbyteDebeziumHandler.java:42
    documents the default); this planner is that contract for a
    declarative bounded replay, computed as exact order statistics so
    a crashed run replans identical boundaries.

    plan_epochs slices the lsn AXIS uniformly (density-scaled width),
    which keeps the epoch COUNT right but not the epoch SIZES: a real
    WAL is bursty — a hot hour can hold 100x the events of a quiet one,
    so uniform-width slices give some epochs 100x the target (executor
    memory pressure at apply) and others near zero (pure commit
    overhead). This planner places boundaries at exact ORDER STATISTICS
    of the unread tail instead: boundary i = the lsn at rank
    i * max_events_per_epoch (ordered by lsn), so every epoch except
    the last holds exactly the target count (lsns are unique in a
    change log — each event is one WAL position).

    Scale shape — no global sort anywhere:
      1. one map-side-combining agg: (min, max, count) of the tail
      2. one arithmetic histogram: lsns bucketed into G >= 8k uniform
         range buckets (G is metadata-sized, <= 65536), counts to the
         driver — the coarse pass of distributed order statistics
      3. the driver walks the cumulative histogram to find, for each
         boundary rank, its bucket + residual rank within that bucket
      4. one filtered per-bucket window (partitionBy bucket — parallel
         across the few boundary buckets, each ~target/8 rows) picks
         the exact lsn at each residual rank
    Cost: two scans + one small shuffle of only the boundary buckets.

    Determinism & resume: boundary ranks are fixed multiples of
    `max_events_per_epoch`, so after J epochs commit (J * target rows
    consumed) a re-plan over the remaining tail puts boundaries at the
    SAME lsns — crash/re-run replans the identical epochs and the
    commit log skips them (epoch_id = from_lsn, as everywhere).

    Lineage: balanced plans are not uniform-width in lsn, so
    compute_lineage_bulk declines them and run_sync falls back to
    per-epoch lineage — use the default planner when a sync plans
    >> 10^2 epochs and lineage cost dominates.
    """
    lo = from_lsn if from_lsn is not None else -(2**62)
    tail = events.filter(F.col(lsn_col) > F.lit(lo)).select(lsn_col)
    row = tail.agg(
        F.min(lsn_col).alias("lo"), F.max(lsn_col).alias("hi"), F.count("*").alias("n")
    ).collect()[0]
    if row["n"] == 0:
        return []
    lo_seen, hi, n = int(row["lo"]), int(row["hi"]), int(row["n"])
    start = from_lsn if from_lsn is not None else lo_seen - 1
    target = max(max_events_per_epoch, 1)
    k = (n + target - 1) // target
    if k <= 1:
        return [Epoch(epoch_id=start, from_lsn=start, to_lsn=hi)]
    span = hi - start
    g = int(min(max(k * 8, 64), 65_536))
    bwidth = max((span + g - 1) // g, 1)
    # bucket of an lsn in (start, hi]: arithmetic, no shuffle of events
    # (integer `div`, not float division — exact at full 64-bit lsn range)
    bucket = F.expr(f"((`{lsn_col}` - {start}L - 1L) div {bwidth}L)")
    hist = {
        int(r["b"]): int(r["cnt"])
        for r in tail.groupBy(bucket.alias("b")).agg(F.count("*").alias("cnt")).collect()
    }
    # driver walk: rank -> (bucket, residual rank inside bucket)
    ranks = [i * target for i in range(1, k)]  # k-1 interior boundaries
    need: dict[int, list[int]] = {}
    cum = 0
    it = iter(sorted(hist.items()))
    b, cnt = next(it)
    for r in ranks:
        while cum + cnt < r:
            cum += cnt
            b, cnt = next(it)
        need.setdefault(b, []).append(r - cum)
    from pyspark.sql import Window

    sub = tail.filter(bucket.isin(list(need))).select(
        bucket.alias("b"), F.col(lsn_col).alias("v")
    )
    wn = Window.partitionBy("b").orderBy(F.col("v").asc())
    # the boundary (bucket, residual-rank) pairs are metadata-sized
    # (k-1 rows): broadcast-join them against the ranked buckets
    pairs = events.sparkSession.createDataFrame(
        [(bb, rr) for bb, rrs in need.items() for rr in rrs], "b long, rn long"
    )
    picked = (
        sub.withColumn("rn", F.row_number().over(wn))
        .join(F.broadcast(pairs), ["b", "rn"], "semi")
        .select("v")
        .collect()
    )
    boundaries = sorted(int(r["v"]) for r in picked)
    epochs: list[Epoch] = []
    prev = start
    for bnd in boundaries:
        if bnd > prev:
            epochs.append(Epoch(epoch_id=prev, from_lsn=prev, to_lsn=bnd))
            prev = bnd
    if prev < hi:
        epochs.append(Epoch(epoch_id=prev, from_lsn=prev, to_lsn=hi))
    return epochs


def plan_epochs_tx(
    events: DataFrame,
    from_lsn: int | None,
    max_events_per_epoch: int,
    tx_col: str,
    lsn_col: str = "_ab_cdc_lsn",
) -> list[Epoch]:
    """Transaction-aligned epoch slicing: like plan_epochs, but no
    boundary ever splits a source transaction (Debezium's transaction
    metadata contract — consumers must never observe half a
    transaction; the reference's record iterator likewise only
    checkpoints at event boundaries the source declared safe).

    A boundary B is SAFE iff no transaction straddles it (no tx with
    min_lsn <= B < max_lsn). Concurrent transactions interleave change
    lsns in a real WAL (normal in Postgres), so snapping to "some
    transaction's max lsn" is NOT enough — that end can sit inside a
    concurrent transaction's span. This planner extends every
    candidate boundary OUTWARD to a fixpoint of
    B <- max(end of any tx straddling B), which terminates at a safe
    position (each step strictly increases toward max lsn, and max lsn
    is always safe).

    Dataflow (all map-side-combining aggs; nothing event-sized reaches
    the driver):
      1. per-tx span (s, e) = (min(lsn), max(lsn))   — one hash agg
      2. density width as in plan_epochs; candidate boundaries are the
         uniform grid edges (K = ~n/max_events, metadata-sized)
      3. pass 1: each tx computes the grid edges inside its span by
         ARITHMETIC (ceil-div; no K-wide scan per tx) and emits
         (edge, e); max(e) per edge — one hash agg, output <= K rows
      4. passes 2..: only boundaries that MOVED are rechecked (a
         boundary verified safe stays safe — spans don't change), via
         a filtered-literal-array straddle test whose array is just
         the moved set. Per-chain extensions strictly increase, so
         this converges; a defensive pass cap drops any still-unsafe
         boundary (dropping merges two epochs — always safe).

    A transaction bigger than `width`, or a fully interleaved region,
    simply owns its whole epoch. The highest observed lsn of a tx is
    taken as its end; if the source can be tailed mid-transaction,
    bound the read at the last committed position first
    (target_position semantics) — same rule as the reference's
    CdcTargetPosition.
    """
    lo = from_lsn if from_lsn is not None else -(2**62)
    tail = events.filter(F.col(lsn_col) > F.lit(lo))
    row = tail.agg(
        F.min(lsn_col).alias("lo"), F.max(lsn_col).alias("hi"), F.count("*").alias("n")
    ).collect()[0]
    if row["n"] == 0:
        return []
    lo_seen, hi, n = int(row["lo"]), int(row["hi"]), int(row["n"])
    start = from_lsn if from_lsn is not None else lo_seen - 1
    width = max((hi - start) * max_events_per_epoch // n, 1)
    spans = tail.groupBy(tx_col).agg(
        F.min(lsn_col).alias("s"), F.max(lsn_col).alias("e")
    )
    multi = spans.filter(F.col("e") > F.col("s"))  # singletons can't straddle
    multi.persist()
    try:
        # candidate boundaries: the uniform density grid, capped at hi
        bounds: set[int] = set()
        cur = start
        while cur < hi:
            cur = min(cur + width, hi)
            bounds.add(cur)
        # pass 1 — arithmetic straddle detection on the grid: tx (s, e)
        # straddles edge start + j*width for j in [ceil((s-start)/width),
        # floor((e-1-start)/width)]  (integer math; lsns are 64-bit WAL
        # positions, never floats)
        ext_rows = (
            # guard: F.sequence(a, b) DESCENDS when a > b, so a span
            # containing no grid edge would emit bogus straddles
            multi.filter(
                F.expr(
                    f"div(s - {start} + {width} - 1, {width})"
                    f" <= div(e - 1 - {start}, {width})"
                )
            )
            .select(
                F.explode(
                    F.sequence(
                        F.expr(f"div(s - {start} + {width} - 1, {width})"),
                        F.expr(f"div(e - 1 - {start}, {width})"),
                    )
                ).alias("j"),
                "e",
            )
            .filter(F.col("j") >= 1)
            .groupBy("j")
            .agg(F.max("e").alias("ext"))
            .collect()
        )
        pending = {
            start + int(r["j"]) * width: int(r["ext"])
            for r in ext_rows
            if start + int(r["j"]) * width in bounds
            and int(r["ext"]) > start + int(r["j"]) * width
        }
        for _ in range(32):
            if not pending:
                break
            for b, ext in pending.items():
                bounds.discard(b)
                bounds.add(ext)
            recheck = sorted(set(pending.values()))
            arr = F.filter(
                F.array(*[F.lit(x) for x in recheck]),
                lambda b: (F.col("s") <= b) & (b < F.col("e")),
            )
            viol = (
                multi.select(F.explode(arr).alias("b"), "e")
                .groupBy("b")
                .agg(F.max("e").alias("ext"))
                .collect()
            )
            pending = {
                int(r["b"]): int(r["ext"])
                for r in viol
                if int(r["b"]) in bounds and int(r["ext"]) > int(r["b"])
            }
        else:
            # defensive cap (a pathological chain of interleaves):
            # dropping an unsafe boundary merges two epochs, which is
            # always safe; hi itself never straddles so coverage holds
            for b in pending:
                bounds.discard(b)
    finally:
        multi.unpersist()
    epochs: list[Epoch] = []
    prev = start
    for b in sorted(bounds):
        if b > prev:
            epochs.append(Epoch(epoch_id=prev, from_lsn=prev, to_lsn=b))
            prev = b
    return epochs


def run_sync(
    spark: SparkSession,
    events: DataFrame,
    table: LakeTable,
    config: SyncConfig,
    max_events_per_epoch: int = 1_000_000,
    extract_missing_text: bool = True,
    max_epochs: int | None = None,
    compact_threshold: int | None = 8,
    tx_col: str | None = None,
    balanced: bool = False,
    heartbeat_position: int | None = None,
    refresh_views: list | None = None,
    patch_cols: tuple[str, ...] | None = None,
    patch_mask_cols: tuple[str, ...] | None = None,
) -> list[Epoch]:
    """One bounded sync: plan epochs past the committed watermark and
    apply each as dedup -> MERGE -> atomic commit (+ lineage).

    With `tx_col`, epoch boundaries are snapped to transaction ends
    (plan_epochs_tx) so no commit ever exposes half a transaction.

    `heartbeat_position` is the source's CURRENT log position (Debezium
    heartbeat semantics: the WAL can be ahead of the last change to any
    tracked table — e.g. other databases' traffic — and the offset must
    still advance or the source retains WAL forever). If it is past the
    final watermark after all planned epochs apply, a zero-row marker
    epoch `hb:<position>` commits to advance watermark(); the next sync
    then plans strictly above it, so stale events at or below the
    heartbeat are treated as already-consumed (exactly the offset
    contract).

    Returns the epochs applied. Safe to re-run at any time (idempotent
    per epoch); safe to kill at any point (snapshot isolation).

    ``patch_cols`` switches the apply to PARTIAL-image semantics
    (lakehouse/patch_apply.py): each epoch's per-column latest writes
    overlay the key's current row instead of replacing it, with
    ``patch_mask_cols`` naming the per-column written flags (MongoDB
    updateDescription decode emits ``_w_<name>``). Epoch planning,
    commit-log idempotence, lineage, and compaction are unchanged."""
    lsn_col = config.cursor_field[0]
    wm = table.watermark(config.stream)
    if tx_col is not None and balanced:
        raise ValueError("tx_col and balanced are mutually exclusive epoch planners")
    if tx_col is not None:
        epochs = plan_epochs_tx(events, wm, max_events_per_epoch, tx_col, lsn_col)
    elif balanced:
        # row-balanced boundaries for bursty logs (order-statistics
        # planner); lineage falls back to per-epoch automatically
        epochs = plan_epochs_balanced(events, wm, max_events_per_epoch, lsn_col)
    else:
        epochs = plan_epochs(events, wm, max_events_per_epoch, lsn_col)
    if max_epochs is not None:
        epochs = epochs[:max_epochs]
    # All epochs' lineage in ONE tail scan when the plan is
    # uniform-width (plan_epochs always is): per-epoch lineage jobs
    # would double the sync's job count — a scheduler storm at the
    # 10^4-epoch design point. Tx-aligned plans (non-uniform) fall back
    # to per-epoch scans.
    bulk = (
        compute_lineage_bulk(
            events, config.stream, epochs, lsn_col,
            balanced_target=max_events_per_epoch if balanced else None,
        )
        if any(
            not table.is_epoch_committed(config.stream, ep.epoch_id)
            for ep in epochs
        )
        else None
    )
    for ep in epochs:
        if table.is_epoch_committed(config.stream, ep.epoch_id):
            continue
        batch = events.filter(
            (F.col(lsn_col) > F.lit(ep.from_lsn)) & (F.col(lsn_col) <= F.lit(ep.to_lsn))
        )
        # html->text extraction is applied to the per-key WINNERS inside
        # merge_into, not to the raw slice: the ordering columns don't
        # depend on text, so losers of the dedup never reach the UDF.
        transform = (
            with_extracted_text
            if extract_missing_text and "html" in batch.columns
            else None
        )
        if bulk is not None:
            pdf, pa_schema = bulk
            rows = pdf[pdf["epoch"] == ep.epoch_id].drop(columns=["epoch"])
            write_lineage_rows(rows, pa_schema, table.root, ep.epoch_id)
        else:
            lineage = compute_lineage(batch, config.stream, ep.epoch_id, lsn_col)
            write_lineage(lineage, table.root, ep.epoch_id)
        if patch_cols is not None:
            from airbyte_integrations_spark.lakehouse.patch_apply import (
                merge_patches_into,
            )

            merge_patches_into(
                table,
                batch,
                patch_cols,
                stream=config.stream,
                epoch=ep.epoch_id,
                epoch_meta={"from_lsn": ep.from_lsn, "to_lsn": ep.to_lsn},
                cursor=lsn_col,
                secondary=config.secondary_order,
                mask_cols=patch_mask_cols,
                mode=config.write_mode,
                key=config.primary_key,
                n_buckets=config.n_buckets,
            )
        else:
            merge_into(
                table,
                batch,
                stream=config.stream,
                epoch=ep.epoch_id,
                epoch_meta={"from_lsn": ep.from_lsn, "to_lsn": ep.to_lsn},
                cursor=lsn_col,
                secondary=config.secondary_order,
                transform_winners=transform,
                mode=config.write_mode,
                dedup_impl=config.dedup_impl,
                key=config.primary_key,
                n_buckets=config.n_buckets,
            )
    if heartbeat_position is not None and table.exists() and (
        max_epochs is None or len(epochs) < max_epochs
    ):
        final_wm = table.watermark(config.stream)
        if final_wm is None or heartbeat_position > final_wm:
            table.commit_marker_epoch(
                config.stream,
                f"hb:{heartbeat_position}",
                {
                    "from_lsn": final_wm,
                    "to_lsn": heartbeat_position,
                    "heartbeat": True,
                },
            )
    # Maintenance: bound small files (COW keeps touched buckets at ~1
    # file, but skewed batches and appends fragment; at the 10^10 point
    # this is the rewrite_data_files compaction an operator would cron).
    if compact_threshold is not None and table.exists():
        table.compact(max_files_per_bucket=compact_threshold)
    # Downstream marts: one incremental refresh per SYNC (not per
    # epoch) — the IVM cadence; each view folds the bucket-pruned
    # change feed from its recorded base version to the new head
    # (lakehouse/ivm.py). Versioned and idempotent, so a crash here
    # self-heals on the next sync's refresh.
    if refresh_views and table.exists():
        for view in refresh_views:
            view.refresh(table)
    return epochs
