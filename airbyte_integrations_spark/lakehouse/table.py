"""LakeTable — a minimal snapshot-based table format on parquet.

The sandbox has no Iceberg runtime, so the engine ships its own
Iceberg-style format providing exactly the guarantees the reference's
sink contract needs (BufferedStreamConsumer.java:122-194,
JdbcBufferedConsumerFactory.java:119-197 — staged write + single
atomic transaction + state only after commit):

- immutable data files; every commit writes a new manifest
  `_meta/v{N}.json` and atomically swaps the `_meta/VERSION` pointer
  (os.replace — atomic on POSIX). Readers always see a complete
  snapshot; a crashed writer leaves only orphan files.
- hash-bucket layout: rows live in `bucket = pmod(xxhash64(key), N)`
  directories; MERGE rewrites only touched buckets (copy-on-write) and
  carries untouched buckets' files forward by reference — the analogue
  of Iceberg `bucket(N, url)` partitioning + COW MERGE.
- an epoch commit log in the manifest: `(stream, checkpoint_epoch)` ->
  offset range. Re-committing an epoch is a no-op => exactly-once
  effect under task/driver retries.
- schema stored in the manifest; evolution = union-by-name + widening
  casts resolved before MERGE (SURVEY §2.9).

Single-writer (the Spark driver) by design; a multi-writer deployment
would swap the VERSION pointer for a catalog compare-and-swap, exactly
as Iceberg does.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import time
import uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from airbyte_integrations_spark.schema import incompatible_widenings, merge_schemas


class CommitConflictError(RuntimeError):
    """Another writer committed between this writer's manifest read and
    its commit attempt (Iceberg's optimistic-concurrency
    CommitFailedException analogue). The loser's data files are
    unreferenced orphans — safe, and swept by expire_snapshots. Retry
    by re-reading the manifest and re-deriving the change."""

META_DIR = "_meta"
DATA_DIR = "data"


def bucket_expr(key_cols: tuple[str, ...], n_buckets: int) -> Column:
    """Deterministic bucket id from the primary key (recomputed on
    read — never stored, so files stay pure row data)."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(n_buckets)).cast("int")


BRANCHES_DIR = "_meta_branches"


class LakeTable:
    def __init__(self, spark: SparkSession, root: str, branch: str = "main"):
        self.spark = spark
        self.root = root
        if branch != "main" and not re.fullmatch(r"[A-Za-z0-9_\-]+", branch):
            raise ValueError(f"invalid branch name {branch!r}")
        self.branch = branch
        # Props to fold into the NEXT commit's manifest (props otherwise
        # carry forward unchanged). Used e.g. when a writer that needs
        # tombstone retention (stream_sync) attaches to a table created
        # without it — the prop must be durable before compact() could
        # drop the retained tombstones.
        self._pending_props: dict = {}

    def want_props(self, **updates) -> None:
        """Merge `updates` into the table props at the next commit."""
        self._pending_props.update(updates)

    # ---------- manifest plumbing ----------

    @property
    def _meta_dir(self) -> str:
        """Manifest directory for this branch. `main` keeps the
        historical `_meta` layout; named branches live under
        `_meta_branches/<name>` — data files are shared by reference
        (immutable), only metadata forks."""
        if self.branch == "main":
            return os.path.join(self.root, META_DIR)
        return os.path.join(self.root, BRANCHES_DIR, self.branch)

    @property
    def _version_path(self) -> str:
        return os.path.join(self._meta_dir, "VERSION")

    def exists(self) -> bool:
        return os.path.exists(self._version_path)

    def current_version(self) -> int:
        with open(self._version_path) as f:
            return int(f.read().strip())

    def manifest(self, version: int | None = None) -> dict:
        v = self.current_version() if version is None else version
        with open(os.path.join(self._meta_dir, f"v{v}.json")) as f:
            return json.load(f)

    @property
    def schema(self) -> T.StructType:
        return T.StructType.fromJson(self.manifest()["schema"])

    @property
    def n_buckets(self) -> int:
        return int(self.manifest()["n_buckets"])

    def key_cols(self) -> tuple[str, ...]:
        return tuple(self.manifest()["key"])

    def committed_epochs(self, stream: str) -> dict[str, dict]:
        return self.manifest().get("committed", {}).get(stream, {})

    def is_epoch_committed(self, stream: str, epoch: int) -> bool:
        return self.exists() and str(epoch) in self.committed_epochs(stream)

    def watermark(self, stream: str) -> int | None:
        """Highest applied LSN for a stream (resume point)."""
        if not self.exists():
            return None
        eps = self.committed_epochs(stream)
        # Epochs committed by non-lsn writers (stream_sync batch ids,
        # scd applies) carry no to_lsn; they don't advance the LSN
        # watermark but must not crash resume on a mixed-lifecycle table.
        bounds = [int(e["to_lsn"]) for e in eps.values() if "to_lsn" in e]
        if not bounds:
            return None
        return max(bounds)

    # Zone maps: per-file [min, max] kept in the manifest for the key
    # columns and the winner cursor. Strings longer than this are
    # truncated — lower bounds truncate plainly, upper bounds truncate
    # and increment the last code point (the Iceberg truncate()
    # transform rule) so the bound stays a true upper bound.
    _STATS_TRUNCATE = 96

    def _stats_cols(self, manifest: dict) -> list[str]:
        order = (manifest.get("props") or {}).get("order") or {}
        cursor = order.get("cursor", "_ab_cdc_lsn")
        fields = {
            f["name"]: f["type"]
            for f in manifest["schema"]["fields"]
            if isinstance(f.get("type"), str)
        }
        # JSON-representable, totally-ordered types only; timestamps/
        # dates would need an epoch encoding and no key/cursor needs
        # them here (timestamp cursors map via unix_micros upstream).
        ok = {"string", "long", "integer", "short", "byte"}
        sort_order = (manifest.get("props") or {}).get("sort_order") or []
        cand = [*manifest["key"], cursor, *sort_order]
        seen: list[str] = []
        for c in cand:
            if fields.get(c) in ok and c not in seen:
                seen.append(c)
        return seen

    @staticmethod
    def _truncate_upper(s: str, limit: int) -> str | None:
        """A string >= every string with this prefix-truncation, or
        None when no such bound exists (all chars at the max code
        point — then the file simply reports no upper bound and is
        never pruned by it)."""
        if len(s) <= limit:
            return s
        t = s[:limit]
        for i in range(len(t) - 1, -1, -1):
            cp = ord(t[i])
            if cp < 0x10FFFF:
                return t[:i] + chr(cp + 1)
        return None

    def _file_stats(self, manifest: dict) -> dict:
        """{relpath: {col: [min, max]}} for every data+delta file in
        the manifest. Files inherited from the parent snapshot copy
        their stats forward (immutable files, immutable stats); only
        files new to this commit read their parquet footers — O(new
        files) metadata reads per commit, the Iceberg manifest-file
        economics. A column absent from a file's entry means "unknown"
        and the file is never pruned on it. In a multi-executor
        deployment the footer read would ride back with the write task
        (as Iceberg's DataFile metrics do); driver-side footer reads
        are the single-writer sandbox analogue."""
        import pyarrow.parquet as pq

        prev = self.manifest().get("stats", {}) if self.exists() else {}
        cols = self._stats_cols(manifest)
        paths = [p for ps in manifest["files"].values() for p in ps]
        paths += [p for ps in manifest.get("deltas", {}).values() for p in ps]
        out: dict[str, dict] = {}
        new_paths = [p for p in paths if p not in prev]

        def _footer(p: str):
            try:
                return p, pq.ParquetFile(os.path.join(self.root, p)).metadata
            except Exception:
                return p, None  # unreadable footer => no stats, never pruned

        # Footer reads are independent IO — read them concurrently
        # (pyarrow releases the GIL); sequential reads serialized the
        # commit path at one footer per round trip.
        footers: dict[str, object] = {}
        if len(new_paths) > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=min(8, len(new_paths))) as pool:
                for p, md in pool.map(_footer, new_paths):
                    footers[p] = md
        elif new_paths:
            footers[new_paths[0]] = _footer(new_paths[0])[1]
        for p in paths:
            if p in prev:
                out[p] = prev[p]
                continue
            md = footers.get(p)
            if md is None:
                continue
            idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
            entry: dict[str, list] = {}
            for c in cols:
                if c not in idx:
                    continue
                lo = hi = None
                complete = True
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(idx[c]).statistics
                    if st is None or not st.has_min_max:
                        complete = False
                        break
                    mn, mx = st.min, st.max
                    if isinstance(mn, bytes):
                        try:
                            mn, mx = mn.decode(), mx.decode()
                        except UnicodeDecodeError:
                            complete = False
                            break
                    lo = mn if lo is None else min(lo, mn)
                    hi = mx if hi is None else max(hi, mx)
                if not complete or lo is None:
                    continue
                if isinstance(lo, str):
                    lo = lo[: self._STATS_TRUNCATE]
                    hi = self._truncate_upper(hi, self._STATS_TRUNCATE)
                entry[c] = [lo, hi]
            out[p] = entry
        return out

    @staticmethod
    def _schema_id(schema_json: dict) -> str:
        """Stable id of a schema document (content hash, so identical
        schemas across branches/rollbacks share one id)."""
        return hashlib.md5(
            json.dumps(schema_json, sort_keys=True).encode()
        ).hexdigest()[:12]

    def _file_schemas(self, manifest: dict) -> tuple[dict, dict]:
        """(schemas, file_schema): the Iceberg per-data-file schema-id
        bookkeeping. Data files are immutable, so a file written under
        schema S must forever be READ with S and cast up to the
        current table schema — reading an INT64 parquet column with a
        widened string expectation is a hard reader error, not a cast.
        Files inherited from the parent keep their recorded id; files
        new to this commit get the committing schema's id. Manifests
        that predate this bookkeeping resolve missing entries to their
        own manifest schema at read time (the pre-evolution behavior,
        correct for any table that never widened)."""
        schemas = dict(manifest.get("schemas") or {})
        fmap = dict(manifest.get("file_schema") or {})
        if self.exists():
            parent = self.manifest()
            for k, v in (parent.get("schemas") or {}).items():
                schemas.setdefault(k, v)
            for k, v in (parent.get("file_schema") or {}).items():
                fmap.setdefault(k, v)
        sid = self._schema_id(manifest["schema"])
        schemas.setdefault(sid, manifest["schema"])
        paths = [p for ps in manifest["files"].values() for p in ps]
        paths += [p for ps in manifest.get("deltas", {}).values() for p in ps]
        fmap = {p: fmap[p] for p in paths if p in fmap}
        for p in paths:
            fmap.setdefault(p, sid)
        used = set(fmap.values()) | {sid}
        return {k: v for k, v in schemas.items() if k in used}, fmap

    def _commit(self, manifest: dict) -> int:
        """Optimistic-concurrency commit (Iceberg's model): the
        manifest's pinned `parent` must still be the table's current
        version — a writer that read state at V and tries to commit
        over W != V has derived its change from a stale snapshot and
        would silently erase W's effects, so it fails with
        CommitConflictError instead. The manifest file itself is
        created exclusively (O_EXCL): even two writers racing the SAME
        parent serialize — exactly one creates v{N}.json, the loser
        conflicts. The VERSION swap stays the atomic visibility point.

        Normal operation remains single-writer (module docstring) —
        this guard turns an operator mistake at the 10^10 point (two
        schedulers running the same sync) from silent data loss into a
        clean retryable error."""
        meta = self._meta_dir
        os.makedirs(meta, exist_ok=True)
        if "stats" not in manifest:
            manifest["stats"] = self._file_stats(manifest)
        manifest["schemas"], manifest["file_schema"] = self._file_schemas(manifest)
        # Wall-clock commit stamp (Iceberg snapshot timestamp-ms): the
        # basis for AS-OF-TIMESTAMP time travel and retention policy.
        # Always re-stamped — rollback/reset/publish manifests derived
        # from older snapshots are NEW commits with their own time.
        manifest["committed_at_us"] = time.time_ns() // 1000
        cur = self.current_version() if self.exists() else None
        if "parent" in manifest and manifest["parent"] != cur:
            raise CommitConflictError(
                f"stale commit: derived from parent {manifest['parent']}, "
                f"table is now at {cur} (concurrent writer)"
            )
        version = (cur + 1) if cur is not None else 0
        manifest["version"] = version
        mpath = os.path.join(meta, f"v{version}.json")
        try:
            with open(mpath, "x") as f:
                json.dump(manifest, f)
        except FileExistsError:
            # an invisible v{N}.json (VERSION never swapped to N) is a
            # crash orphan from a writer that died mid-commit — recovery
            # must replace it, not poison the table. A visible one means
            # a racer already swapped: conflict.
            if (self.current_version() if self.exists() else -1) >= version:
                raise CommitConflictError(
                    f"lost the commit race for version {version} "
                    "(concurrent writer committed it first)"
                ) from None
            tmp_m = mpath + f".tmp-{uuid.uuid4().hex}"
            with open(tmp_m, "w") as f:
                json.dump(manifest, f)
            os.replace(tmp_m, mpath)
        tmp = self._version_path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, self._version_path)  # the atomic commit point
        return version

    # ---------- data IO ----------

    def _write_files(
        self,
        df: DataFrame | list[tuple[DataFrame, bool]],
        n_buckets: int,
        key: tuple[str, ...],
        aligned: bool = False,
        sort_cols: tuple[str, ...] | None = None,
        max_records_per_file: int | None = None,
    ) -> dict[str, list[str]]:
        """Write df as one parquet dir per bucket; returns
        {bucket: [file paths relative to root]}. Uses hash
        repartitioning on the bucket id so each output task writes one
        bucket's rows (co-located with the MERGE shuffle key).

        aligned=True skips the repartition+sort: the caller asserts the
        input partitions are already bucket-pure and key-clustered
        (true for rows scanned out of this table's own bucket files,
        e.g. the carried side of a COW merge — narrow scan->filter->
        write, no shuffle). At 10^10 events this halves the MERGE's
        disk traffic: the table payload is written once, not
        shuffled + written.

        A list of (df, aligned) parts writes ALL parts in ONE Spark
        job: each part is prepared with its own repartition/sort (or
        none when aligned) and the prepared frames union — a narrow
        union, so every part keeps its own partitioning and each task
        still writes its own buckets' files. One write job per COMMIT
        instead of one per part (the COW merge has two parts; a job
        per part doubled the sync loop's scheduler round trips)."""
        commit_id = uuid.uuid4().hex
        rel_dir = os.path.join(DATA_DIR, commit_id)
        out_dir = os.path.join(self.root, rel_dir)
        parts = df if isinstance(df, list) else [(df, aligned)]

        def prep(part: DataFrame, part_aligned: bool) -> DataFrame:
            bucketed = part.withColumn("_bucket", bucket_expr(key, n_buckets))
            if not part_aligned:
                bucketed = (
                    bucketed.repartition(n_buckets, F.col("_bucket"))
                    # Iceberg sort-order analogue: cluster rows within
                    # each bucket file — by key for MERGE locality, or
                    # by an explicit sort order (compact(sort_by=...))
                    # so the column's per-file zone maps become
                    # disjoint and read_range prunes to O(matching
                    # files).
                    .sortWithinPartitions("_bucket", *(sort_cols or key))
                )
            return bucketed

        bucketed = prep(*parts[0])
        for extra in parts[1:]:
            bucketed = bucketed.unionByName(prep(*extra))
        writer = bucketed.write.partitionBy("_bucket").mode("overwrite")
        if max_records_per_file:
            # sorted buckets split into range-disjoint files, so the
            # per-file zone maps actually prune (a single file per
            # bucket would span the bucket's whole value range)
            writer = writer.option("maxRecordsPerFile", str(int(max_records_per_file)))
        writer.parquet(out_dir)
        files: dict[str, list[str]] = {}
        for dirpath, _dirnames, filenames in os.walk(out_dir):
            for fn in filenames:
                if not fn.endswith(".parquet"):
                    continue
                # dirpath ends with _bucket=K
                b = os.path.basename(dirpath).split("=", 1)[1]
                files.setdefault(b, []).append(
                    os.path.relpath(os.path.join(dirpath, fn), self.root)
                )
        return files

    def read(self, buckets: list[int] | None = None, version: int | None = None) -> DataFrame:
        """Snapshot read; optionally only the given buckets (partition
        pruning by manifest — no directory listing at scan time) and/or
        a historical snapshot (time travel — every manifest is
        retained, like Iceberg snapshots)."""
        m = self.manifest(version)
        schema = T.StructType.fromJson(m["schema"])
        file_map: dict[str, list[str]] = m["files"]
        if buckets is None:
            paths = [p for ps in file_map.values() for p in ps]
        else:
            want = {str(b) for b in buckets}
            paths = [p for b, ps in file_map.items() if b in want for p in ps]
        return self._scan(paths, schema, m)

    def _scan(self, paths: list[str], target: T.StructType, m: dict) -> DataFrame:
        """Scan data files grouped by the schema they were WRITTEN
        with (manifest file_schema ids), casting each group up to the
        snapshot schema — Iceberg read-time type promotion. A table
        that never evolved has exactly one group and this is the same
        single multi-path scan as before; after a widening, only the
        pre-widening files take the extra (columnar, codegen) cast
        projection. Files without a recorded id (pre-bookkeeping
        manifests) read with the snapshot schema directly."""
        if not paths:
            return self.spark.createDataFrame([], target)
        fmap = m.get("file_schema") or {}
        schemas = m.get("schemas") or {}
        tgt_id = self._schema_id(target.jsonValue())
        groups: dict[str, list[str]] = {}
        for p in paths:
            sid = fmap.get(p, tgt_id)
            groups.setdefault(sid if sid in schemas else tgt_id, []).append(p)
        parts = []
        for sid, ps in sorted(groups.items()):
            sch = T.StructType.fromJson(schemas[sid]) if sid != tgt_id else target
            df = self.spark.read.schema(sch).parquet(
                *[os.path.join(self.root, p) for p in ps]
            )
            if sch != target:
                df = conform(df, target)
            parts.append(df)
        out = parts[0]
        for df in parts[1:]:
            out = out.unionByName(df)
        return out

    # ---------- table operations ----------

    def props(self, version: int | None = None) -> dict:
        return self.manifest(version).get("props", {}) if self.exists() else {}

    def read_live(self, **kw) -> DataFrame:
        """Visible rows: winner-resolves merge-on-read deltas and
        filters retained tombstones when the table was written with
        keep_tombstones."""
        if self.manifest(kw.get("version")).get("deltas"):
            return self.read_resolved(**kw)
        df = self.read(**kw)
        if (
            self.props(kw.get("version")).get("keep_tombstones")
            and "_ab_cdc_deleted_at" in df.columns
        ):
            return df.filter(F.col("_ab_cdc_deleted_at").isNull())
        return df

    def create(
        self,
        df: DataFrame,
        key: tuple[str, ...],
        n_buckets: int,
        stream: str | None = None,
        epoch: int | None = None,
        epoch_meta: dict | None = None,
        props: dict | None = None,
        aligned: bool = False,
    ) -> int:
        body = df.drop("_bucket") if aligned else df
        files = self._write_files(df, n_buckets, key, aligned=aligned)
        manifest = {
            "parent": self.current_version() if self.exists() else None,
            "schema": body.schema.jsonValue(),
            "key": list(key),
            "n_buckets": n_buckets,
            "files": files,
            "committed": self.manifest().get("committed", {}) if self.exists() else {},
            "props": props if props is not None else self.props(),
        }
        if stream is not None and epoch is not None:
            manifest["committed"].setdefault(stream, {})[str(epoch)] = epoch_meta or {}
        return self._commit(manifest)

    def commit_marker_epoch(
        self, stream: str, epoch: int | str, epoch_meta: dict | None = None
    ) -> int | None:
        """Commit an epoch entry with NO data change (new manifest
        version, same files/deltas/schema). The CDC heartbeat surface:
        Debezium emits heartbeat records so the connector's offset (and
        therefore the source's WAL retention horizon) advances even when
        no tracked table changed (debezium heartbeat.interval.ms;
        DebeziumRecordPublisher's offset commits). Here the marker's
        `to_lsn` advances watermark() so the next sync plans strictly
        above it. Idempotent: re-committing an existing epoch key is a
        no-op returning None."""
        if not self.exists():
            raise ValueError(
                "marker epochs need an existing table (no stream has "
                "committed yet — there is no watermark to advance)"
            )
        manifest = self.manifest()
        committed = manifest.setdefault("committed", {})
        if str(epoch) in committed.get(stream, {}):
            return None
        committed.setdefault(stream, {})[str(epoch)] = epoch_meta or {}
        # want_props() promises "folds into the NEXT commit" — a marker
        # commit is a commit (vector_index relies on this to make its
        # codebook durable right after creation).
        manifest["props"] = {**manifest.get("props", {}), **self._pending_props}
        manifest["parent"] = self.current_version()
        return self._commit(manifest)

    def rollback(self, version: int) -> int:
        """Iceberg ``rollback_to_snapshot`` analogue: commit a NEW
        snapshot whose entire logical state — files, deltas, schema,
        props, and the committed-epoch log — is the target version's.
        Bad-sync recovery at the 10^10 point without rewriting a byte:
        the commit is metadata-only and atomic (same optimistic
        `_commit` as every write).

        Because the committed-epoch log is part of the manifest, the
        stream WATERMARK rolls back with the data: the next run_sync
        re-plans strictly above the restored watermark and re-applies
        the undone range; the undone epochs' keys are no longer in the
        log, so they re-commit instead of being skipped (pinned in
        tests/test_rollback.py — the epoch-skip / rollback interplay
        is the part naive implementations get wrong).

        History stays monotone: the undone versions remain time-
        travelable until expire_snapshots reclaims them, and the new
        manifest records `rollback_of` for provenance. Rolling back to
        an EXPIRED snapshot raises FileNotFoundError (its files may be
        gone); rolling back to the current version is a no-op."""
        cur = self.current_version()
        if version == cur:
            return cur
        target = self.manifest(version)  # FileNotFoundError if expired
        manifest = {
            k: target[k]
            for k in target
            if k not in ("version", "parent", "rollback_of")
        }
        # stats carried verbatim (immutable files, immutable stats):
        # the whole rollback is O(1) metadata, zero footer reads.
        manifest["parent"] = cur
        manifest["rollback_of"] = int(version)
        return self._commit(manifest)

    def reset(self) -> int:
        """The platform's RESET_CONNECTION job (DefaultJobCreator.java:
        93-118: every stream forced to FULL_REFRESH + OVERWRITE with an
        empty source, wiping destination data AND connection state so
        the next scheduled sync re-syncs from scratch), expressed as
        ONE metadata-only commit: files, merge-on-read deltas, and the
        whole committed-epoch log are cleared while schema, key,
        bucket layout, and props survive.

        Because the epoch log is cleared, every stream's watermark()
        returns None and the next run_sync re-plans from the beginning
        of the log — the undone epochs' keys are gone so they
        re-commit instead of being skipped (the same epoch-skip
        interplay rollback() handles). The pre-reset snapshots stay
        time-travel readable until expire_snapshots reclaims their
        (now unreferenced-at-head) data files; the reset itself
        rewrites zero bytes. Raises on a non-existent table."""
        m = self.manifest()
        manifest = {
            "parent": self.current_version(),
            "schema": m["schema"],
            "key": m["key"],
            "n_buckets": m["n_buckets"],
            "files": {},
            "deltas": {},
            "committed": {},
            "props": m.get("props", {}),
            "reset_of": self.current_version(),
        }
        return self._commit(manifest)

    # ---------- branches (write-audit-publish) ----------

    def create_branch(self, name: str) -> "LakeTable":
        """Fork a metadata branch at the current snapshot — the
        Iceberg branch half of WRITE-AUDIT-PUBLISH, the production CDC
        validation pattern: sync the next batch into a branch, audit
        it (row counts, invariants, IVM reconciliation), and only then
        `publish_branch` it to main. Data files are shared by
        reference (immutable); the branch gets its own manifest chain
        under `_meta_branches/<name>`, seeded with a verbatim copy of
        the current manifest — including the committed-epoch log, so
        run_sync on the branch resumes exactly where main's watermark
        stands. O(1) metadata (stats carried, zero footer reads).

        The audit diff is `branch.changes(0)`: branch version 0 IS the
        fork state, so the standard changelog read classifies exactly
        what the branch's syncs would publish (bucket-pruned as
        always)."""
        br = LakeTable(self.spark, self.root, branch=name)
        if br.branch == self.branch:
            raise ValueError("cannot branch onto itself")
        if br.exists():
            raise ValueError(f"branch {name!r} already exists")
        m = self.manifest()
        seed = {k: m[k] for k in m if k not in ("version", "parent")}
        br._commit(seed)
        # Fork provenance lives in a branch-level sidecar (manifests
        # are rebuilt by every commit and would drop a custom key).
        with open(os.path.join(br._meta_dir, "BRANCH.json"), "w") as f:
            json.dump(
                {"branch": name, "from_branch": self.branch,
                 "from_version": self.current_version()},
                f,
            )
        return br

    def branch_info(self) -> dict | None:
        """Fork provenance recorded at create_branch (None on main)."""
        p = os.path.join(self._meta_dir, "BRANCH.json")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def branches(self) -> list[str]:
        bdir = os.path.join(self.root, BRANCHES_DIR)
        if not os.path.isdir(bdir):
            return []
        return sorted(
            d for d in os.listdir(bdir)
            if os.path.exists(os.path.join(bdir, d, "VERSION"))
        )

    # ---------- tags (named snapshot refs) ----------

    @property
    def _tags_path(self) -> str:
        return os.path.join(self._meta_dir, "TAGS.json")

    def tags(self) -> dict[str, int]:
        """{tag: version} for this branch (Iceberg TAG refs)."""
        if not os.path.exists(self._tags_path):
            return {}
        with open(self._tags_path) as f:
            return {k: int(v) for k, v in json.load(f).items()}

    def tag(self, name: str, version: int | None = None) -> int:
        """Pin a snapshot under an immutable name (Iceberg
        `manageSnapshots().createTag`): the audit/compliance ref for
        "the table as shipped" — `read(version=tags()[name])` serves
        it forever, and `expire_snapshots` RETAINS tagged versions
        beyond both keep_last and the age cutoff until the tag is
        dropped. Tags are immutable (re-tagging an existing name
        raises — drop first); tagging an expired version raises
        FileNotFoundError (its manifest is gone). Atomic sidecar
        update (tmp + rename), same discipline as VERSION."""
        v = self.current_version() if version is None else int(version)
        self.manifest(v)  # FileNotFoundError if expired / never existed
        cur = self.tags()
        if name in cur:
            raise ValueError(
                f"tag {name!r} already points at v{cur[name]} "
                "(tags are immutable; drop_tag first)"
            )
        cur[name] = v
        tmp = self._tags_path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(cur, f)
        os.replace(tmp, self._tags_path)
        return v

    def drop_tag(self, name: str) -> None:
        cur = self.tags()
        if name not in cur:
            raise ValueError(f"no tag {name!r}")
        del cur[name]
        tmp = self._tags_path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(cur, f)
        os.replace(tmp, self._tags_path)

    def publish_branch(self, branch: "LakeTable") -> int:
        """Fast-forward this branch to a child branch's head — the
        PUBLISH half of write-audit-publish (Iceberg
        `manageSnapshots().fastForwardBranch`). Precondition: this
        branch has not advanced past the fork point (fast-forward
        only, exactly Iceberg's ancestor rule for linear histories) —
        a concurrent commit here means the audit ran against a stale
        base, so publishing raises CommitConflictError instead of
        silently merging. The publish itself is one O(1) atomic
        metadata commit; the audited data files become visible without
        being rewritten or recopied."""
        bm = branch.manifest()
        fork = branch.branch_info()
        if not fork or fork.get("from_branch") != self.branch:
            raise ValueError(
                f"branch {branch.branch!r} was not forked from "
                f"{self.branch!r}"
            )
        if int(fork["from_version"]) != self.current_version():
            raise CommitConflictError(
                f"fast-forward refused: {self.branch!r} advanced from "
                f"{fork['from_version']} to {self.current_version()} since "
                f"the branch forked — re-branch and re-audit"
            )
        manifest = {k: bm[k] for k in bm if k not in ("version", "parent")}
        manifest["parent"] = self.current_version()
        manifest["published_from"] = {
            "branch": branch.branch,
            "version": branch.current_version(),
        }
        return self._commit(manifest)

    def drop_branch(self, name: str) -> None:
        """Delete a branch's metadata (its data files are reclaimed by
        the next expire_snapshots once unreferenced)."""
        br = LakeTable(self.spark, self.root, branch=name)
        if br.branch == "main":
            raise ValueError("cannot drop main")
        import shutil

        shutil.rmtree(br._meta_dir, ignore_errors=True)

    def _foreign_referenced_files(self) -> set[str]:
        """Every data/delta path referenced by ANY manifest of ANY
        OTHER branch — expire_snapshots must treat these as live no
        matter what this branch retains (Iceberg's branch-aware
        reachability)."""
        dirs: list[str] = []
        if self.branch != "main":
            dirs.append(os.path.join(self.root, META_DIR))
        bdir = os.path.join(self.root, BRANCHES_DIR)
        if os.path.isdir(bdir):
            dirs += [
                os.path.join(bdir, d)
                for d in os.listdir(bdir)
                if d != self.branch
            ]
        out: set[str] = set()
        for md in dirs:
            if not os.path.isdir(md):
                continue
            for fn in os.listdir(md):
                if not (fn.startswith("v") and fn.endswith(".json")):
                    continue
                try:
                    with open(os.path.join(md, fn)) as f:
                        m = json.load(f)
                except (OSError, json.JSONDecodeError):
                    continue
                for ps in m.get("files", {}).values():
                    out.update(ps)
                for ps in m.get("deltas", {}).values():
                    out.update(ps)
        return out

    def overwrite(self, df: DataFrame, **kw) -> int:
        """Full-refresh + overwrite (truncate-then-copy semantics of
        JdbcBufferedConsumerFactory.java:173, as one atomic commit)."""
        return self.create(df, kw.pop("key", self.key_cols() if self.exists() else ("url",)),
                           kw.pop("n_buckets", self.n_buckets if self.exists() else 32), **kw)

    def append(
        self,
        df: DataFrame,
        stream: str | None = None,
        epoch: int | None = None,
        epoch_meta: dict | None = None,
        key: tuple[str, ...] = ("url",),
        n_buckets: int = 32,
    ) -> int:
        """incremental + append: add files, never rewrite. `key`/
        `n_buckets` take effect only at table CREATION (first append);
        the manifest's values win thereafter — same contract as
        merge_into."""
        if not self.exists():
            return self.create(df, key, n_buckets, stream, epoch, epoch_meta)
        if stream is not None and epoch is not None and self.is_epoch_committed(stream, epoch):
            return self.current_version()
        m = self.manifest()
        old_schema = T.StructType.fromJson(m["schema"])
        target = merge_schemas(old_schema, df.schema)
        bad = incompatible_widenings(old_schema, target)
        if bad:
            # Committing this schema would make existing files
            # unreadable; append never rewrites, so refuse — the COW
            # merge path handles such widenings with a full rewrite.
            raise ValueError(
                f"append cannot widen {bad} over existing files; "
                "use the copy-on-write merge path"
            )
        df = conform(df, target)
        files = self._write_files(df, int(m["n_buckets"]), tuple(m["key"]))
        new_files = {b: list(ps) for b, ps in m["files"].items()}
        for b, ps in files.items():
            new_files.setdefault(b, []).extend(ps)
        manifest = {
            "parent": m["version"],
            "schema": target.jsonValue(),
            "key": m["key"],
            "n_buckets": m["n_buckets"],
            "files": new_files,
            "deltas": m.get("deltas", {}),
            "committed": m.get("committed", {}),
            "props": {**m.get("props", {}), **self._pending_props},
        }
        if stream is not None and epoch is not None:
            manifest["committed"].setdefault(stream, {})[str(epoch)] = epoch_meta or {}
        return self._commit(manifest)

    def replace_buckets(
        self,
        new_data: DataFrame | list[tuple[DataFrame, bool]],
        touched: list[int],
        schema: T.StructType,
        stream: str | None = None,
        epoch: int | None = None,
        epoch_meta: dict | None = None,
        sort_cols: tuple[str, ...] | None = None,
        max_records_per_file: int | None = None,
    ) -> int:
        """Copy-on-write commit: new files for `touched` buckets,
        untouched buckets carried forward by reference.

        new_data is either one DataFrame or a list of
        (df, aligned) parts written in ONE job into the same
        snapshot — the COW merge passes (carried, aligned=True) and
        (merged, aligned=False) so the carried table payload is never
        shuffled (see _write_files)."""
        m = self.manifest()
        parts = new_data if isinstance(new_data, list) else [(new_data, False)]
        files = self._write_files(
            parts, int(m["n_buckets"]), tuple(m["key"]),
            sort_cols=sort_cols, max_records_per_file=max_records_per_file,
        )
        new_files = {b: ps for b, ps in m["files"].items() if int(b) not in set(touched)}
        for b, ps in files.items():
            new_files.setdefault(b, []).extend(ps)
        # Deltas (merge-on-read) of rewritten buckets are folded into the
        # new base files by the caller; untouched buckets keep theirs.
        new_deltas = {
            b: ps
            for b, ps in m.get("deltas", {}).items()
            if int(b) not in set(touched) and ps
        }
        manifest = {
            "parent": m["version"],
            "schema": schema.jsonValue(),
            "key": m["key"],
            "n_buckets": m["n_buckets"],
            "files": new_files,
            "deltas": new_deltas,
            "committed": m.get("committed", {}),
            "props": {**m.get("props", {}), **self._pending_props},
        }
        if stream is not None and epoch is not None:
            manifest["committed"].setdefault(stream, {})[str(epoch)] = epoch_meta or {}
        return self._commit(manifest)


    # ---------- merge-on-read (Iceberg v2 equality-delete analogue) ----------

    def append_deltas(
        self,
        winners: DataFrame,
        stream: str | None = None,
        epoch: int | None = None,
        epoch_meta: dict | None = None,
        order: dict | None = None,
        aligned: bool = False,
    ) -> int:
        """Merge-on-read commit: the batch's per-key winners — tombstone
        rows INCLUDED, acting as Iceberg v2 equality-delete markers on
        `key` — land as per-bucket delta files; the base is never
        rewritten. Per-epoch write cost is O(batch winners), not
        O(table) — the streaming-upsert layout (Hudi MoR / Paimon /
        Iceberg v2) for the 10^10-event point. Readers resolve the
        winner rule across base+deltas (`read_resolved`); `compact`
        folds deltas into the base.

        `order` (stored in props on first commit) names the winner
        ordering: {"cursor", "secondary", "ab_id"}.

        `aligned=True`: the caller asserts `winners` is already
        bucket-partitioned and key-clustered under THIS table's
        (key, n_buckets) layout (winner_agg_bucketed), so the file
        writer skips its repartition+sort."""
        if stream is not None and epoch is not None and self.exists() and self.is_epoch_committed(stream, epoch):
            return self.current_version()
        if not self.exists():
            props = {"mor": True}
            if order:
                props["order"] = order
            # Epoch 0: winners ARE the base; tombstones need no marker
            # (there is nothing underneath to mask).
            base = winners
            if "_ab_cdc_deleted_at" in winners.columns:
                base = winners.filter(F.col("_ab_cdc_deleted_at").isNull())
            return self.create(base, ("url",), 32, stream, epoch, epoch_meta, props=props)
        m = self.manifest()
        old_schema = T.StructType.fromJson(m["schema"])
        body = winners.drop("_bucket") if aligned else winners
        target = merge_schemas(old_schema, body.schema)
        bad = incompatible_widenings(old_schema, target)
        if bad:
            raise ValueError(
                f"append_deltas cannot widen {bad} over existing files; "
                "merge_into routes such epochs through the COW rewrite"
            )
        if aligned and body.schema != target:
            # conform()'s projection would preserve the physical
            # partitioning, but the caller bucketed on the UNWIDENED key
            # values — only byte-identical schemas keep the alignment
            # premise airtight; anything else takes the shuffled path.
            aligned = False
            winners = body
        files = self._write_files(
            conform(winners, target) if not aligned else winners,
            int(m["n_buckets"]), tuple(m["key"]), aligned=aligned,
        )
        deltas = {b: list(ps) for b, ps in m.get("deltas", {}).items()}
        for b, ps in files.items():
            deltas.setdefault(b, []).extend(ps)
        manifest = {
            "parent": m["version"],
            "schema": target.jsonValue(),
            "key": m["key"],
            "n_buckets": m["n_buckets"],
            "files": m["files"],
            "deltas": deltas,
            "committed": m.get("committed", {}),
            "props": {**m.get("props", {}), **self._pending_props},
        }
        if stream is not None and epoch is not None:
            manifest["committed"].setdefault(stream, {})[str(epoch)] = epoch_meta or {}
        return self._commit(manifest)

    def read_deltas(self, buckets: list[int] | None = None, version: int | None = None) -> DataFrame:
        m = self.manifest(version)
        schema = T.StructType.fromJson(m["schema"])
        dmap: dict[str, list[str]] = m.get("deltas", {})
        if buckets is None:
            paths = [p for ps in dmap.values() for p in ps]
        else:
            want = {str(b) for b in buckets}
            paths = [p for b, ps in dmap.items() if b in want for p in ps]
        return self._scan(paths, schema, m)

    def _order(self, version: int | None = None) -> dict:
        return self.props(version).get("order") or {
            "cursor": "_ab_cdc_lsn",
            "secondary": ["_ab_cdc_updated_at", "_airbyte_emitted_at"],
            "ab_id": "_airbyte_ab_id",
        }

    def read_resolved(self, buckets: list[int] | None = None, version: int | None = None) -> DataFrame:
        """Winner-resolved live view of a merge-on-read table: the
        reference ordering applied across base ∪ deltas per key, delete
        markers dropped. Base rows and delta rows both carry the full
        ordering tuple, so resolution is the same associative rule the
        writer uses — duplicated or re-delivered deltas converge.
        Uses the associative max-by-ordering aggregation (map-side
        combine, no sort, hot-key safe) — equivalence with the literal
        window is pinned in tests/test_dedup.py."""
        from airbyte_integrations_spark.operators.dedup import winner_agg

        m = self.manifest(version)
        base = self.read(buckets, version)
        if not m.get("deltas"):
            out = base
        else:
            o = self._order(version)
            out = winner_agg(
                base.unionByName(self.read_deltas(buckets, version)),
                tuple(m["key"]), o["cursor"], tuple(o["secondary"]), o["ab_id"],
            )
        if (
            "_ab_cdc_deleted_at" in out.columns
            and not self.props(version).get("keep_tombstones")
        ):
            out = out.filter(F.col("_ab_cdc_deleted_at").isNull())
        return out

    # ---------- zone-map pruned reads ----------

    def _read_paths(
        self, paths: list[str], schema: T.StructType, m: dict | None = None
    ) -> DataFrame:
        return self._scan(paths, schema, m if m is not None else self.manifest())

    def _pruned_paths(
        self, version: int | None, keep, buckets: set[str] | None = None
    ) -> tuple[list[str], list[str], int]:
        """(base_paths, delta_paths, n_total_candidates) keeping files
        where keep(stats_entry) is True. Missing stats keep the file
        (pruning must never be able to lose rows)."""
        m = self.manifest(version)
        stats = m.get("stats", {})

        def walk(fmap: dict) -> tuple[list[str], int]:
            kept, total = [], 0
            for b, ps in fmap.items():
                if buckets is not None and b not in buckets:
                    continue
                for p in ps:
                    total += 1
                    if keep(stats.get(p, {})):
                        kept.append(p)
            return kept, total

        base, n1 = walk(m["files"])
        deltas, n2 = walk(m.get("deltas", {}))
        return base, deltas, n1 + n2

    def _resolve(self, base: DataFrame, deltas: DataFrame, version: int | None,
                 include_deletes: bool = False) -> DataFrame:
        from airbyte_integrations_spark.operators.dedup import winner_agg

        m = self.manifest(version)
        if any(ps for ps in m.get("deltas", {}).values()):
            o = self._order(version)
            out = winner_agg(
                base.unionByName(deltas), tuple(m["key"]),
                o["cursor"], tuple(o["secondary"]), o["ab_id"],
            )
        else:
            # COW invariant: the base is already winner-unique per key
            # — resolution would be an identity shuffle.
            out = base
        if "_ab_cdc_deleted_at" in out.columns and not include_deletes:
            out = out.filter(F.col("_ab_cdc_deleted_at").isNull())
        return out

    def read_since(self, cursor_gt: int, version: int | None = None,
                   include_deletes: bool = False) -> DataFrame:
        """Changed-since scan: live rows whose winning cursor is
        strictly greater than `cursor_gt` — the downstream-consumer
        feed ("give me everything that changed since my watermark").
        Zone maps prune every file whose max cursor <= the watermark
        BEFORE the scan: at the 10^10-event point a consumer that is
        one epoch behind reads one epoch's delta files, not the table.

        Correct under pruning because the winner rule is a max: a key
        whose winner beats the watermark has that winner row in a kept
        file (its file's max >= the row's cursor > watermark), and the
        winner beats every pruned older version by definition; keys
        whose winner is <= the watermark are removed by the final
        filter wherever they survive pruning. Equality with the
        unpruned `read_live().filter(cursor > X)` is pinned in
        tests/test_zonemap.py.

        include_deletes=True keeps tombstone winners (a delete IS a
        change) — complete for uncompacted epochs, and at any age on a
        keep_tombstones table; an Iceberg changelog-scan analogue."""
        m = self.manifest(version)
        cursor = self._order(version)["cursor"]

        def keep(entry: dict) -> bool:
            rng = entry.get(cursor)
            return rng is None or rng[1] > cursor_gt

        base_p, delta_p, _ = self._pruned_paths(version, keep)
        schema = T.StructType.fromJson(m["schema"])
        out = self._resolve(
            self._read_paths(base_p, schema, m),
            self._read_paths(delta_p, schema, m),
            version, include_deletes,
        )
        return out.filter(F.col(cursor) > F.lit(cursor_gt))

    def read_range(
        self,
        col: str,
        lo=None,
        hi=None,
        version: int | None = None,
    ) -> DataFrame:
        """Zone-map-pruned range scan on any stats column (the payoff
        of `compact(sort_by=col)`: per-file [min, max] become disjoint
        after clustering, so a range touches O(matching files), not the
        table — Iceberg's sort-order + file-skipping read). Bounds are
        inclusive; either may be None (half-open).

        Winner-soundness requires ONE physical version per key, which
        the COW base guarantees but merge-on-read deltas break: a key
        whose winner lies outside the range but an older delta version
        inside it would resurrect the old image. A table with
        uncompacted deltas therefore REJECTS read_range (compact()
        first, or use read_live().filter(...) — unpruned but always
        correct). read_since remains the pruned feed that IS sound
        under deltas (max-cursor argument).

        Equality with the unpruned read_live().filter is pinned in
        tests/test_sort_order.py."""
        m = self.manifest(version)
        if any(ps for ps in m.get("deltas", {}).values()):
            raise ValueError(
                "read_range needs a compacted table (merge-on-read deltas "
                "can hold older versions of a key than the base, which "
                "breaks range pruning) — run compact() first or use "
                "read_live().filter(...)"
            )

        def keep(entry: dict) -> bool:
            rng = entry.get(col)
            if rng is None:
                return True  # unknown stats: never prune
            f_lo, f_hi = rng
            if hi is not None and (f_lo is not None and f_lo > hi):
                return False
            if lo is not None and (f_hi is not None and f_hi < lo):
                return False
            return True

        base_p, _dp, _n = self._pruned_paths(version, keep)
        schema = T.StructType.fromJson(m["schema"])
        out = self._read_paths(base_p, schema, m)
        if (
            self.props(version).get("keep_tombstones")
            and "_ab_cdc_deleted_at" in out.columns
        ):
            out = out.filter(F.col("_ab_cdc_deleted_at").isNull())
        if lo is not None:
            out = out.filter(F.col(col) >= F.lit(lo))
        if hi is not None:
            out = out.filter(F.col(col) <= F.lit(hi))
        return out

    def range_prune_counts(
        self, col: str, lo=None, hi=None, version: int | None = None
    ) -> tuple[int, int]:
        """(kept_files, total_files) the read_range pruning decides —
        metadata-only; used by tests and in-query scale asserts."""
        m = self.manifest(version)
        stats = m.get("stats", {})
        kept = total = 0
        for ps in m["files"].values():
            for p in ps:
                total += 1
                rng = stats.get(p, {}).get(col)
                if rng is None:
                    kept += 1
                    continue
                f_lo, f_hi = rng
                if hi is not None and f_lo is not None and f_lo > hi:
                    continue
                if lo is not None and f_hi is not None and f_hi < lo:
                    continue
                kept += 1
        return kept, total

    def changed_buckets(self, from_version: int, to_version: int) -> list[int] | None:
        """Buckets whose physical file set (base or delta) differs
        between two manifests — a metadata-only computation. Data and
        delta files are immutable once committed (rewrites always
        create new paths; carried buckets reference the SAME paths),
        so an identical per-bucket path list implies identical live
        rows in that bucket; a key's bucket never changes while
        n_buckets is fixed, so every changed key lives in a changed
        bucket. Returns None (meaning "all") when the bucket layouts
        are incomparable (rebucketed between the versions)."""
        m_from, m_to = self.manifest(from_version), self.manifest(to_version)
        if int(m_from["n_buckets"]) != int(m_to["n_buckets"]):
            return None
        names = (
            set(m_from["files"]) | set(m_to["files"])
            | set(m_from.get("deltas", {})) | set(m_to.get("deltas", {}))
        )
        return sorted(
            int(b)
            for b in names
            if m_from["files"].get(b) != m_to["files"].get(b)
            or m_from.get("deltas", {}).get(b) != m_to.get("deltas", {}).get(b)
        )

    def changes(
        self,
        from_version: int,
        to_version: int | None = None,
        include_update_preimage: bool = False,
    ) -> DataFrame:
        """Row-level diff between two snapshots — the Delta CDF /
        Iceberg ``create_changelog_view`` consumer surface: every key
        whose LIVE image differs between the versions, as the to-side
        row for `insert` / `update_postimage` and the BEFORE image for
        `delete`, tagged in `_change_type`. With
        ``include_update_preimage`` each update additionally emits the
        BEFORE image as `update_preimage` (Delta CDF's four-row-kind
        contract) — the signed feed incremental view maintenance
        (lakehouse/ivm.py) consumes. Works on any layout (COW, MoR,
        keep_tombstones) because it diffs the resolved live views
        rather than trusting physical change files.

        Scale shape: both sides are pruned to `changed_buckets` —
        the buckets whose file lists differ between the manifests, a
        metadata-only test — before one key-hash full-outer join. A
        CDC sync touching k of N buckets therefore diffs O(k/N of the
        table), not O(n); the worst case (every bucket touched, or a
        rebucket between the versions) is the same shuffle one MERGE
        epoch pays. Consumers that only need the monotone "changed
        since cursor X" feed should use read_since(), which zone-map
        prunes to O(changed files); changes() is the general diff
        (deletes and arbitrary version pairs included).

        The old side is conformed onto the to-version schema (additive
        evolution: dropped-in columns null-backfill in before images)."""
        if to_version is None:
            to_version = self.current_version()
        key = list(self.key_cols())
        cursor = self._order(to_version)["cursor"]
        schema_to = T.StructType.fromJson(self.manifest(to_version)["schema"])
        buckets = self.changed_buckets(from_version, to_version)
        old = conform(
            self.read_live(version=from_version, buckets=buckets), schema_to
        )
        new = self.read_live(version=to_version, buckets=buckets)
        o = old.select(
            *[F.col(k).alias(f"_ck_{k}") for k in key],
            F.struct(*[F.col(c) for c in new.columns]).alias("_old"),
        )
        n = new.select(
            *[F.col(k).alias(f"_ck_{k}") for k in key],
            F.struct(*[F.col(c) for c in new.columns]).alias("_new"),
        )
        j = o.join(n, on=[f"_ck_{k}" for k in key], how="full_outer")
        change = (
            F.when(F.col("_old").isNull(), F.lit("insert"))
            .when(F.col("_new").isNull(), F.lit("delete"))
            .when(
                ~F.col(f"_new.{cursor}").eqNullSafe(F.col(f"_old.{cursor}")),
                F.lit("update_postimage"),
            )
        )
        img = F.when(F.col("_new").isNull(), F.col("_old")).otherwise(
            F.col("_new")
        )
        if not include_update_preimage:
            return (
                j.select(change.alias("_change_type"), img.alias("_img"))
                .filter(F.col("_change_type").isNotNull())
                .select(
                    *[F.col(f"_img.{c}").alias(c) for c in new.columns],
                    "_change_type",
                )
            )
        # Delta-CDF four-kind feed: updates expand to (preimage, postimage).
        pair = F.when(
            change == "update_postimage",
            F.array(
                F.struct(
                    F.lit("update_preimage").alias("_ct"), F.col("_old").alias("_i")
                ),
                F.struct(
                    F.lit("update_postimage").alias("_ct"), F.col("_new").alias("_i")
                ),
            ),
        ).otherwise(
            F.array(F.struct(change.alias("_ct"), img.alias("_i")))
        )
        return (
            j.select(change.alias("_change_type"), pair.alias("_pair"))
            .filter(F.col("_change_type").isNotNull())
            .select(F.explode("_pair").alias("_e"))
            .select(
                *[F.col(f"_e._i.{c}").alias(c) for c in new.columns],
                F.col("_e._ct").alias("_change_type"),
            )
        )

    def key_bucket(self, *values) -> int:
        """Bucket id for a primary-key value (same JVM xxhash64 the
        writer uses — computed via a one-row plan so Python never
        reimplements the hash)."""
        m = self.manifest()
        key = list(m["key"])
        fields = {f["name"]: f for f in m["schema"]["fields"]}
        schema = T.StructType.fromJson(
            {"type": "struct", "fields": [fields[c] for c in key]}
        )
        row = self.spark.createDataFrame([tuple(values)], schema)
        return row.select(
            bucket_expr(tuple(key), int(m["n_buckets"])).alias("b")
        ).first()["b"]

    def read_key(self, *values, version: int | None = None) -> DataFrame:
        """Point lookup: the live row(s) for one primary-key value.
        Prunes to the key's hash bucket (manifest, no listing), then
        inside the bucket to files whose key zone map covers the value
        — with the writer's within-bucket key clustering
        (sortWithinPartitions in _write_files) most files hold a
        disjoint key range, so a lookup touches O(versions of this
        key) files, not O(bucket). Every surviving version of the key
        is in the kept set (covering ranges are kept), so winner
        resolution over the subset equals resolution over the table."""
        m = self.manifest(version)
        key = list(m["key"])
        if len(values) != len(key):
            raise ValueError(f"expected {len(key)} key values ({key})")
        bucket = str(self.key_bucket(*values))

        def keep(entry: dict) -> bool:
            for c, v in zip(key, values):
                rng = entry.get(c)
                if rng is None:
                    continue
                lo, hi = rng
                probe = v[: self._STATS_TRUNCATE] if isinstance(v, str) else v
                if probe < lo or (hi is not None and probe > hi):
                    return False
            return True

        base_p, delta_p, _ = self._pruned_paths(version, keep, buckets={bucket})
        schema = T.StructType.fromJson(m["schema"])
        out = self._resolve(
            self._read_paths(base_p, schema, m),
            self._read_paths(delta_p, schema, m),
            version,
        )
        for c, v in zip(key, values):
            out = out.filter(F.col(c) == F.lit(v))
        return out

    def compact(
        self,
        max_files_per_bucket: int = 1,
        sort_by: tuple[str, ...] | str | None = None,
        target_file_rows: int | None = None,
        zorder_by: tuple[str, ...] | None = None,
        zorder_bits: int = 16,
    ) -> int:
        """Maintenance: rewrite buckets whose file count (base + delta)
        exceeds the threshold (Iceberg rewrite_data_files analogue).
        For buckets with deltas this folds them into the base via the
        winner rule (delete markers drop out — safe under the planner's
        monotone-epoch guarantee, retained under keep_tombstones);
        pure-base fragmentation is rewritten data-identically.
        Committed as a new snapshot.

        `sort_by` is Iceberg's rewrite-with-SORT-ORDER strategy: EVERY
        bucket is rewritten with rows clustered by the given column(s)
        inside each bucket's files, the order is recorded in table
        props (`sort_order`), and the columns join the per-file zone
        maps — after which `read_range` on a sort column prunes to
        O(matching files) instead of scanning the bucket. The sort is
        per-bucket (sortWithinPartitions): no global Exchange is added
        at any table size. `target_file_rows` splits each sorted
        bucket into range-disjoint files (Iceberg target-file-size):
        without it a bucket is one file spanning the whole value range
        and file-level pruning has nothing to skip (row-group skipping
        inside the file still applies).

        `zorder_by` is the MULTI-column strategy (Iceberg
        rewrite_data_files zorder / Delta OPTIMIZE ZORDER BY,
        lakehouse/zorder.py): rows cluster on the Morton interleave of
        the normalized columns, so EVERY listed column's per-file
        zone maps become narrow and read_range prunes on each
        dimension independently — where sort_by only serves its lead
        column. Bounds come from one metadata-sized min/max aggregate;
        the key is pure codegen integer arithmetic; the sort stays
        per-bucket (no global Exchange). Numeric columns only."""
        m = self.manifest()
        dmap = m.get("deltas", {})
        if zorder_by is not None:
            if sort_by is not None:
                raise ValueError("pass sort_by or zorder_by, not both")
            fields = {
                f["name"]: f.get("type")
                for f in m["schema"]["fields"]
                if isinstance(f.get("type"), str)
            }
            from airbyte_integrations_spark.lakehouse.zorder import _NUMERIC

            bad = [
                c for c in zorder_by if fields.get(c) not in _NUMERIC
            ]
            if bad:
                raise ValueError(
                    f"zorder_by column(s) {bad} missing or non-numeric "
                    "(z-order normalization needs numeric bounds)"
                )
            # validate the interleave budget BEFORE want_props mutates
            # pending table props — a late interleave_bits raise would
            # otherwise leave a clustering claim that silently attaches
            # to the next unrelated commit
            if len(zorder_by) < 2:
                raise ValueError("z-order needs at least 2 columns")
            if zorder_bits * len(zorder_by) > 62:
                raise ValueError(
                    f"bits*n_cols = {zorder_bits * len(zorder_by)} "
                    "exceeds the 62-bit key"
                )
            fragmented = sorted(
                {int(b) for b in m["files"]} | {int(b) for b in dmap}
            )
            self.want_props(
                sort_order=list(zorder_by), zorder_bits=zorder_bits
            )
        elif sort_by is not None:
            sort_by = (sort_by,) if isinstance(sort_by, str) else tuple(sort_by)
            fields = {f["name"] for f in m["schema"]["fields"]}
            missing = [c for c in sort_by if c not in fields]
            if missing:
                raise ValueError(f"sort_by column(s) {missing} not in schema")
            # re-clustering is a full rewrite by definition
            fragmented = sorted({int(b) for b in m["files"]} | {int(b) for b in dmap})
            self.want_props(sort_order=list(sort_by))
        else:
            fragmented = sorted(
                {
                    int(b)
                    for b, ps in m["files"].items()
                    if len(ps) + len(dmap.get(b, [])) > max_files_per_bucket
                }
                | {int(b) for b, ps in dmap.items() if ps and len(ps) + len(m["files"].get(b, [])) > max_files_per_bucket}
            )
        if not fragmented:
            return m["version"]
        has_deltas = any(dmap.get(str(b)) for b in fragmented)
        aligned = False
        if has_deltas:
            o = self._order()
            key = tuple(m["key"])
            drop_tomb = (
                "_ab_cdc_deleted_at"
                in {f["name"] for f in m["schema"]["fields"]}
                and not self.props().get("keep_tombstones")
            )
            if sort_by is None and zorder_by is None:
                # bucket-keyed fold: the one Exchange is the rewrite's
                # own layout, so replace_buckets writes aligned (no
                # second shuffle/sort) — same single-exchange shape as
                # the MoR epoch write (operators/dedup.
                # winner_agg_bucketed; equivalence in tests/test_dedup)
                from airbyte_integrations_spark.operators.dedup import (
                    winner_agg_bucketed,
                )

                data = winner_agg_bucketed(
                    self.read(fragmented).unionByName(self.read_deltas(fragmented)),
                    key, o["cursor"], tuple(o["secondary"]), o["ab_id"],
                    bucket_expr(key, int(m["n_buckets"])), int(m["n_buckets"]),
                    drop_tombstones=drop_tomb,
                )
                aligned = True
            else:
                from airbyte_integrations_spark.operators.dedup import winner_agg

                data = winner_agg(
                    self.read(fragmented).unionByName(self.read_deltas(fragmented)),
                    key, o["cursor"], tuple(o["secondary"]), o["ab_id"],
                    drop_tombstones=drop_tomb,
                )
        else:
            data = self.read(fragmented)
        sort_cols: tuple | None = sort_by
        if zorder_by is not None:
            from airbyte_integrations_spark.lakehouse.zorder import zorder_key

            row = data.agg(
                *[F.min(c).alias(f"lo_{c}") for c in zorder_by],
                *[F.max(c).alias(f"hi_{c}") for c in zorder_by],
            ).collect()[0]
            bounds = {c: (row[f"lo_{c}"], row[f"hi_{c}"]) for c in zorder_by}
            sort_cols = (zorder_key(bounds, tuple(zorder_by), zorder_bits),)
        return self.replace_buckets(
            [(data, aligned)], fragmented, T.StructType.fromJson(m["schema"]),
            sort_cols=sort_cols,
            max_records_per_file=(
                target_file_rows
                if (sort_by is not None or zorder_by is not None)
                else None
            ),
        )

    def rebucket(self, n_buckets: int) -> int:
        """Partition evolution (Iceberg partition-spec evolution +
        rewrite_data_files analogue): rewrite the table into a
        different hash-bucket count as ONE new snapshot.

        Bucket counts are sized for a data volume; a table that grew
        100x needs more write parallelism and smaller per-bucket files.
        The migration preserves every contract the layout change could
        threaten: old snapshots keep their own layout and stay
        time-travel readable (read() lists files from the pinned
        manifest, never the directory); the epoch commit log carries
        forward unchanged so exactly-once resume and the LSN watermark
        survive; subsequent MERGEs read n_buckets from the manifest and
        bucket-align to the new layout automatically. Merge-on-read
        deltas are folded into the new base by the winner rule (as in
        compact — tombstones drop unless keep_tombstones, under which
        they are physically retained). Single-writer discipline applies
        as for compact/expire_snapshots."""
        if not self.exists():
            raise ValueError("cannot rebucket a table that does not exist")
        if n_buckets < 1:
            raise ValueError("n_buckets must be >= 1")
        m = self.manifest()
        if int(m["n_buckets"]) == n_buckets:
            return m["version"]
        if any(ps for ps in m.get("deltas", {}).values()):
            from airbyte_integrations_spark.operators.dedup import winner_agg

            o = self._order()
            data = winner_agg(
                self.read().unionByName(self.read_deltas()),
                tuple(m["key"]), o["cursor"], tuple(o["secondary"]), o["ab_id"],
            )
            if "_ab_cdc_deleted_at" in data.columns and not self.props().get(
                "keep_tombstones"
            ):
                data = data.filter(F.col("_ab_cdc_deleted_at").isNull())
        else:
            data = self.read()
        files = self._write_files(data, n_buckets, tuple(m["key"]))
        manifest = {
            "parent": m["version"],
            "schema": m["schema"],
            "key": m["key"],
            "n_buckets": n_buckets,
            "files": files,
            "deltas": {},
            "committed": m.get("committed", {}),
            "props": {**m.get("props", {}), **self._pending_props},
        }
        return self._commit(manifest)

    def purge_key(self, *values, erase_history: bool = True) -> dict:
        """GDPR hard delete (right to be forgotten): physically remove
        EVERY row of one primary-key value — current version, every
        historical version in retained deltas, tombstone markers, all
        of it. This is the operation a CDC delete event is NOT: a
        tombstone is a logical delete that still stores the before-
        image; purge rewrites the bytes away.

        Scoped like the point lookup: only the key's hash bucket is
        touched, and inside it only files whose key zone map covers
        the value — at the 10^10-event point a purge rewrites
        O(versions of this key) files, not the table. Base files are
        rewritten into base, delta files into deltas (a rewritten
        delta must keep masking the base under the winner rule);
        zero-row rewrites are dropped.

        erase_history=True (the default — a purge that leaves the
        value readable via time travel is not a purge) expires all
        prior snapshots afterwards, exactly Iceberg's documented
        erasure recipe (DELETE + rewrite_data_files + expire_snapshots).
        Pass erase_history=False to stage several purges and expire
        once. Single-writer discipline as for compact/expire."""
        import pyarrow.parquet as pq

        m = self.manifest()
        key = list(m["key"])
        if len(values) != len(key):
            raise ValueError(f"expected {len(key)} key values ({key})")
        bucket = str(self.key_bucket(*values))
        stats = m.get("stats", {})

        def covers(p: str) -> bool:
            entry = stats.get(p, {})
            for c, v in zip(key, values):
                rng = entry.get(c)
                if rng is None:
                    continue
                lo, hi = rng
                probe = v[: self._STATS_TRUNCATE] if isinstance(v, str) else v
                if probe < lo or (hi is not None and probe > hi):
                    return False
            return True

        schema = T.StructType.fromJson(m["schema"])
        pred = None
        for c, v in zip(key, values):
            clause = F.col(c).eqNullSafe(F.lit(v))
            pred = clause if pred is None else (pred & clause)

        out = {"rows_removed": 0, "files_rewritten": 0, "version": m["version"]}

        def rewrite(paths: list[str]) -> list[str]:
            """Rewrite `paths` without the key's rows; returns the
            replacement relpaths (zero-row outputs dropped)."""
            n_before = sum(
                pq.ParquetFile(os.path.join(self.root, p)).metadata.num_rows
                for p in paths
            )
            df = self._read_paths(paths, schema, m).filter(~pred)
            written = self._write_files(df, int(m["n_buckets"]), tuple(key),
                                        aligned=True)
            kept, n_after = [], 0
            for ps in written.values():
                for p in ps:
                    nr = pq.ParquetFile(
                        os.path.join(self.root, p)
                    ).metadata.num_rows
                    if nr:
                        kept.append(p)
                        n_after += nr
            out["rows_removed"] += n_before - n_after
            out["files_rewritten"] += len(paths)
            return kept

        new_files = {b: list(ps) for b, ps in m["files"].items()}
        new_deltas = {b: list(ps) for b, ps in m.get("deltas", {}).items()}
        touched = False
        for fmap in (new_files, new_deltas):
            cand = [p for p in fmap.get(bucket, []) if covers(p)]
            if not cand:
                continue
            touched = True
            fmap[bucket] = [
                p for p in fmap.get(bucket, []) if p not in set(cand)
            ] + rewrite(cand)
        if not touched:
            return out

        manifest = {
            "parent": m["version"],
            "schema": m["schema"],
            "key": m["key"],
            "n_buckets": m["n_buckets"],
            "files": new_files,
            "deltas": {b: ps for b, ps in new_deltas.items() if ps},
            "committed": m.get("committed", {}),
            "props": {**m.get("props", {}), **self._pending_props},
        }
        out["version"] = self._commit(manifest)
        if erase_history:
            out["expired"] = self.expire_snapshots(keep_last=1)
        return out

    def expire_snapshots(
        self, keep_last: int = 1, older_than_us: int | None = None
    ) -> dict:
        """Maintenance: Iceberg `expire_snapshots` + `remove_orphan_files`
        analogue. At the 10^10-event point a sync commits one snapshot
        per epoch — manifests and superseded/crash-orphaned data files
        accumulate without bound unless expired.

        Retains the newest `keep_last` manifests (the current snapshot
        is always kept); deletes older manifest files and every file
        under data/ not referenced by a retained manifest — which also
        sweeps crash orphans (files written by a job that died before
        its commit; the atomic VERSION swap means they were never
        visible). Time travel remains available for retained versions.

        Single-writer discipline (module docstring) applies: call this
        from the writer between commits, never concurrently with an
        in-flight write job — exactly Iceberg's remove_orphan_files
        caveat, which uses an age cutoff for the same reason.

        `older_than_us` is Iceberg's expireSnapshots(olderThan) rule:
        snapshots committed AT OR AFTER the cutoff are retained even
        beyond `keep_last`, so a retention policy like "keep 7 days"
        composes with "keep at least N" exactly as upstream — the two
        retention knobs can only widen, never narrow, each other (the
        current snapshot is always kept either way)."""
        cur = self.current_version()
        keep = set(range(max(cur - keep_last + 1, 0), cur + 1))
        # tagged snapshots are pinned (Iceberg TAG retention): a tag is
        # an explicit promise the version stays readable until dropped
        keep |= set(self.tags().values())
        if older_than_us is not None:
            for v in range(cur):
                if v in keep:
                    continue
                try:
                    m = self.manifest(v)
                except FileNotFoundError:
                    continue
                if int(m.get("committed_at_us", 0)) >= older_than_us:
                    keep.add(v)
        referenced: set[str] = set()
        for v in keep:
            try:
                m = self.manifest(v)
            except FileNotFoundError:
                continue
            for ps in m["files"].values():
                referenced.update(ps)
            for ps in m.get("deltas", {}).values():
                referenced.update(ps)
        # Branch-aware reachability: files any OTHER branch references
        # are live regardless of what this branch retains.
        referenced |= self._foreign_referenced_files()
        stats = {
            "data_files_removed": 0,
            "bytes_removed": 0,
            "manifests_removed": 0,
            "sidecars_removed": 0,
        }
        # Phase 1 — commit the LOGICAL expiry first: drop superseded
        # manifests, so a crash between phases leaves expired versions
        # raising the clean FileNotFoundError from manifest() (history()
        # skips them) rather than loading a manifest whose data files
        # are half-deleted and failing mid-scan.
        for v in range(cur):
            if v in keep:
                continue
            mp = os.path.join(self._meta_dir, f"v{v}.json")
            if os.path.exists(mp):
                os.remove(mp)
                stats["manifests_removed"] += 1
        # Phase 2 — sweep data files unreferenced by retained manifests.
        # Spark _SUCCESS/.crc sidecars are removed alongside but counted
        # separately: they are not data and must not inflate
        # data_files_removed/bytes_removed.
        data_root = os.path.join(self.root, DATA_DIR)
        for dirpath, _dn, fns in os.walk(data_root):
            for fn in fns:
                p = os.path.join(dirpath, fn)
                if os.path.relpath(p, self.root) in referenced:
                    continue
                if fn.endswith(".parquet"):
                    stats["bytes_removed"] += os.path.getsize(p)
                    stats["data_files_removed"] += 1
                else:
                    stats["sidecars_removed"] += 1
                os.remove(p)
        for dirpath, _dn, _fns in os.walk(data_root, topdown=False):
            if dirpath != data_root and not os.listdir(dirpath):
                os.rmdir(dirpath)
        return stats

    def history(self) -> list[dict]:
        """Commit log across snapshots: version, parent, files per
        bucket, committed epochs. Expired snapshots are skipped."""
        out = []
        for v in range(self.current_version() + 1):
            try:
                m = self.manifest(v)
            except FileNotFoundError:
                continue
            out.append(
                {
                    "version": v,
                    "parent": m.get("parent"),
                    "n_files": sum(len(ps) for ps in m["files"].values()),
                    # epoch ids are integers (WAL positions) OR strings
                    # (chunk:/stream:/jdbc: namespaces) — int ids sort
                    # numerically first, string ids lexically after
                    "committed": {
                        s: sorted(
                            eps,
                            key=lambda e: (0, int(e), "")
                            if e.lstrip("-").isdigit()
                            else (1, 0, e),
                        )
                        for s, eps in m.get("committed", {}).items()
                    },
                }
            )
        return out

    def version_asof(self, stream: str, lsn: int) -> int | None:
        """Largest retained snapshot version whose committed watermark
        for `stream` does not exceed `lsn` — time travel addressed by
        WAL position instead of version number. This is what makes a
        CONSISTENT CROSS-TABLE read possible: pick one WAL position,
        resolve each stream's table to its floor version, and no table
        shows effects the others have not seen (the transaction-
        consistency guarantee Debezium offers across topics, here
        across lake tables). Metadata-only: walks manifests newest-
        first, never touches data files."""
        for v in range(self.current_version(), -1, -1):
            try:
                m = self.manifest(v)
            except FileNotFoundError:
                continue
            eps = m.get("committed", {}).get(stream, {})
            bounds = [int(e["to_lsn"]) for e in eps.values() if "to_lsn" in e]
            if bounds and max(bounds) <= lsn:
                return v
        return None

    def version_asof_ts(self, ts_us: int) -> int | None:
        """Largest retained snapshot committed at or before the given
        wall-clock microsecond timestamp — Iceberg's AS OF TIMESTAMP /
        Delta timestampAsOf addressing. Pre-stamp snapshots (tables
        written before commit stamping) match any timestamp, the same
        leniency Iceberg applies to imported snapshots. Metadata-only:
        walks manifests newest-first."""
        for v in range(self.current_version(), -1, -1):
            try:
                m = self.manifest(v)
            except FileNotFoundError:
                continue
            if int(m.get("committed_at_us", 0)) <= ts_us:
                return v
        return None

    def meta_files(self, version: int | None = None) -> DataFrame:
        """Iceberg `files` metadata-table analogue: one row per data /
        delta file of the pinned snapshot, with its bucket, role, and
        zone-map stats (stringified [min, max] per tracked column) —
        the operator surface for answering "what would this predicate
        prune" and "how fragmented is bucket 17" WITHOUT touching a
        data file. Driver-side metadata only; the DataFrame is
        manifest-sized (one row per file, not per data row)."""
        m = self.manifest(version)
        stats = m.get("stats", {})
        rows = []
        for kind, key in (("base", "files"), ("delta", "deltas")):
            for b, ps in m.get(key, {}).items():
                for p in ps:
                    rows.append(
                        (
                            m["version"],
                            int(b),
                            p,
                            kind,
                            {
                                c: [str(v[0]), str(v[1])]
                                for c, v in stats.get(p, {}).items()
                            },
                        )
                    )
        return self.spark.createDataFrame(
            rows,
            "version long, bucket int, path string, kind string, "
            "stats map<string, array<string>>",
        )

    def meta_history(self) -> DataFrame:
        """Iceberg `history`/`snapshots` metadata-table analogue: one
        row per retained snapshot — version, parent, commit timestamp,
        file count, and per-stream committed-epoch count. The ops
        dashboard feed at the 10^10 point (commit cadence, snapshot
        growth, reset/rollback provenance) as a queryable DataFrame;
        expired snapshots are skipped."""
        rows = []
        for v in range(self.current_version() + 1):
            try:
                m = self.manifest(v)
            except FileNotFoundError:
                continue
            rows.append(
                (
                    v,
                    m.get("parent"),
                    int(m.get("committed_at_us", 0)),
                    sum(len(ps) for ps in m["files"].values()),
                    sum(len(ps) for ps in m.get("deltas", {}).values()),
                    {s: len(eps) for s, eps in m.get("committed", {}).items()},
                )
            )
        return self.spark.createDataFrame(
            rows,
            "version long, parent long, committed_at_us long, "
            "n_files long, n_delta_files long, epochs_per_stream map<string, int>",
        )


def conform(df: DataFrame, target: T.StructType) -> DataFrame:
    """Project df onto `target`: missing columns null-backfilled,
    types widened by cast (star_intersect.sql:9-47 semantics)."""
    cols = []
    have = {f.name: f for f in df.schema.fields}
    for f in target.fields:
        if f.name in have:
            src = F.col(f.name)
            cols.append(src.cast(f.dataType).alias(f.name) if have[f.name].dataType != f.dataType else src)
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)
