"""Object-store files destination — the destination-s3 / destination-gcs
analogue over any Hadoop-visible filesystem path.

Reference semantics mirrored (file:line cites are into
/root/reference/airbyte-integrations/connectors/destination-s3):

- Path template with sync-time variables, resolved ONCE per sync
  (S3ConsumerFactory.java:41 pins SYNC_DATETIME for the whole sync;
  S3StorageOperations.java:69-87 substitutes ${NAMESPACE} /
  ${STREAM_NAME} / ${YEAR} / ${MONTH} / ${DAY} / ${HOUR} / ${MINUTE} /
  ${SECOND} / ${MILLISECOND} / ${EPOCH} / ${UUID} and collapses
  duplicate slashes). Default template per
  S3DestinationConstants.java:19.
- Part files named `<part_id><extension>` with part_id continuing from
  whatever already exists under the object path
  (S3StorageOperations.java:138,197) — append syncs never clobber.
- OVERWRITE cleans the stream's prior objects BEFORE writing, matching
  a regex built from the path template with each time variable widened
  to its digit class (S3ConsumerFactory.java onStartFunction,
  S3StorageOperations.java:240-258 getRegexFormat).
- Formats: csv / jsonl (optionally gzip) / parquet / avro, the
  reference's S3Format set (S3Format.java). gzip keeps the double
  extension `.csv.gz` / `.jsonl.gz` (getExtension :187-193).

Spark-first: csv/jsonl/parquet go through Spark's native writers
(JVM, whole-stage codegen, one file per partition — the analogue of
the reference's per-buffer flush). Avro is encoded executor-side per
partition with the vendored container codec (sources/avro_io.py), so
the write parallelizes like every other format; it lands on a shared
filesystem path, the sandbox analogue of the object store.
"""

from __future__ import annotations

import glob
import os
import re
import shutil
import tempfile
import uuid as _uuid
from dataclasses import dataclass, field
from datetime import datetime, timezone

from pyspark.sql import DataFrame

DEFAULT_PATH_FORMAT = "${NAMESPACE}/${STREAM_NAME}/${YEAR}_${MONTH}_${DAY}_${EPOCH}_"

_FORMAT_EXT = {"csv": ".csv", "jsonl": ".jsonl", "parquet": ".parquet", "avro": ".avro"}

# time-variable -> (render, regex-class) per S3StorageOperations.java
# :69-87 (render) and :240-258 (regex widening for cleanup matching)
_VARS = {
    "${YEAR}": (lambda dt: f"{dt.year}", r"[0-9]{4}"),
    "${MONTH}": (lambda dt: f"{dt.month:02d}", r"[0-9]{2}"),
    "${DAY}": (lambda dt: f"{dt.day:02d}", r"[0-9]{2}"),
    "${HOUR}": (lambda dt: f"{dt.hour:02d}", r"[0-9]{2}"),
    "${MINUTE}": (lambda dt: f"{dt.minute:02d}", r"[0-9]{2}"),
    "${SECOND}": (lambda dt: f"{dt.second:02d}", r"[0-9]{2}"),
    "${MILLISECOND}": (lambda dt: f"{dt.microsecond // 1000:04d}", r"[0-9]{4}"),
    "${EPOCH}": (lambda dt: f"{int(dt.timestamp() * 1000)}", r"[0-9]+"),
}


def _norm_name(s: str) -> str:
    """ExtendedNameTransformer analogue: lowercase, non-alnum -> _."""
    return re.sub(r"[^A-Za-z0-9]", "_", s or "").lower()


def resolve_object_path(
    path_format: str, namespace: str | None, stream: str, dt: datetime
) -> str:
    """S3StorageOperations.getBucketObjectPath(:69-87): substitute the
    sync-time variables and collapse duplicate slashes."""
    out = path_format.replace("${NAMESPACE}", _norm_name(namespace or ""))
    out = out.replace("${STREAM_NAME}", _norm_name(stream))
    for var, (render, _) in _VARS.items():
        out = out.replace(var, render(dt))
    out = out.replace("${UUID}", str(_uuid.uuid4()))
    return re.sub(r"/+", "/", out).lstrip("/")


def object_path_regex(path_format: str, namespace: str | None, stream: str) -> str:
    """getRegexFormat (:240-258): the same template with every time
    variable widened to its digit class + `.*` for part id/extension —
    what OVERWRITE uses to find the stream's prior sync objects.

    Substitutions and the duplicate-slash collapse happen in the SAME
    order as resolve_object_path (substitute, then collapse): an empty
    namespace collapses `a//b` to `a/b` in the resolved path, so the
    regex must collapse identically or overwrite cleanup silently
    matches nothing. Placeholders pass through the collapse as
    slash-free sentinels and become regex classes only after escaping."""
    out = path_format.replace("${NAMESPACE}", _norm_name(namespace or ""))
    out = out.replace("${STREAM_NAME}", _norm_name(stream))
    sentinels: dict[str, str] = {}
    for i, (var, (_, cls)) in enumerate(_VARS.items()):
        s = f"\x00{i}\x00"
        out = out.replace(var, s)
        sentinels[s] = cls
    u = "\x00U\x00"
    out = out.replace("${UUID}", u)
    sentinels[u] = ".*"
    out = re.escape(re.sub(r"/+", "/", out).lstrip("/"))
    for s, cls in sentinels.items():
        out = out.replace(re.escape(s), cls)
    return out + ".*"


@dataclass(frozen=True)
class FilesDestinationConfig:
    """S3DestinationConfig analogue: root 'bucket' + path template +
    format block (S3FormatConfigs)."""

    root: str
    path_format: str = DEFAULT_PATH_FORMAT
    format: str = "jsonl"
    gzip: bool = False
    format_options: dict = field(default_factory=dict)
    # Airbyte wire shape (S3CsvFormatConfig "flattening"): None keeps
    # the engine-native plain columns; "no" emits the reference's
    # 3-column envelope [_airbyte_ab_id, _airbyte_emitted_at,
    # _airbyte_data] with the record as ONE json blob
    # (NoFlatteningSheetGenerator.java:17-30); "root_level" emits the
    # ab columns followed by the record's root fields in SORTED header
    # order (RootLevelFlatteningSheetGenerator.java:24-35).
    flattening: str | None = None

    def __post_init__(self):
        if self.format not in _FORMAT_EXT:
            raise ValueError(f"unsupported format: {self.format!r}")
        if self.gzip and self.format in ("parquet", "avro"):
            raise ValueError(f"gzip transport applies to csv/jsonl, not {self.format}")
        if self.flattening not in (None, "no", "root_level"):
            raise ValueError(f"unknown flattening: {self.flattening!r}")

    @property
    def extension(self) -> str:
        ext = _FORMAT_EXT[self.format]
        return ext + ".gz" if self.gzip else ext


class FilesDestination:
    def __init__(self, spark, config: FilesDestinationConfig):
        self.spark = spark
        self.config = config

    # ------------------------------------------------------------ write

    def write(
        self,
        df: DataFrame,
        stream: str,
        namespace: str | None = None,
        mode: str = "append",
        sync_dt: datetime | None = None,
    ) -> list[str]:
        """One stream's sync: stage part files, publish them under the
        resolved object path with sequential part ids. Returns the
        written paths (relative to root).

        mode="overwrite" first deletes the stream's objects from prior
        syncs (template-regex match, S3StorageOperations.java:240-258);
        mode="append" only ever adds part files."""
        if mode not in ("append", "overwrite"):
            raise ValueError(f"unknown files destination mode: {mode!r}")
        cfg = self.config
        dt = sync_dt or datetime.now(timezone.utc)
        obj_path = resolve_object_path(cfg.path_format, namespace, stream, dt)

        if cfg.flattening is not None:
            df = self._to_wire(df, dt)

        if mode == "overwrite":
            self._clean_prior(namespace, stream)

        staging = tempfile.mkdtemp(prefix="files_dest_")
        try:
            self._stage(df, staging)
            staged = sorted(
                p for p in glob.glob(os.path.join(staging, "part-*"))
                if not p.endswith(".crc")
            )
            target_dir = os.path.join(cfg.root, os.path.dirname(obj_path))
            os.makedirs(target_dir, exist_ok=True)
            prefix = os.path.basename(obj_path)
            part = self._next_part_id(target_dir, prefix)
            written = []
            for p in staged:
                rel = os.path.join(
                    os.path.dirname(obj_path), f"{prefix}{part}{cfg.extension}"
                )
                shutil.move(p, os.path.join(cfg.root, rel))
                written.append(rel)
                part += 1
            return written
        finally:
            shutil.rmtree(staging, ignore_errors=True)

    # ------------------------------------------------------------ check

    def check(self) -> dict:
        """CONNECTION_STATUS probe — S3Destination.attemptWriteAndDelete
        (:133-152): write a probe object under the configured root,
        list it back (the IAM listObjects check), delete it. Any
        failure maps to FAILED + message."""
        probe = os.path.join(
            self.config.root, "_airbyte_connection_test_" + _uuid.uuid4().hex
        )
        try:
            os.makedirs(self.config.root, exist_ok=True)
            with open(probe, "w") as f:
                f.write("check-content")
            listed = set(os.listdir(self.config.root))
            if os.path.basename(probe) not in listed:
                return {"status": "FAILED", "message": "probe object not listed"}
            os.remove(probe)
            return {"status": "SUCCEEDED"}
        except Exception as e:
            return {"status": "FAILED", "message": str(e)[:200]}

    # ---------------------------------------------------------- helpers

    def _to_wire(self, df: DataFrame, dt: datetime) -> DataFrame:
        """Airbyte envelope per the CsvSheetGenerator pair: ab_id +
        emitted_at + either one `_airbyte_data` json blob
        (NoFlatteningSheetGenerator.java:17-30) or the record's root
        fields in sorted header order
        (RootLevelFlatteningSheetGenerator.java:24-35).

        Deviations, both deterministic on purpose so syncs replay
        byte-identically: ab_id is the md5 of the serialized record in
        UUID shape (the reference draws UUID.randomUUID per record),
        and emitted_at is the pinned sync time in epoch millis (the
        reference stamps Instant.now per record)."""
        from pyspark.sql import functions as F

        cols = list(df.columns)
        blob = F.to_json(F.struct(*cols))
        h = F.md5(blob)
        ab_id = F.concat_ws(
            "-",
            F.substring(h, 1, 8), F.substring(h, 9, 4), F.substring(h, 13, 4),
            F.substring(h, 17, 4), F.substring(h, 21, 12),
        )
        emitted = F.lit(int(dt.timestamp() * 1000)).cast("long")
        head = [ab_id.alias("_airbyte_ab_id"), emitted.alias("_airbyte_emitted_at")]
        if self.config.flattening == "no":
            return df.select(*head, blob.alias("_airbyte_data"))
        return df.select(*head, *sorted(cols))

    def _stage(self, df: DataFrame, staging: str) -> None:
        cfg = self.config
        out = os.path.join(staging, "out")
        if cfg.format == "csv":
            w = df.write.options(header="true", **cfg.format_options)
            if cfg.gzip:
                w = w.option("compression", "gzip")
            w.csv(out)
        elif cfg.format == "jsonl":
            w = df.write.options(**cfg.format_options)
            if cfg.gzip:
                w = w.option("compression", "gzip")
            w.json(out)
        elif cfg.format == "parquet":
            df.write.options(**cfg.format_options).parquet(out)
        else:  # avro: executor-side vendored container codec
            self._stage_avro(df, out)
        for p in glob.glob(os.path.join(out, "part-*")):
            if not p.endswith(".crc"):
                shutil.move(p, staging)

    def _stage_avro(self, df: DataFrame, out: str) -> None:
        from airbyte_integrations_spark.sources.avro_io import (
            spark_schema_to_avro,
            to_avro_value,
            write_avro_file,
        )

        os.makedirs(out, exist_ok=True)
        avro_schema = spark_schema_to_avro(df.schema, name="record")
        cols = [f.name for f in df.schema.fields]

        def write_partition(idx: int, rows) -> list:
            recs = [dict(zip(cols, (to_avro_value(v) for v in r))) for r in rows]
            if not recs:
                return []
            write_avro_file(
                os.path.join(out, f"part-{idx:05d}"), avro_schema, recs
            )
            return []

        df.rdd.mapPartitionsWithIndex(write_partition).count()

    def _clean_prior(self, namespace: str | None, stream: str) -> None:
        cfg = self.config
        rx = re.compile(object_path_regex(cfg.path_format, namespace, stream))
        root = cfg.root
        if not os.path.isdir(root):
            return
        for dirpath, _dirs, files in os.walk(root):
            for fn in files:
                rel = os.path.relpath(os.path.join(dirpath, fn), root)
                if rx.fullmatch(rel.replace(os.sep, "/")):
                    os.remove(os.path.join(dirpath, fn))

    @staticmethod
    def _next_part_id(target_dir: str, prefix: str) -> int:
        """getPartId (:197): continue past the max existing part id
        under this object path."""
        best = -1
        if os.path.isdir(target_dir):
            for fn in os.listdir(target_dir):
                if fn.startswith(prefix):
                    m = re.match(r"(\d+)", fn[len(prefix):])
                    if m:
                        best = max(best, int(m.group(1)))
        return best + 1
