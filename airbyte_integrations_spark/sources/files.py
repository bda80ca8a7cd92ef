"""File sources (csv / json / parquet) with mtime-cursor incrementality.

Reference: source-s3 format parsers (formats/{csv,parquet,avro}_parser.py)
and the `_ab_source_file_last_modified` cursor — files sorted ascending
by mtime, skip mtime <= state (stream.py:47-48, 158, 329, 431-464).

Spark-first: `spark.read.<format>` does the parsing (JVM, vectorized);
we only add the two system columns and the mtime predicate, which
prunes at file granularity before any bytes are read.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CURSOR_COL = "_ab_source_file_last_modified"
URL_COL = "_ab_source_file_url"


@dataclass(frozen=True)
class FileState:
    """Incremental file-source state: the mtime cursor PLUS the set of
    file paths already synced AT that exact mtime.

    Reference: source-s3's stream state keeps a ``history`` of file
    names alongside the cursor (source_files_abstract/stream.py:47-48,
    158 — files with last_modified == cursor are skipped only when
    already recorded) because a bare strictly-``>`` cursor drops any
    file that lands with an mtime EQUAL to the cursor after the sync
    that set it (same-second writes are routine at scale). The history
    is bounded: it only ever holds paths whose mtime equals the
    cursor."""

    cursor: datetime | None = None
    history: frozenset[str] = field(default_factory=frozenset)

    def to_json(self) -> dict:
        return {
            "cursor": self.cursor.isoformat() if self.cursor else None,
            "history": sorted(self.history),
        }

    @staticmethod
    def from_json(d: dict) -> "FileState":
        c = d.get("cursor")
        return FileState(
            cursor=datetime.fromisoformat(c) if c else None,
            history=frozenset(d.get("history") or ()),
        )


def _glob_to_regex(pattern: str) -> str:
    """One glob pattern -> an anchored regex over the key, with the
    GLOBSTAR semantics the reference matches file keys with
    (source-s3/source_s3/source_files_abstract/stream.py:146
    ``globmatch(key, pattern, GLOBSTAR | SPLIT)``): ``**`` crosses
    directory separators, ``*``/``?`` stay within a segment,
    ``[seq]``/``[!seq]`` character classes pass through."""
    out, i, n = [], 0, len(pattern)
    while i < n:
        c = pattern[i]
        if c == "*":
            if pattern[i : i + 2] == "**":
                # "**/" matches zero or more whole directories
                if pattern[i : i + 3] == "**/":
                    out.append("(?:.*/)?")
                    i += 3
                else:
                    out.append(".*")
                    i += 2
            else:
                out.append("[^/]*")
                i += 1
        elif c == "?":
            out.append("[^/]")
            i += 1
        elif c == "[":
            j = i + 1
            if j < n and pattern[j] == "!":
                j += 1
            if j < n and pattern[j] == "]":
                j += 1
            while j < n and pattern[j] != "]":
                j += 1
            if j >= n:
                out.append(re.escape(c))  # unterminated class: literal [
                i += 1
            else:
                cls = pattern[i + 1 : j]
                if cls.startswith("!"):
                    cls = "^" + cls[1:]
                out.append(f"[{cls}]")
                i = j + 1
        else:
            out.append(re.escape(c))
            i += 1
    return "".join(out)


def compile_path_pattern(path_pattern: str):
    """``|``-separated glob patterns (the reference's SPLIT flag,
    source-s3 spec.py:53-57 path_pattern) -> a matcher over the file
    key RELATIVE to the source root. A key matches when ANY pattern
    fully matches it."""
    regexes = [
        re.compile(_glob_to_regex(p.strip()) + r"\Z")
        for p in path_pattern.split("|")
        if p.strip()
    ]
    if not regexes:
        raise ValueError(f"empty path_pattern {path_pattern!r}")
    return lambda key: any(r.match(key) for r in regexes)


def list_files(
    root: str, suffix: str = "", path_pattern: str | None = None
) -> list[tuple[str, datetime]]:
    match = compile_path_pattern(path_pattern) if path_pattern else None
    out = []
    for dirpath, _d, fns in os.walk(root):
        for fn in fns:
            if fn.endswith(suffix) and not fn.startswith(("_", ".")):
                p = os.path.join(dirpath, fn)
                if match is not None and not match(
                    os.path.relpath(p, root)
                ):
                    continue
                mtime = datetime.fromtimestamp(os.path.getmtime(p), tz=timezone.utc)
                out.append((p, mtime))
    return sorted(out, key=lambda t: (t[1], t[0]))


SUPPORTED_FORMATS = (
    "parquet", "csv", "json", "text", "avro", "orc", "feather", "html", "warc",
)


def read_files_incremental(
    spark: SparkSession,
    root: str,
    fmt: str = "parquet",
    state: datetime | FileState | None = None,
    suffix: str = "",
    path_pattern: str | None = None,
    **options,
) -> tuple[DataFrame | None, FileState]:
    """Read files past the cursor; returns (df | None, new FileState).

    Selection rule (source-s3 stream.py:47-48,158 history semantics):
    mtime > cursor, OR mtime == cursor and the path is not yet in the
    state's history — so a file written at the same timestamp as the
    cursor AFTER the sync that set it is still picked up instead of
    being skipped forever. A bare datetime is accepted as legacy state
    (empty history).

    df carries `_ab_source_file_url` + `_ab_source_file_last_modified`.
    Formats map 1:1 to `spark.read.format(...)`; avro uses the vendored
    container codec (sources/avro_io.py) decoded executor-side via
    binaryFile + mapInPandas — no spark-avro jar in this environment.

    path_pattern: ``|``-separated globs matched against each file's
    root-relative key with ``**`` crossing directories (the reference's
    source-s3 path_pattern, stream.py:146) — pruning happens at LISTING
    time, before any bytes are read or tasks planned.
    """
    if fmt not in SUPPORTED_FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {SUPPORTED_FORMATS}")
    legacy = isinstance(state, datetime)
    if legacy:
        # bare-datetime state predates the history: it cannot say which
        # at-cursor files were synced, so it keeps the original strict->
        # rule rather than re-reading (and duplicating) them all
        state = FileState(cursor=state)
    elif state is None:
        state = FileState()
    files = list_files(root, suffix, path_pattern=path_pattern)
    if state.cursor is not None:
        files = [
            (p, m)
            for p, m in files
            if m > state.cursor
            or (not legacy and m == state.cursor and p not in state.history)
        ]
    if not files:
        return None, state
    new_cursor = max(m for _p, m in files)
    at_cursor = {p for p, m in files if m == new_cursor}
    if state.cursor == new_cursor:
        at_cursor |= state.history
    new_state = FileState(cursor=new_cursor, history=frozenset(at_cursor))
    mtime_map = {p: m for p, m in files}
    if fmt == "avro":
        from airbyte_integrations_spark.sources.avro_io import PATH_COL, read_avro

        if options:
            # The vendored codec takes no reader options; silently
            # ignoring them would diverge from every other format.
            raise ValueError(
                f"avro reader accepts no options; got {sorted(options)}"
            )
        df = read_avro(spark, [p for p, _m in files]).withColumnRenamed(
            PATH_COL, URL_COL
        )
    elif fmt == "html":
        # Reference: source-file's read_html branch (client.py:282,
        # pandas table scraping). Engine mapping: one row per html
        # FILE — raw bytes in `html` plus the canonical byte-stable
        # text extraction (the same vectorized Arrow UDF the CDC
        # winner path uses), so downstream operators see the
        # (url, html, text) shape of the pages table. binaryFile
        # ships each file to an executor; nothing is parsed on the
        # driver.
        if options:
            raise ValueError(
                f"html reader accepts no options; got {sorted(options)}"
            )
        from airbyte_integrations_spark.functions.extract import extract_text

        df = (
            spark.read.format("binaryFile")
            .load([p for p, _m in files])
            .select(
                F.col("path").alias(URL_COL),
                F.col("content").alias("html"),
            )
            .withColumn("text", extract_text(F.col("html")))
        )
    elif fmt == "warc":
        # Common-Crawl container archives (sources/warc.py): one
        # mapInPandas task per archive; response records become
        # (url, warc_ts, payload, ...) rows. `record_types` is the one
        # accepted option. Incremental file sync over a landing
        # directory of crawl archives is exactly the Common-Crawl
        # ingest loop: each new .warc.gz lands once, is parsed once.
        from airbyte_integrations_spark.sources.warc import read_warc

        bad = set(options) - {"record_types"}
        if bad:
            raise ValueError(f"warc reader accepts record_types; got {sorted(bad)}")
        df = read_warc(
            spark,
            [p for p, _m in files],
            record_types=tuple(options.get("record_types", ("response",))),
        ).withColumnRenamed("warc_file", URL_COL)
    elif fmt == "feather":
        # Arrow IPC/Feather (the reference's source-file pandas engine,
        # client.py "feather" branch) — no Spark datasource exists, so
        # decode executor-side like avro: binaryFile ships each file to
        # a worker, pyarrow reads the IPC buffer, rows return
        # Arrow-batched. One file = one task.
        if options:
            raise ValueError(
                f"feather reader accepts no options; got {sorted(options)}"
            )
        df = _read_feather(spark, [p for p, _m in files])
    else:
        # source-s3 csv advanced_options `column_names`
        # (csv_spec.py:68-70): names for a HEADER-LESS csv. Spark
        # mapping: read with header=false (the default) -> positional
        # _c0.. columns, renamed positionally. Mutually exclusive with
        # header=true (the file either has a header row or it doesn't).
        column_names = options.pop("column_names", None)
        if column_names is not None:
            if fmt != "csv":
                raise ValueError("column_names applies to csv only")
            if isinstance(column_names, str):
                column_names = [c.strip() for c in column_names.split(",")]
            if str(options.get("header", "false")).lower() == "true":
                raise ValueError(
                    "column_names is for header-less csv; drop header=true"
                )
        reader = spark.read
        for k, v in options.items():
            reader = reader.option(k, v)
        df = reader.format(fmt).load([p for p, _m in files])
        if column_names is not None:
            if len(column_names) != len(df.columns):
                raise ValueError(
                    f"column_names has {len(column_names)} names but the "
                    f"csv has {len(df.columns)} columns"
                )
            df = df.toDF(*column_names)
        df = df.withColumn(URL_COL, F.input_file_name())
    # input_file_name()/binaryFile return percent-encoded URIs; a file
    # named "my data.csv" comes back as .../my%20data.csv. Key the map
    # under both the raw path and its URI-quoted form so special
    # characters never orphan the cursor.
    from urllib.parse import quote

    entries = {}
    for p, m2 in mtime_map.items():
        entries[p] = m2
        entries.setdefault(quote(p, safe="/"), m2)
    mtime_expr = F.create_map(
        *[x for p, m2 in entries.items() for x in (F.lit(p), F.lit(m2))]
    )
    df = df.withColumn(
        CURSOR_COL,
        mtime_expr[F.regexp_replace(F.col(URL_COL), "^file:/+", "/")],
    )
    return df, new_state


def _read_feather(spark: SparkSession, paths: list[str]) -> DataFrame:
    """Distributed Feather/Arrow-IPC read via binaryFile + mapInPandas.

    The driver reads only the FIRST file's schema (pyarrow reads
    metadata lazily); each file's bytes are decoded on an executor.
    All files must share the first file's schema."""
    import io

    import pyarrow as pa
    import pyarrow.feather as feather
    from pyspark.sql.pandas.types import from_arrow_schema

    arrow_schema = feather.read_table(paths[0]).schema
    out_schema = from_arrow_schema(arrow_schema).add(URL_COL, "string", False)

    def decode(batches):
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                out = feather.read_feather(pa.BufferReader(bytes(content)))
                out[URL_COL] = path
                yield out

    bf = spark.read.format("binaryFile").load(paths).select("path", "content")
    return bf.mapInPandas(decode, out_schema)
