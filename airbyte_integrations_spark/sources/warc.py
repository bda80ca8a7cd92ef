"""WARC (Web ARChive, ISO 28500) file source — the Common-Crawl
container format.

The reference ingests web corpora through per-file parsers on a single
worker (source-file / source-s3 hand each file to one pandas/fastavro
parse: connectors/source-s3/source_s3/source_files_abstract/formats/);
Common-Crawl-style pages specifically arrive as `.warc` / `.warc.gz`
archives: a sequence of records, each framed as

    WARC/1.0\\r\\n
    <name>: <value>\\r\\n ...          (WARC headers)
    \\r\\n
    <Content-Length bytes of block>\\r\\n\\r\\n

where a `WARC-Type: response` record's block is a full HTTP response
(status line + headers + body = the page bytes). `.warc.gz` archives
are MULTI-MEMBER gzip: each record its own member, so the format is
splittable at member boundaries — but member offsets live in external
CDX indexes, so the portable unit of work is the FILE.

Spark-first shape: `binaryFile` scan -> Arrow `mapInPandas`, ONE task
per archive — exactly how Common Crawl is processed at scale (the
corpus is ~10^5 archives of ~1 GiB per monthly crawl; file-level
parallelism saturates any cluster). The splitter is per-FILE Python
over bytes (a binary container no Catalyst expression can frame), not
per-row Python; records stream out as Arrow batches. Payload bytes are
emitted verbatim (`binary`), feeding the multimodal/extraction columns
downstream (input_hint: html stays an opaque binary column).
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

WARC_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("record_type", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("http_content_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("warc_file", T.StringType()),
    ]
)


def _split_records(buf: bytes, fname: str) -> Iterator[dict]:
    """Yield parsed records from one decompressed WARC byte stream.

    Strict framing: every record must start with a WARC/ version line
    and carry Content-Length; anything else raises with the file and
    offset (a torn archive must fail the task, not silently truncate
    the corpus)."""
    pos, n = 0, len(buf)
    while pos < n:
        # tolerate the inter-record CRLF CRLF separator / trailing blanks
        while pos < n and buf[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            return
        eol = buf.find(b"\r\n", pos)
        if eol < 0 or not buf[pos:eol].startswith(b"WARC/"):
            raise ValueError(
                f"{fname}: expected WARC/ version line at offset {pos}"
            )
        pos = eol + 2
        headers: dict[str, str] = {}
        while True:
            eol = buf.find(b"\r\n", pos)
            if eol < 0:
                raise ValueError(f"{fname}: unterminated header block")
            line = buf[pos:eol]
            pos = eol + 2
            if not line:
                break
            k, _, v = line.partition(b":")
            headers[k.decode("ascii").lower()] = v.strip().decode(
                "utf-8", "replace"
            )
        try:
            clen = int(headers["content-length"])
        except KeyError:
            raise ValueError(f"{fname}: record without Content-Length")
        block = buf[pos : pos + clen]
        if len(block) != clen:
            raise ValueError(f"{fname}: truncated record block at {pos}")
        pos += clen
        yield {"headers": headers, "block": block}


def _http_parts(block: bytes) -> tuple[int | None, str | None, bytes]:
    """(status, content-type, body) of an HTTP response block."""
    head, sep, body = block.partition(b"\r\n\r\n")
    if not sep:
        return None, None, block
    lines = head.split(b"\r\n")
    status = None
    first = lines[0].split()
    if len(first) >= 2 and first[0].startswith(b"HTTP/"):
        try:
            status = int(first[1])
        except ValueError:
            status = None
    ctype = None
    for ln in lines[1:]:
        k, _, v = ln.partition(b":")
        if k.strip().lower() == b"content-type":
            ctype = v.strip().decode("utf-8", "replace")
            break
    return status, ctype, body


def read_warc(
    spark: SparkSession,
    path: str | list[str],
    record_types: tuple[str, ...] = ("response",),
) -> DataFrame:
    """Scan `.warc` / `.warc.gz` archives into one row per record of
    the requested types (default: response records — the pages).

    Columns: url, warc_ts, record_type, record_id, content_type (WARC
    block type), http_status, http_content_type, payload (the HTTP body
    bytes for response records, the raw block otherwise), warc_file.

    The record-type filter runs INSIDE the per-file splitter — skipped
    request/metadata records never materialize into Arrow batches."""
    import pandas as pd

    want = {t.lower() for t in record_types} if record_types else None
    files = spark.read.format("binaryFile").load(path)

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            for fname, content in zip(pdf["path"], pdf["content"]):
                raw = bytes(content)
                if raw[:2] == b"\x1f\x8b":
                    # multi-member gzip: GzipFile reads concatenated
                    # members transparently (one member per record in
                    # Common Crawl archives)
                    raw = gzip.GzipFile(fileobj=io.BytesIO(raw)).read()
                rows = []
                for rec in _split_records(raw, fname):
                    h = rec["headers"]
                    rtype = h.get("warc-type", "").lower()
                    if want is not None and rtype not in want:
                        continue
                    if rtype == "response":
                        status, http_ct, body = _http_parts(rec["block"])
                    else:
                        status, http_ct, body = None, None, rec["block"]
                    ts = h.get("warc-date")
                    rows.append(
                        {
                            "url": h.get("warc-target-uri"),
                            "warc_ts": pd.Timestamp(ts) if ts else None,
                            "record_type": rtype,
                            "record_id": h.get("warc-record-id"),
                            "content_type": h.get("content-type"),
                            "http_status": status,
                            "http_content_type": http_ct,
                            "payload": body,
                            "warc_file": fname,
                        }
                    )
                if rows:
                    out = pd.DataFrame(rows)
                    out["warc_ts"] = (
                        pd.to_datetime(out["warc_ts"], utc=True)
                        .dt.tz_localize(None)
                    )
                    yield out

    return files.select("path", "content").mapInPandas(parse, WARC_SCHEMA)


def write_warc(
    records: list[dict], path: str, compress: bool = True
) -> None:
    """Render records ({url, ts_iso, payload: bytes, status=200,
    http_content_type='text/html'}) as a WARC response archive —
    multi-member gzip when compress=True, matching Common Crawl's
    per-record-member layout. Test/fixture utility (metadata-sized,
    driver-side): the distributed surface is read_warc."""
    out = open(path, "wb")
    try:
        for i, r in enumerate(records):
            body = r["payload"]
            http = (
                f"HTTP/1.1 {r.get('status', 200)} OK\r\n"
                f"Content-Type: {r.get('http_content_type', 'text/html')}\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
            ).encode() + body
            head = (
                "WARC/1.0\r\n"
                "WARC-Type: response\r\n"
                f"WARC-Target-URI: {r['url']}\r\n"
                f"WARC-Date: {r['ts_iso']}\r\n"
                f"WARC-Record-ID: <urn:uuid:{i:032x}>\r\n"
                "Content-Type: application/http; msgtype=response\r\n"
                f"Content-Length: {len(http)}\r\n\r\n"
            ).encode()
            member = head + http + b"\r\n\r\n"
            out.write(gzip.compress(member) if compress else member)
    finally:
        out.close()
