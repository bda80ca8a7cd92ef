"""URL single-file source (source-file HTTPS provider parity,
client.py:32-142): csv / jsonl / parquet behind a live local HTTP
fixture, fetched executor-side, line formats parsed JVM-side."""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from airbyte_integrations_spark.sources.url_file import (
    URL_COL,
    read_url_files,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)

ROWS = [(1, "a", 0.5), (2, "b,with,commas", 1.5), (3, None, 2.5)]


def _csv_bytes() -> bytes:
    out = ["id,name,score"]
    for i, n, s in ROWS:
        n_enc = f'"{n}"' if n and "," in n else ("" if n is None else n)
        out.append(f"{i},{n_enc},{s}")
    return ("\n".join(out) + "\n").encode()


def _jsonl_bytes() -> bytes:
    return (
        "\n".join(
            json.dumps({"id": i, "name": n, "score": s}) for i, n, s in ROWS
        )
        + "\n"
    ).encode()


def _parquet_bytes() -> bytes:
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "id": [r[0] for r in ROWS],
            "name": [r[1] for r in ROWS],
            "score": [r[2] for r in ROWS],
        }
    )
    buf = io.BytesIO()
    pq.write_table(tbl, buf)
    return buf.getvalue()


@pytest.fixture()
def file_server():
    import gzip

    files = {
        "/data.csv": _csv_bytes(),
        "/data.jsonl": _jsonl_bytes(),
        "/data.parquet": _parquet_bytes(),
        "/data.csv.gz": gzip.compress(_csv_bytes()),
        "/data.jsonl.gz": gzip.compress(_jsonl_bytes()),
        "/data.csv.bz2": __import__("bz2").compress(_csv_bytes()),
        "/data.csv.xz": __import__("lzma").compress(_csv_bytes()),
        "/data.csv.zip": _zip_bytes({"data.csv": _csv_bytes()}),
        "/multi.zip": _zip_bytes(
            {"a.csv": _csv_bytes(), "b.csv": _csv_bytes()}
        ),
        "/data.csv.zst": b"\x28\xb5\x2f\xfd" + b"\x00" * 16,
    }
    hits = []

    class H(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            hits.append(self.path)
            body = files.get(self.path)
            if body is None:
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        yield f"http://127.0.0.1:{srv.server_port}", hits
    finally:
        srv.shutdown()


def _collect(df):
    return sorted(
        (r.id, r.name, r.score) for r in df.select("id", "name", "score").collect()
    )


def test_csv_url_read_header_and_quoting(spark, file_server):
    base, _ = file_server
    df = read_url_files(spark, f"{base}/data.csv", "csv", SCHEMA)
    assert _collect(df) == sorted(ROWS)
    assert df.select(URL_COL).distinct().count() == 1


def test_jsonl_url_read(spark, file_server):
    base, _ = file_server
    df = read_url_files(spark, f"{base}/data.jsonl", "jsonl", SCHEMA)
    assert _collect(df) == sorted(ROWS)


def test_parquet_url_read(spark, file_server):
    base, _ = file_server
    df = read_url_files(spark, f"{base}/data.parquet", "parquet", SCHEMA)
    assert _collect(df) == sorted(ROWS)


def test_line_parse_is_jvm_side(spark, file_server):
    """csv/jsonl: the only Python node is the download task; the parse
    is from_csv/from_json in the JVM plan."""
    base, _ = file_server
    df = read_url_files(spark, f"{base}/data.csv", "csv", SCHEMA)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("MapInPandas") == 1
    assert "BatchEvalPython" not in plan
    assert "from_csv" in plan
    dfj = read_url_files(spark, f"{base}/data.jsonl", "jsonl", SCHEMA)
    planj = dfj._jdf.queryExecution().optimizedPlan().toString()
    assert "from_json" in planj and planj.count("MapInPandas") == 1


def test_multiple_urls_fan_out(spark, file_server):
    base, hits = file_server
    urls = [f"{base}/data.csv", f"{base}/data.csv"]
    df = read_url_files(spark, urls, "csv", SCHEMA)
    assert df.count() == 2 * len(ROWS)
    # one distinct URL value per input url string (dedup by URL_COL)
    assert df.select(URL_COL).distinct().count() == 1


def test_unsupported_scheme_and_format_rejected(spark):
    with pytest.raises(NotImplementedError):
        read_url_files(spark, "s3://bucket/key.csv", "csv", SCHEMA)
    with pytest.raises(ValueError):
        read_url_files(spark, "https://x/y.xlsx", "xlsx", SCHEMA)


def test_http_404_fails_fast(spark, file_server):
    base, hits = file_server
    df = read_url_files(spark, f"{base}/missing.csv", "csv", SCHEMA)
    with pytest.raises(Exception):
        df.collect()
    # a non-retryable 4xx is requested exactly once
    assert hits.count("/missing.csv") == 1


def test_url_file_stream_through_read_catalog(spark, file_server, tmp_path):
    """A url_file stream flows through the multi-stream sync loop as a
    full-refresh overwrite (source-file syncs are whole-file reads —
    the reference connector has no cursor either)."""
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

    base, _ = file_server
    cs = ConfiguredStream(
        config=SyncConfig(
            stream="remote_csv",
            primary_key=("id",),
            sync_mode=SyncMode.FULL_REFRESH,
            destination_sync_mode=DestinationSyncMode.OVERWRITE,
            n_buckets=4,
        ),
        source={
            "kind": "url_file",
            "urls": [f"{base}/data.csv"],
            "format": "csv",
            "record_schema": SCHEMA,
        },
    )
    lake = str(tmp_path / "lake")
    msgs = read_catalog(spark, ConfiguredCatalog(streams=(cs,)), lake)
    assert len(msgs) == 1
    tbl = stream_table(spark, lake, "remote_csv")
    got = sorted(
        (r.id, r.name, r.score)
        for r in tbl.read().select("id", "name", "score").collect()
    )
    assert got == sorted(ROWS)
    # re-run converges (overwrite refresh, same content)
    read_catalog(spark, ConfiguredCatalog(streams=(cs,)), lake)
    assert tbl.read().count() == len(ROWS)


def test_gzip_transport_transparent(spark, file_server):
    """*.gz payloads decompress in the fetch task (source-file's
    smart_open transparent decompression); sniffed by magic bytes, so
    plain payloads are untouched."""
    base, _ = file_server
    df = read_url_files(spark, f"{base}/data.csv.gz", "csv", SCHEMA)
    assert _collect(df) == sorted(ROWS)
    dfj = read_url_files(spark, f"{base}/data.jsonl.gz", "jsonl", SCHEMA)
    assert _collect(dfj) == sorted(ROWS)


def _zip_bytes(members: dict) -> bytes:
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, body in members.items():
            zf.writestr(name, body)
    return buf.getvalue()


def test_bz2_xz_zip_transports(spark, file_server):
    """source-file's other pandas infer_compression transports: bz2,
    xz, and single-member zip all decompress transparently in the
    fetch task, sniffed by magic bytes."""
    base, _ = file_server
    for path in ("/data.csv.bz2", "/data.csv.xz", "/data.csv.zip"):
        df = read_url_files(spark, f"{base}{path}", "csv", SCHEMA)
        assert _collect(df) == sorted(ROWS), path


def test_multi_member_zip_and_zstd_rejected(spark, file_server):
    """A multi-member zip is ambiguous (pandas compression='zip'
    contract) and zstd needs an absent vendor lib — both fail with a
    clear error instead of mis-parsing."""
    base, _ = file_server
    with pytest.raises(Exception, match="exactly one file"):
        read_url_files(spark, f"{base}/multi.zip", "csv", SCHEMA).collect()
    with pytest.raises(Exception, match="zstd"):
        read_url_files(spark, f"{base}/data.csv.zst", "csv", SCHEMA).collect()
