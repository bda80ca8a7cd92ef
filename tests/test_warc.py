"""WARC source (sources/warc.py): ISO 28500 framing, multi-member
gzip, response-record HTTP split, strict torn-archive rejection,
file-level parallelism."""

import gzip

import pytest

from airbyte_integrations_spark.sources.warc import read_warc, write_warc


def _fixture(tmp_path, n_files=2, per_file=3, compress=True):
    paths = []
    for f in range(n_files):
        recs = [
            {
                "url": f"https://example.org/f{f}/p{i}",
                "ts_iso": f"2024-03-0{f + 1}T00:00:0{i}Z",
                "payload": f"<html><body>doc {f}-{i} é</body></html>".encode(),
            }
            for i in range(per_file)
        ]
        p = str(tmp_path / ("crawl-%d.warc%s" % (f, ".gz" if compress else "")))
        write_warc(recs, p, compress=compress)
        paths.append(p)
    return paths


@pytest.mark.parametrize("compress", [True, False])
def test_roundtrip_responses(spark, tmp_path, compress):
    _fixture(tmp_path, compress=compress)
    suffix = "*.warc.gz" if compress else "*.warc"
    df = read_warc(spark, str(tmp_path / suffix))
    rows = {r.url: r for r in df.collect()}
    assert len(rows) == 6
    r = rows["https://example.org/f1/p2"]
    assert r.record_type == "response"
    assert r.http_status == 200
    assert r.http_content_type == "text/html"
    assert bytes(r.payload) == "<html><body>doc 1-2 é</body></html>".encode()
    assert r.warc_ts.isoformat() == "2024-03-02T00:00:02"
    assert r.warc_file.endswith("crawl-1.warc.gz" if compress else "crawl-1.warc")


def test_payload_with_crlf_and_type_filter(spark, tmp_path):
    """Payload bytes containing the CRLF-CRLF frame separator survive
    (Content-Length framing, not delimiter scanning); non-requested
    record types are skipped inside the splitter."""
    body = b"line1\r\n\r\nline2\x00\xff binary"
    p = str(tmp_path / "x.warc")
    write_warc(
        [{"url": "https://e.org/a", "ts_iso": "2024-01-01T00:00:00Z",
          "payload": body}],
        p, compress=False,
    )
    # append a non-response record by hand
    meta_block = b"via: https://e.org/seed"
    head = (
        "WARC/1.0\r\nWARC-Type: metadata\r\n"
        "WARC-Target-URI: https://e.org/a\r\n"
        "WARC-Date: 2024-01-01T00:00:01Z\r\n"
        "WARC-Record-ID: <urn:uuid:m>\r\n"
        f"Content-Length: {len(meta_block)}\r\n\r\n"
    ).encode()
    with open(p, "ab") as fh:
        fh.write(head + meta_block + b"\r\n\r\n")

    got = read_warc(spark, p).collect()
    assert len(got) == 1 and bytes(got[0].payload) == body

    both = read_warc(spark, p, record_types=("response", "metadata")).collect()
    assert {r.record_type for r in both} == {"response", "metadata"}
    meta = next(r for r in both if r.record_type == "metadata")
    assert bytes(meta.payload) == meta_block and meta.http_status is None


def test_torn_archive_fails_loudly(spark, tmp_path):
    p = str(tmp_path / "torn.warc")
    write_warc(
        [{"url": "https://e.org/a", "ts_iso": "2024-01-01T00:00:00Z",
          "payload": b"x" * 100}],
        p, compress=False,
    )
    raw = open(p, "rb").read()
    open(p, "wb").write(raw[:-60])  # truncate mid-block
    with pytest.raises(Exception, match="truncated|WARC"):
        read_warc(spark, p).collect()


def test_one_task_per_file(spark, tmp_path):
    """File-level parallelism: each archive parses in its own task
    (the Common-Crawl unit of work)."""
    _fixture(tmp_path, n_files=4, per_file=2)
    df = read_warc(spark, str(tmp_path / "*.warc.gz"))
    import pyspark.sql.functions as F

    parts = df.select(F.spark_partition_id().alias("p"), "warc_file").distinct()
    by_file = parts.groupBy("warc_file").count().collect()
    assert all(r["count"] == 1 for r in by_file)  # no file split across tasks
    assert df.count() == 8


def test_warc_files_incremental(spark, tmp_path):
    """warc as a files-source format: mtime-cursor incremental over a
    landing directory of crawl archives — the Common-Crawl ingest
    loop (each archive lands once, parses once)."""
    import os
    import time

    from airbyte_integrations_spark.sources.files import read_files_incremental

    _fixture(tmp_path, n_files=2, per_file=2)
    df, st = read_files_incremental(spark, str(tmp_path), fmt="warc")
    assert df.count() == 4
    assert "_ab_source_file_url" in df.columns
    assert df.filter("_ab_source_file_last_modified IS NULL").count() == 0

    # nothing new -> no read
    df2, st2 = read_files_incremental(spark, str(tmp_path), fmt="warc", state=st)
    assert df2 is None

    # a new archive lands -> only it is read
    time.sleep(0.02)
    write_warc(
        [{"url": "https://example.org/new", "ts_iso": "2024-04-01T00:00:00Z",
          "payload": b"<html>new</html>"}],
        str(tmp_path / "crawl-9.warc.gz"),
    )
    os.utime(str(tmp_path / "crawl-9.warc.gz"))
    df3, _ = read_files_incremental(spark, str(tmp_path), fmt="warc", state=st)
    assert [r.url for r in df3.collect()] == ["https://example.org/new"]
