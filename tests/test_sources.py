"""Source contracts: incremental cursor scan (SAT
test_two_sequential_reads / abnormally-large-state), file-source mtime
cursor, CDC target position + snapshot-then-tail."""

import datetime as dt
import os
import time

import pytest

from airbyte_integrations_spark.gen import gen_change_events, gen_pages
from airbyte_integrations_spark.sources.cdc import LogTailSource
from airbyte_integrations_spark.sources.files import read_files_incremental
from airbyte_integrations_spark.sources.incremental import read_incremental


def test_incremental_two_sequential_reads(spark):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    first, state = read_incremental(events, "event_id", None)
    assert first.count() == events.count()
    second, state2 = read_incremental(events, "event_id", state)
    assert second.count() == 0  # nothing new => no records (SAT rule)
    assert state2 == state  # state echoed


def test_incremental_future_state_returns_nothing(spark):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    got, state = read_incremental(events, "event_id", 10**15)
    assert got.count() == 0 and state == 10**15


def test_incremental_partial_resume(spark):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    mid = events.approxQuantile("event_id", [0.5], 0.0)[0]
    got, state = read_incremental(events, "event_id", int(mid))
    assert got.count() == events.filter(f"event_id > {int(mid)}").count()


def test_file_source_mtime_cursor(spark, tmp_path):
    d = str(tmp_path / "in")
    os.makedirs(d)
    gen_pages(spark, 10).select("url", "lang").write.parquet(d + "/f1")
    df1, s1 = read_files_incremental(spark, d, "parquet", None, suffix=".parquet")
    assert df1.count() == 10
    assert df1.filter("_ab_source_file_last_modified IS NULL").count() == 0
    # no new files => no data
    df2, s2 = read_files_incremental(spark, d, "parquet", s1, suffix=".parquet")
    assert df2 is None and s2 == s1
    time.sleep(1.1)
    gen_pages(spark, 5).select("url", "lang").write.parquet(d + "/f2")
    df3, s3 = read_files_incremental(spark, d, "parquet", s1, suffix=".parquet")
    assert df3.count() == 5 and s3.cursor > s1.cursor


def test_file_source_same_mtime_tie_history(spark, tmp_path):
    """A file landing with mtime EQUAL to the cursor after the sync that
    set it is still picked up (source-s3 stream.py history semantics) —
    a bare strictly-> cursor would skip it forever — and the history
    makes the re-read converge."""
    d = str(tmp_path / "tie")
    os.makedirs(d)
    gen_pages(spark, 10).select("url", "lang").coalesce(1).write.parquet(d + "/f1")
    df1, s1 = read_files_incremental(spark, d, "parquet", None, suffix=".parquet")
    assert df1.count() == 10
    # late arrival stamped at EXACTLY the cursor mtime
    gen_pages(spark, 4).select("url", "lang").coalesce(1).write.parquet(d + "/f2")
    tie = s1.cursor.timestamp()
    for dirpath, _dd, fns in os.walk(d + "/f2"):
        for fn in fns:
            os.utime(os.path.join(dirpath, fn), (tie, tie))
    df2, s2 = read_files_incremental(spark, d, "parquet", s1, suffix=".parquet")
    assert df2 is not None and df2.count() == 4
    assert s2.cursor == s1.cursor and s2.history > s1.history
    # converged: nothing selects on the next pass
    df3, s3 = read_files_incremental(spark, d, "parquet", s2, suffix=".parquet")
    assert df3 is None and s3 == s2
    # legacy bare-datetime state still accepted (and demonstrates why
    # history exists: the tied file is invisible to it)
    df4, _s4 = read_files_incremental(
        spark, d, "parquet", s1.cursor, suffix=".parquet"
    )
    assert df4 is None


def test_cdc_target_position_bounds_sync(spark):
    ev = gen_change_events(spark, 500, n_urls=40)
    src = LogTailSource(ev)
    target = src.target_position()
    assert target == 500
    sl = src.slice(100, target)
    assert sl.count() == 400


def test_snapshot_then_tail(spark):
    pages = gen_pages(spark, 30)
    ev = gen_change_events(spark, 100, n_urls=30)
    src = LogTailSource(ev)
    merged = src.snapshot_then_tail(pages, snapshot_lsn=0)
    assert merged.count() == 130
    assert merged.filter("_ab_cdc_lsn = 0").count() == 30


def test_file_source_csv_and_json(spark, tmp_path):
    d = str(tmp_path / "multi")
    os.makedirs(d)
    pages = gen_pages(spark, 8).select("url", "lang")
    pages.write.option("header", True).csv(d + "/c")
    df_csv, s = read_files_incremental(
        spark, d + "/c", "csv", None, suffix=".csv", header=True
    )
    assert df_csv.count() == 8 and "url" in df_csv.columns
    pages.write.json(d + "/j")
    df_json, _ = read_files_incremental(spark, d + "/j", "json", None, suffix=".json")
    assert df_json.count() == 8
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unsupported format"):
        read_files_incremental(spark, d, "orc2", None)


def test_namespaced_catalog_sync(spark, tmp_path):
    import datetime as dt

    from airbyte_integrations_spark.catalog import ConfiguredStream, run_catalog_sync
    from airbyte_integrations_spark.config import (
        DestinationSyncMode,
        SyncConfig,
        SyncMode,
    )
    from airbyte_integrations_spark.lakehouse.table import LakeTable

    df = spark.createDataFrame([("k1", 1.0)], "k string, v double")
    cfg = SyncConfig(
        stream="rates",
        primary_key=("k",),
        sync_mode=SyncMode.FULL_REFRESH,
        destination_sync_mode=DestinationSyncMode.OVERWRITE,
        properties={"namespace": "Public Schema"},
    )
    versions = run_catalog_sync(spark, [(ConfiguredStream(cfg), df)], str(tmp_path / "lake"))
    assert "Public Schema.rates" in versions
    t = LakeTable(spark, str(tmp_path / "lake/public_schema/rates"))
    assert t.read().count() == 1


def test_very_large_record_roundtrip(spark, tmp_path):
    """DestinationAcceptanceTest 'very large records' (:680) analogue:
    a multi-MB text payload survives dedup + MERGE byte-identically."""
    import datetime as dt

    from airbyte_integrations_spark.lakehouse.merge import merge_into
    from airbyte_integrations_spark.lakehouse.table import LakeTable

    ts = dt.datetime(2021, 6, 1)
    big = "x" * (5 * 1024 * 1024) + "END"
    schema = (
        "url string, text string, _ab_cdc_lsn long, _ab_cdc_updated_at timestamp, "
        "_ab_cdc_deleted_at timestamp, _airbyte_ab_id string, _airbyte_emitted_at timestamp"
    )
    t = LakeTable(spark, str(tmp_path / "t"))
    merge_into(t, spark.createDataFrame([("u", big, 1, ts, None, "a", ts)], schema), epoch=1)
    merge_into(t, spark.createDataFrame([("u", big + "2", 2, ts, None, "b", ts)], schema), epoch=2)
    rows = t.read().collect()
    assert len(rows) == 1
    assert rows[0]["text"] == big + "2"
    assert len(rows[0]["text"]) == 5 * 1024 * 1024 + 4


def test_csv_options_parity(spark, tmp_path):
    """The reference CSV spec's knobs (source-s3 csv_spec.py:21-56 —
    delimiter, quote_char, escape_char, encoding, infer_datatypes,
    multiline values) map 1:1 onto Spark csv reader options through
    read_files_incremental's option passthrough, including gzip
    transport (transparent by extension)."""
    import gzip

    d = str(tmp_path / "csvopts")
    os.makedirs(d)
    raw = (
        'id|name|note\n'
        '1|"pipe|in quotes"|plain\n'
        '2|"esc \\" quoted"|"multi\nline"\n'
        '3|café|7\n'
    )
    with open(os.path.join(d, "a.csv"), "w", encoding="utf-8") as f:
        f.write(raw)

    df, _ = read_files_incremental(
        spark, d, "csv", None, suffix=".csv",
        header=True, sep="|", quote='"', escape="\\",
        multiLine=True, encoding="UTF-8", inferSchema=True,
    )
    rows = {r["id"]: r for r in df.collect()}
    assert len(rows) == 3
    assert rows[1]["name"] == "pipe|in quotes"   # quote_char
    assert rows[2]["name"] == 'esc " quoted'    # escape_char (escaped quote)
    assert rows[2]["note"] == "multi\nline"      # newlines_in_values
    assert rows[3]["name"] == "café"             # encoding
    assert dict(df.dtypes)["id"] == "int"        # infer_datatypes

    # gzip-compressed member read transparently (reference decompresses
    # by extension; Spark's csv source does the same)
    g = str(tmp_path / "csvgz")
    os.makedirs(g)
    with gzip.open(os.path.join(g, "b.csv.gz"), "wt", encoding="utf-8") as f:
        f.write("id,name\n9,zed\n")
    dfz, _ = read_files_incremental(
        spark, g, "csv", None, suffix=".csv.gz", header=True, inferSchema=True
    )
    assert dfz.collect()[0]["name"] == "zed"


def test_orc_and_feather_formats(spark, tmp_path):
    """orc (native Spark datasource) and feather (Arrow IPC decoded
    executor-side, the reference source-file pandas-engine branch) both
    flow through the same mtime-cursor incremental contract."""
    import time

    import pandas as pd

    from airbyte_integrations_spark.sources.files import CURSOR_COL, URL_COL

    # --- orc
    d = str(tmp_path / "orc_src")
    gen_pages(spark, 6).select("url", "lang").coalesce(1).write.orc(d)
    df_orc, state = read_files_incremental(spark, d, "orc", None, suffix=".orc")
    assert df_orc.count() == 6 and {URL_COL, CURSOR_COL} <= set(df_orc.columns)

    # --- feather
    f = str(tmp_path / "feather_src")
    os.makedirs(f)
    for i in range(2):
        pdf = pd.DataFrame({"id": [i * 10 + 1, i * 10 + 2], "name": [f"a{i}", f"b{i}"]})
        p = os.path.join(f, f"part{i}.feather")
        pdf.to_feather(p)
        os.utime(p, (time.time() - 60 + i * 10,) * 2)
    df_fe, st = read_files_incremental(spark, f, "feather", None, suffix=".feather")
    assert df_fe.count() == 4
    assert sorted(r["id"] for r in df_fe.collect()) == [1, 2, 11, 12]
    assert df_fe.select(URL_COL).distinct().count() == 2

    # incremental resume picks up only the newer file
    p3 = os.path.join(f, "part2.feather")
    pd.DataFrame({"id": [99], "name": ["z"]}).to_feather(p3)
    df2, st2 = read_files_incremental(spark, f, "feather", st)
    assert df2.count() == 1 and st2.cursor > st.cursor
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no options"):
        read_files_incremental(spark, f, "feather", None, header=True)


def test_file_source_html(spark, tmp_path):
    """html branch (source-file client.py:282 read_html analogue):
    one row per file with raw bytes + the canonical byte-stable text
    extraction, mtime-cursor incremental like every other format."""
    from airbyte_integrations_spark.functions.extract import extract_text_py

    d = str(tmp_path / "web")
    os.makedirs(d)
    pages = {
        "a.html": "<html><head><style>p{}</style></head>"
                  "<body><h1>Title &amp; more</h1><p>Body A</p></body></html>",
        "b.html": "<html><script>var x=1;</script><p>Body&nbsp;B</p></html>",
    }
    for name, content in pages.items():
        with open(os.path.join(d, name), "w") as f:
            f.write(content)
    df, s1 = read_files_incremental(spark, d, "html", None, suffix=".html")
    rows = {os.path.basename(r["_ab_source_file_url"]): r for r in df.collect()}
    assert set(rows) == {"a.html", "b.html"}
    for name, r in rows.items():
        assert bytes(r["html"]).decode() == pages[name]
        # byte-identical to the scalar oracle of the SAME rule the CDC
        # path uses — scripts/styles dropped, entities unescaped
        assert r["text"] == extract_text_py(pages[name].encode())
        assert r["_ab_source_file_last_modified"] is not None
    assert rows["a.html"]["text"] == "Title & more Body A"
    assert rows["b.html"]["text"] == "Body B"

    # mtime cursor: nothing new => None; a new file => only it
    df2, s2 = read_files_incremental(spark, d, "html", s1, suffix=".html")
    assert df2 is None and s2 == s1
    time.sleep(1.1)
    with open(os.path.join(d, "c.html"), "w") as f:
        f.write("<p>late</p>")
    df3, s3 = read_files_incremental(spark, d, "html", s1, suffix=".html")
    assert df3.count() == 1 and s3.cursor > s1.cursor
    assert df3.first()["text"] == "late"


def test_glob_path_pattern_matching_semantics():
    """source-s3 stream.py:146 globmatch(key, pattern, GLOBSTAR|SPLIT):
    ** crosses directories, * stays in-segment, | splits alternates."""
    from airbyte_integrations_spark.sources.files import compile_path_pattern

    m = compile_path_pattern("**/*.csv")
    assert m("a.csv") and m("x/a.csv") and m("x/y/a.csv")
    assert not m("a.json") and not m("x/a.csv.bak")
    m = compile_path_pattern("data/*.csv")
    assert m("data/a.csv")
    assert not m("data/sub/a.csv")  # * does not cross /
    m = compile_path_pattern("data/**/part-?.parquet")
    assert m("data/part-1.parquet")  # **/ matches zero dirs
    assert m("data/x/y/part-2.parquet")
    assert not m("data/part-10.parquet")  # ? is one char
    m = compile_path_pattern("a/*.csv|b/*.json")  # SPLIT
    assert m("a/x.csv") and m("b/y.json")
    assert not m("a/x.json") and not m("b/y.csv")
    m = compile_path_pattern("logs/202[34]/**")
    assert m("logs/2023/x/y.gz") and m("logs/2024/z")
    assert not m("logs/2025/x")
    with pytest.raises(ValueError):
        compile_path_pattern("  |  ")


def test_read_files_with_path_pattern(spark, tmp_path):
    """Pattern pruning happens at LISTING time: only matching keys are
    read, and the mtime cursor is computed over the matched set."""
    import pandas as pd

    d = tmp_path / "root"
    for rel in ("keep/a.csv", "keep/sub/b.csv", "skip/c.csv", "keep/d.txt"):
        p = d / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        pd.DataFrame({"k": [rel]}).to_csv(p, index=False)
    df, state = read_files_incremental(
        spark, str(d), "csv", None, path_pattern="keep/**/*.csv",
        header="true",
    )
    got = sorted(r.k for r in df.collect())
    assert got == ["keep/a.csv", "keep/sub/b.csv"]
    assert state is not None
    # no match -> no read, state unchanged
    df2, st2 = read_files_incremental(
        spark, str(d), "csv", state, path_pattern="keep/**/*.csv",
        header="true",
    )
    assert df2 is None and st2 == state


def test_csv_headerless_column_names(spark, tmp_path):
    """source-s3 advanced_options `column_names` parity
    (source-s3/.../csv_spec.py:68-70): a header-less csv reads with the
    given names positionally; count mismatch and header=true conflict
    fail loudly; a name list also arrives comma-joined (the spec's
    JSON string form)."""
    import pytest

    from airbyte_integrations_spark.sources.files import read_files_incremental

    root = str(tmp_path / "in")
    os.makedirs(root)
    with open(os.path.join(root, "a.csv"), "w") as f:
        f.write("u1,10,en\nu2,20,de\n")
    df, _ = read_files_incremental(
        spark, root, fmt="csv", column_names=["url", "n", "lang"]
    )
    rows = {r["url"]: (r["n"], r["lang"]) for r in df.collect()}
    assert rows == {"u1": ("10", "en"), "u2": ("20", "de")}
    # comma-joined string form + typed read via inferSchema
    df2, _ = read_files_incremental(
        spark, root, fmt="csv", column_names="url, n, lang", inferSchema="true"
    )
    assert {r["n"] for r in df2.collect()} == {10, 20}
    with pytest.raises(ValueError, match="4 names"):
        read_files_incremental(spark, root, fmt="csv", column_names=["a", "b", "c", "d"])[0].columns
    with pytest.raises(ValueError, match="header"):
        read_files_incremental(
            spark, root, fmt="csv", column_names=["a", "b", "c"], header="true"
        )
    with pytest.raises(ValueError, match="csv only"):
        read_files_incremental(spark, root, fmt="json", column_names=["a"])
