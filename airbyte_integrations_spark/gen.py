"""Deterministic, distributed synthetic data generator.

Generates Common-Crawl-style `pages` and a CDC `change_events` log
(FIXTURES.md F1/F2) entirely with JVM-side column expressions over
``spark.range`` — no Python UDFs, no driver-side loops, no randomness
source other than xxhash64/md5 of the row id, so output is
byte-identical at any parallelism and any scale.

Skew: url ranks are drawn with a power-law transform of a uniform hash
(rank = floor(n_urls * u^alpha)), so low ranks are hot keys — this
exercises the salted/associative dedup path (SURVEY §4 "skew on hot
urls").

The `text` column is generated to be exactly what
functions.extract.extract_text produces from `html` (verified by
tests/test_extract.py) — the per-row invariant from BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Small fixed vocabulary; chosen words contain no markup or entities so
# the html->text extraction is exactly whitespace-joined tokens.
VOCAB = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango", "uniform",
    "victor", "whiskey", "xray", "yankee", "zulu", "amber", "birch",
    "cedar", "dune", "ember", "fjord", "grove", "harbor", "isle",
    "jade", "knoll", "lagoon", "mesa", "nook", "onyx", "pine",
    "quartz", "ridge", "slate", "thorn", "umber", "vale", "wharf",
    "yucca", "zenith", "arc", "bay", "cliff", "dell", "edge",
    "ford", "gate", "hill", "inlet", "junction", "key", "loch", "moor",
]
LANGS = ["en", "de", "fr", "es", "it", "nl", "pt", "pl"]
BASE_EPOCH_S = 1_600_000_000  # 2020-09-13T12:26:40Z


def _h(seed: str, ident: Column) -> Column:
    """Deterministic non-negative 64-bit hash of (seed, id)."""
    return F.abs(F.xxhash64(F.lit(seed), ident))


def _word(seed: str, ident: Column, pos: int) -> Column:
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    return F.element_at(vocab, (_h(f"{seed}:{pos}", ident) % len(VOCAB) + 1).cast("int"))


def _sentence(seed: str, ident: Column, n_words: int) -> Column:
    return F.concat_ws(" ", *[_word(seed, ident, i) for i in range(n_words)])


def url_for_rank(rank: Column) -> Column:
    return F.concat(
        F.lit("https://site-"),
        (rank % 97).cast("string"),
        F.lit(".example/page/"),
        rank.cast("string"),
    )


def page_content(ident: Column, url: Column, lang: Column, body_words: int = 24):
    """(html, text) pair for a page version keyed by `ident`.

    html embeds a <style> block and attributes so extraction is a real
    tag-strip, not a trivial one; text is exactly
    extract_text(html) by construction.
    """
    title = _sentence("title", ident, 3)
    para1 = _sentence("p1", ident, body_words)
    para2 = _sentence("p2", ident, body_words // 2)
    html = F.concat(
        F.lit("<html><head><title>"), title,
        F.lit("</title><style>body{margin:0;color:#333}</style></head>"),
        F.lit('<body class="page"><h1>'), title,
        F.lit("</h1>\n<p>"), para1,
        F.lit('</p>\n<p id="x">'), para2,
        F.lit("</p><script>var t=1;</script>\n<footer>lang="), lang,
        F.lit("</footer></body></html>"),
    )
    text = F.concat_ws(" ", title, title, para1, para2, F.concat(F.lit("lang="), lang))
    return F.encode(html, "UTF-8"), text


def gen_pages(spark: SparkSession, n_pages: int, seed: str = "pages") -> DataFrame:
    """Initial snapshot: one row per url rank 0..n_pages-1."""
    df = spark.range(n_pages).withColumnRenamed("id", "rank")
    rank = F.col("rank")
    url = url_for_rank(rank)
    lang = F.element_at(
        F.array(*[F.lit(x) for x in LANGS]), (_h(seed + ":lang", rank) % len(LANGS) + 1).cast("int")
    )
    ident = F.xxhash64(F.lit(seed), rank)
    html, text = page_content(ident, url, lang)
    warc_ts = F.timestamp_seconds(F.lit(BASE_EPOCH_S) + rank % 86400)
    return df.select(
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        text.alias("text"),
        lang.alias("lang"),
    )


def gen_change_events(
    spark: SparkSession,
    n_events: int,
    n_urls: int | None = None,
    skew_alpha: float = 3.0,
    delete_pct: int = 8,
    lsn_start: int = 1,
    seed: str = "cdc",
    n_partitions: int | None = None,
    body_words: int = 24,
) -> DataFrame:
    """WAL/binlog-tail event log: strictly-increasing `_ab_cdc_lsn`,
    Zipf-ish hot urls, ~delete_pct% tombstones, out-of-order
    `_ab_cdc_updated_at` vs lsn (jittered) to exercise the full winner
    ordering (stream_processor.py:832-846).
    """
    n_urls = n_urls or max(n_events // 10, 100)
    rng = spark.range(n_events, numPartitions=n_partitions) if n_partitions else spark.range(n_events)
    df = rng.withColumnRenamed("id", "seq")
    seq = F.col("seq")
    lsn = (seq + lsn_start).alias("_ab_cdc_lsn")

    u = (_h(seed + ":url", seq) % 1_000_000) / F.lit(1_000_000.0)
    rank = F.floor(F.lit(n_urls) * F.pow(u, F.lit(skew_alpha))).cast("long")
    url = url_for_rank(rank)
    lang = F.element_at(
        F.array(*[F.lit(x) for x in LANGS]), (_h(seed + ":lang", rank) % len(LANGS) + 1).cast("int")
    )
    # updated_at jitter: +/-3s around the lsn clock => lsn order and
    # transaction-time order disagree for nearby events.
    jitter = (_h(seed + ":jit", seq) % 7).cast("long") - 3
    upd_s = F.lit(BASE_EPOCH_S) + seq + jitter
    updated_at = F.timestamp_seconds(upd_s)
    emitted_at = F.timestamp_seconds(upd_s + 2)
    is_delete = (_h(seed + ":del", seq) % 100) < delete_pct
    deleted_at = F.when(is_delete, updated_at).otherwise(F.lit(None).cast("timestamp"))
    ab_id = F.md5(F.concat(F.lit(seed + ":ab:"), seq.cast("string")))

    ident = F.xxhash64(F.lit(seed + ":content"), seq)
    html, text = page_content(ident, url, lang, body_words=body_words)
    # Deletes carry the before image per DebeziumEventUtils.java:46-65;
    # content payload is irrelevant for tombstones downstream.
    return df.select(
        url.alias("url"),
        updated_at.alias("warc_ts"),
        html.alias("html"),
        text.alias("text"),
        lang.alias("lang"),
        lsn,
        updated_at.alias("_ab_cdc_updated_at"),
        deleted_at.alias("_ab_cdc_deleted_at"),
        ab_id.alias("_airbyte_ab_id"),
        emitted_at.alias("_airbyte_emitted_at"),
    )
