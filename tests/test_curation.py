"""Unit pins for the r3 curation/eventlog operators: decontamination,
PII redaction, URL canonicalization, sessionization. Each case is a
hand-computed expectation on a constructed frame (the driver oracle
covers the corpus-scale parity; these pin the semantic edges)."""

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from airbyte_integrations_spark.functions.curation import (
    EMAIL_TOKEN,
    PHONE_TOKEN,
    decontaminate,
    redact_pii,
    url_canonicalize,
    url_host,
    url_registered_domain,
)
from airbyte_integrations_spark.operators.sessionize import (
    session_stats,
    sessionize,
)


# ------------------------------------------------------------ decontaminate

def test_decontaminate_flags_shared_5gram(spark):
    eval_df = spark.createDataFrame(
        [Row(doc_id=100, text="the quick brown fox jumps over the lazy dog")]
    )
    train = spark.createDataFrame(
        [
            # shares "quick brown fox jumps over" (a 5-gram of eval)
            Row(doc_id=1, text="a quick brown fox jumps over fences daily"),
            # same words, different order => no shared 5-gram
            Row(doc_id=2, text="fox brown quick the jumps lazy over dog the"),
        ]
    )
    out = {
        r["doc_id"]: r
        for r in decontaminate(train, eval_df, "doc_id", "text", k=5).collect()
    }
    assert out[1]["is_contaminated"] == 1 and out[1]["n_hits"] >= 1
    assert out[2]["is_contaminated"] == 0 and out[2]["n_hits"] == 0
    # n_grams counts DISTINCT 5-grams: 8 words -> 4 positions
    assert out[1]["n_grams"] == 4


def test_decontaminate_short_doc_single_gram(spark):
    # fewer than k words: one (short) shingle position, no crash
    eval_df = spark.createDataFrame([Row(doc_id=9, text="tiny doc")])
    train = spark.createDataFrame([Row(doc_id=1, text="tiny doc")])
    row = decontaminate(train, eval_df, "doc_id", "text", k=5).collect()[0]
    assert row["n_grams"] == 1 and row["is_contaminated"] == 1


# ----------------------------------------------------------------- PII

def test_redact_pii_counts_and_masks(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="mail a.b+c_d%e@sub.Example.org and x@y.io now"),
            Row(doc_id=2, text="call +1 (555) 010-1234 or +44 (020) 946-0000"),
            Row(doc_id=3, text="clean text, no pii at all"),
        ]
    )
    out = {r["doc_id"]: r for r in redact_pii(df, "text").collect()}
    assert out[1]["n_emails"] == 2 and out[1]["n_phones"] == 0
    assert out[1]["redacted"] == f"mail {EMAIL_TOKEN} and {EMAIL_TOKEN} now"
    assert out[2]["n_phones"] == 2
    assert out[2]["redacted"] == f"call {PHONE_TOKEN} or {PHONE_TOKEN}"
    assert out[3]["redacted"] == out[3]["text"]
    assert out[3]["n_emails"] == 0 and out[3]["n_phones"] == 0


# ----------------------------------------------------------------- URLs

URL_CASES = [
    (
        "http://WWW.News.Example.COM/a/B?utm_source=x&id=7&ref=r2&q=z#frag",
        "https://news.example.com/a/B?id=7&q=z",
        "news.example.com",
        "example.com",
    ),
    # all params tracking -> no '?'; no www to strip
    (
        "https://blog.site.org/post?utm_campaign=c&fbclid=abc",
        "https://blog.site.org/post",
        "blog.site.org",
        "site.org",
    ),
    # no query, no path
    ("https://Example.com", "https://example.com", "example.com", "example.com"),
]


@pytest.mark.parametrize("url,canon,host,domain", URL_CASES)
def test_url_canonicalize(spark, url, canon, host, domain):
    df = spark.createDataFrame([Row(url=url)])
    row = df.select(
        url_canonicalize(F.col("url")).alias("c"),
        url_host(F.col("url")).alias("h"),
        url_registered_domain(F.col("url")).alias("d"),
    ).collect()[0]
    assert row["c"] == canon
    assert row["h"] == host
    assert row["d"] == domain


def test_url_canonical_merges_tracking_duplicates(spark):
    # the point of the operator: utm-variants of one URL dedup to 1
    df = spark.createDataFrame(
        [
            Row(url="https://a.com/x?utm_source=1&id=5"),
            Row(url="https://WWW.A.com/x?id=5&utm_medium=2"),
            Row(url="https://a.com/x?id=6"),
        ]
    )
    n = (
        df.select(url_canonicalize(F.col("url")).alias("c"))
        .distinct()
        .count()
    )
    assert n == 2


# ------------------------------------------------------------- sessionize

def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def test_sessionize_gap_boundary(spark):
    # silence of EXACTLY gap does not split; gap+1 does
    rows = [
        Row(user_id=1, event_id=1, ts=_ts(0), value=1.0),
        Row(user_id=1, event_id=2, ts=_ts(1800), value=2.0),   # == gap: same
        Row(user_id=1, event_id=3, ts=_ts(3601), value=3.0),   # gap+1: new
        Row(user_id=2, event_id=4, ts=_ts(10), value=4.0),
    ]
    sess = sessionize(
        spark.createDataFrame(rows), "user_id", "ts", gap_s=1800,
        tiebreak_col="event_id",
    )
    got = {
        (r["user_id"], r["event_id"]): r["session_id"] for r in sess.collect()
    }
    assert got[(1, 1)] == 1 and got[(1, 2)] == 1
    assert got[(1, 3)] == 2
    assert got[(2, 4)] == 1


def test_session_stats_exact_cents(spark):
    rows = [
        Row(user_id=1, event_id=1, ts=_ts(0), value=6.55),
        Row(user_id=1, event_id=2, ts=_ts(60), value=12.31),
    ]
    sess = sessionize(
        spark.createDataFrame(rows), "user_id", "ts", gap_s=1800,
        tiebreak_col="event_id",
    )
    st = session_stats(sess, "user_id", "ts", "value").collect()[0]
    assert st["n_events"] == 2
    assert st["duration_s"] == 60
    assert st["sum_cents"] == 655 + 1231


def test_sessionize_single_exchange_plan(spark):
    """Both windows + the stats agg must reuse ONE user-keyed shuffle —
    the scale property the operator claims."""
    rows = [
        Row(user_id=i % 3, event_id=i, ts=_ts(i * 10), value=1.0)
        for i in range(30)
    ]
    out = session_stats(
        sessionize(spark.createDataFrame(rows), "user_id", "ts", 1800,
                   tiebreak_col="event_id"),
        "user_id", "ts", "value",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2  # initial parallelize + one shuffle


def test_sessionize_stream_matches_batch(spark, tmp_path):
    """Streaming session_window (complete drain) groups the same events
    into the same (start,end,count) sessions as the batch gap rule when
    no session exceeds the gap internally."""
    rows = [
        Row(user_id=1, event_id=1, ts=_ts(0), value=1.0),
        Row(user_id=1, event_id=2, ts=_ts(600), value=1.0),
        Row(user_id=1, event_id=3, ts=_ts(5000), value=1.0),   # new session
        Row(user_id=2, event_id=4, ts=_ts(100), value=1.0),
    ]
    log = str(tmp_path / "ev")
    spark.createDataFrame(rows).write.parquet(log)
    schema = spark.read.parquet(log).schema

    from airbyte_integrations_spark.operators.sessionize import (
        sessionize_stream,
    )

    stream = spark.readStream.schema(schema).parquet(log)
    out = sessionize_stream(stream, "user_id", "ts", gap="30 minutes")
    q = (
        out.writeStream.format("memory").queryName("sess_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in spark.sql("select * from sess_out").collect()
    }
    assert got == {
        (1, _ts(0)): 2,       # events at t=0 and t=600 merge
        (1, _ts(5000)): 1,
        (2, _ts(100)): 1,
    }


def test_url_canonicalize_idempotent(spark):
    """canon(canon(u)) == canon(u) over a messy generated corpus —
    the invariant that makes the normalizer safe to re-apply in
    multi-stage pipelines (raw -> staged -> final)."""
    import random

    rng = random.Random(42)
    hosts = ["WWW.A.com", "a.b.C.org", "www.x.io", "Y.net", "z.co"]
    params = ["utm_source=s", "utm_campaign=c", "ref=r", "fbclid=f",
              "id=1", "q=term", "page=2", ""]
    urls = []
    for _ in range(60):
        scheme = rng.choice(["http", "https"])
        host = rng.choice(hosts)
        path = rng.choice(["", "/", "/a", "/a/B/c"])
        qs = "&".join(rng.sample(params, rng.randint(0, 4)))
        frag = rng.choice(["", "#x"])
        urls.append(f"{scheme}://{host}{path}" + (f"?{qs}" if qs else "") + frag)
    df = spark.createDataFrame([Row(url=u) for u in urls])
    once = url_canonicalize(F.col("url"))
    out = df.select(
        once.alias("c1"),
        url_canonicalize(once).alias("c2"),
    )
    assert out.filter(F.col("c1") != F.col("c2")).count() == 0


def test_incremental_dedup_status_taxonomy(spark, tmp_path):
    """All three MERGE-taxonomy statuses of dedup-on-ingest over a
    crafted corpus/batch split (doc_id % 10 >= 8 = incoming batch):
    dup_of_corpus beats dup_in_batch, within-batch winner is the
    lowest doc_id, unique heads are new."""
    from pyspark.sql import Row

    head_a = "alpha " * 20           # shared head: corpus doc 1 + batch doc 8
    head_b = "bravo " * 20           # batch-only head: docs 18 (winner) + 28
    head_c = "charlie " * 20         # unique in batch: doc 38
    rows = [
        Row(doc_id=1, text=head_a + "corpus tail", lang="en", source="s", n_chars=1),
        Row(doc_id=8, text=head_a + "recrawled tail", lang="en", source="s", n_chars=1),
        Row(doc_id=18, text=head_b + "x", lang="en", source="s", n_chars=1),
        Row(doc_id=28, text=head_b + "y", lang="en", source="s", n_chars=1),
        Row(doc_id=38, text=head_c, lang="en", source="s", n_chars=1),
    ]
    spark.createDataFrame(rows).write.parquet(str(tmp_path / "documents.parquet"))

    import __spark_entry__ as ent

    got = {
        r["doc_id"]: r["status"]
        for r in ent.q_docs_incremental_dedup(spark, str(tmp_path)).collect()
    }
    assert got == {
        8: "dup_of_corpus",
        18: "new",
        28: "dup_in_batch",
        38: "new",
    }


# ----------------------------------------------------------- c4 line filter

def test_c4_line_filter_rules(spark):
    from airbyte_integrations_spark.functions.curation import c4_line_filter

    df = spark.createDataFrame(
        [
            Row(
                doc_id=1,
                text=(
                    "one two three four five six.\n"      # kept
                    "no terminal punctuation here at all\n"  # dropped: rule (a)
                    "too short.\n"                        # dropped: rule (b)
                    "this line mentions javascript a lot.\n"  # dropped: rule (c)
                    "another good line with many words!\n"    # kept
                    'quoted line stays with five words"'      # kept (quote terminal)
                ),
            ),
            Row(doc_id=2, text="only one decent line right here."),
        ]
    )
    out = c4_line_filter(
        df, min_words_per_line=5, min_kept_lines=3, badwords=("javascript",)
    ).collect()
    by_id = {r.doc_id: r for r in out}
    d1 = by_id[1]
    assert d1.n_lines == 6
    assert d1.n_kept_lines == 3
    assert d1.doc_kept is True
    assert d1.clean_text == (
        "one two three four five six.\n"
        "another good line with many words!\n"
        'quoted line stays with five words"'
    )
    assert d1.kept_words == 6 + 6 + 6
    d2 = by_id[2]
    assert d2.n_kept_lines == 1 and d2.doc_kept is False
    assert d2.clean_text == "only one decent line right here."


def test_c4_line_filter_badword_boundary_and_case(spark):
    """The blocklist matches whole words case-insensitively: 'Slow'
    fires, 'slowly' does not (word boundary)."""
    from airbyte_integrations_spark.functions.curation import c4_line_filter

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="the Slow train arrives here today."),
            Row(doc_id=2, text="she walked slowly across the room."),
        ]
    )
    out = {
        r.doc_id: r.n_kept_lines
        for r in c4_line_filter(df, badwords=("slow",), min_kept_lines=1).collect()
    }
    assert out == {1: 0, 2: 1}


def test_c4_line_filter_narrow_plan(spark):
    """Scale pin: the cleaning is one codegen'd projection — no
    Exchange beyond the input parallelize, no Python evaluation, no
    Generate (the line array never explodes)."""
    from airbyte_integrations_spark.functions.curation import c4_line_filter

    df = spark.createDataFrame([Row(doc_id=1, text="a b c d e f.")])
    plan = c4_line_filter(df, badwords=("x",))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Generate" not in plan
    assert plan.count("Exchange") == 0


def test_hashed_linear_score_matches_python_reference(spark):
    """Integer-exact score: bigram -> md5-prefix bucket (mod 1024) ->
    Knuth-hash weight in [-1000, 1000] -> sum, reproduced in pure
    Python."""
    import hashlib

    from airbyte_integrations_spark.functions.curation import (
        hashed_linear_score,
    )

    text = "the quick brown fox jumps"

    def w(bg: str) -> int:
        b = int(hashlib.md5(bg.encode()).hexdigest()[:6], 16) % 1024
        return (b * 2654435761) % 2147483648 % 2001 - 1000

    words = text.split(" ")
    expected = sum(w(f"{a} {b}") for a, b in zip(words, words[1:]))
    row = (
        spark.createDataFrame([(1, text)], "doc_id long, text string")
        .select(hashed_linear_score("text").alias("s"))
        .collect()[0]["s"]
    )
    assert row["n_bigrams"] == len(words) - 1
    assert row["score"] == expected


def test_hashed_linear_score_short_doc_and_narrow_plan(spark):
    """A <2-word doc scores (0, 0) instead of tripping the descending
    sequence() edge; the whole classifier is one narrow projection —
    no Exchange, no Python, no Generate."""
    from pyspark.sql import Row

    from airbyte_integrations_spark.functions.curation import (
        hashed_linear_score,
    )

    df = spark.createDataFrame([Row(doc_id=1, text="solo")])
    out = df.select(hashed_linear_score("text").alias("s"))
    row = out.collect()[0]["s"]
    assert (row["n_bigrams"], row["score"]) == (0, 0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Generate" not in plan
    assert plan.count("Exchange") == 0


def test_priority_sample_key_weight_proportional_and_deterministic(spark):
    from airbyte_integrations_spark.functions.curation import priority_sample_key

    # two strata: heavy docs (w=1000) and light docs (w=10), equal counts.
    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, 1000).otherwise(10).alias("w"),
    )
    keyed = df.select(
        "doc_id", "w", priority_sample_key(F.col("doc_id"), F.col("w")).alias("k")
    )
    top = keyed.orderBy(F.col("k").asc(), F.col("doc_id").asc()).limit(200)
    rows = top.collect()
    # deterministic: same sample on re-run
    rows2 = keyed.orderBy(F.col("k").asc(), F.col("doc_id").asc()).limit(200).collect()
    assert [r["doc_id"] for r in rows] == [r["doc_id"] for r in rows2]
    # weight-proportional: heavy stratum (100x weight) dominates the
    # sample far beyond its 50% population share
    n_heavy = sum(1 for r in rows if r["w"] == 1000)
    assert n_heavy > 180, n_heavy
