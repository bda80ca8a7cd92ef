"""Corpus-curation operators a training-data pipeline runs before the
text ever reaches a tokenizer: benchmark decontamination, PII
redaction, and URL canonicalization.

These are LLM-data-pipeline additions on top of the reference's CDC
surface (the brief's first-class extras); each is expressed with
native Catalyst expressions only — no Python in the row path — so the
plans stay inside whole-stage codegen and scale with executors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from airbyte_integrations_spark.functions.neardup import shingles

# ------------------------------------------------------------- decontaminate

def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Benchmark decontamination by k-gram overlap (the standard
    train/test leak gate: a training doc sharing any k-word shingle
    with the held-out set is flagged).

    Returns one row per training doc: (id, n_grams, n_hits,
    is_contaminated) where n_grams counts the doc's DISTINCT k-grams
    and n_hits counts how many of them occur anywhere in the eval set.

    Scale shape (10^10 docs): the eval side is benchmark-sized (10^4-
    10^6 grams), so it is reduced to DISTINCT grams and BROADCAST; the
    training shingle explosion never shuffles — each partition joins
    against the in-memory gram set and aggregates map-side by doc id.
    No all-pairs comparison, no skew exposure (gram frequency skew sits
    on the broadcast side).
    """
    train_sh = shingles(train, id_col, text_col, k)
    eval_grams = (
        shingles(eval_df, id_col, text_col, k)
        .select("shingle").distinct()
        .withColumn("_hit", F.lit(1))
    )
    joined = train_sh.join(F.broadcast(eval_grams), "shingle", "left")
    return joined.groupBy(id_col).agg(
        F.count("*").alias("n_grams"),
        F.count("_hit").alias("n_hits"),
        (F.count("_hit") > 0).cast("int").alias("is_contaminated"),
    )


# ---------------------------------------------------------------- PII redact

# Conservative patterns valid (and identical in semantics) under both
# Java regex and RE2 — no backreferences, no lookaround — so the DuckDB
# oracle and any RE2-based scrubber agree byte-for-byte.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+[0-9]{1,2} \([0-9]{3}\) [0-9]{3}-[0-9]{4}"

EMAIL_TOKEN = "<EMAIL>"
PHONE_TOKEN = "<PHONE>"


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "redacted"
) -> DataFrame:
    """Mask emails and phone numbers, counting what was masked.

    Adds n_emails / n_phones (match counts on the ORIGINAL text) and
    `out_col` with every match replaced by a typed token. Pure
    projection — codegen'd per partition, no shuffle, scales linearly.
    Email is replaced first; the phone pattern cannot match inside the
    email token, so the two passes are order-independent on real text.
    """
    c = F.col(text_col)
    masked = F.regexp_replace(
        F.regexp_replace(c, EMAIL_RE, EMAIL_TOKEN), PHONE_RE, PHONE_TOKEN
    )
    return df.withColumns({
        "n_emails": F.regexp_count(c, F.lit(EMAIL_RE)).cast("long"),
        "n_phones": F.regexp_count(c, F.lit(PHONE_RE)).cast("long"),
        out_col: masked,
    })


# ------------------------------------------------------------ URL canonical

# One regex family shared with the SQL oracle (Java regex + RE2 safe).
_HOST_RE = r"^https?://([^/?#]+)"
_PATH_RE = r"^https?://[^/?#]+([^?#]*)"
_QUERY_RE = r"\?([^#]*)"
TRACKING_PARAM_RE = r"^(utm_[a-z]+|ref|fbclid|gclid)="


def url_host(url: Column) -> Column:
    """Lowercased authority with any leading www. stripped."""
    host = F.lower(F.regexp_extract(url, _HOST_RE, 1))
    return F.regexp_replace(host, r"^www\.", "")


def url_registered_domain(url: Column) -> Column:
    """Last two host labels (public-suffix lists are a config concern;
    the two-label rule is the deterministic, oracle-checkable core)."""
    return F.regexp_extract(url_host(url), r"([^.]+\.[^.]+)$", 1)


def url_canonicalize(url: Column) -> Column:
    """Canonical form: https, lowercased www-stripped host, path kept
    verbatim, tracking parameters (utm_*/ref/fbclid/gclid) dropped,
    remaining query order preserved, fragment dropped.

    Composition of codegen'd string expressions — a projection that
    runs where the data is. This is the key normalizer in front of
    exact URL dedup: without it, utm-tagged duplicates defeat the
    hash-groupBy dedup entirely.
    """
    path = F.regexp_extract(url, _PATH_RE, 1)
    qs = F.regexp_extract(url, _QUERY_RE, 1)
    kept = F.array_join(
        F.filter(
            F.split(qs, "&"),
            lambda kv: (kv != "") & ~kv.rlike(TRACKING_PARAM_RE),
        ),
        "&",
    )
    return F.concat(
        F.lit("https://"),
        url_host(url),
        path,
        F.when(kept != "", F.concat(F.lit("?"), kept)).otherwise(F.lit("")),
    )


# ---------------------------------------------------------- C4 line cleaning

TERMINAL_PUNCT = (".", "!", "?", '"')


def c4_line_filter(
    df: DataFrame,
    *,
    text_col: str = "text",
    min_words_per_line: int = 5,
    min_kept_lines: int = 3,
    badwords: tuple[str, ...] = (),
) -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2020 §2.2; the same
    rule set ships in TensorFlow-Datasets' c4_utils and every open
    reproduction): split the document on newlines, keep only lines that
    (a) end in terminal punctuation, (b) have at least
    ``min_words_per_line`` words, and (c) contain no blocklisted word;
    then keep only documents with at least ``min_kept_lines`` surviving
    lines. Emits per-document audit counters plus the cleaned text so
    downstream dedup runs on what a C4 pipeline would actually keep.

    Scale shape: one narrow projection — split / filter / aggregate are
    Catalyst higher-order functions over the line array, entirely
    inside whole-stage codegen. No shuffle, no Python, no explode (the
    line array never leaves the row), so at 10^10 documents this is a
    pure map stage that parallelizes with executors.

    Output columns: every input column plus
      n_lines        total lines in the document
      n_kept_lines   lines surviving the three rules
      kept_words     total words across surviving lines
      doc_kept       n_kept_lines >= min_kept_lines
      clean_text     surviving lines rejoined with '\\n' ('' when none)
    """
    lines = F.split(F.col(text_col), "\n")
    words = lambda ln: F.size(F.split(F.trim(ln), " +"))  # noqa: E731
    ends_ok = lambda ln: F.substring(F.trim(ln), -1, 1).isin(  # noqa: E731
        *TERMINAL_PUNCT
    )
    if badwords:
        bad_re = "(?i)\\b(" + "|".join(badwords) + ")\\b"
        clean = lambda ln: ~F.trim(ln).rlike(bad_re)  # noqa: E731
    else:
        clean = lambda ln: F.lit(True)  # noqa: E731
    keep = lambda ln: (
        ends_ok(ln) & (words(ln) >= min_words_per_line) & clean(ln)
    )  # noqa: E731
    kept = F.filter(lines, keep)
    out = (
        df.withColumn("n_lines", F.size(lines))
        .withColumn("n_kept_lines", F.size(kept))
        .withColumn(
            "kept_words",
            F.coalesce(
                F.aggregate(
                    kept, F.lit(0), lambda acc, ln: acc + words(ln)
                ),
                F.lit(0),
            ),
        )
        .withColumn("doc_kept", F.col("n_kept_lines") >= F.lit(min_kept_lines))
        .withColumn("clean_text", F.array_join(kept, "\n"))
    )
    return out


# ------------------------------------------------- hashed linear classifier

def hashed_linear_score(
    text_col: str | Column, dim: int = 1024
) -> Column:
    """fastText-style quality-classifier scoring as a pure projection:
    the hashing trick (Weinberger et al. 2009; fastText's ngram
    buckets) maps each word BIGRAM to one of `dim` weight buckets, and
    the document score is the sum of bucket weights — exactly the
    linear-model inference CCNet/GPT-3-style pipelines run over every
    crawled page to keep/drop it.

    The weight vector here is a deterministic stand-in for trained
    parameters — an integer in [-1000, 1000] derived from the bucket
    id by a Knuth multiplicative hash — so results are engine- and
    run-independent (DuckDB-oracle-checkable). Swapping in real
    trained weights changes ONE line: make `weight` an
    `element_at(lit(weights_array), bucket + 1)` lookup over the
    broadcast literal vector; the plan shape is identical.

    Shape at scale: the bigram expansion, bucketing, and weighted sum
    all happen INSIDE one higher-order-function fold (`aggregate`)
    over the split array — zero explode, zero shuffle, zero Python; a
    narrow codegen projection that classifies 10^10 pages at scan
    speed. Returns a struct column (n_bigrams, score); keep/drop is
    `score > 0` (threshold 0 for the synthetic weights).
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    w = F.split(c, " ")
    # sequence(0, -1) would DESCEND — guard docs with < 2 words
    idx = F.when(
        F.size(w) >= 2, F.sequence(F.lit(0), F.size(w) - F.lit(2))
    ).otherwise(F.array().cast("array<int>"))
    bigrams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", F.element_at(w, i + 1), F.element_at(w, i + 2)
        ),
    )
    bucket = lambda bg: (  # noqa: E731
        F.conv(F.substring(F.md5(bg), 1, 6), 16, 10).cast("long") % dim
    )
    weight = lambda b: (b * F.lit(2654435761)) % F.lit(  # noqa: E731
        2147483648
    ) % F.lit(2001) - F.lit(1000)
    score = F.aggregate(
        bigrams,
        F.lit(0).cast("long"),
        lambda acc, bg: acc + weight(bucket(bg)),
    )
    return F.struct(
        F.size(bigrams).cast("long").alias("n_bigrams"),
        score.alias("score"),
    )


def priority_sample_key(id_col: Column, weight_col: Column) -> Column:
    """Priority-sampling sort key (Duffield, Lund & Thorup 2007,
    "Priority sampling for estimation of arbitrary subset sums"):
    each row draws a deterministic uniform u in (0, 1] from the
    md5-derived 60-bit hash of its id, and gets priority w / u; the m
    rows with the LARGEST priorities form a weight-proportional sample
    supporting unbiased subset-sum estimation. Returned key is the
    INVERSE priority u / w = (h + 1) / (2^60 * w) scaled to
    (h + 1) / w (same ordering, no overflow) so callers take the
    ASCENDING top-m — which Spark executes as TakeOrderedAndProject
    (map-side top-m per task, no global sort). IEEE-double division
    rounds identically on every engine, so the selected sample is
    deterministic and cross-engine reproducible; break exact key ties
    with the id."""
    h = F.conv(F.substring(F.md5(id_col.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    return (h + F.lit(1)).cast("double") / weight_col.cast("double")
