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
