"""Near-duplicate detection for webtext at scale.

Techniques (standard MinHash/LSH and SimHash constructions from the
public literature — Broder '97 resemblance sketches, Charikar '02
similarity estimation — expressed Spark-first):

- MinHash: k-word shingles; "permutation" i realized as the
  lexicographic MIN of md5(shingle || '#' || i) hex strings. md5 is
  identical everywhere, so signatures are engine- and
  parallelism-independent (and DuckDB-oracle-checkable). Banding
  groups signature slices; docs sharing a band bucket are candidate
  pairs — the classic LSH join, implemented as groupBy(band) which
  Spark executes as a hash shuffle with map-side combine.
- SimHash: 64-bit sketch from per-token md5 bits, vectorized in a
  pandas UDF (bit arithmetic is awkward as SQL, cheap in numpy).
- Exact n-gram Jaccard on candidate pairs (verification stage).

All operators take/return DataFrames and never collect.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

TOKEN_SPLIT = r"\s+"


def words(text_col: str | Column) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(F.trim(F.lower(c)), TOKEN_SPLIT)


def shingles(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """(id, shingle) pairs — distinct k-word shingles per doc."""
    w = words(text_col)
    n = F.size(w)
    positions = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    sh = F.transform(
        positions, lambda p: F.concat_ws(" ", F.slice(w, p, k))
    )
    return df.select(F.col(id_col), F.explode(F.array_distinct(sh)).alias("shingle"))


def minhash_signature(
    df: DataFrame, id_col: str, text_col: str, k: int = 3, n_hashes: int = 8,
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """One row per doc: mh0..mh{n-1} columns of lexicographic-min md5
    hex digests; groupBy min() is associative => map-side combine,
    skew-safe on huge docs.

    Pass a (cached) `shingles_df` to share the shingle explosion with
    the verification stage — Spark recomputes branch lineage otherwise,
    and the explosion is the dominant cost of the pipeline."""
    sh = shingles_df if shingles_df is not None else shingles(df, id_col, text_col, k)
    aggs = [
        F.min(F.md5(F.concat(F.col("shingle"), F.lit(f"#{i}")))).alias(f"mh{i}")
        for i in range(n_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str,
    n_hashes: int = 8,
    band_size: int = 2,
) -> DataFrame:
    """Docs sharing any band bucket, as (id_a < id_b) pairs.

    bands = n_hashes / band_size; band key = md5(concat of its rows).
    All bands ride ONE keyed self-join: each signature explodes into
    its (band_idx, band) rows and the join key is the pair — bands are
    disjoint in band_idx, so this is exactly the union of the per-band
    self-joins, in one Exchange instead of n_bands of them (one
    candidate-keyed shuffle; still no cartesian). Same banding shape
    as lsh_candidates_vs_index."""
    n_bands = n_hashes // band_size
    band_keys = [
        F.md5(
            F.concat_ws(
                "|", *[F.col(f"mh{b * band_size + j}") for j in range(band_size)]
            )
        )
        for b in range(n_bands)
    ]
    banded = signatures.select(
        F.col(id_col),
        F.posexplode(F.array(*band_keys)).alias("band_idx", "band"),
    )
    lhs = banded.alias("l")
    rhs = banded.alias("r")
    return (
        lhs.join(rhs, on=["band_idx", "band"])
        .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .select(
            F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
        )
        .distinct()
    )


def lsh_candidates_vs_index(
    batch_sigs: DataFrame,
    index_sigs: DataFrame,
    id_col: str,
    n_hashes: int = 8,
    band_size: int = 2,
) -> DataFrame:
    """Incremental LSH lookup: candidate (batch_id, index_id) pairs for
    a NEW batch of signatures against the already-ingested corpus band
    index — the near-dup counterpart of the exact-fingerprint
    dedup-on-ingest join. Unlike `lsh_candidate_pairs` (corpus
    self-join, O(corpus) rebanded per run), only the batch is banded
    fresh; at 10^10 docs the corpus side is the persisted band index
    read bucket-pruned, and each band join is keyed on band buckets —
    never all-pairs, and never a corpus self-join per micro-batch."""
    n_bands = n_hashes // band_size

    def bands(df: DataFrame, out: str) -> DataFrame:
        parts = []
        for b in range(n_bands):
            cols = [F.col(f"mh{b * band_size + j}") for j in range(band_size)]
            parts.append(
                df.select(
                    F.col(id_col).alias(out),
                    F.lit(b).alias("band_idx"),
                    F.md5(F.concat_ws("|", *cols)).alias("band"),
                )
            )
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        return u

    return (
        bands(batch_sigs, "batch_id")
        .join(bands(index_sigs, "index_id"), ["band_idx", "band"])
        .select("batch_id", "index_id")
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame, pairs: DataFrame, id_col: str, text_col: str, k: int = 3,
    shingles_df: DataFrame | None = None,
) -> DataFrame:
    """Exact shingle-Jaccard for candidate pairs (verification).

    The shingle relation feeds THREE plan branches (both pair sides +
    per-doc sizes); pass a cached `shingles_df` so the explosion runs
    once, not three times."""
    sh = shingles_df if shingles_df is not None else shingles(df, id_col, text_col, k)
    a = sh.select(F.col(id_col).alias("id_a"), F.col("shingle"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("shingle"))
    inter = (
        pairs.join(a, "id_a")
        .join(b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    return (
        inter.join(sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("na")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("nb")), "id_b")
        .select(
            "id_a",
            "id_b",
            F.col("n_inter"),
            (F.col("na") + F.col("nb") - F.col("n_inter")).alias("n_union"),
            (F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter"))).alias(
                "jaccard"
            ),
        )
    )


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components over an undirected edge list: returns
    (node, component) where component = MIN node id in the component.
    The capstone of near-dup dedup — LSH gives verified duplicate
    PAIRS; keeping one doc per duplicate CLUSTER needs the transitive
    closure (a~b, b~c => keep one of {a,b,c}).

    Algorithm: min-label propagation (the Pregel/GraphX dataflow, each
    round = one hash join + one map-side-combining min aggregation).
    Rounds are bounded by component DIAMETER — for duplicate clusters
    that is small (near-dups of one page form a dense clique-ish blob),
    so convergence is a handful of rounds; an adversarial long chain is
    bounded by max_iter and raises rather than silently truncating.
    Scale notes baked in:
    - the symmetrized edge list is localCheckpoint'ed ONCE and reused
      every round (re-deriving LSH lineage per round would rescan the
      corpus);
    - labels are localCheckpoint'ed per round, so plan lineage stays
      O(1) instead of O(rounds) — the classic iterative-Spark pitfall;
    - convergence is an aggregate on the already-materialized frame
      (no second execution).
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint()
    )
    # Seed with one propagation step fused into the init aggregation:
    # label(v) = min(v, min neighbor). Same fixpoint (min label of the
    # component), one fewer join round for the common shallow clusters.
    labels = (
        sym.groupBy(F.col("a").alias("node"))
        .agg(F.min("b").alias("_mb"))
        .select("node", F.least("node", "_mb").alias("component"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        incoming = (
            sym.join(labels, sym["a"] == labels["node"])
            .groupBy(F.col("b").alias("nb"))
            .agg(F.min("component").alias("cand"))
        )
        merged = (
            labels.join(incoming, labels["node"] == incoming["nb"], "left")
            .select(
                "node",
                F.col("component").alias("old"),
                F.least("component", F.coalesce("cand", "component")).alias(
                    "component"
                ),
            )
            .localCheckpoint()
        )
        changed = merged.filter(F.col("component") != F.col("old")).count()
        labels = merged.select("node", "component")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(component diameter exceeds the bound)"
    )


@F.pandas_udf(T.LongType())
def simhash64(text: pd.Series) -> pd.Series:
    """64-bit SimHash over whitespace tokens (Charikar '02), vectorized.

    Deterministic: token weight 1, bit source = first 8 bytes of
    md5(token). md5 runs once per UNIQUE token per Arrow batch (webtext
    token frequency is Zipfian, so this removes almost all hashing);
    the ±1 bit matrix and the per-doc vote sums are numpy ops."""
    import numpy as np

    toks_per_doc = text.map(lambda t: None if t is None else t.lower().split())
    uniq: list[str] = []
    seen: set[str] = set()
    for toks in toks_per_doc:
        if toks:
            for tok in toks:
                if tok not in seen:
                    seen.add(tok)
                    uniq.append(tok)
    if uniq:
        hs = np.array(
            [
                int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
                for t in uniq
            ],
            dtype=np.uint64,
        )
        shifts = np.arange(64, dtype=np.uint64)
        bits = ((hs[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
        mat = np.where(bits == 1, 1, -1)  # (n_unique, 64) vote rows
    idx = {t: i for i, t in enumerate(uniq)}
    pow2 = np.left_shift(np.ones(64, dtype=np.uint64), np.arange(64, dtype=np.uint64))

    def one(toks):
        if toks is None:
            return None
        if not toks:
            return 0
        acc = mat[[idx[t] for t in toks]].sum(axis=0)
        v = int(pow2[acc > 0].sum())
        return v - (1 << 64) if v >= (1 << 63) else v

    return toks_per_doc.map(one)


def hamming64(a: str | Column, b: str | Column) -> Column:
    """Hamming distance between two signed-64-bit simhash columns."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.bit_count(ca.bitwiseXOR(cb))


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup: one canonical row per distinct content hash
    (lowest id wins — deterministic)."""
    h = F.md5(F.col(text_col))
    w = Window.partitionBy(h).orderBy(F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def ngram_multiset(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """(id, shingle) pairs WITH multiplicity — same tokenization as
    `shingles` but non-distinct, for within-document repetition stats."""
    w = words(text_col)
    n = F.size(w)
    positions = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    sh = F.transform(positions, lambda p: F.concat_ws(" ", F.slice(w, p, k)))
    return df.select(F.col(id_col), F.explode(sh).alias("shingle"))


def repetition_stats(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """Within-document repetition signals (the Gopher/C4-style quality
    gate: heavily self-repeating pages are boilerplate or spam):

    - n_ngrams / n_distinct_ngrams: k-gram multiset vs set size
    - dup_ngram_pm: 1000 * (1 - distinct/total) (per-mille duplicated)
    - top_ngram_pm: 1000 * max-frequency-k-gram share

    Shape at scale: two chained hash aggregations, (id, shingle) -> id.
    Both are associative counts => map-side partial aggregation; the
    first stage's key includes the shingle so even a pathological doc
    (one shingle repeated 10^6 times) collapses on the mappers before
    the shuffle. No sort, no window, no skew hazard."""
    per = ngram_multiset(df, id_col, text_col, k).groupBy(id_col, "shingle").agg(
        F.count("*").alias("c")
    )
    agg = per.groupBy(id_col).agg(
        F.sum("c").alias("n_ngrams"),
        F.count("*").alias("n_distinct_ngrams"),
        F.max("c").alias("top_c"),
    )
    return agg.select(
        F.col(id_col),
        F.col("n_ngrams"),
        F.col("n_distinct_ngrams"),
        F.floor(
            (F.lit(1.0) - F.col("n_distinct_ngrams") / F.col("n_ngrams")) * 1000.0
        ).cast("long").alias("dup_ngram_pm"),
        F.floor(F.col("top_c") * 1000.0 / F.col("n_ngrams")).cast("long").alias(
            "top_ngram_pm"
        ),
    )


def remove_duplicate_spans(
    df: DataFrame, id_col: str, text_col: str, span_words: int = 10
) -> DataFrame:
    """Exact-substring deduplication with EXCISION (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499, the ExactSubstr variant): a span of text that
    already occurred earlier in the corpus is CUT OUT of the document,
    not just counted — only the corpus-wide first occurrence (ordered
    by (doc, position)) survives. `exact_dedup` drops whole documents;
    this rewrites their text.

    Suffix arrays (the paper's single-node index) don't distribute;
    the industrial equivalent keeps the paper's semantics over fixed
    `span_words`-word chunks with pure dataflow: chunking is a flatMap
    (rows = tokens/span_words, no driver state), first occurrence is
    ONE hash aggregation with map-side combine on the span text, the
    verdict is a span-keyed join, and reassembly is a bounded
    per-document regroup (group size = one doc's span count). No
    all-pairs, no global sort, no skew hazard — the same plan at
    10^10 documents.

    Returns one row per input document: id_col, n_spans, n_kept, and
    clean_text (surviving spans joined by ' ' in original order; ''
    when every span duplicated an earlier document).
    """
    w = F.split(F.col(text_col), " ")
    n_spans = F.ceil(F.size(w) / F.lit(float(span_words))).cast("int")
    spans = F.transform(
        F.sequence(F.lit(0), n_spans - F.lit(1)),
        lambda i: F.concat_ws(" ", F.slice(w, i * span_words + 1, span_words)),
    )
    sp = df.select(
        F.col(id_col), F.posexplode(spans).alias("span_idx", "span")
    ).withColumn("k", F.col(id_col) * 1_000_000 + F.col("span_idx"))
    first = sp.groupBy("span").agg(F.min("k").alias("first_k"))
    keep = F.col("k") == F.col("first_k")
    return (
        sp.join(first, "span")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_spans"),
            F.sum(keep.cast("long")).alias("n_kept"),
            F.array_join(
                F.transform(
                    # collect_list skips nulls => only kept spans are
                    # gathered; array_sort on (span_idx, span) structs
                    # restores original order (span_idx is unique per doc)
                    F.array_sort(
                        F.collect_list(
                            F.when(keep, F.struct(F.col("span_idx"), F.col("span")))
                        )
                    ),
                    lambda s: s["span"],
                ),
                " ",
            ).alias("clean_text"),
        )
    )
