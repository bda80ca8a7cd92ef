"""Near-dup operators: minhash determinism, LSH candidate recall on
known dups, jaccard verification, simhash properties, exact dedup."""

import hashlib

from pyspark.sql import functions as F

from airbyte_integrations_spark.functions.neardup import (
    exact_dedup,
    hamming64,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signature,
    simhash64,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from a warm windowsill in the late afternoon sun"
)
NEAR = BASE.replace("lazy", "sleepy")
FAR = "completely different content about spark shuffle partitioning and iceberg commits"


def _docs(spark):
    rows = [(1, BASE), (2, BASE), (3, NEAR), (4, FAR)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_identical_docs_identical_signatures(spark):
    sig = minhash_signature(_docs(spark), "doc_id", "text").collect()
    by_id = {r["doc_id"]: tuple(r[f"mh{i}"] for i in range(8)) for r in sig}
    assert by_id[1] == by_id[2]
    assert by_id[1] != by_id[4]
    # near-dup shares most minhashes
    shared = sum(a == b for a, b in zip(by_id[1], by_id[3]))
    assert shared >= 4


def test_lsh_finds_dup_pair_and_jaccard_verifies(spark):
    docs = _docs(spark)
    sig = minhash_signature(docs, "doc_id", "text")
    pairs = lsh_candidate_pairs(sig, "doc_id")
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in got
    assert (1, 4) not in got and (2, 4) not in got
    jac = {(r["id_a"], r["id_b"]): r["jaccard"] for r in jaccard_pairs(docs, pairs, "doc_id", "text").collect()}
    assert jac[(1, 2)] == 1.0
    if (1, 3) in jac:
        assert 0.5 < jac[(1, 3)] < 1.0


def test_simhash_matches_python_reference(spark):
    df = spark.createDataFrame([(1, BASE)], "doc_id long, text string")
    got = df.select(simhash64("text").alias("h")).collect()[0]["h"]

    acc = [0] * 64
    for tok in BASE.lower().split():
        h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
        for i in range(64):
            acc[i] += 1 if (h >> i) & 1 else -1
    v = 0
    for i in range(64):
        if acc[i] > 0:
            v |= 1 << i
    want = v - (1 << 64) if v >= (1 << 63) else v
    assert got == want


def test_simhash_hamming_properties(spark):
    df = _docs(spark).withColumn("h", simhash64("text"))
    a = df.alias("a").select(F.col("doc_id").alias("ia"), F.col("h").alias("ha"))
    b = df.alias("b").select(F.col("doc_id").alias("ib"), F.col("h").alias("hb"))
    d = (
        a.crossJoin(b)
        .withColumn("dist", hamming64("ha", "hb"))
        .collect()
    )
    dist = {(r["ia"], r["ib"]): r["dist"] for r in d}
    assert dist[(1, 2)] == 0  # identical docs
    assert dist[(1, 3)] < dist[(1, 4)]  # near-dup closer than unrelated


def test_exact_dedup(spark):
    out = exact_dedup(_docs(spark), "doc_id", "text")
    ids = sorted(r["doc_id"] for r in out.collect())
    assert ids == [1, 3, 4]  # doc 2 collapsed onto canonical doc 1


def test_repetition_stats_toy_docs(spark):
    from airbyte_integrations_spark.functions.neardup import repetition_stats

    docs = spark.createDataFrame(
        [
            # "a b c a b c a b c" -> 7 3-grams, 3 distinct cyclic ones
            (1, "a b c a b c a b c"),
            (2, "all words here are entirely distinct tokens"),
            (3, "x x x x x x"),  # one shingle repeated
        ],
        ["doc_id", "text"],
    )
    r = {row["doc_id"]: row for row in repetition_stats(docs, "doc_id", "text").collect()}
    assert r[1]["n_ngrams"] == 7 and r[1]["n_distinct_ngrams"] == 3
    assert r[1]["dup_ngram_pm"] == 571  # floor((1 - 3/7)*1000)
    assert r[1]["top_ngram_pm"] == 428  # 'a b c' x3 -> floor(3000/7)
    assert r[2]["dup_ngram_pm"] == 0 and r[2]["top_ngram_pm"] < 250
    assert r[3]["n_distinct_ngrams"] == 1 and r[3]["dup_ngram_pm"] == 750
    assert r[3]["top_ngram_pm"] == 1000


def test_connected_components_transitive_chain(spark):
    """a~b, b~c collapse into one cluster even though (a,c) is not a
    pair; disjoint edges stay separate; labels are component minima."""
    from airbyte_integrations_spark.functions.neardup import connected_components

    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 7), (10, 11)], "id_a long, id_b long"
    )
    got = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 1, 10: 10, 11: 10}


def test_connected_components_long_chain_and_strings(spark):
    """A 12-node path (worst-case diameter for propagation) converges,
    and string ids order lexicographically."""
    from airbyte_integrations_spark.functions.neardup import connected_components

    chain = [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(11)]
    edges = spark.createDataFrame(chain, "id_a string, id_b string")
    got = connected_components(edges).collect()
    assert len(got) == 12
    assert {r["component"] for r in got} == {"n00"}


def test_connected_components_empty_edges(spark):
    from airbyte_integrations_spark.functions.neardup import connected_components

    edges = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(edges).count() == 0


def test_remove_duplicate_spans_excises_later_occurrences(spark):
    """Lee et al. ExactSubstr semantics: a 10-word span that occurred
    earlier in the corpus (by (doc_id, position)) is cut out of the
    text; first occurrences survive; a fully-duplicated document is
    rewritten to ''."""
    from airbyte_integrations_spark.functions.neardup import (
        remove_duplicate_spans,
    )

    span_a = " ".join(f"a{i}" for i in range(10))
    span_b = " ".join(f"b{i}" for i in range(10))
    span_c = " ".join(f"c{i}" for i in range(10))
    rows = [
        (1, f"{span_a} {span_b}"),        # both first occurrences
        (2, f"{span_a} {span_c}"),        # A duplicates doc 1
        (3, f"{span_b} {span_a}"),        # fully duplicated => ''
    ]
    out = {
        r["doc_id"]: r
        for r in remove_duplicate_spans(
            spark.createDataFrame(rows, "doc_id long, text string"),
            "doc_id",
            "text",
        ).collect()
    }
    assert out[1]["clean_text"] == f"{span_a} {span_b}"
    assert (out[1]["n_spans"], out[1]["n_kept"]) == (2, 2)
    assert out[2]["clean_text"] == span_c
    assert (out[2]["n_spans"], out[2]["n_kept"]) == (2, 1)
    assert out[3]["clean_text"] == ""
    assert (out[3]["n_spans"], out[3]["n_kept"]) == (2, 0)


def test_remove_duplicate_spans_preserves_order_on_middle_cut(spark):
    """Excision keeps the surviving spans in original position order
    (the regroup sorts on span_idx, not on span text)."""
    from airbyte_integrations_spark.functions.neardup import (
        remove_duplicate_spans,
    )

    span_z = " ".join(f"z{i}" for i in range(10))  # sorts after everything
    span_dup = " ".join(f"m{i}" for i in range(10))
    span_a = " ".join(f"aa{i}" for i in range(10))
    rows = [
        (1, span_dup),
        (2, f"{span_z} {span_dup} {span_a}"),
    ]
    out = {
        r["doc_id"]: r["clean_text"]
        for r in remove_duplicate_spans(
            spark.createDataFrame(rows, "doc_id long, text string"),
            "doc_id",
            "text",
        ).collect()
    }
    assert out[2] == f"{span_z} {span_a}"
