"""Broadcast Bloom filter: no false negatives, parallelism-invariant
bitmap build, and prefilter+verify == plain join."""

from pyspark.sql import functions as F

from airbyte_integrations_spark.functions.bloom import (
    build_bloom,
    might_contain,
)


def _corpus(spark, n=500):
    return spark.range(n).select(
        F.md5(F.concat(F.lit("m:"), F.col("id").cast("string"))).alias("fp")
    )


def test_no_false_negatives(spark):
    corpus = _corpus(spark)
    bloom = build_bloom(corpus, "fp", m_bits=1 << 14, k=5)
    hits = corpus.filter(might_contain(bloom, "fp")).count()
    assert hits == 500  # every true member passes the prefilter


def test_build_is_parallelism_invariant(spark):
    corpus = _corpus(spark)
    b1 = build_bloom(corpus.repartition(1), "fp", m_bits=1 << 14, k=5)
    b8 = build_bloom(corpus.repartition(8), "fp", m_bits=1 << 14, k=5)
    assert b1 == b8  # OR-fold is partition-order independent


def test_prefilter_plus_verify_equals_plain_join(spark):
    corpus = _corpus(spark, 300)
    # probe set: half members, half strangers
    probe = spark.range(600).select(
        F.when(
            F.col("id") < 300,
            F.md5(F.concat(F.lit("m:"), F.col("id").cast("string"))),
        )
        .otherwise(F.md5(F.concat(F.lit("x:"), F.col("id").cast("string"))))
        .alias("fp")
    )
    # deliberately tiny bitmap so false positives actually occur
    bloom = build_bloom(corpus, "fp", m_bits=1 << 10, k=3)
    candidates = probe.filter(might_contain(bloom, "fp"))
    n_candidates = candidates.count()
    assert n_candidates >= 300  # all members + some false positives
    verified = candidates.join(corpus, "fp", "left_semi").count()
    plain = probe.join(corpus, "fp", "left_semi").count()
    assert verified == plain == 300  # verify join removes every FP


def test_null_values_skipped(spark):
    df = spark.createDataFrame([("a",), (None,)], "fp string")
    bloom = build_bloom(df, "fp", m_bits=1 << 10, k=3)
    assert (
        spark.createDataFrame([("a",)], "fp string")
        .filter(might_contain(bloom, "fp"))
        .count()
        == 1
    )


def test_k_travels_inside_the_filter(spark):
    # probe reads k from the header: a build with k=7 must be probed
    # with k=7 even though the caller never says so (a k mismatch would
    # silently manufacture false negatives).
    import pytest

    corpus = _corpus(spark, 100)
    bloom = build_bloom(corpus, "fp", m_bits=1 << 12, k=7)
    assert bloom[:4] == b"BLM1" and bloom[4] == 7
    assert corpus.filter(might_contain(bloom, "fp")).count() == 100
    with pytest.raises(ValueError):
        might_contain(b"junkbytes", F.col("fp"))
