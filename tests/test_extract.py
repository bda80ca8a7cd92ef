"""Per-row invariant (BASELINE.json): extracted text is a byte-identical
pure function of html, at any parallelism."""

from pyspark.sql import functions as F

from airbyte_integrations_spark.functions.extract import extract_text, extract_text_py
from airbyte_integrations_spark.gen import gen_change_events, gen_pages


def test_generated_text_matches_extraction(spark):
    pages = gen_pages(spark, 200)
    mism = pages.withColumn("ex", extract_text(F.col("html"))).filter(
        F.col("ex") != F.col("text")
    )
    assert mism.count() == 0


def test_event_payload_text_matches_extraction(spark):
    ev = gen_change_events(spark, 500, n_urls=50)
    mism = ev.withColumn("ex", extract_text(F.col("html"))).filter(
        F.col("ex") != F.col("text")
    )
    assert mism.count() == 0


def test_extraction_parallelism_invariant(spark):
    ev = gen_change_events(spark, 300, n_urls=40)
    a = (
        ev.repartition(1)
        .withColumn("ex", extract_text(F.col("html")))
        .select("_airbyte_ab_id", "ex")
        .toPandas()
        .sort_values("_airbyte_ab_id")
        .reset_index(drop=True)
    )
    b = (
        ev.repartition(16)
        .withColumn("ex", extract_text(F.col("html")))
        .select("_airbyte_ab_id", "ex")
        .toPandas()
        .sort_values("_airbyte_ab_id")
        .reset_index(drop=True)
    )
    assert (a["ex"] == b["ex"]).all()


def test_scalar_rules():
    html = (
        b"<html><head><style>p{color:red}</style></head>"
        b"<body><p>Hello &amp;\n <b>world</b></p><script>x=1</script></body></html>"
    )
    assert extract_text_py(html) == "Hello & world"
    assert extract_text_py(None) is None
