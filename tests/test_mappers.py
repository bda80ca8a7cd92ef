"""Field-level record mappers (Airbyte mappers: hashing, renaming,
field filtering, row filtering) as per-stream Catalyst transforms, and
their composition through replicate(mapper=...)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from airbyte_integrations_spark.mappers import (
    FieldFilteringMapper,
    FieldRenamingMapper,
    HashingMapper,
    RowFilteringMapper,
    record_mapper,
)


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        [
            (1, "alice@example.com", "US", 30),
            (2, "bob@example.com", "DE", 17),
            (3, None, "FR", 44),
        ],
        "id long, email string, country string, age long",
    )


def test_hashing_mapper_sha256_and_null(df):
    out = HashingMapper("email").apply(df).orderBy("id").collect()
    assert "email" not in out[0].asDict()
    want = hashlib.sha256(b"alice@example.com").hexdigest()
    assert out[0]["email_hashed"] == want
    assert out[2]["email_hashed"] is None  # NULL stays NULL, not a digest


def test_hashing_mapper_methods(df):
    md5 = HashingMapper("email", method="MD5").apply(df).orderBy("id").first()
    assert md5["email_hashed"] == hashlib.md5(b"alice@example.com").hexdigest()
    with pytest.raises(ValueError):
        HashingMapper("email", method="CRC32")


def test_hashing_mapper_missing_field_is_noop(df):
    assert HashingMapper("nope").apply(df).columns == df.columns


def test_renaming_and_filtering(df):
    out = FieldRenamingMapper("country", "region").apply(df)
    assert "region" in out.columns and "country" not in out.columns
    with pytest.raises(ValueError):
        FieldRenamingMapper("email", "id").apply(df)
    assert "age" not in FieldFilteringMapper("age").apply(df).columns


def test_row_filtering_in_and_out(df):
    assert RowFilteringMapper("age >= 18").apply(df).count() == 2
    assert RowFilteringMapper("age >= 18", negate=True).apply(df).count() == 1


def test_composition_order_matters(df):
    # rename THEN hash: the hash targets the renamed column
    m = record_mapper(
        FieldRenamingMapper("email", "contact"),
        HashingMapper("contact", method="SHA-256"),
        RowFilteringMapper("age >= 18"),
    )
    out = m(df)
    assert "contact_hashed" in out.columns and "email" not in out.columns
    assert out.count() == 2


def test_mapper_is_pure_catalyst(df):
    # no Python row operators anywhere in the mapped plan
    m = record_mapper(
        HashingMapper("email"),
        FieldFilteringMapper("age"),
        RowFilteringMapper("country <> 'FR'"),
    )
    plan = m(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEvalPython" not in plan


def test_through_replicate(spark, tmp_path, df):
    from airbyte_integrations_spark.replication import (
        ReplicationStream,
        replicate,
    )

    sink: dict = {}

    class CaptureDestination:
        def write(self, frame, stream, **kw):
            sink[stream] = frame.toPandas()

    summary = replicate(
        [ReplicationStream(stream="people", df=df)],
        CaptureDestination(),
        mapper=record_mapper(HashingMapper("email"), RowFilteringMapper("age >= 18")),
    )
    assert summary.status == "completed"
    got = sink["people"]
    assert set(got.columns) >= {"id", "email_hashed", "country", "age"}
    assert len(got) == 2 and "email" not in got.columns
