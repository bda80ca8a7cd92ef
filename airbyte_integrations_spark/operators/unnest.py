"""Nested object/array explosion into child streams.

Reference: nested objects/arrays are kept as a JSON blob in the parent
AND recursively unnested into one substream per nested field
(stream_processor.py:78-82, 343-380; cross-db unnest macros
array.sql:13-103). Spark-first: `explode()` (lateral view) for arrays,
struct-field projection for objects, parent linkage via the parent's
`_airbyte_ab_id` (the reference's `_airbyte_<parent>_hashid` role).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def child_streams(df: DataFrame) -> list[str]:
    """Names of columns that unnest into child streams."""
    return [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.StructType))
    ]


def unnest_stream(
    df: DataFrame, parent_id: str = "_airbyte_ab_id"
) -> dict[str, DataFrame]:
    """Explode every nested column into a child DataFrame keyed by the
    parent id; recurses so doubly-nested structures yield
    grandchild streams named parent.child."""
    out: dict[str, DataFrame] = {}
    for name in child_streams(df):
        dt = df.schema[name].dataType
        if isinstance(dt, T.ArrayType):
            child = df.select(
                F.col(parent_id).alias("_airbyte_parent_id"),
                F.posexplode_outer(F.col(name)).alias("_airbyte_index", name),
            )
            elem = dt.elementType
            if isinstance(elem, T.StructType):
                child = child.select(
                    "_airbyte_parent_id",
                    "_airbyte_index",
                    *[F.col(f"{name}.{f.name}").alias(f.name) for f in elem.fields],
                )
        else:  # StructType
            child = df.select(
                F.col(parent_id).alias("_airbyte_parent_id"),
                *[F.col(f"{name}.{f.name}").alias(f.name) for f in dt.fields],
            )
        out[name] = child
        # Recurse with a PER-CHILD-ROW id (the reference's per-row
        # `_airbyte_<child>_hashid`, stream_processor.py:631-660):
        # md5(parent_id ~ index) distinguishes sibling array elements,
        # so a grandchild row links to the exact child element it came
        # from — reusing the grandparent id would collapse siblings
        # into one ambiguous linkage key.
        if "_airbyte_index" in child.columns:
            child_id = F.md5(
                F.concat_ws(
                    "~",
                    F.col("_airbyte_parent_id"),
                    F.col("_airbyte_index").cast("string"),
                )
            )
        else:  # struct child: one row per parent row
            child_id = F.col("_airbyte_parent_id")
        for sub, sdf in unnest_stream(
            child.withColumn("_airbyte_ab_id", child_id), parent_id="_airbyte_ab_id"
        ).items():
            if sub not in ("_airbyte_parent_id",):
                out[f"{name}.{sub}"] = sdf
    return out
