"""Replicate the driver's correctness gate locally.

For every queries() entry with an oracle: run the Spark DataFrame and
the DuckDB SQL over the same sf dir, sort columns by name, sort rows,
and compare row count, schema-ish dtypes, and values exactly.

Usage: python tools/check_oracles.py [sf_dir] [only_query_substr]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].map(lambda v: None if v is None or (isinstance(v, float) and np.isnan(v)) else v)
    return pdf.sort_values(list(pdf.columns), na_position="last").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2] if len(sys.argv) > 2 else ""

    import __spark_entry__ as ent
    from airbyte_integrations_spark.session import get_spark

    spark = get_spark("check_oracles", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, os_ = ent.queries(), ent.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and only not in name:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failed.append(name)
            continue
        sql = os_.get(name)
        if sql is None:
            print(f"SKIP {name}: no oracle (rows-only check, {len(got)} rows)")
            continue
        try:
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failed.append(name)
            continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}")
            failed.append(name)
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
            failed.append(name)
            continue
        try:
            # The driver's value hash is sensitive to the NUMERIC KIND
            # (DuckDB SUM(BIGINT) -> HUGEINT -> float64 renders 5.0 vs
            # Spark's int64 5 — round 1 lost 4 queries to this) but not
            # to integer width (int32 rank vs int64 rank hashes alike).
            # Mirror that: exact values, matching dtype *kind*.
            kinds_g = [g[c].dtype.kind for c in g.columns]
            kinds_w = [w[c].dtype.kind for c in w.columns]
            if kinds_g != kinds_w:
                raise AssertionError(
                    f"dtype kinds differ: spark {list(zip(g.columns, kinds_g))} "
                    f"vs oracle {list(zip(w.columns, kinds_w))}"
                )
            pd.testing.assert_frame_equal(g, w, check_dtype=False)
            print(f"OK   {name}: {len(g)} rows")
        except AssertionError as e:
            print(f"FAIL {name}: values differ: {str(e)[:500]}")
            failed.append(name)
    print("\n==>", "ALL OK" if not failed else f"FAILED: {failed}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
