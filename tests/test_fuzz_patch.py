"""Property fuzz of the partial-image (patch) fold + apply.

Generated event logs with arbitrary interleavings of full images
(insert/replace), sparse $set updates, explicit $unset writes, and
key-only deletes — the fold (ONE mask-aware associative aggregation)
must equal a brute-force per-key Python replay, the literal
ordered-window fold, AND the epoch-split lake apply at a generated
boundary (the epoch-composition law under generated shapes instead of
the fixed ones in test_patch_apply.py)."""

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from airbyte_integrations_spark.lakehouse.patch_apply import merge_patches_into
from airbyte_integrations_spark.lakehouse.table import LakeTable
from airbyte_integrations_spark.operators.patch import (
    coalesce_patches,
    coalesce_patches_window,
)

SCHEMA = (
    "url string, _ab_cdc_lsn long, _ab_cdc_updated_at timestamp, "
    "_airbyte_emitted_at timestamp, _airbyte_ab_id string, "
    "_ab_cdc_deleted_at timestamp, a string, b long, wa boolean, wb boolean"
)
TS = __import__("datetime").datetime(2021, 1, 1)
DEL = __import__("datetime").datetime(2021, 6, 1)


@st.composite
def patch_logs(draw):
    """Per event: (key, op) where op encodes which columns are written
    and how: 'full' writes both (values or explicit null), 'set_a' /
    'set_b' write one, 'unset_a' / 'unset_b' write an explicit null,
    'del' is a key-only tombstone."""
    n = draw(st.integers(3, 40))
    ops = []
    for _ in range(n):
        key = draw(st.sampled_from(["k1", "k2", "k3"]))
        op = draw(
            st.sampled_from(
                ["full", "set_a", "set_b", "unset_a", "unset_b", "del"]
            )
        )
        av = draw(st.sampled_from(["x", "y", None]))
        bv = draw(st.integers(0, 9))
        ops.append((key, op, av, bv))
    split = draw(st.integers(1, n - 1))
    return ops, split


def _rows(ops):
    rows = []
    for lsn, (key, op, av, bv) in enumerate(ops, start=1):
        if op == "del":
            rows.append((key, lsn, TS, TS, f"i{lsn}", DEL, None, None, False, False))
        elif op == "full":
            rows.append((key, lsn, TS, TS, f"i{lsn}", None, av, bv, True, True))
        elif op == "set_a":
            rows.append((key, lsn, TS, TS, f"i{lsn}", None, av, None, True, False))
        elif op == "set_b":
            rows.append((key, lsn, TS, TS, f"i{lsn}", None, None, bv, False, True))
        elif op == "unset_a":
            rows.append((key, lsn, TS, TS, f"i{lsn}", None, None, None, True, False))
        else:  # unset_b
            rows.append((key, lsn, TS, TS, f"i{lsn}", None, None, None, False, True))
    return rows


def _model(rows):
    """Brute-force per-key replay in plain Python: the semantics spec."""
    state: dict[str, dict] = {}
    for (key, lsn, _, _, ab, dele, a, b, wa, wb) in rows:
        if dele is not None:
            state[key] = {"dead": True, "lsn": lsn}
            continue
        cur = state.get(key)
        if cur is None or cur.get("dead"):
            cur = {"dead": False, "a": None, "b": None}
            state[key] = cur
        cur["dead"] = False
        cur["lsn"] = lsn
        if wa:
            cur["a"] = a
        if wb:
            cur["b"] = b
    return {
        k: (v["a"], v["b"], v["lsn"])
        for k, v in state.items()
        if not v["dead"]
    }


@given(patch_logs())
@settings(max_examples=10, deadline=None)
def test_fold_equals_model_and_window_and_split_apply(spark, tmp_path_factory, case):
    ops, split = case
    rows = _rows(ops)
    df = spark.createDataFrame(rows, SCHEMA)
    want = _model(rows)

    agg = {
        r["url"]: (r["a"], r["b"], r["_ab_cdc_lsn"])
        for r in coalesce_patches(
            df, patch_cols=("a", "b"), mask_cols=("wa", "wb")
        ).collect()
    }
    assert agg == want

    win = {
        r["url"]: (r["a"], r["b"], r["_ab_cdc_lsn"])
        for r in coalesce_patches_window(
            df, patch_cols=("a", "b"), mask_cols=("wa", "wb")
        ).collect()
    }
    assert win == want

    # epoch-split lake apply at the generated boundary
    table = LakeTable(
        spark, str(tmp_path_factory.mktemp("fuzzpatch") / "t")
    )
    for i, (lo, hi) in enumerate([(0, split), (split, len(rows))]):
        batch = df.filter(
            (F.col("_ab_cdc_lsn") > lo) & (F.col("_ab_cdc_lsn") <= hi)
        )
        if batch.count() == 0:
            continue
        merge_patches_into(
            table,
            batch,
            ("a", "b"),
            stream="docs",
            epoch=i,
            mask_cols=("wa", "wb"),
            key=("url",),
            n_buckets=2,
        )
    got = {
        r["url"]: (r["a"], r["b"], r["_ab_cdc_lsn"])
        for r in table.read_live().collect()
    }
    assert got == want
