"""Differential fuzz of the declarative condition grammar.

Hypothesis generates random expression trees over the restricted
record_filter grammar (record/config paths, int/str/bool literals,
null-safe ==/!=, ordered comparisons, in-lists, and/or/not) and
asserts that `compile_condition`'s Catalyst translation keeps EXACTLY
the rows a pure-Python Kleene-logic evaluator keeps, over a fixed
60-row record set that crosses every value pool with NULLs.

This pins the semantics the reference evaluates record-at-a-time in
Python (InterpolatedBoolean, interpolated_boolean.py:10-24 — Jinja
truthiness; our documented contract: eqNullSafe ==/!=, three-valued
ordered comparisons, presence-is-truthy bare paths with
coalesce-false booleans, literal Python truthiness) against the
JVM-side Filter for generated expressions, not just the hand-picked
ones in test_declarative_ops.py.
"""

from itertools import product

from hypothesis import given, settings, strategies as st
from pyspark.sql import types as T

from airbyte_integrations_spark.sources.declarative import compile_condition

CFG = {"thr": 2, "tag": "b"}
REC_FIELDS = {"int": ["i1", "i2"], "str": ["s1"], "bool": ["b1"]}
LITS = {"int": [0, 1, 2, 5], "str": ["a", "b", "c", ""], "bool": [True, False]}
CFG_KEYS = {"int": "thr", "str": "tag"}
ORDERED = ["<", "<=", ">", ">="]

SCHEMA = T.StructType(
    [
        T.StructField("rid", T.LongType()),
        T.StructField("i1", T.LongType()),
        T.StructField("i2", T.LongType()),
        T.StructField("s1", T.StringType()),
        T.StructField("b1", T.BooleanType()),
    ]
)

I_POOL = [None, 0, 1, 2, 5]
S_POOL = [None, "a", "b", "c"]
B_POOL = [None, True, False]
RECORDS = [
    {
        "rid": rid,
        "i1": i1,
        "i2": I_POOL[(rid * 3 + 1) % len(I_POOL)],
        "s1": s1,
        "b1": b1,
    }
    for rid, (i1, s1, b1) in enumerate(product(I_POOL, S_POOL, B_POOL))
]


# ---------------------------------------------------------------- strategies
@st.composite
def _cmp(draw):
    t = draw(st.sampled_from(["int", "str", "bool"]))
    lhs = ("rec", draw(st.sampled_from(REC_FIELDS[t])), t)
    ops = ["==", "!="] if t == "bool" else ["==", "!="] + ORDERED
    op = draw(st.sampled_from(ops))
    kind = draw(st.sampled_from(["lit", "lit", "rec", "cfg", "none"]))
    if kind == "none" and op in ("==", "!="):
        rhs = ("lit", None, t)
    elif kind == "cfg" and t in CFG_KEYS:
        rhs = ("cfg", CFG_KEYS[t], t)
    elif kind == "rec":
        rhs = ("rec", draw(st.sampled_from(REC_FIELDS[t])), t)
    else:
        rhs = ("lit", draw(st.sampled_from(LITS[t])), t)
    return ("cmp", op, lhs, rhs)


@st.composite
def _inlist(draw):
    t = draw(st.sampled_from(["int", "str"]))
    lhs = ("rec", draw(st.sampled_from(REC_FIELDS[t])), t)
    vals = draw(st.lists(st.sampled_from(LITS[t]), min_size=1, max_size=3, unique=True))
    return ("in", lhs, vals, draw(st.booleans()))


@st.composite
def _bare(draw):
    t = draw(st.sampled_from(["int", "str", "bool"]))
    kind = draw(st.sampled_from(["rec", "rec", "lit"]))
    if kind == "lit":
        return ("bare", ("lit", draw(st.sampled_from(LITS[t] + [None])), t))
    return ("bare", ("rec", draw(st.sampled_from(REC_FIELDS[t])), t))


_leaf = st.one_of(_cmp(), _inlist(), _bare())
_expr = st.recursive(
    _leaf,
    lambda ch: st.one_of(
        st.tuples(st.just("not"), ch),
        st.tuples(st.just("and"), ch, ch),
        st.tuples(st.just("or"), ch, ch),
    ),
    max_leaves=6,
)


# ------------------------------------------------------------------ renderer
def _rlit(v):
    if v is None:
        return "none"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, str):
        return f"'{v}'"
    return str(v)


def _rop(o):
    if o[0] == "rec":
        return f"record['{o[1]}']"
    if o[0] == "cfg":
        return f"config['{o[1]}']"
    return _rlit(o[1])


def render(n) -> str:
    k = n[0]
    if k == "cmp":
        return f"({_rop(n[2])} {n[1]} {_rop(n[3])})"
    if k == "in":
        inner = ", ".join(_rlit(v) for v in n[2])
        word = "not in" if n[3] else "in"
        return f"({_rop(n[1])} {word} [{inner}])"
    if k == "bare":
        return f"({_rop(n[1])})"
    if k == "not":
        return f"(not {render(n[1])})"
    return f"({render(n[1])} {k} {render(n[2])})"


# ------------------------------------------------------- python Kleene model
def _val(o, rec):
    if o[0] == "rec":
        return rec[o[1]]
    if o[0] == "cfg":
        return CFG[o[1]]
    return o[1]


def _eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    return a == b


def ev(n, rec):
    """True / False / None (SQL three-valued logic)."""
    k = n[0]
    if k == "cmp":
        a, b, op = _val(n[2], rec), _val(n[3], rec), n[1]
        if op == "==":
            return _eq(a, b)
        if op == "!=":
            return not _eq(a, b)
        if a is None or b is None:
            return None
        return {"<": a < b, "<=": a <= b, ">": a > b, ">=": a >= b}[op]
    if k == "in":
        a = _val(n[1], rec)
        if a is None:
            return None
        hit = a in n[2]
        return (not hit) if n[3] else hit
    if k == "bare":
        o = n[1]
        if o[0] == "lit":
            return bool(o[1])
        v = _val(o, rec)
        if o[2] == "bool":
            return v is True  # coalesce(col, false)
        return v is not None
    if k == "not":
        c = ev(n[1], rec)
        return None if c is None else not c
    a, b = ev(n[1], rec), ev(n[2], rec)
    if k == "and":
        if a is False or b is False:
            return False
        return None if (a is None or b is None) else True
    if a is True or b is True:
        return True
    return None if (a is None or b is None) else False


# ---------------------------------------------------------------------- test
@given(_expr)
@settings(max_examples=35, deadline=None)
def test_condition_filter_matches_python_model(spark, ast):
    tmpl = "{{ " + render(ast) + " }}"
    df = spark.createDataFrame(
        [tuple(r[f.name] for f in SCHEMA.fields) for r in RECORDS], SCHEMA
    )
    cond = compile_condition(tmpl, config=CFG, record_schema=SCHEMA)
    got = {r["rid"] for r in df.filter(cond).select("rid").collect()}
    want = {r["rid"] for r in RECORDS if ev(ast, r) is True}
    assert got == want, (tmpl, sorted(got ^ want))
