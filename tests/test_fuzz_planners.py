"""Property fuzz of the epoch planners.

plan_epochs_balanced: generated unique-lsn logs with arbitrary gaps and
burst shapes — every plan must be contiguous/covering, interior epochs
must hold exactly the target count, replans must be identical, and a
resume from any committed prefix must replan the identical suffix.

plan_epochs_tx: generated CONCURRENT transactions whose lsns interleave
arbitrarily (a random partition of a shared lsn pool) — no boundary may
ever split a transaction (ADVICE r3 #2's outward-snap rule, here under
generated interleavings instead of the two hand-built ones in
test_tx_epochs.py), while remaining contiguous and covering.
"""

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from airbyte_integrations_spark.streaming.microbatch import (
    plan_epochs_balanced,
    plan_epochs_tx,
)


@st.composite
def lsn_logs(draw):
    # unique lsns with wildly uneven spacing: mix a dense block and
    # far-flung stragglers
    dense = draw(st.lists(st.integers(1, 300), min_size=2, max_size=80, unique=True))
    sparse = draw(
        st.lists(st.integers(301, 10**9), min_size=0, max_size=20, unique=True)
    )
    lsns = sorted(set(dense) | set(sparse))
    target = draw(st.integers(1, 25))
    return lsns, target


@given(lsn_logs())
@settings(max_examples=12, deadline=None)
def test_balanced_planner_invariants(spark, case):
    lsns, target = case
    df = spark.createDataFrame([(x,) for x in lsns], "_ab_cdc_lsn long")
    eps = plan_epochs_balanced(df, None, target)
    # contiguous, monotone, covering (start just below min, end at max)
    assert eps[0].from_lsn == lsns[0] - 1
    assert eps[-1].to_lsn == lsns[-1]
    for a, b in zip(eps, eps[1:]):
        assert a.to_lsn == b.from_lsn and a.from_lsn < a.to_lsn
    # exact balance: interior epochs hold exactly target events
    counts = [
        sum(1 for x in lsns if ep.from_lsn < x <= ep.to_lsn) for ep in eps
    ]
    assert counts[:-1] == [target] * (len(counts) - 1), (counts, target)
    assert 0 < counts[-1] <= target and sum(counts) == len(lsns)
    # deterministic replan + identical-suffix resume from every prefix
    assert plan_epochs_balanced(df, None, target) == eps
    for j in range(1, len(eps)):
        assert plan_epochs_balanced(df, eps[j - 1].to_lsn, target) == eps[j:]


@st.composite
def tx_logs(draw):
    n = draw(st.integers(4, 60))
    lsns = draw(
        st.lists(st.integers(1, 500), min_size=n, max_size=n, unique=True)
    )
    n_tx = draw(st.integers(1, max(1, n // 2)))
    tx_of = [draw(st.integers(0, n_tx - 1)) for _ in range(n)]
    target = draw(st.integers(1, 20))
    return sorted(lsns), tx_of, target


@given(tx_logs())
@settings(max_examples=12, deadline=None)
def test_tx_planner_never_splits_generated_interleavings(spark, case):
    lsns, tx_of, target = case
    rows = [(lsn, f"tx{t}") for lsn, t in zip(lsns, tx_of)]
    df = spark.createDataFrame(rows, "_ab_cdc_lsn long, tx string")
    eps = plan_epochs_tx(df, None, target, "tx")
    # contiguous + covering
    assert eps[0].from_lsn == lsns[0] - 1 and eps[-1].to_lsn == lsns[-1]
    for a, b in zip(eps, eps[1:]):
        assert a.to_lsn == b.from_lsn and a.from_lsn < a.to_lsn
    # no boundary splits any transaction: for every tx span (s, e),
    # no epoch boundary b satisfies s <= b < e
    spans = {}
    for lsn, t in zip(lsns, tx_of):
        s, e = spans.get(t, (lsn, lsn))
        spans[t] = (min(s, lsn), max(e, lsn))
    bounds = [ep.to_lsn for ep in eps[:-1]]
    for s, e in spans.values():
        for b in bounds:
            assert not (s <= b < e), (s, e, b, bounds)
    # deterministic
    assert plan_epochs_tx(df, None, target, "tx") == eps
    # every event lands in exactly one epoch
    counts = [
        sum(1 for x in lsns if ep.from_lsn < x <= ep.to_lsn) for ep in eps
    ]
    assert sum(counts) == len(lsns)
