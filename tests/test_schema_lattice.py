"""Property tests for the type-widening lattice (SURVEY §1.3/§2.9).

Schema evolution's correctness rests on `widen` being a join
(least-upper-bound) operator: commutative, associative, idempotent,
with string absorbing every conflict. If any of these broke, the
merged target schema would depend on batch arrival ORDER — and two
resumed runs could commit different schemas for the same data.
"""

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from airbyte_integrations_spark.schema import merge_schemas, widen

SCALARS = [
    T.BooleanType(), T.IntegerType(), T.LongType(), T.DoubleType(),
    T.StringType(), T.TimestampType(), T.DateType(), T.BinaryType(),
    T.ArrayType(T.LongType()), T.FloatType(),
]

types_st = st.sampled_from(SCALARS)


@given(a=types_st, b=types_st)
@settings(max_examples=200, deadline=None)
def test_widen_commutative(a, b):
    assert widen(a, b) == widen(b, a)


@given(a=types_st, b=types_st, c=types_st)
@settings(max_examples=300, deadline=None)
def test_widen_associative(a, b, c):
    assert widen(widen(a, b), c) == widen(a, widen(b, c))


@given(a=types_st)
@settings(max_examples=50, deadline=None)
def test_widen_idempotent_and_string_absorbs(a):
    assert widen(a, a) == a
    assert widen(a, T.StringType()) == T.StringType()


def _schema(cols):
    return T.StructType([T.StructField(n, t, True) for n, t in cols])


names_st = st.lists(
    st.tuples(st.sampled_from(["a", "b", "c", "d"]), types_st),
    min_size=0, max_size=4, unique_by=lambda nt: nt[0],
)


@given(s1=names_st, s2=names_st, s3=names_st)
@settings(max_examples=200, deadline=None)
def test_merge_schemas_order_invariant_type_assignment(s1, s2, s3):
    """Any arrival order of three batch schemas yields the same
    column->type mapping (field ORDER may differ; per-column types and
    the column set may not — the engine conforms by name)."""
    a, b, c = _schema(s1), _schema(s2), _schema(s3)

    def as_map(s):
        return {f.name: f.dataType for f in s.fields}

    m1 = as_map(merge_schemas(merge_schemas(a, b), c))
    m2 = as_map(merge_schemas(a, merge_schemas(b, c)))
    m3 = as_map(merge_schemas(merge_schemas(c, b), a))
    assert m1 == m2 == m3


def test_reference_widening_cases():
    """The reference's concrete run-3 evolutions (catalog_schema_change
    diff): integer->number widens to double; number->integer also lands
    on the wider type (monotone, never narrowing)."""
    assert widen(T.LongType(), T.DoubleType()) == T.DoubleType()
    assert widen(T.DoubleType(), T.LongType()) == T.DoubleType()
    assert widen(T.BooleanType(), T.LongType()) == T.LongType()
    assert widen(T.TimestampType(), T.LongType()) == T.StringType()
