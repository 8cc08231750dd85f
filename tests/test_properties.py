"""Hypothesis property tests for the driver-side pure functions.

These run without a SparkSession, so they're cheap to fuzz: the schema
promotion lattice (the one algorithm ported by spec from the reference,
utils/dataset.py:8-130) and the deterministic-hash sampling predicates.
"""

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from pydala_spark.schema import (
    _TYPE_RANK,
    get_unified_schema,
    promote_types,
    unify_pair,
)

lattice_types = st.sampled_from(_TYPE_RANK)
# a few off-lattice types that must fall back to rank 0, not crash
other_types = st.sampled_from(
    [pa.bool_(), pa.date32(), pa.timestamp("us"), pa.binary(), pa.decimal128(10, 2)]
)
any_type = st.one_of(lattice_types, other_types)


@given(any_type)
def test_promote_idempotent(t):
    assert promote_types(t, t).equals(t)


@given(lattice_types, lattice_types)
def test_promote_commutative_on_lattice(a, b):
    # on distinct lattice ranks the winner is rank-determined, so order
    # can't matter; equal ranks only happen for equal types here
    assert promote_types(a, b).equals(promote_types(b, a))


@given(lattice_types, lattice_types, lattice_types)
def test_promote_associative_on_lattice(a, b, c):
    lhs = promote_types(promote_types(a, b), c)
    rhs = promote_types(a, promote_types(b, c))
    assert lhs.equals(rhs)


@given(lattice_types)
def test_string_absorbs(t):
    assert promote_types(t, pa.string()).equals(pa.string())
    assert promote_types(pa.string(), t).equals(pa.string())


names = st.lists(
    st.text(alphabet="abcdef", min_size=1, max_size=3), min_size=1, max_size=5, unique=True
)


@st.composite
def schemas(draw):
    cols = draw(names)
    return pa.schema([pa.field(n, draw(lattice_types)) for n in cols])


@given(schemas(), schemas())
@settings(max_examples=50)
def test_unify_pair_symmetric_fields(s1, s2):
    u12, _ = unify_pair(s1, s2)
    u21, _ = unify_pair(s2, s1)
    # same column set, alphabetical order, and rank-equivalent types
    # (ties go to the later schema by spec, so exact types may differ
    # only between equal-rank types — impossible on this lattice)
    assert u12.names == u21.names == sorted(set(s1.names) | set(s2.names))
    for f12, f21 in zip(u12, u21):
        assert f12.type.equals(f21.type)


@given(st.lists(schemas(), min_size=1, max_size=5))
@settings(max_examples=50)
def test_unified_schema_covers_all_fields(schema_list):
    unified, all_equal = get_unified_schema(schema_list)
    every_name = sorted({n for s in schema_list for n in s.names})
    if len(schema_list) == 1:
        # the fold returns a lone fragment's schema untouched (original
        # field order preserved — reference utils/dataset.py:109-130)
        assert sorted(unified.names) == every_name
    else:
        assert unified.names == every_name
    # each unified type is >= (in lattice rank) every contributing type
    rank = {str(t): i for i, t in enumerate(_TYPE_RANK)}
    for f in unified:
        for s in schema_list:
            if f.name in s.names:
                assert rank[str(f.type)] >= rank[str(s.field(f.name).type)]
    if all_equal:
        for s in schema_list:
            for f in s:
                assert unified.field(f.name).type.equals(f.type)
