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


_UNITS = ["u", "us", "ms", "s", "sec", "min", "h", "d", "w", "mo", "y",
          "hour", "day", "week", "month", "year"]


@given(st.integers(min_value=1, max_value=999), st.sampled_from(_UNITS))
def test_parse_interval_grammar(n, unit):
    from pydala_spark.dataset.writer import parse_interval

    count, canonical = parse_interval(f"{n}{unit}")
    assert count == n
    assert canonical in {
        "microsecond", "millisecond", "second", "minute", "hour",
        "day", "week", "month", "year",
    }
    # bare unit defaults to n=1; bare number defaults to years
    assert parse_interval(unit)[0] == 1
    assert parse_interval(str(n)) == (n, "year")


@given(st.text(alphabet="qzxv", min_size=1, max_size=4))
def test_parse_interval_rejects_unknown_units(junk):
    import pytest

    from pydala_spark.dataset.writer import _UNIT_ALIASES, parse_interval

    if junk in _UNIT_ALIASES:
        return
    with pytest.raises(ValueError, match="unknown interval unit"):
        parse_interval(f"3{junk}")


@given(
    st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
    st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
)
def test_sample_threshold_monotone(f1, f2):
    from pydala_spark.operators.sampling import HASH_SPACE, sample_threshold

    t1, t2 = sample_threshold(f1), sample_threshold(f2)
    assert 0 <= t1 <= HASH_SPACE
    if f1 <= f2:
        # nested-subset property: a bigger fraction's predicate strictly
        # contains a smaller one's (the threshold can only grow)
        assert t1 <= t2


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
