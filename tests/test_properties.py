"""Hypothesis property tests for the driver-side pure functions.

These run without a SparkSession, so they're cheap to fuzz: the schema
promotion lattice (the one algorithm ported by spec from the reference,
utils/dataset.py:8-130) and the deterministic-hash sampling predicates.
"""

import os

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

#: deep-drive knob (round 15, VERDICT r14 #4): the committed suite runs
#: hypothesis defaults; `tools/deep_drive_property.py` re-runs this file
#: with PYDALA_PROPERTY_EXAMPLES=2000 across 3 seeds — the example
#: budget every @given test honors via `deep_settings`
_EXAMPLES = int(os.environ.get("PYDALA_PROPERTY_EXAMPLES") or 0)


def deep_settings(default: int = 100, **kw):
    if _EXAMPLES:
        kw.setdefault("deadline", None)  # budget runs, not wall pins
    return settings(max_examples=_EXAMPLES or default, **kw)

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
@deep_settings()
def test_promote_idempotent(t):
    assert promote_types(t, t).equals(t)


@given(lattice_types, lattice_types)
@deep_settings()
def test_promote_commutative_on_lattice(a, b):
    # on distinct lattice ranks the winner is rank-determined, so order
    # can't matter; equal ranks only happen for equal types here
    assert promote_types(a, b).equals(promote_types(b, a))


@given(lattice_types, lattice_types, lattice_types)
@deep_settings()
def test_promote_associative_on_lattice(a, b, c):
    lhs = promote_types(promote_types(a, b), c)
    rhs = promote_types(a, promote_types(b, c))
    assert lhs.equals(rhs)


@given(lattice_types)
@deep_settings()
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
@deep_settings(50)
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
@deep_settings()
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
@deep_settings()
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
@deep_settings()
def test_sample_threshold_monotone(f1, f2):
    from pydala_spark.operators.sampling import HASH_SPACE, sample_threshold

    t1, t2 = sample_threshold(f1), sample_threshold(f2)
    assert 0 <= t1 <= HASH_SPACE
    if f1 <= f2:
        # nested-subset property: a bigger fraction's predicate strictly
        # contains a smaller one's (the threshold can only grow)
        assert t1 <= t2


@given(st.lists(schemas(), min_size=1, max_size=5))
@deep_settings(50)
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


# -- TOML emitter round-trip (round 3: sidecar write-back) ------------------

_toml_scalar = st.one_of(
    st.text(max_size=40),
    st.integers(min_value=-(2**53), max_value=2**53),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.booleans(),
    st.lists(st.text(max_size=12), max_size=4),
)
_toml_key = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"),
                           whitelist_characters="_-"),
    min_size=1, max_size=16,
)
_toml_table = st.recursive(
    st.dictionaries(_toml_key, _toml_scalar, max_size=4),
    lambda inner: st.dictionaries(
        _toml_key, st.one_of(_toml_scalar, inner), max_size=4
    ),
    max_leaves=8,
)


@given(_toml_table)
@deep_settings(150, deadline=None)
def test_tomlout_roundtrips_arbitrary_configs(cfg):
    import tomllib

    from pydala_spark.utils.tomlout import dumps

    parsed = tomllib.loads(dumps(cfg))

    def norm(d):
        out = {}
        for k, v in d.items():
            if isinstance(v, dict):
                out[k] = norm(v)
            elif isinstance(v, float):
                out[k] = round(v, 9)
            elif isinstance(v, (list, tuple)):
                out[k] = [str(x) for x in v]
            else:
                out[k] = v
        return out

    # floats compare to 9 places (repr round-trips, TOML parsing is
    # exact for repr output — the rounding only guards float32 noise)
    assert norm(parsed) == norm(cfg)


# -- deterministic sampling thresholds (round 3: mixture weighting) ---------

@given(
    st.dictionaries(st.sampled_from(["a", "b", "c"]),
                    st.floats(min_value=0, max_value=1), max_size=3),
    st.floats(min_value=0, max_value=1),
)
@deep_settings()
def test_mixture_thresholds_nest(rates, default_rate):
    # the per-domain threshold is monotone in the rate, so a domain's
    # sample at r1 <= r2 is a subset — verified at the threshold level
    # (the Spark filter compares the same bucket to the same threshold)
    from pydala_spark.operators.sampling import sample_threshold

    for d, r in rates.items():
        assert sample_threshold(r) <= sample_threshold(min(1.0, r + 0.1) if r <= 0.9 else 1.0)
    assert 0 <= sample_threshold(default_rate) <= 1 << 32
