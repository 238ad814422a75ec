"""Property-based tests (FIXTURES.md F5): random tables × random
(field, size, ignoreNull) vs a pure-Python heap model of the
reference's aggregate loop (TopN.java:98-130) — null smallest,
descending, NaN above +Inf, set-equality on ties."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from topn_spark.operators.topn import topn

# value domains per F5: nulls, NaN, ±Inf, -0.0, forced duplicates
_floats = st.one_of(
    st.none(),
    st.just(float("nan")),
    st.just(float("inf")),
    st.just(float("-inf")),
    st.just(-0.0),
    st.sampled_from([1.0, 2.0, 2.0, 3.0]),  # forced ties
    st.floats(allow_nan=False, allow_infinity=False, width=32),
)
_ints = st.one_of(st.none(), st.integers(-(2**31), 2**31 - 1), st.sampled_from([7, 7, 7]))


def _sort_key(v):
    # Mirrors the reference comparator (TopN.java:144-186, 222-231) +
    # Float.compare NaN ordering: null < everything < ... < +Inf < NaN.
    if v is None:
        return (0, 0.0)
    if isinstance(v, float) and math.isnan(v):
        return (2, 0.0)
    return (1, v)


def model_topn(values, size, ignore_null):
    vals = [v for v in values if v is not None] if ignore_null else list(values)
    return sorted(vals, key=_sort_key, reverse=True)[:size]


def _canon(v):
    if v is None:
        return "null"
    if isinstance(v, float):
        return "nan" if math.isnan(v) else repr(v)
    return repr(v)


def _multiset_key(vals):
    return sorted(_canon(v) for v in vals)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    values=st.lists(_floats, min_size=0, max_size=60),
    size=st.sampled_from([1, 2, 5, 59, 60, 61, 1048576]),
    ignore_null=st.booleans(),
)
def test_topn_double_matches_model(spark, values, size, ignore_null):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "id long, v double"
    )
    got = [r.v for r in topn(df, "v", size, ignore_null).collect()]
    want = model_topn(values, size, ignore_null)
    assert _multiset_key(got) == _multiset_key(want)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    values=st.lists(_ints, min_size=0, max_size=40),
    size=st.sampled_from([1, 3, 40, 41]),
    ignore_null=st.booleans(),
)
def test_topn_int_matches_model(spark, values, size, ignore_null):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "id long, v int"
    )
    got = [r.v for r in topn(df, "v", size, ignore_null).collect()]
    want = model_topn(values, size, ignore_null)
    assert _multiset_key(got) == _multiset_key(want)
