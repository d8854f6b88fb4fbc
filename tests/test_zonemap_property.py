"""Property test for the data-skipping soundness invariant: a chunk
containing ANY row that satisfies a filter must never be pruned by its
stats (min/max, null counts, or bloom). Missed prunes are fine;
a wrong prune would silently drop rows."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql.datasource import (
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    StringStartsWith,
)

from mandoline_hbase_spark import zonemaps

_num = st.one_of(st.integers(min_value=-50, max_value=50), st.none())
_str = st.one_of(st.text(alphabet="abc", min_size=0, max_size=3), st.none())


def _matches(f, v):
    """Reference row-level filter semantics (SQL three-valued: NULL
    comparisons are not matches)."""
    if isinstance(f, IsNull):
        return v is None
    if isinstance(f, IsNotNull):
        return v is not None
    if v is None:
        return False
    if isinstance(f, EqualTo):
        return v == f.value
    if isinstance(f, GreaterThan):
        return v > f.value
    if isinstance(f, GreaterThanOrEqual):
        return v >= f.value
    if isinstance(f, LessThan):
        return v < f.value
    if isinstance(f, LessThanOrEqual):
        return v <= f.value
    if isinstance(f, In):
        return v in f.value
    if isinstance(f, StringStartsWith):
        return isinstance(v, str) and v.startswith(f.value)
    raise AssertionError(f)


_num_filters = st.one_of(
    st.builds(EqualTo, st.just(("x",)), st.integers(-60, 60)),
    st.builds(GreaterThan, st.just(("x",)), st.integers(-60, 60)),
    st.builds(GreaterThanOrEqual, st.just(("x",)), st.integers(-60, 60)),
    st.builds(LessThan, st.just(("x",)), st.integers(-60, 60)),
    st.builds(LessThanOrEqual, st.just(("x",)), st.integers(-60, 60)),
    st.builds(In, st.just(("x",)), st.tuples(st.integers(-60, 60), st.integers(-60, 60))),
    st.builds(IsNull, st.just(("x",))),
    st.builds(IsNotNull, st.just(("x",))),
)

_str_filters = st.one_of(
    st.builds(EqualTo, st.just(("s",)), st.text(alphabet="abc", max_size=3)),
    st.builds(StringStartsWith, st.just(("s",)), st.text(alphabet="abc", min_size=1, max_size=2)),
    st.builds(IsNull, st.just(("s",))),
    st.builds(IsNotNull, st.just(("s",))),
)


@settings(max_examples=300, deadline=None)
@given(xs=st.lists(_num, min_size=1, max_size=12), f=_num_filters)
def test_numeric_pruning_never_drops_matches(xs, f):
    pdf = pd.DataFrame({"x": pd.array(xs, dtype="Int64")})
    stats = {r["column"]: r for r in zonemaps.stats_rows("c", pdf)}
    has_match = any(_matches(f, None if x is None else int(x)) for x in xs)
    if has_match:
        assert zonemaps._may_match_one(stats, f) is True, (xs, f, stats)


@settings(max_examples=300, deadline=None)
@given(ss=st.lists(_str, min_size=1, max_size=12), f=_str_filters)
def test_string_pruning_never_drops_matches(ss, f):
    pdf = pd.DataFrame({"s": pd.array(ss, dtype=object)})
    stats = {r["column"]: r for r in zonemaps.stats_rows("c", pdf)}
    has_match = any(_matches(f, s) for s in ss)
    if has_match:
        assert zonemaps._may_match_one(stats, f) is True, (ss, f, stats)


@settings(max_examples=150, deadline=None)
@given(
    xs=st.lists(st.integers(-50, 50), min_size=1, max_size=20),
    probe=st.integers(-60, 60),
)
def test_bloom_never_drops_members(xs, probe):
    bits = zonemaps.bloom_bits(xs)
    for x in xs:
        assert zonemaps.bloom_might_contain(bits, x)
    if probe in xs:
        assert zonemaps.bloom_might_contain(bits, probe)


# --- float columns: NaN/±Inf under Spark semantics --------------------------
#
# Spark's NaN is a real value: equal to itself, greater than any number,
# NOT NULL. A pandas float column conflates true nulls with NaN, so the
# stats layer must treat any na as possibly-NaN and never prune a
# comparison it cannot disprove.

import math


def _matches_spark_float(f, v):
    """Row-level float filter semantics as Spark evaluates them (NaN =
    NaN, NaN > any number, NaN IS NOT NULL; None is SQL null)."""
    if isinstance(f, IsNull):
        return v is None
    if isinstance(f, IsNotNull):
        return v is not None
    if v is None:
        return False
    fv = float(f.value) if not isinstance(f, In) else None
    if isinstance(f, EqualTo):
        return (math.isnan(v) and math.isnan(fv)) or v == fv
    nan_gt = lambda a, b: (math.isnan(a) and not math.isnan(b)) or (
        not math.isnan(a) and not math.isnan(b) and a > b
    )
    if isinstance(f, GreaterThan):
        return nan_gt(v, fv)
    if isinstance(f, GreaterThanOrEqual):
        return nan_gt(v, fv) or ((math.isnan(v) and math.isnan(fv)) or v == fv)
    if isinstance(f, LessThan):
        return nan_gt(fv, v)
    if isinstance(f, LessThanOrEqual):
        return nan_gt(fv, v) or ((math.isnan(v) and math.isnan(fv)) or v == fv)
    if isinstance(f, In):
        return any(
            (math.isnan(v) and math.isnan(float(x))) or v == float(x) for x in f.value
        )
    raise AssertionError(f)


_float = st.one_of(
    st.none(),
    st.just(float("nan")),
    st.just(float("inf")),
    st.just(float("-inf")),
    st.integers(min_value=-50, max_value=50).map(float),
)
_float_probe = st.one_of(
    st.just(float("nan")),
    st.just(float("inf")),
    st.just(float("-inf")),
    st.integers(min_value=-60, max_value=60).map(float),
)
_float_filters = st.one_of(
    st.builds(EqualTo, st.just(("x",)), _float_probe),
    st.builds(GreaterThan, st.just(("x",)), _float_probe),
    st.builds(GreaterThanOrEqual, st.just(("x",)), _float_probe),
    st.builds(LessThan, st.just(("x",)), _float_probe),
    st.builds(LessThanOrEqual, st.just(("x",)), _float_probe),
    st.builds(In, st.just(("x",)), st.tuples(_float_probe, _float_probe)),
    st.builds(IsNull, st.just(("x",))),
    st.builds(IsNotNull, st.just(("x",))),
)


@settings(max_examples=400, deadline=None)
@given(xs=st.lists(_float, min_size=1, max_size=12), f=_float_filters)
def test_float_nan_inf_pruning_never_drops_matches(xs, f):
    pdf = pd.DataFrame({"x": pd.array(xs, dtype="float64")})
    stats = {r["column"]: r for r in zonemaps.stats_rows("c", pdf)}
    # pandas float64 folds None into NaN: Spark could see EITHER a null
    # or a NaN for each na slot, so the chunk may match a filter if any
    # interpretation of any na slot matches.
    has_match = any(
        _matches_spark_float(f, interp)
        for x in xs
        for interp in ([x] if (x is not None and not math.isnan(x)) else [None, float("nan")])
    )
    if has_match:
        assert zonemaps._may_match_one(stats, f) is True, (xs, f, stats)


def test_nan_chunk_regressions():
    """The three advisory-report cases: a NaN-bearing chunk must stay
    'maybe' for value > 1e6, x = NaN, and x IS NOT NULL."""
    pdf = pd.DataFrame({"x": pd.array([float("nan"), 1.0], dtype="float64")})
    stats = {r["column"]: r for r in zonemaps.stats_rows("c", pdf)}
    assert zonemaps._may_match_one(stats, GreaterThan(("x",), 1e6)) is True
    assert zonemaps._may_match_one(stats, EqualTo(("x",), float("nan"))) is True
    assert zonemaps._may_match_one(stats, IsNotNull(("x",))) is True
    # all-NaN float chunk: no stats row at all -> never pruned
    allnan = pd.DataFrame({"x": pd.array([float("nan")] * 3, dtype="float64")})
    assert zonemaps.stats_rows("c", allnan) == []
    # ±Inf lands in min/max so value > big stays 'maybe'
    pinf = pd.DataFrame({"x": pd.array([1.0, float("inf")], dtype="float64")})
    stats = {r["column"]: r for r in zonemaps.stats_rows("c", pinf)}
    assert zonemaps._may_match_one(stats, GreaterThan(("x",), 1e300)) is True
    # bloom: NaN probe is unsupported -> maybe, never a false negative
    bits = zonemaps.bloom_bits([1.0, 2.0])
    assert zonemaps.bloom_might_contain(bits, float("nan")) is True


def test_array_chunk_stats_nan_inf():
    import numpy as np

    from mandoline_hbase_spark.engine import _array_chunk_stats

    assert _array_chunk_stats("c", np.array([np.nan, np.nan])) == []
    rows = _array_chunk_stats("c", np.array([1.0, np.inf, np.nan]))
    assert rows[0]["vmax"] == repr(float("inf")) and rows[0]["nulls"] == 1
