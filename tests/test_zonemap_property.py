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
