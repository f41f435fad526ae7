"""Mergeable quantile summary (operators/quantiles.py): rank-error bound,
merge associativity, and the distributed build against exact quantiles."""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from harvester_database_and_automation_spark.operators.quantiles import (
    QuantileSummary,
    summarize_column,
)


def exact_rank(vs, value):
    return sum(1 for v in vs if v <= value)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.integers(min_value=-10_000, max_value=10_000), min_size=1, max_size=2000),
    st.integers(min_value=1, max_value=64),
)
def test_rank_bounds_hold_and_are_tight(values, k):
    s = QuantileSummary.of(values, k)
    vs = sorted(values)
    for q in (0.0, 0.01, 0.25, 0.5, 0.75, 0.99, 1.0):
        v = s.quantile(q)
        target = max(1, min(len(vs), round(q * len(vs))))
        # the summary's answer has true rank within k of the target
        r = exact_rank(vs, v)
        lo, hi = s.rank_of(v)
        assert lo <= r <= hi
        assert abs(r - target) <= k, (q, r, target, k)


@settings(max_examples=20, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=1000), min_size=1, max_size=500),
    st.lists(st.integers(min_value=0, max_value=1000), min_size=1, max_size=500),
    st.lists(st.integers(min_value=0, max_value=1000), min_size=1, max_size=500),
)
def test_merge_is_associative_and_error_adds(a, b, c):
    k = 16
    sa, sb, sc = (QuantileSummary.of(x, k) for x in (a, b, c))
    left = sa.merge(sb).merge(sc)
    right = sa.merge(sb.merge(sc))
    assert left.n == right.n == len(a) + len(b) + len(c)
    allv = sorted(a + b + c)
    for s in (left, right):
        for q in (0.1, 0.5, 0.9):
            v = s.quantile(q)
            target = max(1, min(len(allv), round(q * len(allv))))
            assert abs(exact_rank(allv, v) - target) <= 3 * k


def test_compress_bounds_grow_by_stride():
    vs = list(range(1000))
    random.Random(7).shuffle(vs)
    s = QuantileSummary.of(vs, 8)
    c = s.compress(4)
    assert len(c.entries) < len(s.entries)
    for q in (0.05, 0.5, 0.95):
        v = c.quantile(q)
        target = max(1, round(q * 1000))
        assert abs(exact_rank(sorted(vs), v) - target) <= 8 * 4 + 8


def test_distributed_build_matches_exact_within_bound(spark):
    from harvester_database_and_automation_spark.catalog import load_table

    sf = "/root/testdata/sf0.01"
    li = load_table(spark, sf, "lineitem").select("l_extendedprice")
    n = li.count()
    n_parts = li.rdd.getNumPartitions()
    k = 64
    s = summarize_column(li, "l_extendedprice", k=k)
    assert s.n == n
    exact = sorted(r[0] for r in li.collect())
    for q in (0.25, 0.5, 0.75):
        v = s.quantile(q)
        target = max(1, min(n, round(q * n)))
        assert abs(exact_rank(exact, v) - target) <= n_parts * k
