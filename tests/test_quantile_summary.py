"""Mergeable quantile summary (operators/quantiles.py): rank-bound
validity (including under multi-way merges — the case a naive span-based
merge got wrong), quantile error bounds, compression, and the
distributed build against exact quantiles."""

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


def assert_quantile_within(vs, v, target, bound):
    """Tie-aware quantile assertion: a returned value v summarizes SOME
    instance of v, whose sorted position lies anywhere in the interval
    [count(<v)+1, count(<=v)] — with duplicates that interval is wide and
    a scalar count(<=v) rank is the wrong error metric (e.g. values
    [0,0,0], q=0: the only possible answer 0 has ranks {1,2,3}).
    Valid iff the interval intersects [target-bound, target+bound]."""
    lt = sum(1 for x in vs if x < v)
    le = sum(1 for x in vs if x <= v)
    assert lt + 1 <= target + bound and le >= target - bound, (v, lt + 1, le, target, bound)


def assert_bounds_valid(summary, all_values):
    """Every stored entry summarizes some INSTANCE of its value, whose
    sorted position lies in [count(<v)+1, count(<=v)] — the entry's
    [rmin, rmax] interval must intersect that range (with ties, count(<=v)
    alone is the wrong target). rank_of must bracket count(<=probe)."""
    vs = sorted(all_values)
    for v, rmin, rmax in summary._bounds():
        le = exact_rank(vs, v)
        lt = sum(1 for x in vs if x < v)
        assert rmin <= le and rmax >= lt + 1, (v, rmin, rmax, lt, le)
    probes = vs[:: max(1, len(vs) // 7)] + [vs[0] - 1, vs[-1] + 1]
    for p in probes:
        lo, hi = summary.rank_of(p)
        r = exact_rank(vs, p)
        assert lo <= r <= hi, (p, lo, r, hi)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.integers(min_value=-10_000, max_value=10_000), min_size=1, max_size=2000),
    st.integers(min_value=1, max_value=64),
)
def test_fresh_summary_rank_error_within_k(values, k):
    s = QuantileSummary.of(values, k)
    vs = sorted(values)
    assert_bounds_valid(s, values)
    for q in (0.0, 0.01, 0.25, 0.5, 0.75, 0.99, 1.0):
        v = s.quantile(q)
        target = max(1, min(len(vs), round(q * len(vs))))
        assert_quantile_within(vs, v, target, k)


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=400),
        min_size=2,
        max_size=6,
    ),
    st.integers(min_value=2, max_value=32),
)
def test_multiway_merge_bounds_stay_valid(partitions, k):
    """The regression class the review found: merging 3+ summaries must
    never produce a lower rank bound above the true rank."""
    merged = QuantileSummary((), 0)
    for p in partitions:
        merged = merged.merge(QuantileSummary.of(p, k))
    allv = [x for p in partitions for x in p]
    assert merged.n == len(allv)
    assert_bounds_valid(merged, allv)
    # Error bound: delta inflation is additive across merges.
    m = len(partitions)
    for q in (0.1, 0.5, 0.9):
        v = merged.quantile(q)
        target = max(1, min(len(allv), round(q * len(allv))))
        assert_quantile_within(sorted(allv), v, target, (m + 1) * k)


def test_review_repro_five_partition_merge():
    """Exact repro from the review: rank_of(723) returned (9, 15) under
    the old merge while the true rank is 8."""
    parts = [
        [7926, 6202, 166, 5767, 1358, 8955, 5485, 5707, 1052, 936, 8806],
        [4713, 2909, 7557, 4455, 8361, 8778, 5283, 4301, 389, 6865, 2359, 1284, 6377],
        [978, 3823, 2207, 344, 6887, 5817, 140, 1203, 6622, 7741, 541, 6096, 6344, 5016],
        [8788, 7282, 723, 7476, 3165, 4200, 9201],
        [8106, 8915, 2519, 7115, 5, 1779, 1025, 1454, 7097, 6184, 477, 6784, 2684, 3849, 8498, 2394, 4770],
    ]
    merged = QuantileSummary((), 0)
    for p in parts:
        merged = merged.merge(QuantileSummary.of(p, 4))
    allv = [x for p in parts for x in p]
    lo, hi = merged.rank_of(723)
    true = exact_rank(allv, 723)
    assert lo <= true <= hi, (lo, true, hi)
    assert_bounds_valid(merged, allv)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=1000), min_size=1, max_size=300),
    st.lists(st.integers(min_value=0, max_value=1000), min_size=1, max_size=300),
    st.lists(st.integers(min_value=0, max_value=1000), min_size=1, max_size=300),
)
def test_merge_grouping_independent_validity(a, b, c):
    """(a⊕b)⊕c and a⊕(b⊕c) may differ structurally, but both must carry
    valid bounds over the same multiset and the same n."""
    k = 16
    sa, sb, sc = (QuantileSummary.of(x, k) for x in (a, b, c))
    left = sa.merge(sb).merge(sc)
    right = sa.merge(sb.merge(sc))
    allv = a + b + c
    assert left.n == right.n == len(allv)
    assert_bounds_valid(left, allv)
    assert_bounds_valid(right, allv)


def test_compress_keeps_bounds_valid_and_shrinks():
    vs = list(range(1000))
    random.Random(7).shuffle(vs)
    s = QuantileSummary.of(vs, 8)
    c = s.compress(4)
    assert len(c.entries) < len(s.entries)
    assert_bounds_valid(c, vs)
    for q in (0.05, 0.5, 0.95):
        v = c.quantile(q)
        target = max(1, round(q * 1000))
        assert_quantile_within(sorted(vs), v, target, 8 * 4 + 8)


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
    assert_bounds_valid(s, exact)
    for q in (0.25, 0.5, 0.75):
        v = s.quantile(q)
        target = max(1, min(n, round(q * n)))
        assert_quantile_within(exact, v, target, (n_parts + 1) * k)
