"""Mergeable quantile summaries with a deterministic rank-error bound.

The sketch family's percentile member (KMV: cardinality, CMS: frequency,
MG: heavy hitters — `operators/sketches.py`): each partition compresses
its sorted values to every k-th element annotated with the ranks it
covers; summaries CONCATENATE and re-compress associatively, so per-day /
per-segment summaries maintained as tiny published tables merge into
corpus quantiles without touching rows again — the same algebra the
reference's wholesale MV refresh lacks and `kmv_segment_overlap` shows
for distinct counts.

Guarantee (deterministic, no randomization): a summary built with
``compress_k(k)`` answers any rank query within ``k`` positions; merging
``m`` summaries and re-compressing to ``k`` keeps the error ≤ sum of the
inputs' errors + k. For a target relative error ε over n rows, use
k = ceil(ε·n / (2·#partitions)) per partition — property-tested in
tests/test_quantile_summary.py.

Cite: GK01-style rank summaries (Greenwald–Khanna), simplified to the
fixed-stride compaction Spark's own approx_percentile uses internally —
this version is transparent (a plain (value, min_rank, max_rank) table)
and mergeable across published segments.
"""

from __future__ import annotations

from bisect import bisect_right
from dataclasses import dataclass


@dataclass(frozen=True)
class QuantileSummary:
    """Sorted tuple of (value, min_rank, max_rank), ranks 1-based over the
    summarized multiset; n is the exact total count."""

    entries: tuple[tuple[float, int, int], ...]
    n: int

    @staticmethod
    def of(values, k: int = 64) -> "QuantileSummary":
        vs = sorted(values)
        n = len(vs)
        if n == 0:
            return QuantileSummary((), 0)
        ent = []
        i = 0
        while i < n:
            j = min(i + k, n) - 1
            # keep the LAST element of each stride; it covers ranks i+1..j+1
            ent.append((float(vs[j]), i + 1, j + 1))
            i = j + 1
        # always keep the minimum exactly (rank-1 queries)
        if ent[0][2] > 1:
            ent.insert(0, (float(vs[0]), 1, 1))
        return QuantileSummary(tuple(ent), n)

    def merge(self, other: "QuantileSummary") -> "QuantileSummary":
        """Associative, commutative merge: entries interleave by value and
        rank spans add — the result answers rank queries within the SUM of
        the two inputs' errors."""
        if not other.entries:
            return self
        if not self.entries:
            return other
        merged = []
        a, b = list(self.entries), list(other.entries)
        ia = ib = 0
        ra = rb = 0  # max_rank consumed so far on each side
        while ia < len(a) or ib < len(b):
            take_a = ib >= len(b) or (ia < len(a) and a[ia][0] <= b[ib][0])
            if take_a:
                v, lo, hi = a[ia]
                ia += 1
                # other side: at least rb values are <= v (consumed), at
                # most (next unconsumed entry's max_rank - 1) are < v.
                other_lo = rb
                other_hi = (b[ib][2] - 1) if ib < len(b) else other.n
                merged.append((v, lo + other_lo, hi + other_hi))
                ra = hi
            else:
                v, lo, hi = b[ib]
                ib += 1
                self_lo = ra
                self_hi = (a[ia][2] - 1) if ia < len(a) else self.n
                merged.append((v, lo + self_lo, hi + self_hi))
                rb = hi
        return QuantileSummary(tuple(merged), self.n + other.n)

    def compress(self, k: int) -> "QuantileSummary":
        """Keep every k-th entry (plus first and last): adds ≤ the dropped
        entries' rank spans (< k·stride span) to the error."""
        e = self.entries
        if len(e) <= 2:
            return self
        kept = [e[0]] + [e[i] for i in range(1, len(e) - 1) if i % k == 0] + [e[-1]]
        return QuantileSummary(tuple(kept), self.n)

    def rank_of(self, value: float) -> tuple[int, int]:
        """(lower, upper) bound on the rank of ``value`` (count <= value)."""
        vs = [x[0] for x in self.entries]
        i = bisect_right(vs, value)
        if i == 0:
            return (0, self.entries[0][2] - 1 if self.entries else 0)
        lo = self.entries[i - 1][1]
        hi = (self.entries[i][2] - 1) if i < len(self.entries) else self.n
        return (lo, hi)

    def quantile(self, q: float) -> float:
        """Value whose rank bounds straddle q·n as closely as the summary
        allows (the standard GK query)."""
        if not self.entries:
            raise ValueError("empty summary")
        target = max(1, min(self.n, round(q * self.n)))
        best = self.entries[0][0]
        for v, lo, hi in self.entries:
            if lo <= target:
                best = v
            if hi >= target:
                break
        return best


def summarize_column(df, col: str, k: int = 64) -> QuantileSummary:
    """Distributed build: one summary per partition via mapPartitions
    (values never leave their partition unsorted-globally), merged on the
    driver — P × (partition_n / k) entries total, the only collected
    state. The per-partition stride k sets the error: ≤ k per partition,
    ≤ P·k after the merge."""
    summaries = (
        df.select(col)
        .rdd.mapPartitions(
            lambda rows: [QuantileSummary.of([r[0] for r in rows if r[0] is not None], k)]
        )
        .collect()
    )
    out = QuantileSummary((), 0)
    for s in summaries:
        out = out.merge(s)
    return out
