"""Mergeable quantile summaries with a deterministic rank-error bound.

The sketch family's percentile member (KMV: cardinality, CMS: frequency,
MG: heavy hitters — `operators/sketches.py`): each partition compresses
its sorted values to every k-th element, summaries MERGE associatively,
and per-day / per-segment summaries maintained as tiny published tables
combine into corpus quantiles without touching rows again — the same
mergeable algebra `kmv_segment_overlap` certifies for distinct counts.

Representation is the classical Greenwald–Khanna tuple list
``(value, g, delta)``: with ``rmin(i) = Σ_{j≤i} g_j`` and
``rmax(i) = rmin(i) + delta_i``, every entry's true rank lies in
``[rmin, rmax]``. Fresh summaries have ``delta = 0`` (exact ranks);
merging interleaves by value and inflates delta by the neighbor gap of
the OTHER summary (the standard GK merge bound), so error adds across
merges instead of silently corrupting bounds. Rank/quantile queries and
the bound itself are property-tested in tests/test_quantile_summary.py,
including a multi-partition regression case where a naive span-based
merge produced a lower bound above the true rank.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class QuantileSummary:
    """GK tuples (value, g, delta), values non-decreasing; n = exact count."""

    entries: tuple[tuple[float, int, int], ...]
    n: int

    @staticmethod
    def of(values, k: int = 64) -> "QuantileSummary":
        """Summarize ``values`` keeping every k-th element of the sorted
        order (plus the minimum): g spans are ≤ k, delta = 0, so any rank
        query answers within k."""
        vs = sorted(values)
        n = len(vs)
        if n == 0:
            return QuantileSummary((), 0)
        ent: list[tuple[float, int, int]] = [(float(vs[0]), 1, 0)]
        prev = 0  # 0-based index of the last kept element
        i = min(k, n) - 1
        while i < n:
            if i > prev:
                ent.append((float(vs[i]), i - prev, 0))
                prev = i
            i += k
        if prev != n - 1:
            ent.append((float(vs[n - 1]), n - 1 - prev, 0))
        return QuantileSummary(tuple(ent), n)

    def merge(self, other: "QuantileSummary") -> "QuantileSummary":
        """Associative merge (GK): interleave by value; an entry keeps its
        g and gains delta from the other summary's local gap — the
        uncertainty about how many of the other side's dropped values sit
        just below it. Error bounds ADD across merges."""
        if not other.entries:
            return self
        if not self.entries:
            return other
        a, b = self.entries, other.entries
        merged: list[tuple[float, int, int]] = []
        ia = ib = 0
        while ia < len(a) or ib < len(b):
            take_a = ib >= len(b) or (ia < len(a) and a[ia][0] <= b[ib][0])
            if take_a:
                v, g, d = a[ia]
                ia += 1
                if ib < len(b):
                    gb, db = b[ib][1], b[ib][2]
                    d = d + gb + db - 1
            else:
                v, g, d = b[ib]
                ib += 1
                if ia < len(a):
                    ga, da = a[ia][1], a[ia][2]
                    d = d + ga + da - 1
            merged.append((v, g, d))
        return QuantileSummary(tuple(merged), self.n + other.n)

    def compress(self, stride: int) -> "QuantileSummary":
        """Merge runs of ``stride`` adjacent entries (g sums, delta of the
        survivor) — bounds stay valid, error grows by the absorbed g."""
        e = self.entries
        if len(e) <= 2 or stride <= 1:
            return self
        kept: list[tuple[float, int, int]] = [e[0]]
        i = 1
        while i < len(e):
            j = min(i + stride, len(e)) - 1
            g = sum(x[1] for x in e[i : j + 1])
            kept.append((e[j][0], g, e[j][2]))
            i = j + 1
        return QuantileSummary(tuple(kept), self.n)

    def _bounds(self) -> list[tuple[float, int, int]]:
        out = []
        rmin = 0
        for v, g, d in self.entries:
            rmin += g
            out.append((v, rmin, rmin + d))
        return out

    def rank_of(self, value: float) -> tuple[int, int]:
        """(lower, upper) bound on rank(value) = count of elements ≤ value."""
        lo = 0
        hi = self.n
        for v, rmin, rmax in self._bounds():
            if v <= value:
                lo = rmin  # this element is ≤ value and has rank ≥ rmin
            else:
                hi = rmax - 1  # the first greater element has rank ≤ rmax
                break
        else:
            hi = self.n
        return (lo, min(hi, self.n))

    def quantile(self, q: float) -> float:
        """The stored value whose rank interval sits closest to q·n."""
        if not self.entries:
            raise ValueError("empty summary")
        target = max(1, min(self.n, round(q * self.n)))
        best_v, best_dist = self.entries[0][0], float("inf")
        for v, rmin, rmax in self._bounds():
            dist = 0 if rmin <= target <= rmax else min(abs(rmin - target), abs(rmax - target))
            if dist < best_dist:
                best_v, best_dist = v, dist
        return best_v


def summarize_column(df, col: str, k: int = 64) -> QuantileSummary:
    """Distributed build: one summary per partition via mapPartitions
    (rows never sort globally), merged on the driver — P × (partition_n/k)
    entries is the only collected state. Error: ≤ k per partition from
    of(), plus ≤ (k-ish) neighbor-gap inflation per merge — the
    property-tested bound is (#partitions + 1) · k."""
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
