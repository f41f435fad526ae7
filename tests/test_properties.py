"""Property-based tests for the kernel functions (SURVEY.md §5: mutation
finder diff(ref,ref)=∅, distance symmetry, frameshift multiples-of-3).

Hypothesis generates the cases; each property evaluates ALL examples in a
single Spark job (batched into one DataFrame) so the suite stays fast.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from harvester_database_and_automation_spark.functions.genomics import (
    has_frameshift,
    hamming,
)
from harvester_database_and_automation_spark.functions.geo import GeoRule, resolve_geo

# ---------------------------------------------------------------------------
# K5 frameshift: pure-Python model vs the Spark expression.
# ---------------------------------------------------------------------------
gap_pairs = st.lists(
    st.tuples(st.integers(0, 500), st.integers(0, 500)).map(
        lambda t: (min(t), min(t) + abs(t[1] - t[0]))
    ),
    min_size=0,
    max_size=6,
)


@given(st.lists(gap_pairs, min_size=1, max_size=30))
@settings(max_examples=20, deadline=None)
def test_frameshift_matches_python_model(spark, cases):
    rows = []
    expected = []
    for pairs in cases:
        gaps = ",".join(f"{a}-{b}" for a, b in pairs)
        rows.append((gaps,))
        expected.append(any((b - a) % 3 != 0 for a, b in pairs) if pairs else False)
    df = spark.createDataFrame(rows, "gaps string")
    got = [r[0] for r in df.select(has_frameshift("gaps")).collect()]
    assert got == expected


def test_frameshift_all_multiples_of_three_is_false(spark):
    df = spark.createDataFrame([("0-3,10-16,20-29",), ("",), (None,)], "gaps string")
    assert [r[0] for r in df.select(has_frameshift("gaps")).collect()] == [False, False, False]


# ---------------------------------------------------------------------------
# A11 hamming: symmetry, identity, bounds.
# ---------------------------------------------------------------------------
seqs = st.text(alphabet="ACGT", min_size=8, max_size=8)


@given(st.lists(st.tuples(seqs, seqs), min_size=1, max_size=40))
@settings(max_examples=20, deadline=None)
def test_hamming_symmetry_identity_bounds(spark, pairs):
    df = spark.createDataFrame(pairs, "a string, b string")
    out = df.select(
        hamming("a", "b", 8).alias("ab"),
        hamming("b", "a", 8).alias("ba"),
        hamming("a", "a", 8).alias("aa"),
    ).collect()
    for r, (a, b) in zip(out, pairs):
        expected = sum(1 for x, y in zip(a, b) if x != y)
        assert r["ab"] == expected  # matches the python model
        assert r["ab"] == r["ba"]  # symmetric
        assert r["aa"] == 0  # identity
        assert 0 <= r["ab"] <= 8  # bounded


# ---------------------------------------------------------------------------
# K6 geo rules: fixpoint idempotence; no-rule identity (pure Python, no
# Spark needed — the UDF wraps resolve_geo directly).
# ---------------------------------------------------------------------------
geo_field = st.sampled_from(["Europe", "Asia", "Suisse", "Switzerland", "Zuerich", "x", ""])
geo_tuples = st.tuples(geo_field, geo_field, geo_field, geo_field)

RULES = [
    GeoRule(("*", "Suisse", "*", "*"), ("Europe", "Switzerland", "*", "*")),
    GeoRule(("Europe", "Switzerland", "Zuerich", "*"), ("Europe", "Switzerland", "Zurich", "*")),
    GeoRule(("Asia", "*", "*", "*"), ("Asia", "*", "*", "*")),  # self-map: must not loop
]


@given(geo_tuples)
@settings(max_examples=200, deadline=None)
def test_geo_resolution_is_idempotent(value):
    once = resolve_geo(RULES, value)
    assert resolve_geo(RULES, once) == once


@given(geo_tuples)
@settings(max_examples=50, deadline=None)
def test_geo_no_rules_is_identity(value):
    assert resolve_geo([], value) == value


def test_quantization_error_bounded_by_half_step(spark):
    """Half-up int8 quantization: every reconstruction error is at most
    scale/2 (+ float slack), and zero vectors quantize error-free."""
    import math
    import random

    from harvester_database_and_automation_spark.plans.registry import QUERIES

    rng = random.Random(11)
    rows = [(i, [rng.uniform(-5, 5) for _ in range(16)]) for i in range(40)]
    rows.append((98, [0.0] * 16))
    rows.append((99, [127.0] * 16))  # scale exactly 1.0, zero error
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    import tempfile, os

    d = tempfile.mkdtemp()
    df.write.parquet(os.path.join(d, "embeddings.parquet"))
    out = QUERIES["embedding_quantization_error"].fn(spark, d).collect()
    by_id = {r["vec_id"]: r for r in out}
    assert len(by_id) == 42
    for r in out:
        assert r["max_abs_err"] <= r["scale"] / 2 + 1e-9
        assert 0 <= r["mean_abs_err"] <= r["max_abs_err"] + 1e-9
    assert by_id[98]["scale"] == 0.0 and by_id[98]["max_abs_err"] == 0.0
    assert by_id[99]["scale"] == 1.0 and by_id[99]["max_abs_err"] == 0.0


def test_approx_count_distinct_within_tolerance(spark):
    """The A3 scale path: approx_count_distinct (HLL++) stays within its
    configured relative error of the exact count on the real corpus —
    the drop-in swap for countDistinct at 100 TB."""
    from pyspark.sql import functions as F

    from harvester_database_and_automation_spark.catalog import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    row = li.agg(
        F.countDistinct("l_orderkey").alias("exact"),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx"),
    ).first()
    assert abs(row["approx"] - row["exact"]) <= 0.05 * row["exact"]


def test_approx_percentile_within_tolerance(spark):
    """The A9 scale path: percentile_approx (KLL-style) lands within the
    configured accuracy of the exact percentile on the real corpus — the
    drop-in swap for exact percentile sorts at 100 TB."""
    from pyspark.sql import functions as F

    from harvester_database_and_automation_spark.catalog import load_table

    o = load_table(spark, "/root/testdata/sf0.001", "orders")
    row = o.agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("exact"),
        F.percentile_approx("o_totalprice", 0.5, accuracy=10000).alias("approx"),
    ).first()
    # accuracy=10000 bounds rank error at n/10000; translate to a loose
    # value tolerance via the observed spread
    assert abs(row["approx"] - row["exact"]) <= 0.01 * row["exact"]


# ---------------------------------------------------------------------------
# Misra-Gries mergeable summaries: the candidate guarantee that makes
# heavy_hitters_exact exact. Pure-Python fold — no Spark in the loop.
# ---------------------------------------------------------------------------
batches = st.lists(
    st.lists(st.integers(0, 30), min_size=0, max_size=200),
    min_size=1,
    max_size=12,
)


@given(batches, st.integers(2, 10))
@settings(max_examples=300, deadline=None)
def test_mg_merge_keeps_every_heavy_hitter(batch_seq, k):
    """After folding any batch sequence, every item with true frequency
    >= n/k must survive in the capacity-2k summary (deficiency bound
    n/(2k+1) < n/k), regardless of batch boundaries or value order."""
    from collections import Counter

    from harvester_database_and_automation_spark.operators.sketches import merge_mg_summary

    cap = 2 * k
    counters: dict = {}
    truth: Counter = Counter()
    for batch in batch_seq:
        bc = Counter(batch)
        truth.update(bc)
        counters = merge_mg_summary(counters, dict(bc), cap)
        assert len(counters) <= cap
    n = sum(truth.values())
    for item, c in truth.items():
        if c * k >= n and n > 0:
            assert item in counters, (
                f"heavy hitter {item} (freq {c}/{n}, k={k}) evicted"
            )


@given(batches, st.integers(2, 10))
@settings(max_examples=100, deadline=None)
def test_mg_merge_never_overcounts(batch_seq, k):
    """Summary counters only ever undercount (prunes subtract, never add):
    counter[v] <= true frequency of v at every fold step."""
    from collections import Counter

    from harvester_database_and_automation_spark.operators.sketches import merge_mg_summary

    cap = 2 * k
    counters: dict = {}
    truth: Counter = Counter()
    for batch in batch_seq:
        bc = Counter(batch)
        truth.update(bc)
        counters = merge_mg_summary(counters, dict(bc), cap)
        for v, c in counters.items():
            assert 0 < c <= truth[v]


def test_cdc_chunks_tile_every_document(spark):
    """CDC chunks must partition [0, len) exactly: sorted by start, each
    chunk begins where the previous ended, the first begins at 0, the
    last ends at the document length — no gaps, no overlaps, for every
    document. (The oracle hash-checks values; this checks the geometric
    invariant that makes the chunks a valid dedup unit.)"""
    from harvester_database_and_automation_spark.catalog import load_table
    from harvester_database_and_automation_spark.plans.registry import QUERIES

    sf = "/root/testdata/sf0.001"
    chunks = QUERIES["cdc_chunk_stats"].fn(spark, sf).collect()
    lens = {
        r["doc_id"]: r["len"]
        for r in load_table(spark, sf, "documents")
        .select("doc_id", F.length("text").alias("len"))
        .collect()
    }
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(lens)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["chunk_start"])
        pos = 0
        for r in rows:
            assert r["chunk_start"] == pos, (doc_id, pos, r)
            assert r["chunk_len"] > 0
            pos += r["chunk_len"]
        assert pos == lens[doc_id], (doc_id, pos, lens[doc_id])


def test_fixed_chunks_cover_every_character(spark):
    """Fixed-stride chunk manifest: chunks cover [0, len) with stride-90
    starts and the advertised overlap; every character of every document
    falls in at least one chunk."""
    from harvester_database_and_automation_spark.catalog import load_table
    from harvester_database_and_automation_spark.plans.registry import QUERIES

    sf = "/root/testdata/sf0.001"
    rows = QUERIES["doc_chunk_manifest"].fn(spark, sf).collect()
    lens = {
        r["doc_id"]: r["len"]
        for r in load_table(spark, sf, "documents")
        .select("doc_id", F.length("text").alias("len"))
        .collect()
    }
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(lens)
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r["chunk_idx"])
        covered = 0  # chunks start at idx*90 and are contiguous-or-overlapping
        for r in rs:
            assert r["start"] == r["chunk_idx"] * 90
            assert r["start"] <= covered  # no gap before this chunk
            covered = max(covered, r["start"] + r["chunk_chars"])
        assert covered == lens[doc_id]


def test_skyline_output_is_exactly_the_nondominated_set(spark):
    """Every skyline row must be non-dominated and every excluded part
    dominated by some part — checked against a direct quadratic model on
    the collected sf0.001 frame."""
    from harvester_database_and_automation_spark.catalog import load_table
    from harvester_database_and_automation_spark.plans.registry import QUERIES

    sf = "/root/testdata/sf0.001"
    parts = [
        (r["p_partkey"], r["p_retailprice"], r["p_size"])
        for r in load_table(spark, sf, "part").collect()
    ]
    got = {r["p_partkey"] for r in QUERIES["part_value_skyline"].fn(spark, sf).collect()}

    def dominated(p):
        return any(
            (q[1] <= p[1] and q[2] >= p[2] and (q[1] < p[1] or q[2] > p[2]))
            for q in parts
        )

    expect = {k for (k, pr, sz) in parts if not dominated((k, pr, sz))}
    assert got == expect


def test_clamped_balance_closed_form_equals_sequential_fold(spark):
    """The window identity behind `user_clamped_balance`
    (clamped_t = prefix_t − min(0, running-min prefix)) must agree with
    the literal sequential fold max(0, b + d) for every user."""
    from collections import defaultdict

    from harvester_database_and_automation_spark.catalog import load_table
    from harvester_database_and_automation_spark.plans.registry import QUERIES

    sf = "/root/testdata/sf0.01"
    flows = (
        load_table(spark, sf, "events")
        .filter(F.col("event_type").isin("purchase", "error"))
        .select(
            "user_id",
            "ts",
            "event_id",
            (
                F.floor(F.col("value") * 100 + 0.5).cast("long")
                * F.when(F.col("event_type") == "purchase", 1).otherwise(-1)
            ).alias("d"),
        )
        .orderBy("user_id", "ts", "event_id")
        .collect()
    )
    seq = defaultdict(lambda: [0, 0])
    for r in flows:
        b, p = seq[r["user_id"]]
        b = max(0, b + r["d"])
        seq[r["user_id"]] = [b, max(p, b)]
    out = QUERIES["user_clamped_balance"].fn(spark, sf).collect()
    assert len(out) == len(seq)
    for r in out:
        b, p = seq[r["user_id"]]
        assert (r["final_balance_cents"], r["peak_balance_cents"]) == (b, p), r


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.integers(min_value=-50, max_value=50),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_group_quantiles_exact_matches_numpy_linear(spark, rows):
    """The distribution-based quantile (plans/shared.group_quantiles_exact)
    must equal numpy's 'linear' percentile — the same continuous
    definition quantile_cont uses — per group, including duplicate-heavy
    multisets and singleton groups."""
    import numpy as np

    from harvester_database_and_automation_spark.plans.shared import group_quantiles_exact

    qs = [0.0, 0.25, 0.5, 0.9, 1.0]
    df = spark.createDataFrame(
        [(g, float(v)) for g, v in rows], "g string, v double"
    )
    got = {
        r["g"]: [r[f"q{i}"] for i in range(len(qs))]
        for r in group_quantiles_exact(df, ["g"], "v", qs).collect()
    }
    byg = {}
    for g, v in rows:
        byg.setdefault(g, []).append(float(v))
    assert set(got) == set(byg)
    for g, vs in byg.items():
        want = [float(np.percentile(vs, q * 100, method="linear")) for q in qs]
        for w, h in zip(want, got[g]):
            assert abs(w - h) < 1e-9, (g, vs, want, got[g])


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.one_of(
                st.none(),
                st.integers(min_value=-5000, max_value=5000),
            ),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_group_quantiles_binned_matches_exact(spark, rows):
    """The two-level binned quantile (plans/shared.group_quantiles_binned)
    must return exactly what the single-level exact helper returns — the
    bucket decomposition is an internal physical detail — across
    duplicate-heavy multisets, negatives (sign-mirrored buckets),
    singleton groups, nulls (dropped), and all-null groups (absent)."""
    from harvester_database_and_automation_spark.plans.shared import (
        group_quantiles_binned,
        group_quantiles_exact,
    )

    qs = [0.0, 0.25, 0.5, 0.9, 1.0]
    df = spark.createDataFrame(
        [(g, None if v is None else float(v)) for g, v in rows], "g string, v double"
    )
    exact = {
        r["g"]: [r[f"q{i}"] for i in range(len(qs))]
        for r in group_quantiles_exact(df, ["g"], "v", qs).collect()
    }
    binned = {
        r["g"]: [r[f"q{i}"] for i in range(len(qs))]
        for r in group_quantiles_binned(df, ["g"], "v", qs, bins_per_octave=3).collect()
    }
    # exact emits a row for an all-null group (null quantiles); binned
    # omits it — compare on the groups with at least one live value.
    live = {g for g, v in rows if v is not None}
    assert set(binned) == live
    for g in live:
        for e, b in zip(exact[g], binned[g]):
            assert e == b, (g, exact[g], binned[g])


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 1), st.integers(-100, 500), st.integers(0, 400)),
        min_size=0,
        max_size=25,
    ),
    st.lists(
        st.tuples(st.integers(0, 1), st.integers(-150, 950)),
        min_size=0,
        max_size=25,
    ),
)
def test_interval_containment_join_random_equivalence(spark, ivs, pts):
    """Bucketed interval containment == the naive quadratic predicate on
    arbitrary interval lengths (0 to many bucket widths), negative
    coordinates, bucket-boundary points, and empty sides — and each
    qualifying pair appears exactly once."""
    from harvester_database_and_automation_spark.operators.rangejoin import (
        interval_containment_join,
    )

    iv_rows = [(i, str(k), float(s), float(s + ln)) for i, (k, s, ln) in enumerate(ivs)]
    pt_rows = [(100 + i, str(k), float(p)) for i, (k, p) in enumerate(pts)]
    intervals = spark.createDataFrame(iv_rows, "iid int, k string, s double, e double") \
        if iv_rows else spark.createDataFrame([], "iid int, k string, s double, e double")
    points = spark.createDataFrame(pt_rows, "pid int, k string, p double") \
        if pt_rows else spark.createDataFrame([], "pid int, k string, p double")
    out = interval_containment_join(intervals, points, "s", "e", "p", 60.0, extra_on=["k"])
    got = [(r["iid"], r["pid"]) for r in out.collect()]
    want = {
        (iid, pid)
        for iid, ik, s, e in iv_rows
        for pid, pk, p in pt_rows
        if ik == pk and s <= p <= e
    }
    assert set(got) == want
    assert len(got) == len(want)
