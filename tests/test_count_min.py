"""Count-Min sketch: the no-undercount guarantee and cell-wise merge."""

from __future__ import annotations

from pyspark.sql import functions as F

from harvester_database_and_automation_spark.operators.sketches import (
    count_min_cells,
    count_min_estimate,
)


def _stream(spark, spec):
    rows = [(v,) for v, n in spec.items() for _ in range(n)]
    return spark.createDataFrame(rows, "word string")


def test_estimate_never_undercounts(spark):
    spec = {f"w{i}": (i % 7) + 1 for i in range(300)}
    df = _stream(spark, spec)
    cells = count_min_cells(df, "word", width=256, depth=4)
    probes = df.select("word").distinct()
    est = {
        r["word"]: r["cms_estimate"]
        for r in count_min_estimate(cells, probes, "word", width=256, depth=4).collect()
    }
    assert set(est) == set(spec)
    for w, true_n in spec.items():
        assert est[w] >= true_n, f"{w}: estimate {est[w]} < true {true_n}"


def test_wide_sketch_is_exact_for_sparse_stream(spark):
    # 5 keys in a 4096-column grid: collisions are overwhelmingly unlikely,
    # so the estimate equals the exact count.
    spec = {"a": 10, "b": 7, "c": 1, "d": 99, "e": 3}
    df = _stream(spark, spec)
    cells = count_min_cells(df, "word")
    probes = df.select("word").distinct()
    est = {
        r["word"]: r["cms_estimate"]
        for r in count_min_estimate(cells, probes, "word").collect()
    }
    assert est == spec


def test_cells_merge_additively_across_segments(spark):
    # The mergeable-summary property: grid(seg1 ∪ seg2) = grid(seg1) +
    # grid(seg2) cell-wise — what lets 100 TB maintain per-segment
    # sketches and combine them without rescanning.
    s1 = _stream(spark, {"a": 4, "b": 2})
    s2 = _stream(spark, {"a": 1, "c": 5})
    both = s1.union(s2)
    merged = (
        count_min_cells(s1, "word", width=64, depth=2)
        .union(count_min_cells(s2, "word", width=64, depth=2))
        .groupBy("j", "pos")
        .agg(F.sum("c").alias("c"))
    )
    direct = count_min_cells(both, "word", width=64, depth=2)
    as_dict = lambda df: {(r["j"], r["pos"]): r["c"] for r in df.collect()}  # noqa: E731
    assert as_dict(merged) == as_dict(direct)


def test_probe_columns_named_like_internals_and_duplicates_survive(spark):
    # Probe frames may carry columns named j/pos/c, and duplicate probe
    # rows must come back as duplicate rows, one estimate each.
    stream = _stream(spark, {"x": 3, "y": 1})
    cells = count_min_cells(stream, "word", width=64, depth=2)
    probes = spark.createDataFrame(
        [("x", 1, 2, 3), ("x", 1, 2, 3), ("y", 9, 9, 9)], "word string, j int, pos int, c int"
    )
    rows = count_min_estimate(cells, probes, "word", width=64, depth=2).collect()
    assert len(rows) == 3
    by_word = sorted((r["word"], r["cms_estimate"]) for r in rows)
    assert by_word == [("x", 3), ("x", 3), ("y", 1)]
