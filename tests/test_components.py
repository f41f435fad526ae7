"""Unit tests for alternating large-star/small-star connected components
(operators/components.py) against a driver-side union-find reference."""

from __future__ import annotations

import random

import pytest

from harvester_database_and_automation_spark.operators.components import (
    alternating_star_components,
    incremental_components,
)


def _labels(spark, edges: list[tuple[int, int]]) -> dict[int, int]:
    df = spark.createDataFrame(edges, "u bigint, v bigint")
    out = alternating_star_components(df)
    return {r["node"]: r["component_id"] for r in out.collect()}


def _union_find(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # label every node with its component minimum
    comps: dict[int, list[int]] = {}
    for x in parent:
        comps.setdefault(find(x), []).append(x)
    return {x: min(members) for root, members in comps.items() for x in members}


def test_chain_worst_case_diameter(spark):
    edges = [(i, i + 1) for i in range(20)]
    assert _labels(spark, edges) == {i: 0 for i in range(21)}


def test_two_cliques_and_a_bridgeless_pair(spark):
    edges = [(u, v) for u in (10, 11, 12) for v in (10, 11, 12) if u < v]
    edges += [(u, v) for u in (20, 21, 22) for v in (20, 21, 22) if u < v]
    edges += [(30, 31)]
    got = _labels(spark, edges)
    assert got == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 22: 20, 30: 30, 31: 30}


def test_duplicate_reversed_and_self_edges(spark):
    edges = [(1, 2), (2, 1), (1, 2), (3, 3), (2, 4)]
    got = _labels(spark, edges)
    # (3,3) is a self-loop: contributes no edge, node 3 never appears
    assert got == {1: 1, 2: 1, 4: 1}


def test_empty_edge_list(spark):
    df = spark.createDataFrame([], "u bigint, v bigint")
    assert alternating_star_components(df).count() == 0


@pytest.mark.parametrize("seed", [7, 41])
def test_random_graph_matches_union_find(spark, seed):
    rng = random.Random(seed)
    nodes = list(range(200))
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(120)]
    edges = [(u, v) for u, v in edges if u != v]
    assert _labels(spark, edges) == _union_find(edges)


def _incremental_labels(
    spark, old_edges: list[tuple[int, int]], new_edges: list[tuple[int, int]]
) -> dict[int, int]:
    base = alternating_star_components(
        spark.createDataFrame(old_edges, "u bigint, v bigint")
    )
    out = incremental_components(
        base, spark.createDataFrame(new_edges, "u bigint, v bigint")
    )
    return {r["node"]: r["component_id"] for r in out.collect()}


def test_incremental_merges_existing_components(spark):
    old = [(1, 2), (10, 11), (20, 21)]
    # One bridge between two old clusters, one brand-new pair, one edge
    # from a new node into an old cluster.
    new = [(2, 10), (30, 31), (21, 40)]
    assert _incremental_labels(spark, old, new) == _union_find(old + new)


def test_incremental_noop_edge_inside_component(spark):
    old = [(1, 2), (2, 3)]
    new = [(1, 3)]  # both endpoints already share a component
    assert _incremental_labels(spark, old, new) == _union_find(old)


def test_incremental_empty_new_edges(spark):
    old = [(5, 6)]
    new: list[tuple[int, int]] = []
    base = alternating_star_components(spark.createDataFrame(old, "u bigint, v bigint"))
    out = incremental_components(
        base, spark.createDataFrame(new, "u bigint, v bigint")
    )
    assert {r["node"]: r["component_id"] for r in out.collect()} == {5: 5, 6: 5}


@pytest.mark.parametrize("seed", [13, 99])
def test_incremental_equals_full_recontraction(spark, seed):
    """The promised maintenance property: folding a second batch of edges
    into the published map equals re-contracting everything from scratch."""
    rng = random.Random(seed)
    nodes = list(range(150))
    all_edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(140)]
    all_edges = [(u, v) for u, v in all_edges if u != v]
    cut = len(all_edges) * 2 // 3
    old, new = all_edges[:cut], all_edges[cut:]
    assert _incremental_labels(spark, old, new) == _labels(spark, all_edges)
