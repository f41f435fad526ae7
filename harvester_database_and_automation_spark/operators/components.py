"""Connected components over a distributed edge list via alternating
large-star / small-star contraction (Kiveris et al., "Connected Components
in MapReduce and Beyond", SoCC'14).

Why it exists: the near-dup machinery (MinHash/LSH banding, n-gram Jaccard,
SimHash — plans/text.py) produces candidate PAIRS, but deduplicating a
corpus needs GROUPS: every document labeled with a cluster id so one
canonical representative survives. The reference only ever dedups by exact
key or per-group argmin windows (its strongest form is the not-exists
argmin at database/sql/spectrum/sequences_gisaid_api_based.sql:60-78);
transitive pair-closure is the training-data-pipeline extension.

Scale shape: each round is two hash aggregations + two equi-joins over the
(int, int) edge list — no adjacency matrix, no driver-side graph. The
alternation provably converges in O(log^2 n) rounds (O(log n) in practice;
dup clusters are near-cliques and finish in 2-3). Lineage is truncated with
``localCheckpoint`` per round so the plan does not grow with iterations,
and convergence is detected from a (count, hash-sum) signature — one tiny
action per round, never a ``collect`` of the edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(N(u) ∪ {u}).

    Input/output edges are (u, v) pairs; output is oriented big → small.
    """
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = (
        sym.groupBy("u")
        .agg(F.min("v").alias("_mnv"))
        .select("u", F.least("_mnv", F.col("u")).alias("m"))
    )
    return (
        sym.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Connect every smaller neighbor of u (and u itself) to min(N⁻(u)).

    Requires edges oriented big → small (u > v); preserves that invariant.
    """
    m = edges.groupBy("u").agg(F.min("v").alias("m"))
    moved = (
        edges.join(m, "u")
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    rooted = m.select("u", F.col("m").alias("v"))
    return moved.union(rooted).distinct()


def alternating_star_components(
    edges: DataFrame, src: str = "u", dst: str = "v", max_rounds: int = 30
) -> DataFrame:
    """Label every node appearing in ``edges`` with its component minimum.

    Returns a DataFrame (node, component_id). Isolated nodes (absent from
    the edge list) are the caller's concern — coalesce to the node's own id
    after a left join, as ``dup_connected_components`` does.
    """
    cur = (
        edges.select(
            F.greatest(F.col(src), F.col(dst)).alias("u"),
            F.least(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev_sig = None
    for _ in range(max_rounds):
        cur = _small_star(_large_star(cur)).localCheckpoint(eager=True)
        row = cur.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
        ).first()
        sig = (row["n"], row["h"])
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(f"star contraction did not converge in {max_rounds} rounds")
    members = (
        cur.groupBy("u")
        .agg(F.min("v").alias("component_id"))
        .select(F.col("u").alias("node"), "component_id")
    )
    roots = (
        cur.select(F.col("v").alias("node"))
        .distinct()
        .join(cur.select(F.col("u").alias("node")).distinct(), "node", "left_anti")
        .select("node", F.col("node").alias("component_id"))
    )
    return members.union(roots)


def incremental_components(
    component_map: DataFrame,
    new_edges: DataFrame,
    src: str = "u",
    dst: str = "v",
    max_rounds: int = 30,
) -> DataFrame:
    """Fold NEW candidate pairs into an existing ``(node, component_id)``
    map without re-contracting the historical edge list — the 100 TB
    maintenance path ARCHITECTURE.md promises: per-ingest cost is
    proportional to the NEW pairs (plus the size of the label map joins),
    not to every pair ever seen.

    Correctness: components are transitive closures, so a new edge only
    matters through the components of its endpoints. Each new edge is
    root-translated (endpoint → its current component id, or itself if
    unseen), the tiny root-graph is contracted with the same alternating-
    star kernel, and the resulting root relabels broadcast back over the
    map. Component ids remain the component-minimum node id because old
    ids are exactly the old minima and unseen nodes contribute their own
    ids — the min over merged roots is the global min.

    ``component_map`` must be complete (every clustered node has a row;
    roots map to themselves), as produced by
    ``alternating_star_components`` or a previous call of this function.
    Returns the updated complete map (old nodes + nodes introduced by
    ``new_edges``).
    """
    pairs = new_edges.select(F.col(src).alias("_a"), F.col(dst).alias("_b"))
    root_a = component_map.select(
        F.col("node").alias("_a"), F.col("component_id").alias("_ra")
    )
    root_b = component_map.select(
        F.col("node").alias("_b"), F.col("component_id").alias("_rb")
    )
    root_edges = (
        pairs.join(root_a, "_a", "left")
        .join(root_b, "_b", "left")
        .select(
            F.coalesce("_ra", "_a").alias("u"),
            F.coalesce("_rb", "_b").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    relabel = alternating_star_components(root_edges, max_rounds=max_rounds).select(
        F.col("node").alias("component_id"), F.col("component_id").alias("_new_root")
    )
    updated = (
        component_map.join(relabel, "component_id", "left")
        .select("node", F.coalesce("_new_root", "component_id").alias("component_id"))
    )
    introduced = (
        relabel.select(F.col("component_id").alias("node"), F.col("_new_root").alias("component_id"))
        .join(component_map.select("node"), "node", "left_anti")
    )
    return updated.union(introduced)
