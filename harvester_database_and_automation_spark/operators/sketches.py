"""Streaming-sketch operators: exact heavy hitters via a distributed
Misra-Gries candidate pass.

"Which items exceed 1/k of all occurrences" over 100 TB cannot be answered
by a full groupBy when the key space is huge (every distinct item shuffles).
The two-pass sketch shape fixes that:

1. **Candidate pass** — per input partition, a Misra-Gries summary with
   capacity 2k (mapInPandas: the iterator covers the whole partition, so
   one summary per partition, shipped as ≤2k rows). MG's deficiency bound
   guarantees any item with global frequency ≥ n/k survives in at least
   one partition summary: per-partition undercount ≤ n_p/(2k+1), summing
   to ≤ n/(2k+1) < n/k, so a true heavy hitter cannot be decremented to
   zero everywhere.
2. **Exact pass** — semi-join the corpus to the (broadcast, ≤2k·P row)
   candidate set and count ONLY those items exactly; filter
   ``count·k ≥ n``. The shuffle now carries candidate items only.

Result: exact answers (no false positives/negatives, unlike plain
approximate sketches), with shuffle volume proportional to candidates, not
distinct items. MG here is genuinely inexpressible in DataFrame ops —
per-row conditional counter eviction — hence the Arrow-batched Python; the
hot path (counting) stays JVM-side.

Misra, Gries (1982), "Finding repeated elements"; the distributed merge
argument follows Agarwal et al. (2013), "Mergeable summaries".
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def merge_mg_summary(counters: dict, batch_counts: dict, cap: int) -> dict:
    """Fold one batch's exact counts into a running Misra-Gries summary of
    capacity ``cap`` (the Agarwal et al. mergeable-summaries step): add the
    counts, then if over capacity subtract the (cap+1)-th largest counter
    from every counter and drop the non-positives.

    Guarantee (the property tests gate it): after folding any batch
    sequence with total mass n, every item with true frequency > n/(cap+1)
    still has a positive counter — each prune subtracts sub from > cap
    counters while removing >= sub*(cap+1) total mass, so the total
    undercount of any single item is <= n/(cap+1)."""
    for v, c in batch_counts.items():
        counters[v] = counters.get(v, 0) + int(c)
    if len(counters) > cap:
        sub = sorted(counters.values(), reverse=True)[cap]
        counters = {key: c - sub for key, c in counters.items() if c > sub}
    return counters


def heavy_hitters_exact(df: DataFrame, col: str, k: int) -> DataFrame:
    """Items of ``df[col]`` occurring at least ``1/k`` of total rows, with
    exact counts: (item, n_occurrences). NULLs are ignored."""
    if k < 2:
        raise ValueError("k must be >= 2")
    cap = 2 * k
    field = df.schema[col]
    out_schema = T.StructType([T.StructField(col, field.dataType)])
    src = df.select(col).filter(F.col(col).isNotNull())

    def mg_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Batch-merged Misra-Gries (the mergeable-summaries form): count
        # each Arrow batch vectorized (value_counts is C-speed — a per-row
        # Python loop here measured ~10x slower), fold the batch summary
        # into the running one, and when over capacity subtract the
        # (cap+1)-th largest count from every counter and drop the
        # non-positives. Each prune removes >= sub*(cap+1) mass, so the
        # total undercount stays <= n_p/(cap+1) — the same deficiency
        # bound as element-wise MG, so the candidate guarantee holds.
        counters: dict = {}
        for pdf in batches:
            counters = merge_mg_summary(counters, pdf[col].value_counts().to_dict(), cap)
        yield pd.DataFrame({col: list(counters.keys())})

    candidates = src.mapInPandas(mg_partition, schema=out_schema).distinct()
    total = src.agg(F.count(F.lit(1)).alias("_hh_n"))
    return (
        src.join(F.broadcast(candidates), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("n_occurrences") * k >= F.col("_hh_n"))
        .drop("_hh_n")
    )


# ---------------------------------------------------------------------------
# Count-Min frequency sketch (Cormode & Muthukrishnan 2005).
# ---------------------------------------------------------------------------
def count_min_cells(
    df: DataFrame, expr: str, width: int = 1024, depth: int = 4
) -> DataFrame:
    """Build a Count-Min sketch over the occurrences of key expression
    ``expr``: a (depth x width) counter grid as a (j, pos, c) DataFrame
    (<= depth*width rows). Row j's column for a key is the same split-md5
    double hash as ``operators/bloom.py`` — deterministic, so a SQL oracle
    rebuilds the identical grid.

    Scale shape: one explode (depth small ints per occurrence) into one
    partial-aggregated groupBy — the sketch is a fixed-size mergeable
    summary (cells of two runs ADD), so per-segment sketches maintain
    under union exactly like the KMV sketch algebra. The raw key stream
    never shuffles; only (j, pos) pairs do."""
    from harvester_database_and_automation_spark.operators.bloom import bloom_position_sql

    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        F.expr(bloom_position_sql(expr, j, width)).alias("pos"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("cell")
    )
    return cells.groupBy(F.col("cell.j").alias("j"), F.col("cell.pos").alias("pos")).agg(
        F.count(F.lit(1)).alias("c")
    )


def count_min_estimate(
    cells: DataFrame, probes: DataFrame, expr: str, width: int = 1024, depth: int = 4
) -> DataFrame:
    """Estimate each probe key's frequency from a ``count_min_cells`` grid:
    min over the depth rows of the addressed counters. Never undercounts
    (every occurrence of the key incremented all its cells); overcounts by
    whatever collided, bounded by e*n/width with probability 1-e^-depth.
    Adds ``cms_estimate`` to the probe frame. The grid is tiny — broadcast
    join, probes never shuffle."""
    from harvester_database_and_automation_spark.operators.bloom import bloom_position_sql

    # Internal names are _cms_-prefixed and the regroup key is a synthetic
    # row id, so probe frames may carry columns named j/pos/c and
    # duplicate probe rows come back as duplicate rows (one estimate
    # each), matching the "adds cms_estimate to the probe frame" contract.
    with_id = probes.withColumn("_cms_rid", F.monotonically_increasing_id())
    keyed = with_id.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        F.expr(bloom_position_sql(expr, j, width)).alias("pos"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("_cms_cell"),
    ).select(
        "*",
        F.col("_cms_cell.j").alias("_cms_j"),
        F.col("_cms_cell.pos").alias("_cms_pos"),
    ).drop("_cms_cell")
    grid = cells.select(
        F.col("j").alias("_cms_j"), F.col("pos").alias("_cms_pos"), F.col("c").alias("_cms_c")
    )
    joined = keyed.join(F.broadcast(grid), ["_cms_j", "_cms_pos"], "left")
    group_cols = ["_cms_rid", *probes.columns]
    return (
        joined.groupBy(*group_cols)
        .agg(F.min(F.coalesce(F.col("_cms_c"), F.lit(0))).alias("cms_estimate"))
        .drop("_cms_rid")
    )
