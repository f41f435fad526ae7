"""Session-scoped shared subplans.

Several registered queries consume the same expensive intermediate — the
exploded mutation table feeds K1/K3/K4/lineage counts, the shingle table
feeds the whole Jaccard/MinHash dedup family. Re-deriving that subtree per
query is pure waste in any session that runs more than one of them (the
bench harness, a notebook, a scheduled report batch), so the first consumer
materializes it with ``persist(MEMORY_AND_DISK)`` and later consumers reuse
the cached partitions.

This mirrors the reference's design, where those intermediates are *tables*
(``consensus_sequence_mutation_nucleotide``, populated once and queried by
every downstream report — /root/reference/database/init.sql:403-410) rather
than per-query recomputations.

Scale note (100 TB): what is a ``persist`` here becomes a materialized
derived table via ``operators/publish.py`` on a real cluster — the cache is
the single-session analogue, not the deployment strategy. Only narrow
post-aggregation frames (mutation triples, shingle ids, signature sets) are
ever cached; raw text/genome payloads stay in the scan.
"""

from __future__ import annotations

from typing import Callable

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession

_ATTR = "_hdas_shared_plans"


def fanout(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the session's shuffle parallelism, but
    ONLY when the scan is under-split (the local test corpus is one parquet
    file per table, so heavy per-row map work would otherwise run as a
    single task). A real 100 TB corpus already scans as thousands of splits
    — repartitioning there would ship every payload through a pure-waste
    shuffle, so it is skipped.

    Split detection estimates the scan's partition count from its input
    files' on-disk sizes (sum of ceil(size / maxPartitionBytes)) — the
    same arithmetic FilePartition uses, at the cost of a file listing.
    The previous probe, ``df.rdd.getNumPartitions()``, forced a full
    plan-to-RDD conversion worth 0.1-1s of driver time PER QUERY; the
    listing is ~10x cheaper and warm-cached by the session catalog.
    Frames with no file inputs (in-memory ranges, streaming) fall back to
    the RDD probe."""
    import os

    spark = df.sparkSession
    n = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    files = df.inputFiles()
    if files:
        raw = spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728b")
        max_bytes = int("".join(ch for ch in raw if ch.isdigit()) or "134217728")
        splits = 0
        for f in files:
            path = f.removeprefix("file://").removeprefix("file:")
            try:
                size = os.path.getsize(path)
            except OSError:
                return df  # non-local storage: trust the scan's own splitting
            splits += -(-size // max_bytes)
        if splits >= n:
            return df
        return df.repartition(n)
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)


def shared_df(spark: SparkSession, key: tuple, builder: Callable[[], DataFrame]) -> DataFrame:
    """Return the session-cached DataFrame for ``key``, building + persisting
    it on first use. ``key`` must include every input the plan depends on
    (at minimum the sf_dir)."""
    cache: dict = spark.__dict__.setdefault(_ATTR, {})
    df = cache.get(key)
    if df is None:
        df = builder().persist(StorageLevel.MEMORY_AND_DISK)
        cache[key] = df
    return df


def group_quantiles_exact(df: DataFrame, group_cols: list, value_col: str, qs: list):
    """EXACT continuous quantiles per group without holistic buffers.

    ``percentile(col, q)`` buffers every value of a group in one
    aggregation buffer — an executor-memory bomb on large groups (the
    lesson of `lineitem_column_profile`, SCALING.json's former worst
    entry). Instead: aggregate the VALUE DISTRIBUTION (groupBy value —
    map-side combinable, the shuffle carries NDV rows), running-total it
    per group, and read the two ranks bracketing each continuous
    position p = q·(n−1) with conditional aggregates, interpolating
    v_lo + frac·(v_hi − v_lo) exactly as quantile_cont defines. Nulls
    are dropped first (quantile semantics). Returns one row per group
    with columns q0..q{len(qs)-1}; memory is bounded by the spillable
    hash agg and a sort window over pre-aggregated rows."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    dist = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*group_cols, value_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy(*group_cols)
    cumf = dist.withColumn("cum", F.sum("cnt").over(w.orderBy(value_col))).withColumn(
        "n_val", F.max("cum").over(w)
    )
    aggs = [F.max("n_val").alias("_n_val")]
    for i, q in enumerate(qs):
        p = F.lit(q) * (F.col("n_val") - 1)
        lo_in = (F.floor(p) >= F.col("cum") - F.col("cnt")) & (F.floor(p) <= F.col("cum") - 1)
        hi_in = (F.ceil(p) >= F.col("cum") - F.col("cnt")) & (F.ceil(p) <= F.col("cum") - 1)
        aggs += [
            F.max(F.when(lo_in, F.col(value_col))).alias(f"_vlo{i}"),
            F.max(F.when(hi_in, F.col(value_col))).alias(f"_vhi{i}"),
        ]
    prof = cumf.groupBy(*group_cols).agg(*aggs)
    out = []
    for i, q in enumerate(qs):
        p = F.lit(q) * (F.col("_n_val") - 1)
        frac = p - F.floor(p)
        out.append(
            (F.col(f"_vlo{i}") + frac * (F.col(f"_vhi{i}") - F.col(f"_vlo{i}"))).alias(f"q{i}")
        )
    return prof.select(*group_cols, *out)


def clear_shared(spark: SparkSession) -> None:
    """Unpersist and drop every shared subplan (test isolation hook)."""
    cache: dict = spark.__dict__.pop(_ATTR, {})
    for df in cache.values():
        try:
            df.unpersist()
        except Exception:
            pass
