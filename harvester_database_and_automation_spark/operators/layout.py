"""Table layout for scale: partitioning + clustering replace indexes.

The reference leans on ~90 PostgreSQL b-tree indexes
(database/init.sql:196-238, 1095-1109). Spark tables get the same read
selectivity from physical layout instead (SURVEY.md §4): directory
partitioning prunes whole partitions at planning time, and sorting within
partitions tightens parquet row-group min/max stats so scans skip pages
for clustered predicates — the moral equivalent of a composite index like
``(position, mutation)`` on the mutation tables.

``cluster_for_write`` produces the write-ready DataFrame; pass its result
(plus the same ``partition_by`` and a ``max_records_per_file``) to
``publish_versioned`` for an atomic, well-laid-out partitioned publish.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def cluster_for_write(
    df: DataFrame,
    partition_by: Sequence[str],
    cluster_by: Sequence[str] = (),
) -> DataFrame:
    """Arrange ``df`` so a partitioned write produces a healthy layout.

    - ``repartition(partition_by)``: every output directory is written by
      as few tasks as hold its data — no small-file explosion of
      (tasks × partitions) files.
    - ``sortWithinPartitions(partition_by + cluster_by)``: rows for one
      directory are contiguous within the task, and clustered columns get
      tight row-group min/max bounds (index-like page skipping for
      range/equality predicates on them).

    Skew note: one hot partition value still lands in one task here; for
    a hot-date/hot-lineage table add a salt column to the repartition
    keys at write time or let AQE rebalance — correctness is unaffected,
    the layout just gets more files.
    """
    cols = [*partition_by, *cluster_by]
    if not cols:
        raise ValueError("need at least one partition or cluster column")
    out = df.repartition(*partition_by) if partition_by else df
    return out.sortWithinPartitions(*cols)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    keys: Sequence[str],
    n_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Hash-bucketed + sorted external parquet table.

    Two tables bucketed on their join keys with the SAME bucket count
    join with NO shuffle on either side — the co-located join strategy for
    the hub tables the reference serves with b-tree-indexed FK joins
    (test/plate bridges, sequence/mutation children). Pre-paying one
    clustered write removes the dominant exchange from every subsequent
    join and aggregation on those keys; repeated daily joins at 100 TB are
    exactly where this wins.

    Spark only honors bucket metadata through the catalog, so this writes
    an EXTERNAL table (explicit ``path``); read it back with
    ``spark.table(table_name)``, not ``spark.read.parquet``.
    """
    (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(n_buckets, *keys)
        .sortBy(*(sort_cols or keys))
        .option("path", path)
        .saveAsTable(table_name)
    )
