"""S1 — JDBC table scan / insert (SURVEY.md §2.1).

The reference's sole database access path is JDBC/DBI: R's
``dbGetQuery(db, "SELECT ...")`` (database/R/utility.R:413-416) and Java's
pooled JDBC writers (database/java/.../gisaid/BatchProcessingWorker.java:
443-666). The sanctioned Spark-first translation is the parquet catalog
(catalog.py), which every registered query uses; this module is the
*literal* S1 connector for deployments where an operational RDBMS remains
the system of record.

Spark-first posture:

- ``spark.read.jdbc`` gives Catalyst a JDBCRelation, so filters and column
  pruning are pushed into the remote SQL (``PushedFilters`` in the scan) —
  the database does the selection, Spark never ships dead rows.
- A single-connection read is a 1-partition scan; for big tables callers
  MUST pass ``partition_column/lower/upper/num_partitions`` (range
  splitting) or explicit ``predicates`` (one WHERE clause per partition) so
  the scan parallelizes across executors. At 100 TB the JDBC path is for
  dimension/metadata tables only — fact-scale data belongs in parquet.
- Writes go through ``append`` on a staging table; MERGE semantics stay in
  operators/merge.py (the database-side upsert the reference hand-writes in
  SQL is expressed there as a Spark plan over the staged rows).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    driver: str | None = None,
    properties: dict[str, str] | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    predicates: Sequence[str] | None = None,
    fetch_size: int = 10_000,
) -> DataFrame:
    """Scan ``table`` (a table name or ``(subquery) alias``) over JDBC.

    Exactly one parallelism mode: range-partitioned (``partition_column`` +
    bounds + ``num_partitions``), predicate-partitioned (``predicates``,
    one per task), or single-connection (neither — dimension tables only).
    """
    if predicates is not None and partition_column is not None:
        raise ValueError("pass either partition_column bounds or predicates, not both")

    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", fetch_size)
    )
    if driver:
        reader = reader.option("driver", driver)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)

    if partition_column is not None:
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError("partition_column requires lower_bound, upper_bound, num_partitions")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", lower_bound)
            .option("upperBound", upper_bound)
            .option("numPartitions", num_partitions)
        )
        return reader.load()

    if predicates is not None:
        props = dict(properties or {})
        if driver:
            props["driver"] = driver
        props.setdefault("fetchsize", str(fetch_size))
        return spark.read.jdbc(url, table, predicates=list(predicates), properties=props)

    return reader.load()


def write_jdbc_append(
    df: DataFrame,
    url: str,
    table: str,
    *,
    driver: str | None = None,
    properties: dict[str, str] | None = None,
    batch_size: int = 10_000,
    num_partitions: int | None = None,
) -> None:
    """Append ``df`` to ``table`` with batched inserts (one connection per
    partition — cap with ``num_partitions`` so the pool isn't exhausted,
    mirroring the reference's bounded worker pool in
    BatchProcessingWorker.java:443-666)."""
    if num_partitions is not None:
        df = df.coalesce(num_partitions)
    writer = (
        df.write.format("jdbc")
        .mode("append")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", batch_size)
    )
    if driver:
        writer = writer.option("driver", driver)
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()
