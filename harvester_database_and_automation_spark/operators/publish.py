"""M4 — atomic publish by versioned directories.

The reference publishes with staging tables renamed over live ones
(database/R/automation/auto_import_gisaid.R:59-67, materialized-view swap
at database/sql/spectrum/sequences_gisaid_api_based.sql:506-521).

Without a transactional table format, the Spark equivalent is: write the
new snapshot to ``<table>/v<n+1>/`` and then atomically repoint a tiny
``_CURRENT`` marker file. Readers resolve the marker first, so they see
either the old or the new version, never a half-written directory.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

_MARKER = "_CURRENT"


def current_version(table_dir: str) -> int | None:
    marker = os.path.join(table_dir, _MARKER)
    if not os.path.exists(marker):
        return None
    with open(marker, encoding="utf-8") as fh:
        return int(fh.read().strip())


def publish_versioned(
    df: DataFrame,
    table_dir: str,
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> int:
    """Write ``df`` as the next version of ``table_dir`` and repoint the
    marker atomically (os.replace). Returns the new version number.
    Old versions remain for time-travel/rollback until vacuumed.

    ``max_records_per_file`` bounds output file size (the chunked-export
    contract, pangolin_lineage_exporter.py:26 generalized); combine with
    operators.layout.cluster_for_write for index-like clustering."""
    os.makedirs(table_dir, exist_ok=True)
    version = (current_version(table_dir) or 0) + 1
    writer = df.write.mode("errorifexists")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(os.path.join(table_dir, f"v{version}"))
    fd, tmp = tempfile.mkstemp(dir=table_dir, prefix=".marker-")
    with os.fdopen(fd, "w", encoding="utf-8") as fh:
        fh.write(str(version))
    os.replace(tmp, os.path.join(table_dir, _MARKER))
    return version


def read_published(spark: SparkSession, table_dir: str) -> DataFrame:
    version = current_version(table_dir)
    if version is None:
        raise FileNotFoundError(f"no published version in {table_dir}")
    return spark.read.parquet(os.path.join(table_dir, f"v{version}"))


def vacuum(table_dir: str, keep: int = 2) -> list[int]:
    """Delete all but the newest ``keep`` published versions (never the
    current one). Returns the versions removed."""
    import shutil

    cur = current_version(table_dir)
    versions = sorted(
        int(d[1:]) for d in os.listdir(table_dir) if d.startswith("v") and d[1:].isdigit()
    )
    to_drop = [v for v in versions[:-keep] if v != cur] if keep else [v for v in versions if v != cur]
    for v in to_drop:
        shutil.rmtree(os.path.join(table_dir, f"v{v}"))
    return to_drop
