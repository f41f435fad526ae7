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

import json
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


def _on_disk_versions(table_dir: str) -> list[int]:
    try:
        return sorted(
            int(d[1:]) for d in os.listdir(table_dir) if d.startswith("v") and d[1:].isdigit()
        )
    except FileNotFoundError:
        return []


def _next_version(table_dir: str) -> int:
    """One past the max of (marker, any v-directory on disk) — a crashed
    earlier attempt leaves an orphan v-dir above the marker, and naively
    reusing marker+1 would collide with it forever (`errorifexists`).
    Orphans are skipped here and reclaimed by ``vacuum(drop_failed=True)``."""
    versions = _on_disk_versions(table_dir)
    return max(current_version(table_dir) or 0, versions[-1] if versions else 0) + 1


def publish_versioned(
    df: DataFrame,
    table_dir: str,
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
    metadata: dict | None = None,
) -> int:
    """Write ``df`` as the next version of ``table_dir`` and repoint the
    marker atomically (os.replace). Returns the new version number.
    Old versions remain for time-travel/rollback until vacuumed.

    ``max_records_per_file`` bounds output file size (the chunked-export
    contract, pangolin_lineage_exporter.py:26 generalized); combine with
    operators.layout.cluster_for_write for index-like clustering."""
    os.makedirs(table_dir, exist_ok=True)
    version = _next_version(table_dir)
    writer = df.write.mode("errorifexists")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(os.path.join(table_dir, f"v{version}"))
    if metadata is not None:
        # Written INSIDE the version dir before the marker swap, so the
        # atomic pointer move carries data + metadata together — a crash
        # can never publish one without the other (the streaming sketch
        # sink's batch-id idempotence depends on this).
        with open(
            os.path.join(table_dir, f"v{version}", "_meta.json"), "w", encoding="utf-8"
        ) as fh:
            json.dump(metadata, fh)
    _swap_marker(table_dir, version)
    return version


def published_metadata(table_dir: str) -> dict:
    """The metadata dict published with the CURRENT version; {} when the
    version was published WITHOUT metadata. A present-but-unreadable
    _meta.json raises: consumers (the sketch sink's checkpoint and
    batch-id guards) rely on metadata to prevent double-merges, and
    treating corruption as absence would silently disable exactly those
    guards."""
    version = current_version(table_dir)
    if version is None:
        return {}
    path = os.path.join(table_dir, f"v{version}", "_meta.json")
    try:
        with open(path, encoding="utf-8") as fh:
            return json.load(fh)
    except FileNotFoundError:
        # no metadata published (or the version was vacuumed between the
        # marker read and here) — absence, not corruption
        return {}
    except (OSError, ValueError) as exc:
        raise ValueError(f"unreadable metadata at {path}: {exc}") from exc


def _swap_marker(table_dir: str, version: int) -> None:
    fd, tmp = tempfile.mkstemp(dir=table_dir, prefix=".marker-")
    with os.fdopen(fd, "w", encoding="utf-8") as fh:
        fh.write(str(version))
    os.replace(tmp, os.path.join(table_dir, _MARKER))


def _leaf_partition_dirs(version_dir: str, depth: int) -> list[str]:
    """Relative paths of the leaf partition directories (``lang=de`` or
    ``a=1/b=2``) under a partitioned parquet version directory."""
    leaves: list[str] = []

    def walk(cur: str, rel: str, levels_left: int) -> None:
        for entry in os.listdir(cur):
            path = os.path.join(cur, entry)
            if os.path.isdir(path) and "=" in entry:
                sub = os.path.join(rel, entry) if rel else entry
                if levels_left == 1:
                    leaves.append(sub)
                else:
                    walk(path, sub, levels_left - 1)

    walk(version_dir, "", depth)
    return leaves


_ESCAPE_CHARS = set("\"#%'*/:=?\\\x7f{[]^")


def _escape_path_value(v) -> str:
    """Partition value → hive-style directory fragment, matching Spark's
    path escaping closely enough for string/int/bool keys (the corpus'
    partition columns). Null maps to the hive default-partition name."""
    if v is None:
        return "__HIVE_DEFAULT_PARTITION__"
    if isinstance(v, bool):
        return "true" if v else "false"
    s = str(v)
    return "".join(
        f"%{ord(ch):02X}" if ch in _ESCAPE_CHARS or ord(ch) < 32 else ch for ch in s
    )


def partition_leaves(df: DataFrame, partition_by: list[str]) -> list[str]:
    """Leaf directory names (``k=a``, ``k=a/d=2``) for the distinct
    partition-key tuples present in ``df`` — the same hive-style layout
    the writers produce, so the result can feed
    ``publish_incremental(drop_partitions=...)``. Collects only distinct
    key tuples (partition counts are small by design)."""
    rows = df.select(*partition_by).distinct().collect()
    return sorted(
        "/".join(f"{c}={_escape_path_value(r[c])}" for c in partition_by) for r in rows
    )


def publish_incremental(
    df_partial: DataFrame,
    table_dir: str,
    partition_by: list[str],
    drop_partitions: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> int:
    """Partition-overwrite publish: ``df_partial`` holds ONLY the rows of
    the partitions being replaced. The next version directory gets those
    partitions written fresh, and every other partition HARD-LINKED from
    the previous version — write (and storage) cost is proportional to the
    churn, not the table, while the atomic marker swap and old-version
    rollback of ``publish_versioned`` are preserved.

    This is the custom work SURVEY.md §4 flags for 100 TB derived tables:
    the reference refreshes its materialized views wholesale per ingest
    (database/sql/spectrum/refreshes.sql:3-36); keyed partition overwrite
    keeps the per-ingest cost at O(changed keys). On an object store the
    hard link becomes a manifest entry pointing at the prior version's
    objects; the version/marker protocol is unchanged.

    ``drop_partitions`` lists relative partition paths (``lang=de``) that
    must NOT carry over — partitions whose keys vanished from the source.
    """
    prev = current_version(table_dir)
    if prev is None:
        return publish_versioned(
            df_partial, table_dir, partition_by=partition_by, max_records_per_file=max_records_per_file
        )
    version = _next_version(table_dir)
    new_dir = os.path.join(table_dir, f"v{version}")
    writer = df_partial.write.mode("errorifexists").partitionBy(*partition_by)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(new_dir)

    skip = set(_leaf_partition_dirs(new_dir, len(partition_by))) | set(drop_partitions or ())
    old_dir = os.path.join(table_dir, f"v{prev}")
    for leaf in _leaf_partition_dirs(old_dir, len(partition_by)):
        if leaf in skip:
            continue
        src = os.path.join(old_dir, leaf)
        dst = os.path.join(new_dir, leaf)
        os.makedirs(dst, exist_ok=True)
        for fname in os.listdir(src):
            spath = os.path.join(src, fname)
            if os.path.isfile(spath) and not fname.startswith(("_", ".")):
                os.link(spath, os.path.join(dst, fname))
    _swap_marker(table_dir, version)
    return version


def read_published(spark: SparkSession, table_dir: str) -> DataFrame:
    version = current_version(table_dir)
    if version is None:
        raise FileNotFoundError(f"no published version in {table_dir}")
    return spark.read.parquet(os.path.join(table_dir, f"v{version}"))


def vacuum(table_dir: str, keep: int = 2, drop_failed: bool = False) -> list[int]:
    """Delete all but the newest ``keep`` published versions (never the
    current one). With ``drop_failed`` also remove v-directories NEWER
    than the current marker — the debris of crashed publish attempts
    (safe under the protocol's single-writer assumption; leave False if
    another writer may be mid-publish). Returns the versions removed."""
    import shutil

    cur = current_version(table_dir)
    versions = _on_disk_versions(table_dir)
    # No marker => NOTHING is published: every directory is a potential
    # in-flight first write and must be protected by the default.
    published = [] if cur is None else [v for v in versions if v <= cur]
    orphans = versions if cur is None else [v for v in versions if v > cur]
    to_drop = [v for v in published[:-keep] if v != cur] if keep else [v for v in published if v != cur]
    if drop_failed:
        to_drop += orphans
    for v in to_drop:
        shutil.rmtree(os.path.join(table_dir, f"v{v}"))
    return to_drop


def compact_small_files(
    spark: SparkSession,
    table_dir: str,
    partition_by: list[str],
    target_bytes: int = 128 << 20,
    min_files: int = 2,
) -> tuple[int, list[str]]:
    """Small-file compaction as a maintenance publish: find leaf
    partitions of the CURRENT version holding more (and smaller) files
    than ``target_bytes`` warrants, rewrite ONLY those partitions
    coalesced, and hard-link everything else forward — an atomic new
    version via the same marker swap, so readers never see a half-
    compacted table and rollback stays one marker write away.

    Incremental ingests (streaming micro-batches, per-feed partition
    overwrites) accrete files per partition; scan cost at 100 TB is
    dominated by file count (footer reads + task scheduling), so
    compaction is the OPTIMIZE half of the maintenance pair whose other
    half is :func:`vacuum`. Cost is proportional to the bytes in
    under-sized partitions, never the table.

    Returns ``(version, compacted_leaves)`` — the current version is
    returned unchanged (no new publish) when nothing needs compacting.
    """
    import math

    cur = current_version(table_dir)
    if cur is None:
        raise FileNotFoundError(f"no published version in {table_dir}")
    cur_dir = os.path.join(table_dir, f"v{cur}")

    to_compact: list[str] = []
    leaf_bytes: dict[str, int] = {}
    for leaf in _leaf_partition_dirs(cur_dir, len(partition_by)):
        leaf_dir = os.path.join(cur_dir, leaf)
        sizes = [
            os.path.getsize(os.path.join(leaf_dir, f))
            for f in os.listdir(leaf_dir)
            if not f.startswith(("_", ".")) and os.path.isfile(os.path.join(leaf_dir, f))
        ]
        leaf_bytes[leaf] = sum(sizes)
        needed = max(1, math.ceil(sum(sizes) / target_bytes))
        if len(sizes) >= min_files and len(sizes) > needed:
            to_compact.append(leaf)

    if not to_compact:
        return cur, []

    df = (
        spark.read.option("basePath", cur_dir)
        .parquet(*(os.path.join(cur_dir, leaf) for leaf in to_compact))
        .repartition(*partition_by)
    )
    # Honor target_bytes on the write side: repartition(partition_by)
    # funnels each partition key into ONE task, so without a record cap a
    # big leaf would compact into a single target-busting file. Estimate
    # records-per-target from the leaves' own bytes/row ratio (sizes were
    # collected by the selection pass; count() reads parquet footers, not
    # data pages).
    total_bytes = sum(leaf_bytes[leaf] for leaf in to_compact)
    total_rows = df.count()
    max_records = None
    if total_rows and total_bytes:
        max_records = max(1, int(target_bytes * total_rows / total_bytes))
    version = publish_incremental(
        df, table_dir, partition_by, max_records_per_file=max_records
    )
    return version, to_compact


def publish_group(
    tables: dict[str, DataFrame],
    group_dir: str,
    partition_by: dict[str, list[str]] | None = None,
) -> int:
    """Cross-table transactional publish: write EVERY table of a group
    into one new version directory (``<group>/v<n>/<table>/``), then
    swap the single group marker. Readers resolve the group version
    first, so they always see a CONSISTENT SET — never table A from
    this ingest joined to table B from the previous one.

    This is the Spark stand-in for the reference's multi-table
    transaction (one Postgres COMMIT covers the test + plate + sequence
    tables of an import batch — database/R/utility.R's dbWithTransaction
    wrapper); the per-table :func:`publish_versioned` protocol cannot
    give that guarantee because each table swaps independently.
    Failures before the marker swap leave the group on the old version
    with a dead v-directory to vacuum."""
    if not tables:
        raise ValueError("publish_group needs at least one table")
    os.makedirs(group_dir, exist_ok=True)
    version = _next_version(group_dir)
    vdir = os.path.join(group_dir, f"v{version}")
    for name, df in tables.items():
        writer = df.write.mode("errorifexists")
        pb = (partition_by or {}).get(name)
        if pb:
            writer = writer.partitionBy(*pb)
        writer.parquet(os.path.join(vdir, name))
    _swap_marker(group_dir, version)
    return version


def read_group_table(spark: SparkSession, group_dir: str, table: str) -> DataFrame:
    version = current_version(group_dir)
    if version is None:
        raise FileNotFoundError(f"no published version in {group_dir}")
    return spark.read.parquet(os.path.join(group_dir, f"v{version}", table))


def rollback(table_dir: str) -> int:
    """Repoint the marker at the previous version (one marker write —
    the whole point of the versioned-directory protocol). Raises if no
    earlier version exists on disk. Works for single tables and groups."""
    cur = current_version(table_dir)
    if cur is None:
        raise FileNotFoundError(f"no published version in {table_dir}")
    older = [v for v in _on_disk_versions(table_dir) if v < cur]
    if not older:
        raise ValueError(f"version {cur} has no predecessor to roll back to")
    _swap_marker(table_dir, older[-1])
    return older[-1]
