"""Partition-overwrite incremental publish (operators/publish.py::
publish_incremental) and the derived layer's incremental rebuild."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from harvester_database_and_automation_spark.operators.publish import (
    publish_incremental,
    publish_versioned,
    read_published,
)


def _rows(spark, data):
    return spark.createDataFrame(data, "k string, v int")


def _inodes(table_dir: str, version: int, leaf: str) -> set[int]:
    d = os.path.join(table_dir, f"v{version}", leaf)
    return {
        os.stat(os.path.join(d, f)).st_ino
        for f in os.listdir(d)
        if not f.startswith(("_", "."))
    }


def test_incremental_overwrites_only_named_partitions(spark, tmp_path):
    table = str(tmp_path / "t")
    full = _rows(spark, [("a", 1), ("a", 2), ("b", 10), ("c", 100)])
    assert publish_versioned(full, table, partition_by=["k"]) == 1

    # Replace partition a only; b and c must carry over by hard link.
    v2 = publish_incremental(_rows(spark, [("a", 7)]), table, partition_by=["k"])
    assert v2 == 2
    got = {(r["k"], r["v"]) for r in read_published(spark, table).collect()}
    assert got == {("a", 7), ("b", 10), ("c", 100)}
    # Unchanged partitions share inodes with v1 (no rewrite, no copy).
    assert _inodes(table, 2, "k=b") == _inodes(table, 1, "k=b")
    assert _inodes(table, 2, "k=c") == _inodes(table, 1, "k=c")
    assert _inodes(table, 2, "k=a") != _inodes(table, 1, "k=a")
    # Previous version still reads intact (rollback is a marker move).
    v1 = spark.read.parquet(os.path.join(table, "v1"))
    assert v1.count() == 4


def test_incremental_drop_partitions(spark, tmp_path):
    table = str(tmp_path / "t")
    publish_versioned(_rows(spark, [("a", 1), ("b", 2)]), table, partition_by=["k"])
    publish_incremental(
        _rows(spark, [("a", 5)]), table, partition_by=["k"], drop_partitions=["k=b"]
    )
    got = {(r["k"], r["v"]) for r in read_published(spark, table).collect()}
    assert got == {("a", 5)}


def test_incremental_first_publish_falls_back_to_full(spark, tmp_path):
    table = str(tmp_path / "t")
    v = publish_incremental(_rows(spark, [("a", 1)]), table, partition_by=["k"])
    assert v == 1
    assert read_published(spark, table).count() == 1


def test_multi_level_partitioning(spark, tmp_path):
    table = str(tmp_path / "t")
    df = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 20), ("b", 1, 30)], "k string, d int, v int"
    )
    publish_versioned(df, table, partition_by=["k", "d"])
    part = spark.createDataFrame([("a", 1, 99)], "k string, d int, v int")
    publish_incremental(part, table, partition_by=["k", "d"])
    got = {(r["k"], r["d"], r["v"]) for r in read_published(spark, table).collect()}
    assert got == {("a", 1, 99), ("a", 2, 20), ("b", 1, 30)}
    assert _inodes(table, 2, "k=a/d=2") == _inodes(table, 1, "k=a/d=2")


def test_derived_layer_incremental_rebuild(spark, tmp_path):
    from harvester_database_and_automation_spark.pipelines.derived import LAYER

    out = str(tmp_path / "derived")
    LAYER.rebuild(spark, "/root/testdata/sf0.001", out)
    before = {
        tuple(r) for r in read_published(spark, f"{out}/lineage_mutation_counts").collect()
    }
    langs = [r["lang"] for r in
             read_published(spark, f"{out}/lineage_mutation_counts")
             .select("lang").distinct().collect()]
    target = sorted(langs)[0]

    versions = LAYER.rebuild_incremental(
        spark,
        "/root/testdata/sf0.001",
        out,
        {"lineage_mutation_counts": F.col("lang") == target},
    )
    assert versions == {"lineage_mutation_counts": 2}
    # Inputs unchanged → incremental result identical to the full build.
    after = {
        tuple(r) for r in read_published(spark, f"{out}/lineage_mutation_counts").collect()
    }
    assert after == before

    # A table without partition_by refuses incremental rebuild.
    with pytest.raises(ValueError, match="partition_by"):
        LAYER.rebuild_incremental(
            spark, "/root/testdata/sf0.001", out, {"weekly_dashboard": F.lit(True)}
        )


def test_derived_incremental_drops_vanished_partitions(spark, tmp_path):
    """A partition whose keys disappear from the source must not be
    hard-linked forward: the incremental rebuild must equal a full one."""
    from harvester_database_and_automation_spark.pipelines.derived import DerivedLayer

    src = str(tmp_path / "src")
    out = str(tmp_path / "derived")
    layer = DerivedLayer()

    @layer.register("by_lang", partition_by=("lang",))
    def by_lang(spark, sf_dir, deps):
        return spark.read.parquet(sf_dir).groupBy("lang").agg(F.sum("v").alias("total"))

    spark.createDataFrame(
        [("de", 1), ("de", 2), ("fr", 10)], "lang string, v int"
    ).write.parquet(src)
    layer.rebuild(spark, src, out)

    # fr vanishes from the source entirely.
    spark.createDataFrame([("de", 5)], "lang string, v int").write.mode("overwrite").parquet(src)
    layer.rebuild_incremental(spark, src, out, {"by_lang": F.lit(True)})
    got = {(r["lang"], r["total"]) for r in read_published(spark, f"{out}/by_lang").collect()}
    assert got == {("de", 5)}, "stale fr partition must be dropped, de overwritten"

    # Partitions the predicate does NOT match carry over untouched, even
    # if their keys are gone from the source.
    spark.createDataFrame(
        [("de", 7), ("it", 3)], "lang string, v int"
    ).write.mode("overwrite").parquet(src)
    layer.rebuild_incremental(spark, src, out, {"by_lang": F.col("lang") == "it"})
    spark.createDataFrame([("de", 9)], "lang string, v int").write.mode("overwrite").parquet(src)
    layer.rebuild_incremental(spark, src, out, {"by_lang": F.col("lang") == "de"})
    got = {(r["lang"], r["total"]) for r in read_published(spark, f"{out}/by_lang").collect()}
    assert got == {("de", 9), ("it", 3)}


def test_partition_leaves_formatting(spark):
    from harvester_database_and_automation_spark.operators.publish import partition_leaves

    df = spark.createDataFrame(
        [("de", 1), ("a b", 2), (None, 3)], "lang string, d int"
    )
    assert partition_leaves(df, ["lang", "d"]) == [
        "lang=__HIVE_DEFAULT_PARTITION__/d=3",
        "lang=a b/d=2",
        "lang=de/d=1",
    ]


def test_vacuum_after_incremental_keeps_linked_partitions_readable(spark, tmp_path):
    """Old-version deletion must not corrupt the current version: carried
    partitions are hard links, so the inode survives the rmtree."""
    from harvester_database_and_automation_spark.operators.publish import vacuum

    table = str(tmp_path / "t")
    publish_versioned(_rows(spark, [("a", 1), ("b", 10)]), table, partition_by=["k"])
    publish_incremental(_rows(spark, [("a", 2)]), table, partition_by=["k"])
    dropped = vacuum(table, keep=1)
    assert dropped == [1]
    got = {(r["k"], r["v"]) for r in read_published(spark, table).collect()}
    assert got == {("a", 2), ("b", 10)}


def test_compaction_rewrites_only_fragmented_partitions(spark, tmp_path):
    from harvester_database_and_automation_spark.operators.publish import (
        compact_small_files,
    )

    table = str(tmp_path / "t")
    # Partition a: fragmented into ~5 files; partition b: already 1 file.
    frag = _rows(spark, [("a", i) for i in range(50)]).repartition(5)
    one = _rows(spark, [("b", 100)]).coalesce(1)
    publish_versioned(frag.unionByName(one), table, partition_by=["k"])

    before = read_published(spark, table)
    n_files_a = len(
        [f for f in os.listdir(os.path.join(table, "v1", "k=a")) if not f.startswith(("_", "."))]
    )
    assert n_files_a >= 2
    b_inodes = _inodes(table, 1, "k=b")
    expect = {(r["k"], r["v"]) for r in before.collect()}

    version, compacted = compact_small_files(spark, table, ["k"], target_bytes=1 << 30)
    assert version == 2
    assert compacted == ["k=a"]
    after = read_published(spark, table)
    assert {(r["k"], r["v"]) for r in after.collect()} == expect
    # a is rewritten down to one file; b carried forward by hard link.
    n_files_a2 = len(
        [f for f in os.listdir(os.path.join(table, "v2", "k=a")) if not f.startswith(("_", "."))]
    )
    assert n_files_a2 == 1
    assert _inodes(table, 2, "k=b") == b_inodes

    # Idempotent: nothing left to compact, no new version published.
    version3, compacted3 = compact_small_files(spark, table, ["k"], target_bytes=1 << 30)
    assert (version3, compacted3) == (2, [])


def test_publish_group_is_atomic_and_rollbackable(spark, tmp_path):
    from harvester_database_and_automation_spark.operators.publish import (
        publish_group,
        read_group_table,
        rollback,
    )

    group = str(tmp_path / "g")
    a1 = _rows(spark, [("a", 1)])
    b1 = _rows(spark, [("b", 10)])
    assert publish_group({"t1": a1, "t2": b1}, group) == 1

    a2 = _rows(spark, [("a", 2)])
    b2 = _rows(spark, [("b", 20)])
    assert publish_group({"t1": a2, "t2": b2}, group) == 2

    # Both tables resolve through the same group version — consistent set.
    assert [r["v"] for r in read_group_table(spark, group, "t1").collect()] == [2]
    assert [r["v"] for r in read_group_table(spark, group, "t2").collect()] == [20]

    # Rollback is one marker write and flips BOTH tables together.
    assert rollback(group) == 1
    assert [r["v"] for r in read_group_table(spark, group, "t1").collect()] == [1]
    assert [r["v"] for r in read_group_table(spark, group, "t2").collect()] == [10]


def test_rollback_requires_a_predecessor(spark, tmp_path):
    from harvester_database_and_automation_spark.operators.publish import (
        publish_group,
        rollback,
    )

    group = str(tmp_path / "g")
    publish_group({"t": _rows(spark, [("a", 1)])}, group)
    with pytest.raises(ValueError):
        rollback(group)


def test_crashed_publish_attempt_does_not_block_the_next(spark, tmp_path):
    """A writer that died after creating its v-directory but before the
    marker swap must not wedge the table: the next publish skips the
    orphan, readers never see it, and vacuum(drop_failed=True) reclaims it."""
    from harvester_database_and_automation_spark.operators.publish import (
        current_version,
        publish_versioned,
        read_published,
        vacuum,
    )

    table = str(tmp_path / "t")
    publish_versioned(_rows(spark, [("a", 1)]), table)
    # Simulate a crashed attempt: v2 exists on disk, marker still at v1.
    os.makedirs(os.path.join(table, "v2"))
    with open(os.path.join(table, "v2", "part-junk"), "w") as fh:
        fh.write("incomplete")

    v = publish_versioned(_rows(spark, [("a", 2)]), table)
    assert v == 3  # orphan v2 skipped, not collided with
    assert current_version(table) == 3
    assert [r["v"] for r in read_published(spark, table).collect()] == [2]

    dropped = vacuum(table, keep=10, drop_failed=False)
    assert dropped == []  # conservative default keeps the orphan
    # Roll the marker forward then reclaim debris newer than current.
    os.makedirs(os.path.join(table, "v9"))
    assert 9 in vacuum(table, keep=10, drop_failed=True)
    assert not os.path.exists(os.path.join(table, "v9"))


def test_vacuum_protects_unmarked_tables(spark, tmp_path):
    """With no _CURRENT marker nothing is published — every v-directory
    may be an in-flight first write, so the conservative default must not
    touch it; drop_failed opts into reclaiming."""
    from harvester_database_and_automation_spark.operators.publish import vacuum

    table = str(tmp_path / "t")
    os.makedirs(os.path.join(table, "v1"))
    assert vacuum(table, keep=0) == []
    assert os.path.exists(os.path.join(table, "v1"))
    assert vacuum(table, keep=0, drop_failed=True) == [1]
