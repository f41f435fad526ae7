"""Uniqueness + FK orphan checks (operators/integrity.py)."""

from __future__ import annotations

from harvester_database_and_automation_spark.operators.integrity import (
    duplicate_keys,
    orphans,
)


def test_duplicate_keys(spark):
    df = spark.createDataFrame(
        [(1, "a", 1), (1, "a", 2), (2, "b", 3), (1, "b", 4)], "k int, s string, v int"
    )
    dups = {(r["k"], r["s"], r["n_rows"]) for r in duplicate_keys(df, ["k", "s"]).collect()}
    assert dups == {(1, "a", 2)}
    assert duplicate_keys(df, ["v"]).count() == 0


def test_orphans_with_mapping_and_nulls(spark):
    child = spark.createDataFrame([(1, 10), (2, 99), (3, None)], "id int, fk int")
    parent = spark.createDataFrame([(10,), (20,)], "pk int")
    bad = orphans(child, parent, {"fk": "pk"})
    assert {r["id"] for r in bad.collect()} == {2}  # NULL fk ignored (SQL semantics)
    bad_strict = orphans(child, parent, {"fk": "pk"}, ignore_null_fk=False)
    assert {r["id"] for r in bad_strict.collect()} == {2, 3}


def test_orphans_same_column_names(spark):
    child = spark.createDataFrame([(5,), (6,)], "key int")
    parent = spark.createDataFrame([(5,)], "key int")
    assert {r["key"] for r in orphans(child, parent, ["key"]).collect()} == {6}
