"""Tests for the write-path operators (M1-M6) and keep_best dedup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from harvester_database_and_automation_spark.operators import (
    JobState,
    apply_deletes,
    classify_changes,
    current_version,
    keep_best,
    merge_upsert,
    publish_versioned,
    read_published,
)
from harvester_database_and_automation_spark.operators.merge import erase_columns
from harvester_database_and_automation_spark.operators.publish import vacuum

SCHEMA = "id int, meta string, seq string"


@pytest.fixture()
def current(spark):
    return spark.createDataFrame(
        [(1, "m1", "AAA"), (2, "m2", "CCC"), (3, "m3", "GGG")], SCHEMA
    )


def test_merge_upsert(spark, current):
    updates = spark.createDataFrame([(2, "m2-new", "CCC"), (4, "m4", "TTT")], SCHEMA)
    got = {r["id"]: (r["meta"], r["seq"]) for r in merge_upsert(current, updates, ["id"]).collect()}
    assert got == {
        1: ("m1", "AAA"),
        2: ("m2-new", "CCC"),
        3: ("m3", "GGG"),
        4: ("m4", "TTT"),
    }


def test_merge_upsert_schema_mismatch(spark, current):
    bad = spark.createDataFrame([(1, "x")], "id int, meta string")
    with pytest.raises(ValueError, match="schema mismatch"):
        merge_upsert(current, bad, ["id"])


def test_classify_changes_routes_all_cases(spark, current):
    incoming = spark.createDataFrame(
        [
            (1, "m1", "AAA"),       # unchanged
            (2, "m2-new", "CCC"),   # metadata changed
            (3, "m3", "GGA"),       # payload changed
            (5, "m5", "TTT"),       # insert
        ],
        SCHEMA,
    )
    got = {
        r["id"]: r["change_type"]
        for r in classify_changes(current, incoming, ["id"], ["meta"], ["seq"]).collect()
    }
    assert got == {
        1: "unchanged",
        2: "metadata_changed",
        3: "payload_changed",
        5: "insert",
    }


def test_classify_changes_emits_deletes(spark, current):
    incoming = spark.createDataFrame([(1, "m1", "AAA")], SCHEMA)
    rows = classify_changes(current, incoming, ["id"], ["meta"], ["seq"]).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["change_type"], set()).add(r["id"])
    assert by_type["delete"] == {2, 3}
    assert by_type["unchanged"] == {1}


def test_classify_changes_null_vs_empty(spark):
    cur = spark.createDataFrame([(1, None, "A")], SCHEMA)
    inc = spark.createDataFrame([(1, "", "A")], SCHEMA)
    rows = classify_changes(cur, inc, ["id"], ["meta"], ["seq"]).collect()
    # null and '' must NOT hash equal (the \0 sentinel keeps them apart).
    assert rows[0]["change_type"] == "metadata_changed"


def test_apply_deletes(spark, current):
    tomb = spark.createDataFrame([(2,), (99,)], "id int")
    assert {r["id"] for r in apply_deletes(current, tomb, ["id"]).collect()} == {1, 3}


def test_erase_columns(spark, current):
    got = erase_columns(current, ["meta"], F.col("id") == 2).collect()
    by_id = {r["id"]: r for r in got}
    assert by_id[2]["meta"] is None and by_id[2]["seq"] == "CCC"
    assert by_id[1]["meta"] == "m1"


def test_publish_versioned_atomic_swap(spark, tmp_path, current):
    table = str(tmp_path / "tbl")
    v1 = publish_versioned(current, table)
    assert v1 == 1 and current_version(table) == 1
    assert read_published(spark, table).count() == 3

    updated = current.withColumn("meta", F.lit("new"))
    v2 = publish_versioned(updated, table)
    assert v2 == 2
    assert read_published(spark, table).select("meta").distinct().collect()[0][0] == "new"

    v3 = publish_versioned(current, table)
    dropped = vacuum(table, keep=2)
    assert dropped == [1]
    assert current_version(table) == v3
    assert read_published(spark, table).count() == 3


def test_job_state_run_if_changed(tmp_path):
    state = JobState(str(tmp_path / "state.json"))
    runs = []
    assert state.run_if_changed("files", "3", lambda: runs.append(1)) is True
    assert state.run_if_changed("files", "3", lambda: runs.append(2)) is False
    assert state.run_if_changed("files", "4", lambda: runs.append(3)) is True
    assert runs == [1, 3]

    def boom():
        raise RuntimeError("job failed")

    with pytest.raises(RuntimeError):
        state.run_if_changed("files", "5", boom)
    # Failed run did not record the fingerprint -> retries.
    assert state.get("files") == "4"


def test_keep_best_deterministic_tiebreak(spark):
    df = spark.createDataFrame(
        [("e1", 5, "b"), ("e1", 5, "a"), ("e1", 9, "c"), ("e2", 1, "z")],
        "ethid string, number_n int, sample_name string",
    )
    got = keep_best(df, ["ethid"], [F.col("number_n"), F.col("sample_name")]).collect()
    by_key = {r["ethid"]: r["sample_name"] for r in got}
    assert by_key == {"e1": "a", "e2": "z"}


def test_merge_upsert_null_overwrites(spark, current):
    updates = spark.createDataFrame([(1, None, "AAA")], SCHEMA)
    got = {r["id"]: r["meta"] for r in merge_upsert(current, updates, ["id"]).collect()}
    # A NULL carried by the update must overwrite, not fall back to current.
    assert got[1] is None and got[2] == "m2"


def test_assign_global_ids_matches_window(spark):
    from pyspark.sql import Window

    from harvester_database_and_automation_spark.operators.ids import assign_global_ids

    df = spark.createDataFrame(
        [(i, f"name_{i % 97:03d}_{i}") for i in range(5000)], "k int, name string"
    ).repartition(16)
    got = assign_global_ids(df, ["name"], start=1000)
    # Distributed result must equal the window formulation exactly.
    expected = df.withColumn(
        "assigned_id", (F.lit(999) + F.row_number().over(Window.orderBy("name"))).cast("long")
    )
    assert got.count() == 5000
    diff = got.join(expected, ["k", "name", "assigned_id"], "inner").count()
    assert diff == 5000
    # Ids are dense and start where asked.
    stats = got.agg(
        F.min("assigned_id").alias("lo"),
        F.max("assigned_id").alias("hi"),
        F.countDistinct("assigned_id").alias("n"),
    ).collect()[0]
    assert (stats["lo"], stats["hi"], stats["n"]) == (1000, 5999, 5000)
