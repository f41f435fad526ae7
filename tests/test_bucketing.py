"""Bucketed co-located joins: same-bucketed tables join without a shuffle."""

from __future__ import annotations

import re

from harvester_database_and_automation_spark.operators.layout import write_bucketed


def _exchanges(df) -> int:
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = df._jdf.queryExecution().explainString(mode)
    return len(re.findall(r"^\(\d+\) Exchange", plan, flags=re.MULTILINE))


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    spark.sql("DROP TABLE IF EXISTS bt_orders")
    spark.sql("DROP TABLE IF EXISTS bt_lines")
    orders = spark.range(200).selectExpr("id AS okey", "id % 7 AS prio")
    lines = spark.range(600).selectExpr("id % 200 AS okey", "id AS line_id")
    write_bucketed(orders, "bt_orders", str(tmp_path / "bt_orders"), ["okey"], n_buckets=4)
    write_bucketed(lines, "bt_lines", str(tmp_path / "bt_lines"), ["okey"], n_buckets=4)
    try:
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("bt_orders").join(spark.table("bt_lines"), "okey")
            assert _exchanges(joined) == 0  # co-located: no shuffle either side
            assert joined.count() == 600
            # The same join on plain (unbucketed) frames shuffles both sides.
            plain = orders.join(lines, "okey")
            assert _exchanges(plain) >= 2
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_orders")
        spark.sql("DROP TABLE IF EXISTS bt_lines")
