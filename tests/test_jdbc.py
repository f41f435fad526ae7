"""S1 JDBC connector tests against the embedded Derby engine that ships in
Spark's jars (no external database, no network)."""

from __future__ import annotations

import pytest

from harvester_database_and_automation_spark.sources.jdbc import (
    read_jdbc_table,
    write_jdbc_append,
)

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    """Create an embedded Derby database with a small typed table."""
    db_dir = tmp_path_factory.mktemp("derby") / "s1db"
    url = f"jdbc:derby:{db_dir};create=true"
    jvm = spark._jvm
    try:
        conn = jvm.java.sql.DriverManager.getConnection(url)
    except Exception as exc:  # pragma: no cover - env without Derby jars
        pytest.skip(f"embedded Derby unavailable: {exc}")
    st = conn.createStatement()
    st.execute(
        "CREATE TABLE samples (sample_id INT NOT NULL, lab VARCHAR(32), quality DOUBLE)"
    )
    ps = conn.prepareStatement("INSERT INTO samples VALUES (?, ?, ?)")
    for i in range(100):
        ps.setInt(1, i)
        ps.setString(2, f"lab{i % 4}")
        ps.setDouble(3, float(i) / 10.0)
        ps.addBatch()
    ps.executeBatch()
    st.close()
    conn.close()
    yield url


def test_single_connection_scan(spark, derby_url):
    df = read_jdbc_table(spark, derby_url, "samples", driver=DRIVER)
    assert df.count() == 100
    assert {f.name.lower() for f in df.schema.fields} == {"sample_id", "lab", "quality"}


def test_filter_pushdown_reaches_remote_sql(spark, derby_url):
    df = read_jdbc_table(spark, derby_url, "samples", driver=DRIVER).filter(
        "SAMPLE_ID >= 90"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    # Catalyst pushes the predicate into the JDBCRelation so Derby, not
    # Spark, does the selection.
    assert "PushedFilters" in plan and "SAMPLE_ID" in plan.split("PushedFilters")[1][:200]
    assert df.count() == 10


def test_range_partitioned_scan(spark, derby_url):
    df = read_jdbc_table(
        spark,
        derby_url,
        "samples",
        driver=DRIVER,
        partition_column="SAMPLE_ID",
        lower_bound=0,
        upper_bound=100,
        num_partitions=4,
    )
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 100
    assert df.agg({"SAMPLE_ID": "sum"}).collect()[0][0] == sum(range(100))


def test_predicate_partitioned_scan(spark, derby_url):
    df = read_jdbc_table(
        spark,
        derby_url,
        "samples",
        driver=DRIVER,
        predicates=[f"MOD(sample_id, 3) = {k}" for k in range(3)],
    )
    assert df.rdd.getNumPartitions() == 3
    assert df.count() == 100


def test_mode_conflict_rejected(spark, derby_url):
    with pytest.raises(ValueError):
        read_jdbc_table(
            spark,
            derby_url,
            "samples",
            driver=DRIVER,
            partition_column="SAMPLE_ID",
            predicates=["1=1"],
        )


def test_write_append_round_trip(spark, derby_url):
    src = spark.createDataFrame(
        [(1000 + i, f"lab{i}", 0.5) for i in range(5)],
        "SAMPLE_ID int, LAB string, QUALITY double",
    )
    write_jdbc_append(src, derby_url, "samples", driver=DRIVER, num_partitions=1)
    back = read_jdbc_table(spark, derby_url, "samples", driver=DRIVER).filter(
        "SAMPLE_ID >= 1000"
    )
    assert back.count() == 5
