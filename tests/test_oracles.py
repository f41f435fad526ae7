"""Every registered query must hash-match its DuckDB oracle (the same
contract the driver's correctness gate applies at sf=0.01; tests run the
small sf for speed)."""

from __future__ import annotations

import pytest

from harvester_database_and_automation_spark.plans import QUERIES
from harvester_database_and_automation_spark.testing import check_query, duckdb_connection

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def con():
    con = duckdb_connection(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, con, name):
    res = check_query(spark, con, name, SF_DIR)
    assert res.ok, str(res)
