"""Oracle-result cache (oracle_cache.py): hits certify exactly what a
live compare would, SQL or corpus changes bust the key, and a digest
mismatch falls back to the live oracle instead of failing from the
cache (round-10 verdict ask #2)."""

from __future__ import annotations

import datetime
import os
from decimal import Decimal

import pytest

from harvester_database_and_automation_spark.oracle_cache import (
    OracleCache,
    canonical_digest,
    check_query_cached,
    corpus_fingerprint,
)
from harvester_database_and_automation_spark.testing import duckdb_connection

from tests.conftest import SF_DIR

QUERY = "customer_order_counts"


@pytest.fixture
def cache(tmp_path):
    return OracleCache(tmp_path / "cache")


def _factory(calls):
    def con_factory():
        calls.append(1)
        return duckdb_connection(SF_DIR)

    return con_factory


class TestDigest:
    def test_numeric_equality_classes_collapse(self):
        # Spark Decimal vs DuckDB float vs int: equal by == must digest
        # identically, else every decimal-typed query would always miss.
        a = canonical_digest(["x"], [(1,)])
        assert a == canonical_digest(["x"], [(1.0,)])
        assert a == canonical_digest(["x"], [(Decimal("1.0"),)])
        assert a == canonical_digest(["x"], [(True,)])
        assert a != canonical_digest(["x"], [(2,)])

    def test_distinct_values_distinct_digests(self):
        assert canonical_digest(["x"], [("a",)]) != canonical_digest(["x"], [("b",)])
        assert canonical_digest(["x"], [(None,)]) != canonical_digest(["x"], [("",)])
        assert canonical_digest(["x"], [(b"a",)]) != canonical_digest(["x"], [("a",)])
        # Cell-boundary ambiguity: ("ab","c") vs ("a","bc")
        assert canonical_digest(["x", "y"], [("ab", "c")]) != canonical_digest(
            ["x", "y"], [("a", "bc")]
        )
        # Column names are part of the digest.
        assert canonical_digest(["x"], [(1,)]) != canonical_digest(["y"], [(1,)])

    def test_temporal_and_array_cells(self):
        d1 = canonical_digest(["t"], [(datetime.datetime(2024, 1, 1),)])
        d2 = canonical_digest(["t"], [(datetime.datetime(2024, 1, 2),)])
        assert d1 != d2
        a1 = canonical_digest(["v"], [((1.0, 2.0),)])
        a2 = canonical_digest(["v"], [((1.0, 2.5),)])
        assert a1 != a2
        # Array element equality classes collapse like scalars do.
        assert a1 == canonical_digest(["v"], [((1, 2),)])


class TestFingerprint:
    def test_corpus_change_rekeys(self, tmp_path):
        d = tmp_path / "corpus"
        d.mkdir()
        (d / "t.parquet").write_bytes(b"aaaa")
        f1 = corpus_fingerprint(str(d))
        assert f1 == corpus_fingerprint(str(d))
        (d / "t.parquet").write_bytes(b"aaab")
        os.utime(d / "t.parquet", ns=(1, 1))  # force a visible mtime change
        assert corpus_fingerprint(str(d)) != f1

    def test_nested_multifile_tables_covered(self, tmp_path):
        d = tmp_path / "corpus"
        (d / "t.parquet").mkdir(parents=True)
        (d / "t.parquet" / "part-0.parquet").write_bytes(b"x")
        f1 = corpus_fingerprint(str(d))
        (d / "t.parquet" / "part-1.parquet").write_bytes(b"y")
        assert corpus_fingerprint(str(d)) != f1


class TestCachedCheck:
    def test_miss_then_hit_skips_duckdb(self, spark, cache):
        calls: list[int] = []
        res, hit = check_query_cached(spark, _factory(calls), QUERY, SF_DIR, cache)
        assert res.ok and not hit and len(calls) == 1
        assert cache.stats() == {"hits": 0, "misses": 1, "refreshes": 0}

        calls2: list[int] = []
        res2, hit2 = check_query_cached(spark, _factory(calls2), QUERY, SF_DIR, cache)
        assert res2.ok and hit2
        assert calls2 == []  # the hit never opened DuckDB
        assert res2.spark_rows == res.spark_rows
        assert cache.hits == 1

    def test_changed_sql_busts(self, spark, cache):
        from dataclasses import replace

        from harvester_database_and_automation_spark.plans import QUERIES

        calls: list[int] = []
        check_query_cached(spark, _factory(calls), QUERY, SF_DIR, cache)
        # Same query, whitespace-only SQL edit: a different key, so the
        # prior entry must NOT serve it.
        QUERIES["_cache_sql_changed"] = replace(
            QUERIES[QUERY], name="_cache_sql_changed",
            oracle=QUERIES[QUERY].oracle + " -- changed",
        )
        try:
            calls2: list[int] = []
            res, hit = check_query_cached(
                spark, _factory(calls2), "_cache_sql_changed", SF_DIR, cache
            )
            assert not hit and calls2 == [1]  # re-ran the live oracle
            assert res.ok
        finally:
            del QUERIES["_cache_sql_changed"]

    def test_changed_corpus_busts(self, spark, cache, tmp_path, monkeypatch):
        import harvester_database_and_automation_spark.oracle_cache as oc

        calls: list[int] = []
        check_query_cached(spark, _factory(calls), QUERY, SF_DIR, cache)
        # Simulate a regenerated corpus without touching the read-only
        # testdata: fingerprint indirection.
        monkeypatch.setattr(oc, "corpus_fingerprint", lambda d: "other-corpus")
        calls2: list[int] = []
        _, hit = oc.check_query_cached(spark, _factory(calls2), QUERY, SF_DIR, cache)
        assert not hit and calls2 == [1]
        assert cache.misses == 2

    def test_poisoned_cache_never_fails_from_cache(self, spark, cache):
        """A stale/corrupt digest must fall through to the live oracle —
        the cache can defer, never decide a failure."""
        from harvester_database_and_automation_spark.plans import QUERIES

        calls: list[int] = []
        check_query_cached(spark, _factory(calls), QUERY, SF_DIR, cache)
        # Poison the stored digest.
        spec = QUERIES[QUERY]
        p = cache._path(spec.oracle, corpus_fingerprint(SF_DIR))
        p.write_text(p.read_text().replace('"result_digest": "', '"result_digest": "00'))
        calls2: list[int] = []
        res, hit = check_query_cached(spark, _factory(calls2), QUERY, SF_DIR, cache)
        assert res.ok and not hit and calls2 == [1]
        assert cache.refreshes == 1
        # ...and the refreshed entry hits again.
        _, hit3 = check_query_cached(spark, _factory([]), QUERY, SF_DIR, cache)
        assert hit3

    def test_real_mismatch_reported_with_diagnostics(self, spark, cache):
        """When Spark genuinely disagrees with the oracle, the result is
        the LIVE diagnostic compare, not a bare digest verdict."""
        from dataclasses import replace

        from harvester_database_and_automation_spark.plans import QUERIES

        spec = QUERIES[QUERY]
        QUERIES["_cache_bad"] = replace(
            spec, name="_cache_bad", fn=lambda s, d: spec.fn(s, d).limit(3)
        )
        try:
            res, hit = check_query_cached(
                spark, _factory([]), "_cache_bad", SF_DIR, cache
            )
            assert not res.ok and not hit
            assert any("row count mismatch" in p for p in res.problems)
        finally:
            del QUERIES["_cache_bad"]
