#!/usr/bin/env python
"""Run every registered query against its DuckDB oracle and report.

Usage: python scripts/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from harvester_database_and_automation_spark.plans import QUERIES  # noqa: E402
from harvester_database_and_automation_spark.plans.shared import cleanup_scratch  # noqa: E402
from harvester_database_and_automation_spark.session import get_spark  # noqa: E402
from harvester_database_and_automation_spark.testing import check_query, duckdb_connection  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    vanilla = "--vanilla" in args
    args = [a for a in args if a != "--vanilla"]
    paths = [a for a in args if "/" in a]
    if len(paths) > 1:
        print(f"multiple sf_dir arguments: {paths}", file=sys.stderr)
        return 2
    sf_dir = paths[0] if paths else "/root/testdata/sf0.01"
    names = [a for a in args if "/" not in a] or list(QUERIES)
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        print(f"unknown queries (did you mean an sf_dir path?): {unknown}", file=sys.stderr)
        return 2

    if vanilla:
        # Simulate the external driver: its session has NONE of our confs —
        # default 200 shuffle partitions (different aggregation/summation
        # order than our 32), a non-UTC timezone, fewer cores. Any query
        # that only passes under session.py's tuning fails here first.
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.sql.session.timeZone", "America/New_York")
            .config("spark.driver.memory", "16g")
            .appName("oracle-check-vanilla")
            .getOrCreate()
        )
    else:
        spark = get_spark("oracle-check")
    con = duckdb_connection(sf_dir)
    n_fail = 0
    for name in names:
        t0 = time.time()
        try:
            res = check_query(spark, con, name, sf_dir)
        except Exception as exc:  # pragma: no cover - diagnostic path
            print(f"[ERROR] {name}: {type(exc).__name__}: {exc}")
            n_fail += 1
            continue
        finally:
            cleanup_scratch()
        print(f"{res}  ({time.time() - t0:.1f}s)")
        if not res.ok:
            n_fail += 1
    print(f"\n{len(names) - n_fail}/{len(names)} queries pass")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
