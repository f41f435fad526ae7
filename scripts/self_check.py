#!/usr/bin/env python
"""Full-registry, HEAD-keyed self-certification at sf0.01 —
CORRECTNESS_SELF.json.

The external driver's per-round rotation samples a SUBSET of the
registry, so a query repointed this round can go uncertified for a
round if the rotation happens to skip it (it did for seven queries in
round 6). This script is the repo's own proof: EVERY registered query,
run against its DuckDB oracle on the driver's sf0.01 corpus, recorded
with the git head the sweep ran at — the reconciliation-query habit of
the reference (database/sql/gisaid_our_sequences.sql:1-67: run the
checks where you changed the code), applied to the whole registry every
round.

Usage: python scripts/self_check.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from harvester_database_and_automation_spark.oracle_cache import (  # noqa: E402
    OracleCache,
    check_query_cached,
)
from harvester_database_and_automation_spark.plans import (  # noqa: E402
    MAX_GREEN_AGE_ROUNDS,
    QUERIES,
    latest_green_round,
    next_round,
    stale_green_queries,
)
from harvester_database_and_automation_spark.plans.shared import cleanup_scratch  # noqa: E402
from harvester_database_and_automation_spark.session import get_spark  # noqa: E402
from harvester_database_and_automation_spark.testing import (  # noqa: E402
    check_query,
    duckdb_connection,
    oracle_env_mode,
)


def main() -> int:
    sf_dir = sys.argv[1] if sys.argv[1:] else "/root/testdata/sf0.01"
    spark = get_spark("self-check")
    repo = Path(__file__).resolve().parent.parent
    cache = None if os.environ.get("ORACLE_CACHE") == "0" else OracleCache(repo / ".oracle_cache")
    con = None if cache is not None else duckdb_connection(sf_dir)
    _con: list = []

    def con_factory():
        if not _con:
            _con.append(duckdb_connection(sf_dir))
        return _con[0]
    head = subprocess.run(
        ["git", "rev-parse", "HEAD"], capture_output=True, text=True, check=True
    ).stdout.strip()
    dirty = bool(
        subprocess.run(
            ["git", "status", "--porcelain"], capture_output=True, text=True, check=True
        ).stdout.strip()
    )
    results: dict[str, dict] = {}
    n_fail = 0
    t_start = time.time()
    for name in QUERIES:
        t0 = time.time()
        try:
            if cache is not None:
                res, was_hit = check_query_cached(spark, con_factory, name, sf_dir, cache)
            else:
                res, was_hit = check_query(spark, con, name, sf_dir), False
            entry = {
                "ok": res.ok,
                "spark_rows": res.spark_rows,
                "oracle_rows": res.oracle_rows,
                "oracle_cache_hit": was_hit,
                "sec": round(time.time() - t0, 2),
            }
            if res.problems:
                entry["problems"] = res.problems
        except Exception as exc:  # pragma: no cover - diagnostic path
            entry = {"ok": False, "error": f"{type(exc).__name__}: {exc}"}
        cleanup_scratch()
        if not entry["ok"]:
            n_fail += 1
            print(f"[FAIL] {name}: {entry}")
        results[name] = entry
    # Driver-evidence staleness gate (r9 verdict ask #4): every query whose
    # latest driver green is older than MAX_GREEN_AGE_ROUNDS must be SEATED
    # in the upcoming driver window (the first DRIVER_WINDOW slots of the
    # rotated registry — the driver's capped artifact records exactly
    # those), so the next round clears the tail. The rotation's steady
    # state is an LRU over latest-green rounds, which bounds staleness at
    # ~(registry / window) rounds structurally; this assertion is the
    # tripwire if either mechanism regresses.
    DRIVER_WINDOW = 50  # every CORRECTNESS_r*.json since r1 has 50 rows
    window = list(QUERIES)[:DRIVER_WINDOW]
    stale = stale_green_queries()
    unseated = sorted(set(stale) - set(window))
    latest = latest_green_round()
    ages = sorted(
        ((n, next_round() - latest[n]) for n in QUERIES if n in latest),
        key=lambda kv: -kv[1],
    )
    if unseated:
        n_fail += len(unseated)
        print(f"[FAIL] stale queries NOT seated in the upcoming {DRIVER_WINDOW}-slot "
              f"driver window: {unseated}")

    out = {
        "git_head": head,
        "git_dirty": dirty,
        "sf_dir": sf_dir,
        "oracle_env": oracle_env_mode(),
        "oracle_cache": cache.stats() if cache is not None else {"disabled": True},
        "n_queries": len(results),
        "n_pass": len(results) - (n_fail - len(unseated)),
        "n_fail": n_fail,
        "wall_sec": round(time.time() - t_start, 1),
        "check": "row-count + schema + order-insensitive value compare vs DuckDB oracle "
        "(rows-only for queries without an oracle); plus the driver-evidence "
        "staleness gate (stale queries must be seated in the upcoming window)",
        "staleness": {
            "max_green_age_rounds": MAX_GREEN_AGE_ROUNDS,
            "upcoming_round": next_round(),
            "stale_queries": stale,
            "all_stale_seated_in_window": not unseated,
            "unseated": unseated,
            "oldest_evidence": dict(ages[:10]),
        },
        "queries": results,
    }
    artifact = Path(__file__).resolve().parent.parent / "CORRECTNESS_SELF.json"
    artifact.write_text(json.dumps(out, indent=1) + "\n")
    print(
        f"\n{out['n_pass']}/{out['n_queries']} queries pass at {sf_dir} "
        f"(head {head[:10]}{' DIRTY' if dirty else ''}) -> CORRECTNESS_SELF.json"
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
