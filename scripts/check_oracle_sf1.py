#!/usr/bin/env python
"""Oracle-certify the 100x data step: DuckDB hash-parity at the derived
sf1 corpus, recorded as CORRECTNESS_SF1.json.

SCALING_100x.json measures TIME at sf1; this runs the same row-count +
schema + order-insensitive value-hash compare the driver applies at
sf0.01, at 100x the rows — the reconciliation-at-serving-scale habit of
the reference (database/sql/gisaid_our_sequences.sql:1-67). The slice:
the round-5 bounded-batch kernel reworks, the top of the bench, the
annotated output-bound scaling tails, and every round-6 rework. The sf1
corpus comes from scripts/make_sf1.py (FK-consistent 10x replication of
the driver's sf0.1 — run it first); both engines read the same files.

Oracle results are served from the persistent cache
(.oracle_cache/, keyed by SQL digest x corpus fingerprint —
oracle_cache.py) when present: a warm re-run verifies Spark against the
stored digests without opening DuckDB at all. ORACLE_CACHE=0 disables.

Usage: python scripts/check_oracle_sf1.py [query ...]
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
from harvester_database_and_automation_spark.plans import QUERIES  # noqa: E402
from harvester_database_and_automation_spark.plans.shared import cleanup_scratch  # noqa: E402
from harvester_database_and_automation_spark.session import get_spark  # noqa: E402
from harvester_database_and_automation_spark.testing import (  # noqa: E402
    duckdb_connection,
    oracle_env_mode,
)

REPO = Path(__file__).resolve().parent.parent
SF1 = str(REPO / ".scaling" / "sf1")

DEFAULT_QUERIES = [
    # Round-5 bounded-batch reworks (sampling semantics changed; their
    # 100x entries were timing-only until now):
    "k3_origin_estimator",
    "k4_priority_scorer",
    "knn_label_predict",
    "a11_mean_hamming",
    # Top of BENCH_FULL by warm cost:
    "streaming_watermark_window_replay",
    "streaming_dedup_replay",
    "streaming_change_router_replay",
    "lineitem_column_profile",
    "semantic_dedup_cells",
    "lineitem_column_profile_binned",
    "prefix_filter_jaccard_pairs",
    "incremental_dup_components",
    "streaming_upsert_publish_replay",
    "ivf_recall_at_3",
    "substring_overlap_pairs",
    "kmeans_lloyd_clusters",
    # Annotated output-bound 100x tails (the annotation becomes a check):
    "minhash_jaccard_calibration",
    "event_concurrency_window",
    # Round-6 reworks and additions:
    "hot_band_pair_stress",
    "ngram_jaccard_pairs",
    "ivf_probe_served",
    "semantic_dedup_served",
    "derived_rebuild_parity",
    "csv_typed_roundtrip",
    "chunked_export_roundtrip",
]


def main() -> int:
    names = sys.argv[1:] or DEFAULT_QUERIES
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2
    if not Path(SF1).exists():
        print(f"{SF1} missing — run scripts/make_sf1.py first", file=sys.stderr)
        return 2
    spark = get_spark("oracle-check-sf1")
    # DuckDB opens lazily, only if some query misses the oracle cache —
    # an all-hits warm run never allocates the in-RAM oracle budget.
    cache = None if os.environ.get("ORACLE_CACHE") == "0" else OracleCache(REPO / ".oracle_cache")
    _con: list = []

    def con_factory():
        if not _con:
            _con.append(duckdb_connection(SF1))
        return _con[0]

    head = subprocess.run(
        ["git", "-C", str(REPO), "rev-parse", "--short", "HEAD"],
        capture_output=True,
        text=True,
    ).stdout.strip()
    rows: dict[str, dict] = {}
    n_fail = 0
    for name in names:
        t0 = time.time()
        try:
            if cache is not None:
                res, was_hit = check_query_cached(spark, con_factory, name, SF1, cache)
            else:
                from harvester_database_and_automation_spark.testing import check_query

                res, was_hit = check_query(spark, con_factory(), name, SF1), False
            entry = {
                "ok": res.ok,
                "rows_match": res.ok or res.spark_rows == res.oracle_rows,
                "schema_match": res.ok or not any("column mismatch" in p for p in res.problems),
                "hash_match": res.ok,
                "spark_rows": res.spark_rows,
                "oracle_rows": res.oracle_rows,
                "problems": res.problems,
                "oracle_cache_hit": was_hit,
            }
            print(f"{res}{' [cached oracle]' if was_hit else ''}  ({time.time() - t0:.1f}s)")
        except Exception as exc:  # pragma: no cover - diagnostic path
            entry = {"ok": False, "error": f"{type(exc).__name__}: {exc}"}
            print(f"[ERROR] {name}: {entry['error']}")
        cleanup_scratch()
        entry["seconds"] = round(time.time() - t0, 1)
        entry["measured_at"] = head
        rows[name] = entry
        if not entry["ok"]:
            n_fail += 1
    artifact = REPO / "CORRECTNESS_SF1.json"
    if sys.argv[1:] and artifact.exists():
        # Explicit-query rerun (a rework recert): merge into the existing
        # artifact instead of shrinking it to the rerun slice.
        prior = json.loads(artifact.read_text())
        merged = prior.get("queries", {})
        # Stamp provenance: re-run rows carry THIS head; carried rows keep
        # whatever head they were measured at (valid only while the corpus
        # is unchanged — /root/testdata mtimes are the tell).
        prior_head = prior.get("git_head", "unknown")
        for name, row in merged.items():
            row.setdefault("measured_at", prior_head)
        for name in list(rows):
            rows[name]["measured_at"] = head
        merged.update(rows)
        rows = merged
        n_fail = sum(1 for r in rows.values() if not r.get("ok"))
    out = {
        "scale": "derived sf1 (100x the driver's sf0.01 correctness gate)",
        "sf1_source": "scripts/make_sf1.py: FK-consistent 10x replication of the driver's sf0.1",
        "compare": "row count + schema + order-insensitive value hash (testing.compare_frames); "
        "oracle side served from .oracle_cache digests on hits (oracle_cache.py)",
        "oracle_env": oracle_env_mode(),
        "oracle_cache": cache.stats() if cache is not None else {"disabled": True},
        "git_head": head,
        "note": "rows carry measured_at; a subset rerun merges into prior rows, valid only while the corpus is unchanged",
        "n_queries": len(rows),
        "n_pass": len(rows) - n_fail,
        "queries": rows,
    }
    artifact.write_text(json.dumps(out, indent=1) + "\n")
    print(f"\n{len(rows) - n_fail}/{len(rows)} queries pass at sf1 -> CORRECTNESS_SF1.json")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
