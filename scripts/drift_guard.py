#!/usr/bin/env python
"""Oracle-drift guard sweep — DRIFT_GUARD.json.

Eight rounds of green parity checks share one blind spot: an oracle (or a
Spark plan) that stopped READING its input and pins a constant passes
every same-corpus comparison forever. This sweep perturbs one row's
non-key columns in EVERY input table (testing.perturb_corpus), runs each
registered query and its DuckDB oracle on the clean AND perturbed corpus,
and asserts per query that the two engines' results moved IN LOCKSTEP —
both changed, or both (provably) didn't because the query doesn't read
the touched columns — plus full value-parity on the perturbed corpus.

A violation means one engine responded to the input change and the other
didn't: exactly the pinned-constant failure mode.

Usage: python scripts/drift_guard.py [clean_sf_dir] [query ...]
Writes DRIFT_GUARD.json (git head, per-query moved flags, violations)
and exits non-zero on any violation.
"""

from __future__ import annotations

import json
import subprocess
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from harvester_database_and_automation_spark.plans import QUERIES  # noqa: E402
from harvester_database_and_automation_spark.plans.shared import cleanup_scratch  # noqa: E402
from harvester_database_and_automation_spark.session import get_spark  # noqa: E402
from harvester_database_and_automation_spark.testing import (  # noqa: E402
    drift_check,
    duckdb_connection,
    perturb_corpus,
)


def main() -> int:
    clean_dir = sys.argv[1] if sys.argv[1:] else "/root/testdata/sf0.001"
    names = sys.argv[2:] or list(QUERIES)
    spark = get_spark("drift-guard")
    head = subprocess.run(
        ["git", "rev-parse", "HEAD"], capture_output=True, text=True, check=True
    ).stdout.strip()

    t0 = time.time()
    with tempfile.TemporaryDirectory(prefix="drift_pert_") as pert_dir:
        changed = perturb_corpus(clean_dir, pert_dir)
        clean_con = duckdb_connection(clean_dir)
        pert_con = duckdb_connection(pert_dir)
        rows: dict[str, dict] = {}
        violations: list[str] = []
        for i, name in enumerate(names):
            try:
                r = drift_check(spark, name, clean_dir, pert_dir, clean_con, pert_con)
                rows[name] = {
                    "spark_moved": r.spark_moved,
                    "oracle_moved": r.oracle_moved,
                    "perturbed_parity": r.perturbed_parity,
                    "ok": r.ok,
                }
                if not r.ok:
                    violations.append(name)
                    print(f"[VIOLATION] {name}: spark_moved={r.spark_moved} "
                          f"oracle_moved={r.oracle_moved} parity={r.perturbed_parity}")
            except Exception as exc:  # pragma: no cover - diagnostic path
                rows[name] = {"ok": False, "error": f"{type(exc).__name__}: {exc}"}
                violations.append(name)
                print(f"[ERROR] {name}: {exc}")
            cleanup_scratch()
            if (i + 1) % 25 == 0:
                print(f"... {i + 1}/{len(names)} ({time.time() - t0:.0f}s)")

    n_moved = sum(1 for r in rows.values() if r.get("spark_moved"))
    out = {
        "git_head": head,
        "clean_dir": clean_dir,
        "n_queries": len(rows),
        "n_spark_moved": n_moved,
        "n_violations": len(violations),
        "violations": violations,
        "perturbed_columns": changed,
        "wall_sec": round(time.time() - t0, 1),
        "check": "per-query: spark_moved == oracle_moved AND perturbed-corpus "
        "value parity (movement in lockstep rules out pinned constants)",
        "queries": rows,
    }
    if len(names) == len(QUERIES):
        (Path(__file__).resolve().parent.parent / "DRIFT_GUARD.json").write_text(
            json.dumps(out, indent=1) + "\n"
        )
    print(f"{len(rows) - len(violations)}/{len(rows)} queries drift-consistent; "
          f"{n_moved} moved on perturbation; wall {out['wall_sec']}s")
    return 1 if violations else 0


if __name__ == "__main__":
    raise SystemExit(main())
