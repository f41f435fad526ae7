#!/usr/bin/env python
"""Measure every registered query at two scale factors in ONE session and
record the warm-time ratio — the empirical scaling curve behind the 100 TB
sizing table. A 10x data step that costs << 10x shows the plan has
parallel/overhead slack; >~10x flags superlinear work (the thing the plan
audit exists to prevent).

Usage: python scripts/scaling_curve.py  -> SCALING.json + summary line
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from harvester_database_and_automation_spark.plans import QUERIES  # noqa: E402
from harvester_database_and_automation_spark.session import get_spark  # noqa: E402

SF_A = "/root/testdata/sf0.01"
SF_B = "/root/testdata/sf0.1"


def timed(fn, spark, sf) -> float:
    best = None
    for _ in range(2):
        t0 = time.time()
        fn(spark, sf).write.mode("overwrite").format("noop").save()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    return round(best, 3)


def main() -> int:
    names = sys.argv[1:] or list(QUERIES)
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2
    spark = get_spark("scaling-curve")
    # Warm both scale factors fully first (JIT + footer caches).
    for n in names:
        for sf in (SF_A, SF_B):
            QUERIES[n].fn(spark, sf).write.mode("overwrite").format("noop").save()
    rows = {}
    for n in names:
        ta = timed(QUERIES[n].fn, spark, SF_A)
        tb = timed(QUERIES[n].fn, spark, SF_B)
        rows[n] = {"sf001": ta, "sf01": tb, "ratio": round(tb / ta, 2) if ta > 0 else None}
    artifact = Path(__file__).resolve().parent.parent / "SCALING.json"
    if sys.argv[1:] and artifact.exists():
        # Explicit-query rerun (a rework remeasure): merge into the
        # existing artifact instead of shrinking it to the rerun slice.
        prior = json.loads(artifact.read_text()).get("queries", {})
        prior.update(rows)
        rows = prior
    ratios = sorted(r["ratio"] for r in rows.values() if r["ratio"])
    from bench import _calibration_sec  # pinned env-drift workload

    out = {
        "data_step": "10x rows (sf0.01 -> sf0.1), same session, best-of-2 warm",
        "median_ratio": ratios[len(ratios) // 2],
        "p90_ratio": ratios[(9 * len(ratios)) // 10],
        "max_ratio": ratios[-1],
        "calibration_sec": _calibration_sec(spark, SF_B),
        "queries": dict(sorted(rows.items(), key=lambda kv: -(kv[1]["ratio"] or 0))),
    }
    (Path(__file__).resolve().parent.parent / "SCALING.json").write_text(
        json.dumps(out, indent=1) + "\n"
    )
    print(
        f"{len(rows)} queries: median time ratio {out['median_ratio']}x for 10x data, "
        f"p90 {out['p90_ratio']}x, max {out['max_ratio']}x -> SCALING.json"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
