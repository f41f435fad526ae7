#!/usr/bin/env python
"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line with per-query wall-clock seconds.

Materialization uses the no-op sink so timing covers the full plan without
driver-side collection overhead.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from harvester_database_and_automation_spark.plans import QUERIES  # noqa: E402
from harvester_database_and_automation_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("harvester-bench")
    # Full untimed warmup pass: JIT/codegen for every plan shape, parquet
    # footers cached. The timed passes then measure steady-state execution —
    # first-call numbers were dominated by JIT compilation (≈5x on the
    # widest plans), which a long-lived cluster never pays per query.
    for spec in QUERIES.values():
        spec.fn(spark, sf_dir).write.mode("overwrite").format("noop").save()

    # Two timed passes, keep each query's best: this box runs other
    # workloads, and a single pass regularly charges 5-8s of foreign load
    # to whichever query it lands on. The min of two warm runs is the
    # steady-state number a dedicated cluster would see.
    per_query: dict[str, float] = {}
    for _ in range(2):
        for name, spec in QUERIES.items():
            t0 = time.time()
            spec.fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            dt = round(time.time() - t0, 3)
            if name not in per_query or dt < per_query[name]:
                per_query[name] = dt

    total = round(sum(per_query.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total warm wall-clock over registered query inventory",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
