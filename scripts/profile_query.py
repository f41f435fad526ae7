#!/usr/bin/env python
"""Profile one or more registered queries: warm noop-sink timings plus
optional .explain("formatted") capture for plans/r11/ before/after files.

Usage:
  python scripts/profile_query.py [--runs N] [--explain plans/r11 --tag before] q1 [q2 ...]

Timing methodology matches bench.py (untimed warm pass, then N timed
passes, report min + all) so numbers are comparable to BENCH_FULL.json.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from harvester_database_and_automation_spark.plans import QUERIES  # noqa: E402
from harvester_database_and_automation_spark.plans.shared import cleanup_scratch  # noqa: E402
from harvester_database_and_automation_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--explain", default=None, help="directory for plan dumps")
    ap.add_argument("--tag", default="before", help="suffix for plan dumps")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    spark = get_spark("profile-query")
    for name in args.queries:
        spec = QUERIES[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        # capture plan BEFORE any timing (plan shape, not data)
        if args.explain:
            import contextlib
            import io

            df = spec.fn(spark, args.sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            outdir = Path(args.explain)
            outdir.mkdir(parents=True, exist_ok=True)
            (outdir / f"{name}_{args.tag}.txt").write_text(buf.getvalue())
            cleanup_scratch()
        # warm
        spec.fn(spark, args.sf_dir).write.mode("overwrite").format("noop").save()
        cleanup_scratch()
        times = []
        for _ in range(args.runs):
            t0 = time.time()
            spec.fn(spark, args.sf_dir).write.mode("overwrite").format("noop").save()
            times.append(round(time.time() - t0, 3))
            cleanup_scratch()
        print(f"{name}: min={min(times)} runs={times}", flush=True)


if __name__ == "__main__":
    main()
