#!/usr/bin/env python
"""Per-job breakdown of one registered query via the Spark UI REST API.

Usage: SPARK_UI=true python scripts/profile_jobs.py <query> [--sf-dir D]

Runs the query once warm (untimed), once timed, then prints every Spark
job of the timed run with duration, stage names and shuffle volumes —
the local-mode substitute for clicking through the UI (guide §7.1).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("SPARK_UI", "true")

from harvester_database_and_automation_spark.plans import QUERIES  # noqa: E402
from harvester_database_and_automation_spark.plans.shared import cleanup_scratch  # noqa: E402
from harvester_database_and_automation_spark.session import get_spark  # noqa: E402


def _get(url: str):
    with urllib.request.urlopen(url) as r:
        return json.loads(r.read().decode())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    spark = get_spark("profile-jobs")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    spec = QUERIES[args.query]

    if not args.no_warm:
        spec.fn(spark, args.sf_dir).write.mode("overwrite").format("noop").save()
        cleanup_scratch()

    jobs_before = {j["jobId"] for j in _get(f"{ui}/api/v1/applications/{app_id}/jobs?status=succeeded")}

    t0 = time.time()
    spec.fn(spark, args.sf_dir).write.mode("overwrite").format("noop").save()
    wall = time.time() - t0
    cleanup_scratch()

    jobs = [
        j
        for j in _get(f"{ui}/api/v1/applications/{app_id}/jobs")
        if j["jobId"] not in jobs_before
    ]
    jobs.sort(key=lambda j: j["jobId"])
    total_job_ms = 0
    print(f"query={args.query} wall={wall:.3f}s jobs={len(jobs)}")
    prev_end = None
    from datetime import datetime, timezone

    def ts(s):
        return datetime.strptime(s, "%Y-%m-%dT%H:%M:%S.%f%Z").replace(tzinfo=timezone.utc)

    for j in jobs:
        sub, comp = ts(j["submissionTime"]), ts(j.get("completionTime", j["submissionTime"]))
        dur = (comp - sub).total_seconds()
        gap = (sub - prev_end).total_seconds() if prev_end else 0.0
        prev_end = comp
        total_job_ms += dur
        desc = (j.get("description") or j.get("name") or "")[:100]
        print(
            f"  job {j['jobId']:4d}  dur={dur:7.3f}s gap={gap:7.3f}s tasks={j['numTasks']:4d}  {desc}"
        )
    print(f"sum(job dur)={total_job_ms:.3f}s wall={wall:.3f}s (gap = driver-side time between jobs)")


if __name__ == "__main__":
    main()
