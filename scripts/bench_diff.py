#!/usr/bin/env python
"""Compare the current BENCH_FULL.json against a previous bench artifact
and print per-query regressions — the local feedback loop between bench
refreshes (the driver only records per-round snapshots).

Usage: python scripts/bench_diff.py [old.json] [threshold_ratio=1.5]

With no old.json argument the previous snapshot is the committed
BENCH_FULL.json (``git show HEAD:BENCH_FULL.json``) — the natural
before/after pair around a bench refresh. (BENCH_r0N.json artifacts hold
a truncated stdout tail, not a per-query map, and cannot be compared.)
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path


def main() -> int:
    repo = Path(__file__).resolve().parent.parent
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 1.5
    cur = json.loads((repo / "BENCH_FULL.json").read_text())

    try:
        if len(sys.argv) > 1:
            old = json.loads(Path(sys.argv[1]).read_text())
        else:
            old = json.loads(
                subprocess.run(
                    ["git", "show", "HEAD:BENCH_FULL.json"],
                    cwd=repo, capture_output=True, text=True, check=True,
                ).stdout
            )
        old_q = old.get("queries") or {}
    except (OSError, ValueError, subprocess.CalledProcessError):
        print("no readable previous bench snapshot")
        return 0
    if not old_q:
        print("previous snapshot has no per-query map; nothing to compare")
        return 0

    cur_q = cur["queries"]
    regressions, improved, added = [], [], []
    for name, t in sorted(cur_q.items()):
        if name not in old_q:
            added.append(name)
        elif old_q[name] > 0 and t / old_q[name] >= threshold and t - old_q[name] > 0.3:
            regressions.append((name, old_q[name], t))
        elif t > 0 and old_q[name] / t >= threshold and old_q[name] - t > 0.3:
            improved.append((name, old_q[name], t))
    print(
        f"{len(cur_q)} queries now ({cur.get('sec_per_query', '?')} s/q) vs "
        f"{len(old_q)} before; {len(added)} new"
    )
    for name, a, b in sorted(regressions, key=lambda r: -(r[2] - r[1])):
        print(f"[SLOWER] {name}: {a}s -> {b}s")
    for name, a, b in sorted(improved, key=lambda r: -(r[1] - r[2]))[:10]:
        print(f"[faster] {name}: {a}s -> {b}s")

    # Environment-delta note: this box's wall-clock drifts with foreign
    # load (the round-2 driver measured the same inventory 19% slower
    # than the committed artifact). A UNIFORM shift across the shared
    # queries is an environment delta, not a plan change — flag it so a
    # bench refresh is interpreted (and committed) accordingly.
    shared = [(old_q[n], t) for n, t in cur_q.items() if n in old_q and old_q[n] > 0 and t > 0]
    if shared:
        ratios = sorted(t / a for a, t in shared)
        med = ratios[len(ratios) // 2]
        # Calibration normalization (bench.py runs a PINNED scan+agg and
        # records calibration_sec): the calibration ratio IS the
        # environment shift, measured on a plan that never changes —
        # dividing the per-query median by it separates real plan drift
        # from box drift without eyeballing uniformity.
        # Prefer the CPU-bound probe when both snapshots carry it (round
        # 10): the IO scan probe measurably under-captures CPU drift.
        cal_old, cal_cur = old.get("calibration_cpu_sec"), cur.get("calibration_cpu_sec")
        probe = "cpu"
        if not (cal_old and cal_cur):
            cal_old, cal_cur = old.get("calibration_sec"), cur.get("calibration_sec")
            probe = "io"
        if cal_old and cal_cur:
            env = cal_cur / cal_old
            print(
                f"[calibration:{probe}] pinned workload {cal_old}s -> {cal_cur}s "
                f"(env factor {env:.2f}x); normalized median per-query ratio "
                f"{med / env:.2f}x across {len(shared)} shared queries"
            )
        if med >= 1.1 or med <= 0.9:
            direction = "slower" if med > 1 else "faster"
            print(
                f"[env-delta] median per-query ratio {med:.2f}x ({direction}) across "
                f"{len(shared)} shared queries — a uniform shift of this size is "
                "environment noise, not a plan change; commit the refreshed "
                "BENCH_FULL.json so the repo's numbers match the latest measurement"
            )
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
