"""North-metric-only scaling execution (rollup throughput at 2/8/32
pinned cores on the dense 100M-turn input) — the binding north-rule pair
without the full-pipeline supplement, for repeat executions under a
wall-clock budget.  Writes the same JSON shape as bench_scaling.py's
``north_rollup`` section (plus hw control) so aggregate_scaling.py can
consume it.

Round-5 refinement: the GEMM hardware control additionally runs
PER LEG, immediately before that leg, at that leg's core count
(``hw_control_per_leg``) — the box drifts ±30 % within one execution
(BENCH_AB_r05 controls), so a start-of-execution control can be stale
by the time the 32-core leg runs.  The execution-level ``hw_control``
block is kept for continuity with the r04 artifacts; the per-leg pair
ceiling (``hw_ceiling_eff_2_8_per_leg``) is the time-local one.

Usage: python scripts/north_only_execution.py [out.json]
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from bench_scaling import (  # noqa: E402
    ensure_input, hw_control, input_path, pair_metrics, run,
)


def hw_control_one(nproc: int) -> float:
    """Pooled pinned GEMM tasks/s at ONE core count (the per-leg control)."""
    code = r"""
import os, time, json, sys
os.environ["OPENBLAS_NUM_THREADS"]="1"; os.environ["OMP_NUM_THREADS"]="1"
import numpy as np
from multiprocessing import Pool
def work(seed):
    rng = np.random.default_rng(seed)
    a = rng.normal(0,1,(416,120)); b = rng.normal(0,1,(120,9600))
    s = 0.0
    for _ in range(60):
        s += (a @ b).sum()
    return s
if __name__ == "__main__":
    nproc = int(sys.argv[1])
    os.sched_setaffinity(0, set(range(nproc)))
    tasks = nproc * 4
    t0=time.time()
    with Pool(nproc) as p:
        p.map(work, range(tasks))
    print(tasks/(time.time()-t0))
"""
    out = subprocess.run([sys.executable, "-c", code, str(nproc)],
                         capture_output=True, text=True, timeout=600)
    return float(out.stdout.strip().splitlines()[-1])


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    t0 = time.time()
    ensure_input(4000, 20000, 20)
    NORTH = input_path(4000, 20000, 20)
    hw = hw_control()
    legs, ctl = {}, {}
    for c in (2, 8, 32):
        ctl[str(c)] = round(hw_control_one(c), 4)
        legs[str(c)] = run(NORTH, c, n_iters=1, stages="rollup")
    nr2, nr8, nr32 = legs["2"], legs["8"], legs["32"]
    report = {
        "north_rollup": {
            "input": {"n_convs": 4000, "base_turns": 20000, "turns": nr2["turns"]},
            "legs": legs,
            "pair_2_to_8": pair_metrics(nr2, nr8, "rollup_turns_per_s"),
            "pair_8_to_32": pair_metrics(nr8, nr32, "rollup_turns_per_s"),
        },
        "hw_control_tasks_per_s": hw,
        "hw_ceiling_eff_2_8": round((hw["8"] / hw["2"]) / 4.0, 3),
        "hw_ceiling_eff_8_32": round((hw["32"] / hw["8"]) / 4.0, 3),
        "hw_control_per_leg": ctl,
        "hw_ceiling_eff_2_8_per_leg": round((ctl["8"] / ctl["2"]) / 4.0, 3),
        "hw_ceiling_eff_8_32_per_leg": round((ctl["32"] / ctl["8"]) / 4.0, 3),
        "target": 0.8,
        "harness_wall_s": round(time.time() - t0, 1),
        "north_only": True,
    }
    line = json.dumps(report)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
