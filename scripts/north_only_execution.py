"""North-metric-only scaling execution (rollup throughput at 2/8/32
pinned cores on the dense 100M-turn input) — the binding north-rule pair
without the full-pipeline supplement, for repeat executions under a
wall-clock budget.  Writes the same JSON shape as bench_scaling.py's
``north_rollup`` section (plus hw control) so aggregate_scaling.py can
consume it.

Usage: python scripts/north_only_execution.py [out.json]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from bench_scaling import (  # noqa: E402
    ensure_input, hw_control, input_path, pair_metrics, run,
)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    t0 = time.time()
    ensure_input(4000, 20000, 20)
    NORTH = input_path(4000, 20000, 20)
    hw = hw_control()
    nr2 = run(NORTH, 2, n_iters=1, stages="rollup")
    nr8 = run(NORTH, 8, n_iters=1, stages="rollup")
    nr32 = run(NORTH, 32, n_iters=1, stages="rollup")
    report = {
        "north_rollup": {
            "input": {"n_convs": 4000, "base_turns": 20000, "turns": nr2["turns"]},
            "legs": {"2": nr2, "8": nr8, "32": nr32},
            "pair_2_to_8": pair_metrics(nr2, nr8, "rollup_turns_per_s"),
            "pair_8_to_32": pair_metrics(nr8, nr32, "rollup_turns_per_s"),
        },
        "hw_control_tasks_per_s": hw,
        "hw_ceiling_eff_2_8": round((hw["8"] / hw["2"]) / 4.0, 3),
        "hw_ceiling_eff_8_32": round((hw["32"] / hw["8"]) / 4.0, 3),
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
