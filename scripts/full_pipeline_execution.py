"""Full-pipeline-only scaling execution (2 vs 8 pinned cores) — the
stricter supplement re-run after the stage list changed (round 6:
`_scaling_job.py` gained the `distinct` KMV-partials stage when
plans/pipeline.py gained the distinct_1m table), so the supplement's
efficiency row reflects what run_pipeline actually does at HEAD.

Same gates/metering/per-leg time-local GEMM control as
north_only_execution.py; writes a JSON with the same ``full_pipeline``
shape as bench_scaling.py's section.  The 32-core leg is omitted — it is
hardware-capped (BENCH_SCALING.md §8→32) and not part of the binding
pair.

Usage: python scripts/full_pipeline_execution.py [out.json]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from bench_scaling import (  # noqa: E402
    ensure_input, input_path, pair_metrics, run,
)
from north_only_execution import hw_control_one  # noqa: E402


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    n_convs, base_turns = 600, 10000
    t0 = time.time()
    ensure_input(n_convs, base_turns)
    FULL = input_path(n_convs, base_turns)
    full_limit = n_convs // 2
    legs, ctl = {}, {}
    for c in (2, 8):
        ctl[str(c)] = round(hw_control_one(c), 4)
        legs[str(c)] = run(FULL, c, conv_limit=full_limit, n_iters=2)
    r2, r8 = legs["2"], legs["8"]
    pair = pair_metrics(r2, r8, "turns_per_s")
    pair["rollup_only_efficiency"] = round(
        (r8["rollup_turns_per_s"] / r2["rollup_turns_per_s"]) / 4.0, 3)
    report = {
        "full_pipeline": {
            "input": {"n_convs": full_limit, "base_turns": base_turns,
                      "turns": r2["turns"]},
            "legs": legs,
            "pair_2_to_8": pair,
        },
        "hw_control_per_leg": ctl,
        "hw_ceiling_eff_2_8_per_leg": round((ctl["8"] / ctl["2"]) / 4.0, 3),
        "target": 0.8,
        "harness_wall_s": round(time.time() - t0, 1),
        "full_pipeline_only": True,
        "stage_list": ["rollup", "gapfill", "chunks", "distinct",
                       "matrix_profile"],
    }
    line = json.dumps(report)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
