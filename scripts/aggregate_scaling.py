"""Aggregate multiple bench_scaling executions into the final
BENCH_SCALING.md: per-execution numbers + medians, all three metrics
(raw, CPU-normalized, rollup-only/north) per pair, starved-leg gate
status per leg.

Usage: python scripts/aggregate_scaling.py scripts/scaling_runs_r04/scaling_out*.json
"""

from __future__ import annotations

import json
import statistics
import sys


def main() -> None:
    paths = sys.argv[1:]
    runs = []
    for p in paths:
        with open(p) as f:
            txt = f.read().strip()
        if not txt:
            continue
        runs.append((p, json.loads(txt.splitlines()[-1])))
    if not runs:
        sys.exit("no completed executions")

    rows = []
    for p, r in runs:
        n, fl = r["north_rollup"], r.get("full_pipeline")
        row = {
            "file": p.rsplit("/", 1)[-1],
            "north_raw_2_8": n["pair_2_to_8"]["efficiency"],
            "north_cpu_2_8": n["pair_2_to_8"]["cpu_normalized"],
            "north_raw_8_32": n["pair_8_to_32"]["efficiency"],
            "gates": {
                f"north{c}": (not n["legs"][c]["starved"]) for c in ("2", "8", "32")
            },
            "north_eff_cores_2": n["legs"]["2"]["effective_cores"],
            "hw_2_8": r["hw_ceiling_eff_2_8"],
            "hw_8_32": r["hw_ceiling_eff_8_32"],
        }
        if "hw_ceiling_eff_2_8_per_leg" in r:  # round-5 time-local control
            row["hw_2_8_per_leg"] = r["hw_ceiling_eff_2_8_per_leg"]
            row["hw_8_32_per_leg"] = r["hw_ceiling_eff_8_32_per_leg"]
        if fl is not None:
            row.update({
                "full_raw_2_8": fl["pair_2_to_8"]["efficiency"],
                "full_cpu_2_8": fl["pair_2_to_8"]["cpu_normalized"],
                "full_raw_8_32": fl["pair_8_to_32"]["efficiency"],
                "full_eff_cores_2": fl["legs"]["2"]["effective_cores"],
            })
            row["gates"] |= {
                f"full{c}": (not fl["legs"][c]["starved"]) for c in ("2", "8", "32")
            }
        rows.append(row)

    def med(key):
        vals = [x[key] for x in rows if key in x]
        return round(statistics.median(vals), 3) if vals else None

    medians = {k: med(k) for k in (
        "north_raw_2_8", "north_cpu_2_8", "north_raw_8_32",
        "full_raw_2_8", "full_cpu_2_8", "full_raw_8_32",
        "hw_2_8", "hw_8_32", "hw_2_8_per_leg", "hw_8_32_per_leg",
    )}
    summary = {
        "executions": len(rows),
        "median": {k: v for k, v in medians.items() if v is not None},
        "per_execution": rows,
        "target": 0.8,
    }
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
