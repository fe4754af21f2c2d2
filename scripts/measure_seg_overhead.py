"""Measure the segmented-lag skew-insurance premium on UNIFORM data.

Round 6 made ``turn_features`` default to the segmented scan
(``seg_rows=100_000``): the lag window partitions on ``(conv_id, blk)``
so a hot conversation's sort spreads across cores, at the price of one
extra column-pruned scan of raw turns (the per-block carry summary) plus
a broadcast probe per row.  The skew win is measured
(scripts/SKEW_SCALING_r06.json vs _preseg.json); this script measures
the premium paid on NON-skew data — the dense north input where every
conversation is far smaller than ``seg_rows`` and the carry is never
consulted.

Method: 8 pinned cores, the north 100M-turn input, interleaved
A/B/A/B/A/B drains (seg vs unsegmented) so box drift hits both variants
symmetrically, min-of-3 per variant, checksum equality asserted between
variants, GEMM control before/after.

Usage: python scripts/measure_seg_overhead.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

CORES = 8
os.sched_setaffinity(0, set(range(CORES)))
os.environ.setdefault("MPE_DRIVER_MEM", f"{2 * CORES}g")

from _scaling_job import CpuMeter  # noqa: E402
from bench_scaling import ensure_input, input_path  # noqa: E402
from north_only_execution import hw_control_one  # noqa: E402

N_CONVS, BASE_TURNS = 4000, 20000


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "scripts/SEG_OVERHEAD_r06.json"
    ensure_input(N_CONVS, BASE_TURNS)

    ctl_before = hw_control_one(CORES)

    meter = CpuMeter()
    meter.start()
    from more_pattern_extraction_spark.operators import rollup as R
    from more_pattern_extraction_spark.session import drain_checksum, get_spark

    spark = get_spark("seg_overhead", cores=CORES, shuffle_partitions=CORES * 8)
    turns = spark.read.parquet(input_path(N_CONVS, BASE_TURNS))
    n_turns = turns.count()  # warm scan
    spark.range(CORES * 4, numPartitions=CORES).mapInPandas(
        lambda it: it, "id long"
    ).count()  # warm python workers

    variants = {"seg_100k": 100_000, "unsegmented": None}
    walls: dict[str, list[float]] = {k: [] for k in variants}
    cpus: dict[str, list[float]] = {k: [] for k in variants}
    checksums: dict[str, str] = {}
    for rep in range(3):
        for name, seg in variants.items():
            df = R.rollup_from_raw(R.turn_features(turns, seg_rows=seg), "1m")
            t0, c0 = time.time(), meter.read()
            d = drain_checksum(df)
            walls[name].append(round(time.time() - t0, 2))
            cpus[name].append(round(meter.read() - c0, 1))
            checksums[name] = d.checksum
    assert checksums["seg_100k"] == checksums["unsegmented"], checksums

    ctl_after = hw_control_one(CORES)
    seg_w, uns_w = min(walls["seg_100k"]), min(walls["unsegmented"])
    result = {
        "cores": CORES,
        "turns": n_turns,
        "walls_s": walls,
        "cpu_s": cpus,
        "min_wall_s": {"seg_100k": seg_w, "unsegmented": uns_w},
        "turns_per_s": {
            "seg_100k": round(n_turns / seg_w, 1),
            "unsegmented": round(n_turns / uns_w, 1),
        },
        "premium_wall_frac": round(seg_w / uns_w - 1, 4),
        "premium_cpu_frac": round(
            min(cpus["seg_100k"]) / min(cpus["unsegmented"]) - 1, 4
        ),
        "checksum_equal": True,
        "hw_control_tasks_per_s": {
            "before": round(ctl_before, 2),
            "after": round(ctl_after, 2),
        },
    }
    meter.stop()
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
