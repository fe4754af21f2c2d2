"""Measure the dense-grid interpolation's premium (if any) on UNIFORM
data vs the plain per-conversation window form.

Round 6 replaced gap-fill's interpolation with ``interpolate_dense``
(anchor-time arithmetic, (conv, day)-segmented windows, sparse-side
carry summary) because the plain form sorts a conversation's whole grid
on one task — the skew fix is measured (SKEW_SCALING_r06.json: the
10 M-turn conversation's gap-fill stage went 23.3 s → 13.0 s at 8
cores).  Like the segmented lag (SEG_OVERHEAD_r06.json, 37 % premium →
adaptive gate), the question is what the skew insurance costs when no
conversation is hot.

Method (the established one): 8 pinned cores, a gappy ~2 M-turn input
(the generator's long-gap holes exercise real interpolation), the 1m
rollup written to parquet once so both variants scan identical bytes,
interleaved A/B/A/B/A/B drains (dense vs plain) so box drift hits both
symmetrically, min-of-3, full-row checksum equality asserted, GEMM
control before/after.

Usage: python scripts/measure_gapfill_dense.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

CORES = 8
os.sched_setaffinity(0, set(range(CORES)))
os.environ.setdefault("MPE_DRIVER_MEM", f"{2 * CORES}g")

from _scaling_job import CpuMeter  # noqa: E402
from north_only_execution import hw_control_one  # noqa: E402

N_CONVS, BASE_TURNS = int(os.environ.get("MPE_GF_CONVS", "800")), int(os.environ.get("MPE_GF_TURNS", "2500"))


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "scripts/GAPFILL_DENSE_AB_r06.json"

    ctl_before = hw_control_one(CORES)

    meter = CpuMeter()
    meter.start()
    from pyspark.sql import functions as F

    from more_pattern_extraction_spark.operators import gapfill as G
    from more_pattern_extraction_spark.operators import rollup as R
    from more_pattern_extraction_spark.session import drain_checksum, get_spark
    from more_pattern_extraction_spark.sources.transcripts import generate_transcripts

    spark = get_spark("gapfill_ab", cores=CORES, shuffle_partitions=CORES * 8)
    t = generate_transcripts(spark, n_convs=N_CONVS, base_turns=BASE_TURNS,
                             hot_convs=0, hot_mult=1)
    tmp = tempfile.mkdtemp(prefix="gapfill_ab_")
    R.rollup_from_raw(R.turn_features(t), "1m").write.parquet(f"{tmp}/r1m")
    rollup = spark.read.parquet(f"{tmp}/r1m")
    n_rollup = rollup.count()  # warm scan
    spark.range(CORES * 4, numPartitions=CORES).mapInPandas(
        lambda it: it, "id long"
    ).count()  # warm python workers

    def dense():
        return G.gap_fill_rollup(rollup, "1m")

    def plain():
        d = G.densify(rollup, "1m")
        d = d.withColumn("turn_cnt", F.coalesce("turn_cnt", F.lit(0)))
        d = d.withColumn("tool_call_cnt", F.coalesce("tool_call_cnt", F.lit(0)))
        return G.interpolate(d, ["latency_avg"], limit=1, with_locf=True)

    variants = {"dense": dense, "plain": plain}
    walls: dict[str, list[float]] = {k: [] for k in variants}
    cpus: dict[str, list[float]] = {k: [] for k in variants}
    checksums: dict[str, dict] = {}
    for rep in range(3):
        for name, fn in variants.items():
            df = fn()
            t0, c0 = time.time(), meter.read()
            d = drain_checksum(df)
            walls[name].append(round(time.time() - t0, 2))
            cpus[name].append(round(meter.read() - c0, 1))
            checksums[name] = {"rows": d.rows, "checksum": d.checksum}
    assert checksums["dense"] == checksums["plain"], checksums

    ctl_after = hw_control_one(CORES)
    dw, pw = min(walls["dense"]), min(walls["plain"])
    result = {
        "cores": CORES,
        "rollup_rows": n_rollup,
        "grid_rows": checksums["dense"]["rows"],
        "walls_s": walls,
        "cpu_s": cpus,
        "min_wall_s": {"dense": dw, "plain": pw},
        "premium_wall_frac": round(dw / pw - 1, 4),
        "premium_cpu_frac": round(min(cpus["dense"]) / min(cpus["plain"]) - 1, 4),
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
