"""Quantify the late-data repair's incrementality win: wall-clock of
``repair_late_turns`` for a handful of late turns vs a cold full
pipeline run on the same merged input, with the tier digests asserted
equal.  Writes scripts/REPAIR_WIN_r06.json.

The ratio is the point of plans/repair.py: at 10^12 turns a cold rerun
is off the table, and the repair's cost is O(affected buckets'
conversations) + O(partitions rewritten) — here measured on a ~1.2
M-turn input where even a generous affected set touches a small
fraction of the 32-bucket × ~days unit grid.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from more_pattern_extraction_spark.plans.pipeline import run_pipeline  # noqa: E402
from more_pattern_extraction_spark.plans.repair import repair_late_turns  # noqa: E402
from more_pattern_extraction_spark.session import get_spark  # noqa: E402
from more_pattern_extraction_spark.sources import catalog as CAT  # noqa: E402
from more_pattern_extraction_spark.sources.transcripts import (  # noqa: E402
    generate_transcripts,
)

TABLES = ["rollup_1m", "rollup_1m_filled", "chunks_1m", "rollup_1h", "rollup_1d"]


def digest(spark, root, name):
    df = CAT.read_table(spark, root, name)
    cols = sorted(c for c in df.columns if c != "tier")
    r = df.select(
        F.sum(
            F.pmod(
                F.xxhash64(*[F.col(c).cast("string") for c in cols]),
                F.lit(1_000_000_007),
            )
        ).alias("h"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    return [r["h"], r["n"]]


def main():
    n_buckets = int(os.environ.get("MPE_REPAIR_BUCKETS", "32"))
    spark = get_spark("measure_repair_win", cores=int(os.environ.get("MPE_CPUS", "32")))
    t = generate_transcripts(
        spark, n_convs=600, base_turns=2000, hot_convs=2, hot_mult=5
    ).cache()
    n_turns = t.count()

    pred = (
        ((F.col("conv_id") == "conv_00007") & (F.col("turn_idx") == 100))
        | ((F.col("conv_id") == "conv_00123") & (F.col("turn_idx") == 1500))
        | ((F.col("conv_id") == "conv_00400") & (F.col("turn_idx") == 3))
    )
    late, ontime = t.filter(pred).cache(), t.filter(~pred).cache()
    n_late = late.count()

    root = tempfile.mkdtemp(prefix="repair_win_")
    cold, out = f"{root}/cold", f"{root}/out"

    t0 = time.time()
    run_pipeline(spark, t, cold, input_snapshot="full", n_buckets=n_buckets)
    cold_wall = time.time() - t0

    run_pipeline(spark, ontime, out, input_snapshot="ontime", n_buckets=n_buckets)

    t0 = time.time()
    m = repair_late_turns(
        spark, t, late, out, input_snapshot="merged",
        prior_snapshot="ontime", n_buckets=n_buckets,
    )
    repair_wall = time.time() - t0

    equal = {}
    for name in TABLES:
        a, b = digest(spark, out, name), digest(spark, cold, name)
        equal[name] = a == b
    assert all(equal.values()), equal

    out_json = {
        "turns": n_turns,
        "late_turns": n_late,
        "cold_pipeline_wall_s": round(cold_wall, 2),
        "repair_wall_s": round(repair_wall, 2),
        "speedup": round(cold_wall / repair_wall, 2),
        "units_repaired": m["units_repaired"],
        "units_total": m["units_carried"] + m["units_repaired"],
        "buckets_touched": m["buckets_touched"],
        "all_tables_bit_equal_to_cold": equal,
        "cpus": int(os.environ.get("MPE_CPUS", "32")),
        "n_buckets": n_buckets,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "REPAIR_WIN_r06.json")
    runs = []
    if os.path.exists(path):
        prev = json.load(open(path))
        runs = prev.get("runs", [prev] if "turns" in prev else [])
    runs.append(out_json)
    with open(path, "w") as f:
        json.dump({"runs": runs}, f, indent=1)
    print(json.dumps(out_json))
    spark.stop()


if __name__ == "__main__":
    main()
