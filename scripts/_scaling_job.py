"""One scaling-run invocation: the rollup-engine compute path (features →
1m rollup → gap-fill → chunk encode → matrix profile) on a fixed parquet
input at a given core count.  Fresh JVM per invocation (bench_scaling.py
runs this via subprocess) so the two cluster sizes don't share state.

Prints one JSON line: {"cores": N, "wall_s": ..., "turns": ...}.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from more_pattern_extraction_spark.session import get_spark  # noqa: E402


def main() -> None:
    input_path, cores = sys.argv[1], int(sys.argv[2])
    spark = get_spark(f"scaling_{cores}", cores=cores, shuffle_partitions=cores)
    from more_pattern_extraction_spark.operators import chunks as CH
    from more_pattern_extraction_spark.operators import gapfill as G
    from more_pattern_extraction_spark.operators import matrix_profile as MP
    from more_pattern_extraction_spark.operators import rollup as R

    turns = spark.read.parquet(input_path)
    n_turns = turns.count()  # warm scan outside the timed region

    stages = {}
    t0 = time.time()
    feats = R.turn_features(turns)
    r1m = R.rollup_from_raw(feats, "1m").persist()
    r1m.count()
    stages["rollup"] = round(time.time() - t0, 2)

    t1 = time.time()
    filled = G.gap_fill_rollup(r1m, "1m").persist()
    n_filled = filled.count()
    stages["gapfill"] = round(time.time() - t1, 2)

    t1 = time.time()
    enc = CH.encode_chunks(r1m, ["latency_avg", "latency_sum"], "1m")
    n_chunks = enc.count()
    stages["chunks"] = round(time.time() - t1, 2)

    t1 = time.time()
    grid = filled.select(
        "conv_id", "bucket_start",
        F.coalesce("latency_avg_filled", "latency_avg_locf", F.lit(0.0)).alias(
            "latency_avg_filled"
        ),
    )
    # windowed MP (per conv per week, m = 2 h on the 1m grid): bounded
    # tasks even for Zipf-hot conversations — the skew-safe production
    # shape, and the same workload shape as the reference's m=1-day
    # profile on a 60 s grid (notebooks/interesting_patterns.ipynb)
    n_mp = MP.matrix_profile(grid, 120, window="week").count()
    stages["matrix_profile"] = round(time.time() - t1, 2)
    wall = time.time() - t0

    spark.stop()
    print(
        json.dumps(
            {
                "cores": cores,
                "wall_s": round(wall, 2),
                "turns": n_turns,
                "rows_filled": n_filled,
                "chunks": n_chunks,
                "mp_rows": n_mp,
                "stages": stages,
                "turns_per_s": round(n_turns / wall, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
