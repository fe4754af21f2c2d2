"""Skew execution for the scaling harness (VERDICT r05 optional #9): one
hot conversation holding the majority of ALL turns runs through the full
pipeline (features → 1m rollup → gap-fill → chunk encode → week-windowed
matrix profile) at 2 vs 8 pinned cores, same gates and metering as
`bench_scaling.py`.  The unit tests cover the skew *mechanics*
(`plans/partitioning.with_salt`, banded MP); this execution covers the
north-rule *claim*: scaling efficiency stays ≥ 0.8 when the key
distribution is degenerate, because every grouped stage sub-keys hot
conversations structurally —

  * rollup groups on (conv, minute-bucket): the hot conv's 2 M turns are
    ~463 days of buckets, not one key;
  * gap-fill spines per (conv, day): ≤ 1440 buckets per group;
  * chunk encode groups on (conv, ts_bucket);
  * matrix profile windows per (conv, week): the hot conv becomes ~66
    independent week-tasks instead of one 2 M-point group.

Input shape: N_CONVS cold conversations at BASE_TURNS plus ONE hot
conversation at BASE_TURNS×HOT_MULT (deterministic generator, dense
gaps like the north input so rollup buckets actually aggregate).  The
hot share of total turns is recorded in the artifact.

Reuses bench_scaling.run (pinned fresh-JVM legs, starved-leg gate,
per-core-constant memory) and hw_control (the box's own 2→8 ceiling).

Usage: python scripts/skew_scaling.py [N_CONVS] [BASE_TURNS] [HOT_MULT] [OUT]
       defaults 200 4000 500  → hot conv = 2,000,000 turns ≈ 2/3 of input
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_scaling import hw_control, pair_metrics, run  # noqa: E402


def ensure_skew_input(n_convs: int, base_turns: int, hot_mult: int,
                      gap_max_s: int = 20) -> str:
    path = f"/tmp/mpe_skew_input_{n_convs}x{base_turns}h{hot_mult}_g{gap_max_s}_rr"
    if os.path.exists(path + "/_SUCCESS"):
        return path
    from more_pattern_extraction_spark.session import get_spark
    from more_pattern_extraction_spark.sources.transcripts import generate_transcripts

    spark = get_spark("gen_skew_input", cores=32)
    df = generate_transcripts(
        spark, n_convs=n_convs, base_turns=base_turns, hot_convs=1,
        hot_mult=hot_mult, gap_max_s=gap_max_s, long_gaps=False,
    )
    # round-robin layout, NOT repartition(conv_id): clustering files by
    # conversation would put the hot conversation's 10 M turns in ONE
    # parquet file, serializing the rollup's map-side partial aggregate
    # onto the ~2 tasks that scan it (measured: rollup at 1.4 effective
    # cores on 8).  Real transcript ingest is time-ordered across files —
    # a conversation's turns are spread, which is what round-robin models;
    # the engine's own tier writes handle conversation clustering later.
    df.repartition(64).write.mode("overwrite").parquet(path)
    spark.stop()
    return path


def skew_stats(path: str) -> dict:
    import duckdb

    hot, total = duckdb.sql(
        f"""select max(cnt), sum(cnt)
            from (select conv_id, count(*) cnt
                  from parquet_scan('{path}/*.parquet') group by conv_id)"""
    ).fetchone()
    return {"total_turns": int(total), "hot_conv_turns": int(hot),
            "hot_share": round(hot / total, 3)}


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    base_turns = int(sys.argv[2]) if len(sys.argv) > 2 else 4000
    hot_mult = int(sys.argv[3]) if len(sys.argv) > 3 else 500
    out_path = sys.argv[4] if len(sys.argv) > 4 else "scripts/SKEW_SCALING_r06.json"

    t0 = time.time()
    path = ensure_skew_input(n_convs, base_turns, hot_mult)
    stats = skew_stats(path)
    print(json.dumps({"input": stats}), file=sys.stderr, flush=True)
    hw = hw_control()

    # full pipeline, equal iteration counts across the pair
    r2 = run(path, 2, n_iters=1)
    r8 = run(path, 8, n_iters=1)

    pair = pair_metrics(r2, r8, "turns_per_s")
    pair["rollup_only_efficiency"] = round(
        (r8["rollup_turns_per_s"] / r2["rollup_turns_per_s"]) / 4.0, 3)
    hw_2_8 = round((hw["8"] / hw["2"]) / 4.0, 3)

    out = {
        "design": ("one hot conversation (majority of all turns) through the "
                   "full pipeline at 2 vs 8 pinned cores; bench_scaling gates "
                   "and metering"),
        "input": {"n_convs": n_convs, "base_turns": base_turns,
                  "hot_mult": hot_mult, **stats},
        "legs": {"2": r2, "8": r8},
        "pair_2_8": pair,
        "hw_control_2_8": hw_2_8,
        "hw_control_raw": hw,
        "harness_wall_s": round(time.time() - t0, 1),
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"pair_2_8": pair, "hw_2_8": hw_2_8,
                      "gates": [r2["gate_ok"], r8["gate_ok"]],
                      "input": stats}))


if __name__ == "__main__":
    main()
