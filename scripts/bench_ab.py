"""Interleaved same-window A/B benchmark of two repo checkouts
(VERDICT r04 "next round" #1): settle whether the four >40 % BENCH_r04
wall regressions were code or host drift.

Design (v2 — the first execution exposed three weaknesses):

* **Counterbalanced order** (AB BA AB BA…), not strict alternation: in
  v1 the B leg always ran second in each pair and saw systematically
  higher steal (0.03–0.07 vs 0.007–0.05), biasing B slow.
* **Settle gate before every run**: wait until a 5 s window shows
  steal_frac < 0.02 and non-self busy < 0.25 (up to 3 min), so a run
  never starts inside another run's JVM teardown or an external burst.
* **Per-run GEMM control**: a ~4 s pinned single-core GEMM immediately
  before each bench run yields that moment's box speed; deltas are
  reported both raw and normalized by the paired control, because this
  box drifts ±30 % within one 15-minute window (v1 measured control
  1.317 → 0.909 tasks/s pre→post).

Built-in noise floor: queries whose code is IDENTICAL in both checkouts
(r03→r04 touched only matrix_profile sort + added the sketch)
calibrate how much delta pure environment produces — v1 showed +42 %
on a docstring-only query, which is the strongest argument that
same-window wall-clock alone cannot condemn a code path on this box.

Usage:
    python scripts/bench_ab.py REPO_A REPO_B [REPS] [OUT_JSON]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

CLK = os.sysconf("SC_CLK_TCK")
NCPU = os.cpu_count() or 32


def read_stat() -> tuple[float, float]:
    """(steal_s, busy_s) whole-box since boot."""
    with open("/proc/stat") as f:
        parts = f.readline().split()
    v = [int(x) for x in parts[1:]]
    busy = v[0] + v[1] + v[2] + (v[5] if len(v) > 5 else 0) + (v[6] if len(v) > 6 else 0)
    return v[7] / CLK if len(v) > 7 else 0.0, busy / CLK


def settle(max_wait: float = 180.0) -> dict:
    """Block until a 5 s window is quiet (steal < 2 %, busy < 25 %)."""
    t0 = time.time()
    last = {}
    while time.time() - t0 < max_wait:
        s0, b0 = read_stat()
        time.sleep(5)
        s1, b1 = read_stat()
        steal = (s1 - s0) / (5 * NCPU)
        busy = (b1 - b0) / (5 * NCPU)
        last = {"steal_frac": round(steal, 4), "busy_frac": round(busy, 4)}
        if steal < 0.02 and busy < 0.25:
            last["settled"] = True
            return last
    last["settled"] = False
    return last


def gemm_control() -> float:
    """Single-process pinned GEMM tasks/sec — the box-speed yardstick."""
    code = r"""
import os, time
os.environ["OPENBLAS_NUM_THREADS"]="1"; os.environ["OMP_NUM_THREADS"]="1"
os.sched_setaffinity(0, {0})
import numpy as np
rng = np.random.default_rng(7)
a = rng.normal(0,1,(416,120)); b = rng.normal(0,1,(120,9600))
t0=time.time(); s=0.0
for _ in range(120): s += (a @ b).sum()
print(12/(time.time()-t0))
"""
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=300)
    return round(float(out.stdout.strip().splitlines()[-1]), 3)


def run_bench(repo: str) -> dict:
    env = os.environ | {
        "SPARK_GRAFT_SF_DIR": os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        "SPARK_GRAFT_CPUS": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    }
    gate = settle()
    ctl = gemm_control()
    (s0, _), t0 = read_stat(), time.time()
    out = subprocess.run([sys.executable, "bench.py"], cwd=repo, env=env,
                         capture_output=True, text=True, timeout=900)
    wall, steal = time.time() - t0, read_stat()[0] - s0
    # ADVICE r05: a failed rep must raise a diagnosable error (returncode +
    # stderr tail), not an IndexError on the missing stdout line
    if out.returncode != 0:
        raise RuntimeError(
            f"bench.py in {repo} exited {out.returncode}; stderr tail:\n"
            + "\n".join(out.stderr.splitlines()[-15:])
        )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(
            f"bench.py in {repo} produced no JSON line; stdout tail:\n"
            + "\n".join(out.stdout.splitlines()[-10:])
        )
    rec = json.loads(lines[-1])
    rec["_wall_s"] = round(wall, 1)
    rec["_steal_frac"] = round(steal / (NCPU * wall), 4)
    rec["_gate"] = gate
    rec["_control"] = ctl
    return rec


def median_tbl(runs: list[dict], norm: bool) -> dict:
    queries = sorted({q for r in runs for q in r["queries"]})
    out = {}
    for q in queries:
        vals = [r["queries"][q] * (r["_control"] if norm else 1.0)
                for r in runs if q in r["queries"]]
        if vals:
            out[q] = round(statistics.median(vals), 3)
    return out


def main() -> None:
    repo_a, repo_b = sys.argv[1], sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    out_path = sys.argv[4] if len(sys.argv) > 4 else "BENCH_AB_r05.json"

    runs: dict[str, list[dict]] = {"A": [], "B": []}
    partial_path = out_path + ".partial"
    for i in range(reps):
        order = (("A", repo_a), ("B", repo_b)) if i % 2 == 0 else (("B", repo_b), ("A", repo_a))
        for label, repo in order:
            try:
                rec = run_bench(repo)
            except Exception:
                # ADVICE r05: persist completed reps before re-raising so a
                # multi-hour run that dies on rep k keeps reps 0..k-1
                with open(partial_path, "w") as f:
                    json.dump(runs, f, indent=1)
                print(f"rep {i} label {label} failed; partial results in "
                      f"{partial_path}", file=sys.stderr, flush=True)
                raise
            rec["_rep"] = i
            runs[label].append(rec)
            with open(partial_path, "w") as f:
                json.dump(runs, f, indent=1)
            print(json.dumps({"label": label, "rep": i, "total": rec["value"],
                              "steal_frac": rec["_steal_frac"],
                              "control": rec["_control"], "gate": rec["_gate"],
                              "queries": rec["queries"]}),
                  file=sys.stderr, flush=True)

    def deltas(norm: bool) -> dict:
        a, b = median_tbl(runs["A"], norm), median_tbl(runs["B"], norm)
        return {q: round(b[q] / a[q] - 1.0, 3) for q in a if q in b}

    result = {
        "design": "counterbalanced AB/BA, settle-gated, per-run GEMM control",
        "repo_a": {"path": repo_a, "head": git_head(repo_a)},
        "repo_b": {"path": repo_b, "head": git_head(repo_b)},
        "reps_each": reps,
        "median_sec_raw": {l: median_tbl(runs[l], False) for l in runs},
        "delta_b_over_a_raw": deltas(False),
        "delta_b_over_a_ctl_normalized": deltas(True),
        "controls_per_run": {l: [r["_control"] for r in runs[l]] for l in runs},
        "steal_frac_per_run": {l: [r["_steal_frac"] for r in runs[l]] for l in runs},
        "gates": {l: [r["_gate"] for r in runs[l]] for l in runs},
        "total_sec_per_run": {l: [r["value"] for r in runs[l]] for l in runs},
        "raw": runs,
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    if os.path.exists(partial_path):
        os.remove(partial_path)
    print(json.dumps({k: result[k] for k in
                      ("delta_b_over_a_raw", "delta_b_over_a_ctl_normalized",
                       "controls_per_run")}, indent=1))


def git_head(repo: str) -> str:
    out = subprocess.run(["git", "rev-parse", "--short", "HEAD"], cwd=repo,
                         capture_output=True, text=True)
    return out.stdout.strip()


if __name__ == "__main__":
    main()
