"""Headline benchmark (driver contract): runs the engine's flagship
operators at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ...,
     "throughput": {...rows/sec for the rollup path...}}

Measures compute, not tiny-file IO: results are drained with a full-row
checksum (sum of xxhash64 over every column) — count() would let Catalyst
prune the aggregate/window expressions being timed.  Scaling-efficiency evidence
(local[8] vs local[32]) is scripts/bench_scaling.py → BENCH_SCALING.md.

Methodology (VERDICT r05 #2 — the committed number must not be a single
draw on a drifting box): the default invocation runs $MPE_BENCH_REPS
(default 3) full-suite reps, each in a FRESH interpreter+JVM
(subprocess re-exec with MPE_BENCH_SINGLE=1), each preceded by a settle
gate (wait for a quiet 5 s /proc/stat window) and a pinned single-core
GEMM hardware control — the exact per-run discipline scripts/bench_ab.py
established.  The published "queries" are per-query RAW MEDIANS across
reps; "queries_ctl_normalized" are medians of sec × control (tasks/s),
the box-speed-adjusted cost the >20 % round-over-round rule compares
(scripts/compare_bench.py).  Per-rep walls, controls, steal fractions,
and gates are all recorded so the round ledger is auditable; drain
checksums must be bit-identical across reps (flagged if not).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts"))


def run_single() -> None:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from more_pattern_extraction_spark.session import drain_checksum, get_spark
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    spark = get_spark("bench", cores=cpus, shuffle_partitions=cpus)
    from more_pattern_extraction_spark.operators import chunks as CH
    from more_pattern_extraction_spark.operators import dedup as DD
    from more_pattern_extraction_spark.operators import gapfill as G
    from more_pattern_extraction_spark.operators import matrix_profile as MP
    from more_pattern_extraction_spark.operators import rollup as R
    from more_pattern_extraction_spark.operators import similarity_search as SS
    from more_pattern_extraction_spark.sources.transcripts import events_as_transcripts

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_events = ev.count()  # warm the scan
    # warm the python-worker pool (one-time interpreter+import setup a
    # long-lived cluster amortizes; without this the first UDF stage in
    # the suite is billed ~2s x cores of spawn cost)
    spark.range(cpus * 4, numPartitions=cpus).mapInPandas(
        lambda it: it, "id long"
    ).count()
    turns = events_as_transcripts(spark, sf_dir)
    feats = R.turn_features(turns, latency_col="latency")

    timings: dict[str, float] = {}
    checksums: dict[str, int] = {}

    def bench(name, thunk):
        t0 = time.time()
        res = thunk()
        timings[name] = round(time.time() - t0, 3)
        # DrainResult checksum → cross-round value-regression oracle
        # (VERDICT r04 #5): scripts/compare_bench_checksums.py fails if a
        # checksum moves for an unchanged query definition
        if hasattr(res, "checksum"):
            checksums[name] = res.checksum

    # A1: 1m rollup over the full stream (the headline metric's numerator)
    r1m = R.rollup_from_raw(feats, "1m")
    bench("rollup_1m", lambda: drain_checksum(r1m))
    # cascade 1m→1h→1d (re-agg only)
    bench("rollup_cascade", lambda: drain_checksum(R.cascade(R.cascade(r1m, "1h"), "1d")))
    # gap-fill one day of the grid (spine + LOCF + interp, all windows)
    day1 = r1m.filter(F.col("bucket_start") < "2024-01-03")
    bench("gapfill_2d", lambda: drain_checksum(G.gap_fill_rollup(day1, "1m")))
    # chunk codec round trip (DoD + Gorilla via pandas UDFs)
    bench(
        "chunks_roundtrip",
        lambda: drain_checksum(CH.decode_chunks(
            CH.encode_chunks(r1m, ["latency_avg", "latency_sum"], "1m")
        )),
    )
    # A1+: mergeable p95 sketch, built at 1m and merged up to 1d (round 4)
    from more_pattern_extraction_spark.operators import sketch as SK

    bench(
        "rollup_p95_sketch",
        lambda: drain_checksum(SK.sketch_quantile(
            SK.sketch_cascade(SK.sketch_cascade(SK.sketch_from_raw(feats, "1m"), "1h"), "1d")
        ).drop("latency_sketch")),
    )
    # W1: matrix profile per conversation (grouped STOMP kernel)
    series = turns.select(
        "conv_id", F.col("ts").alias("bucket_start"),
        F.col("latency").alias("latency_avg_filled"),
    ).na.drop(subset=["latency_avg_filled"])
    bench("matrix_profile", lambda: drain_checksum(MP.matrix_profile(series, 16)))
    # dedup: MinHash-LSH near-dup pairs over documents
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench(
        "dedup_minhash_lsh",
        lambda: drain_checksum(DD.minhash_lsh_pairs(
            docs, n_hashes=8, bands=4, threshold=0.5, max_bucket_width=4096
        )),
    )
    # ANN: brute-force cosine top-k over embeddings
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10)
    bench("embedding_topk", lambda: drain_checksum(SS.cosine_topk(emb, q, k=5)))
    # ANN scale path: IVF cell-probe search, quantizer trained on a
    # 1-in-10 sample (the 100 TB shape: sample-trained centroids, one
    # narrow corpus pass for assignment, probes hit 3/8 cells).
    # Training is timed inside the query — it is part of the work.
    bench(
        "embedding_topk_ivf",
        lambda: drain_checksum(SS.cosine_topk_ivf(
            emb, q, k=5, n_centroids=8, n_probe=3,
            centroids=SS.train_ivf_centroids(emb, 8, sample_mod=10),
        )),
    )
    # W3: AV-corrected matrix profile (relational annotation vector)
    bench(
        "corrected_matrix_profile",
        lambda: drain_checksum(MP.corrected_matrix_profile(series, 16)),
    )
    # W11: 2-dim mSTOMP (blocked-GEMM k-dim path)
    series2 = series.withColumn(
        "f2",
        F.lag("latency_avg_filled").over(
            Window.partitionBy("conv_id").orderBy("bucket_start")
        ),
    ).na.drop(subset=["f2"])
    bench(
        "matrix_profile_multidim",
        lambda: drain_checksum(MP.matrix_profile_multidim(
            series2, 16, ["latency_avg_filled", "f2"]
        )),
    )

    total = round(sum(timings.values()), 3)
    rollup_path_s = timings["rollup_1m"] + timings["rollup_cascade"]
    out = {
        "metric": "headline_operator_suite",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "checksums": checksums,
        "sf": sf,
        "throughput": {
            "events": n_events,
            "rollup_turns_per_s": round(n_events / max(rollup_path_s, 1e-9), 1),
        },
        "cpus": cpus,
    }
    spark.stop()
    print(json.dumps(out))


def main() -> None:
    """Gated-median orchestrator: N fresh-JVM reps, settle gate + GEMM
    control before each, medians + full per-rep audit trail in ONE line."""
    from bench_ab import gemm_control, read_stat, settle

    reps = int(os.environ.get("MPE_BENCH_REPS", "3"))
    ncpu = os.cpu_count() or 32
    rep_recs: list[dict] = []
    controls: list[float] = []
    gates: list[dict] = []
    steals: list[float] = []

    for i in range(reps):
        gates.append(settle(max_wait=90.0))
        controls.append(gemm_control())
        (s0, _), t0 = read_stat(), time.time()
        env = os.environ | {"MPE_BENCH_SINGLE": "1"}
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True,
                             timeout=1800)
        wall, steal = time.time() - t0, read_stat()[0] - s0
        if out.returncode != 0:
            raise RuntimeError(
                f"bench rep {i} exited {out.returncode}; stderr tail:\n"
                + "\n".join(out.stderr.splitlines()[-15:])
            )
        lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
        rec = json.loads(lines[-1])
        rec["_wall_s"] = round(wall, 1)
        steals.append(round(steal / (ncpu * wall), 4))
        rep_recs.append(rec)
        print(json.dumps({"rep": i, "total": rec["value"],
                          "control": controls[-1], "gate": gates[-1],
                          "steal_frac": steals[-1]}),
              file=sys.stderr, flush=True)

    names = sorted({q for r in rep_recs for q in r["queries"]})

    def med(q: str, norm: bool) -> float:
        vals = [r["queries"][q] * (controls[j] if norm else 1.0)
                for j, r in enumerate(rep_recs) if q in r["queries"]]
        return round(statistics.median(vals), 3)

    queries = {q: med(q, False) for q in names}
    # checksum stability across reps — a moved checksum is semantic drift
    # inside one round, worse than any wall regression
    ck_sets = {q: {r["checksums"].get(q) for r in rep_recs if q in r.get("checksums", {})}
               for q in names}
    unstable = sorted(q for q, s in ck_sets.items() if len(s - {None}) > 1)

    base = rep_recs[0]
    out_rec = {
        "metric": "headline_operator_suite",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "queries": queries,
        "queries_ctl_normalized": {q: med(q, True) for q in names},
        "checksums": base["checksums"],
        "checksums_unstable": unstable,
        "sf": base["sf"],
        "throughput": {
            "events": base["throughput"]["events"],
            "rollup_turns_per_s": round(
                base["throughput"]["events"]
                / max(queries["rollup_1m"] + queries["rollup_cascade"], 1e-9), 1),
        },
        "cpus": base["cpus"],
        "methodology": {
            "reps": reps,
            "per_rep_total_sec": [r["value"] for r in rep_recs],
            "per_rep_queries": [r["queries"] for r in rep_recs],
            "controls_tasks_per_s": controls,
            "steal_frac_per_rep": steals,
            "gates": gates,
            "normalization": "sec_times_control",
        },
    }
    print(json.dumps(out_rec))


if __name__ == "__main__":
    if os.environ.get("MPE_BENCH_SINGLE") == "1":
        run_single()
    else:
        main()
