"""Measure the brute-vs-IVF ANN crossover instead of asserting it
(VERDICT r05 #4).  BASELINE.md claims the sf0.1 result (IVF ~1.7× slower
than brute on a 6 k corpus) is corpus-size driven; this prices all three
shapes at two corpus sizes on deterministic clustered embeddings:

* **brute**     — exact cosine top-k, Q queries × full corpus.
* **ivf_cold**  — quantizer training (sampled) + corpus cell assignment
                  + probed scoring, all inside the timing: the one-shot
                  searcher's cost.
* **ivf_warm**  — centroids already trained AND corpus cell ids already
                  persisted alongside the table (assign_ivf_cells at
                  ingest — the production repeated-search shape): timing
                  covers only probe + scoring.

Per-corpus-row cost model being verified: brute ≈ Q dots; ivf_cold ≈
n_centroids (assignment) + Q·n_probe/n_cells (scoring); ivf_warm ≈
Q·n_probe/n_cells.  So one-shot IVF only beats brute when Q exceeds
~n_centroids, while the warm path wins by ~n_cells/n_probe at ANY
corpus size — the honest statement is that the crossover is driven by
query count and assignment amortization, not corpus size alone.
Recall@k of both IVF paths is measured against the brute ground truth
in the same run (they share centroids, so recalls are identical by
construction — reported once per size).

Interleaved configs per rep, settle gate + pinned GEMM control per rep
(the BENCH_AB discipline).

Usage: python scripts/bench_ivf_crossover.py [REPS] [OUT_JSON]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from bench_ab import gemm_control, settle  # noqa: E402

ROOT = "/tmp/mpe_ivf_crossover"
DIM = 32
N_CLUSTERS = 64  # true generative clusters
Q = 64           # queries per search batch
K = 10
SIZES = [8192, 131072]
N_CENTROIDS = 64
N_PROBE = 4


def gen_embeddings(n: int, seed: int = 11) -> np.ndarray:
    """Clustered Gaussian vectors (centers on the unit sphere, sigma
    small enough that IVF cells align with real structure) — seeded, so
    every run and both engines see identical data."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 1, (N_CLUSTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.integers(0, N_CLUSTERS, size=n)
    return (centers[assign] + rng.normal(0, 0.15, (n, DIM))).astype("float64")


def stage(spark, n: int) -> str:
    import pandas as pd

    path = f"{ROOT}/emb_{n}"
    if not os.path.exists(path + "/_SUCCESS"):
        X = gen_embeddings(n)
        pdf = pd.DataFrame({"vec_id": np.arange(n, dtype="int64"),
                            "embedding": list(X)})
        spark.createDataFrame(pdf).repartition(32, "vec_id") \
            .write.mode("overwrite").parquet(path)
    return path


def pairs(df) -> dict[int, set]:
    out: dict[int, set] = {}
    for r in df.select("query_id", "cand_id").collect():
        out.setdefault(r.query_id, set()).add(r.cand_id)
    return out


def recall(approx: dict[int, set], truth: dict[int, set]) -> float:
    per_q = [len(approx.get(q, set()) & t) / max(len(t), 1)
             for q, t in truth.items()]
    return round(sum(per_q) / max(len(per_q), 1), 4)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    out_path = sys.argv[2] if len(sys.argv) > 2 else "scripts/IVF_CROSSOVER_r06.json"

    from pyspark.sql import functions as F

    from more_pattern_extraction_spark.operators import similarity_search as SS
    from more_pattern_extraction_spark.session import drain_checksum, get_spark

    spark = get_spark("ivf_crossover", cores=32, shuffle_partitions=32)
    os.makedirs(ROOT, exist_ok=True)

    results: dict = {}
    controls, gates = [], []
    for n in SIZES:
        emb = spark.read.parquet(stage(spark, n))
        emb.count()  # warm the scan
        q = emb.filter(F.col("vec_id") < Q)
        # warm artifacts for the warm path (one-time, outside timing):
        # trained centroids + persisted cell assignment
        C = SS.train_ivf_centroids(emb, N_CENTROIDS,
                                   sample_mod=max(n // 2048, 1))
        cells_path = f"{ROOT}/cells_{n}"
        SS.assign_ivf_cells(emb, C).write.mode("overwrite").parquet(cells_path)
        emb_cells = spark.read.parquet(cells_path)
        emb_cells.count()

        def brute():
            return SS.cosine_topk(emb, q, k=K)

        def ivf_cold():
            c = SS.train_ivf_centroids(emb, N_CENTROIDS,
                                       sample_mod=max(n // 2048, 1))
            return SS.cosine_topk_ivf(emb, q, k=K, n_probe=N_PROBE, centroids=c)

        def ivf_warm():
            return SS.cosine_topk_ivf(emb_cells, q, k=K, n_probe=N_PROBE,
                                      centroids=C, cell_col="ivf_cell")

        configs = {"brute": brute, "ivf_cold": ivf_cold, "ivf_warm": ivf_warm}
        walls: dict[str, list] = {name: [] for name in configs}
        for rep in range(reps):
            gates.append(settle())
            controls.append(gemm_control())
            for name, thunk in configs.items():
                t0 = time.time()
                drain_checksum(thunk().drop("cos"))
                walls[name].append(round(time.time() - t0, 3))
            print(json.dumps({"n": n, "rep": rep, "control": controls[-1],
                              **{m: walls[m][-1] for m in walls}}),
                  file=sys.stderr, flush=True)

        truth = pairs(brute())
        rec = recall(pairs(ivf_warm()), truth)
        results[str(n)] = {
            "wall_s_median": {m: round(statistics.median(w), 3)
                              for m, w in walls.items()},
            "wall_s_raw": walls,
            "recall_at_k": rec,
            "params": {"dim": DIM, "queries": Q, "k": K,
                       "n_centroids": N_CENTROIDS, "n_probe": N_PROBE},
        }

    out = {
        "design": "interleaved configs per rep, settle-gated, per-rep GEMM control",
        "sizes": results,
        "controls_per_rep": controls,
        "gates_per_rep": gates,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["sizes"], indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
