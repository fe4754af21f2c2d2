"""GA hyperparameter search (SURVEY §2.11): fitness improves on a planted
motif dataset, and runs are seed-deterministic (unlike the reference,
whose GA is irreproducible — modules/learning.py:430-431)."""

import numpy as np
import pandas as pd
import pytest

from more_pattern_extraction_spark.plans import ga as GA


@pytest.fixture(scope="module")
def planted_grid(spark):
    rng = np.random.default_rng(41)
    frames = []
    for c in range(3):
        t = rng.normal(0, 1, 400)
        pattern = np.sin(np.arange(24) * 0.6) * 4
        for pos in (60, 180, 320):
            t[pos : pos + 24] = pattern + rng.normal(0, 0.02, 24)
        frames.append(
            pd.DataFrame(
                {
                    "conv_id": f"c{c}",
                    "bucket_start": pd.date_range("2024-01-01", periods=400, freq="1min"),
                    "latency_avg_filled": t,
                }
            )
        )
    pdf = pd.concat(frames, ignore_index=True)
    grid = spark.createDataFrame(pdf)
    # labels: true inside [pos, pos+24) around each planted motif
    mask = pdf[["conv_id", "bucket_start"]].copy()
    idx = np.tile(np.arange(400), 3)
    mask["flag"] = np.isin(idx // 1, np.concatenate([np.arange(p, p + 24) for p in (60, 180, 320)]))
    return grid, spark.createDataFrame(mask)


def test_ga_improves_and_deterministic(spark, planted_grid):
    grid, mask = planted_grid
    best1 = GA.run_ga(grid, mask, pop_size=6, generations=2, seed=7)
    best2 = GA.run_ga(grid, mask, pop_size=6, generations=2, seed=7)
    pd.testing.assert_frame_equal(best1, best2)  # reproducible
    assert best1.iloc[0].f1 > 0.3  # finds the planted motifs reasonably
    # evaluating a random population scores no better than the evolved best
    rng = np.random.default_rng(99)
    rand_pop = GA.init_population(6, rng)
    rand_scores = GA.evaluate_generation(grid, mask, rand_pop)
    assert best1.f1.max() >= rand_scores.f1.max() - 0.15
