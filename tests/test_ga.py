"""GA hyperparameter search (SURVEY §2.11): runs are seed-deterministic
(unlike the reference, whose GA is irreproducible — modules/learning.py:430-431)
and hall-of-fame elitism makes best fitness monotone non-decreasing across
generations, so the evolved best provably never regresses below gen 0."""

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


def test_ga_deterministic(spark, planted_grid):
    grid, mask = planted_grid
    best1 = GA.run_ga(grid, mask, pop_size=6, generations=2, seed=7)
    best2 = GA.run_ga(grid, mask, pop_size=6, generations=2, seed=7)
    pd.testing.assert_frame_equal(best1, best2)  # reproducible


def test_ga_improves(spark, planted_grid):
    grid, mask = planted_grid
    # gen-0 baseline: the same seed's initial population, scored directly
    gen0 = GA.evaluate_generation(grid, mask, GA.init_population(6, np.random.default_rng(7)))
    best = GA.run_ga(grid, mask, pop_size=6, generations=3, seed=7)
    # hall-of-fame elitism: the evolved best can never fall below gen 0's best
    assert best.f1.max() >= gen0.f1.max() - 1e-12
    assert best.iloc[0].f1 > 0.3  # finds the planted motifs reasonably


def test_selection_strategies_prefer_fit(spark):
    """Every strategy draws fitter parents more often than uniform-random
    (except 'random' itself); all are deterministic under a fixed seed."""
    import numpy as np
    import pandas as pd

    from more_pattern_extraction_spark.plans import ga

    scored = pd.DataFrame(
        {
            "indiv": range(10),
            "m": 16, "radius": 2.0, "ez_frac": 0.5, "k": 2,
            "f1": np.linspace(0.0, 0.9, 10),  # indiv 9 is fittest
        }
    )
    for strat in ga.SELECTIONS:
        rng1 = np.random.default_rng(7)
        pool = ga._parent_pool(scored, rng1, 400, strat)
        rng2 = np.random.default_rng(7)
        pool2 = ga._parent_pool(scored, rng2, 400, strat)
        pd.testing.assert_frame_equal(pool, pool2)  # seeded determinism
        mean_f = pool["f1"].mean()
        if strat == "random":
            assert abs(mean_f - scored["f1"].mean()) < 0.1
        else:
            assert mean_f > scored["f1"].mean() + 0.05, strat


def test_crossover_masks_shapes(spark):
    import numpy as np

    from more_pattern_extraction_spark.plans import ga

    rng = np.random.default_rng(11)
    for strat in ga.CROSSOVERS:
        for _ in range(50):
            mask = ga._crossover_mask(rng, 4, strat)
            assert mask.shape == (4,) and mask.dtype == bool
            if strat == "single_point":
                # contiguous prefix of Trues
                assert mask[0] and (np.diff(mask.astype(int)) <= 0).all()
            if strat == "two_points":
                # True outside [a, b), False inside — at most 2 transitions
                assert mask[0] and np.abs(np.diff(mask.astype(int))).sum() <= 2


def test_grid_search_exhaustive_and_deterministic(spark, planted_grid):
    """grid_search evaluates the FULL cartesian product in one fan-out job
    and is deterministic; its best must match or beat any single combo."""
    grid, mask = planted_grid
    pg = {"m": [16, 24], "radius": [2.0, 3.0], "ez_frac": [0.5]}
    out1 = GA.grid_search(grid, mask, pg)
    out2 = GA.grid_search(grid, mask, pg)
    pd.testing.assert_frame_equal(out1, out2)
    assert len(out1) == 4  # 2 x 2 x 1 combos, every one scored
    assert set(out1.columns) >= {"m", "radius", "ez_frac", "k", "f1"}
    assert (out1.f1.values[:-1] >= out1.f1.values[1:]).all()  # best-first
    # the m=24 combos should recover the planted 24-wide motifs well
    assert out1[out1.m == 24].f1.max() > 0.3
    # a single-combo sweep equals that combo's row in the full sweep
    solo = GA.grid_search(grid, mask, {"m": [24], "radius": [3.0], "ez_frac": [0.5]})
    full_row = out1[(out1.m == 24) & (out1.radius == 3.0)].iloc[0]
    assert abs(solo.iloc[0].f1 - full_row.f1) < 1e-12


def test_grid_search_rejects_unknown_param(spark, planted_grid):
    grid, mask = planted_grid
    with pytest.raises(ValueError, match="unknown parameters"):
        GA.grid_search(grid, mask, {"not_a_gene": [1]})
