"""Genetic-algorithm hyperparameter search (reference §2.11:
``modules/learning.py:233-345`` procedure; population init/selection/
crossover/mutation ``modules/io.py:190-621``; fitness = F1 of motif
coverage vs labeled intervals, ``modules/learning.py:350-466``).

This stays a DRIVER loop, exactly as SURVEY §2.11 prescribes: the
population is small driver-side state; each generation evaluates every
individual's fitness with ONE Spark job — individuals explode into the
grouped-UDF key so (conversation × individual) motif extraction runs
shuffle-parallel, then coverage is scored relationally and collected
(population-sized rows only).

Unlike the reference (unseeded random.choice → irreproducible runs,
SURVEY §5.1), every stochastic choice here derives from a seeded
numpy Generator.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from more_pattern_extraction_spark.functions.kernels import stomp, top_k_motifs_kernel
from more_pattern_extraction_spark.operators.matrix_profile import sort_series

# genes: (m, radius, ez_frac, k)
GENE_BOUNDS = {
    "m": (8, 64),
    "radius": (1.0, 5.0),
    "ez_frac": (0.1, 1.0),
    "k": (1, 5),
}


def init_population(pop_size: int, rng: np.random.Generator) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "indiv": range(pop_size),
            "m": rng.integers(*GENE_BOUNDS["m"], pop_size),
            "radius": rng.uniform(*GENE_BOUNDS["radius"], pop_size),
            "ez_frac": rng.uniform(*GENE_BOUNDS["ez_frac"], pop_size),
            "k": rng.integers(GENE_BOUNDS["k"][0], GENE_BOUNDS["k"][1] + 1, pop_size),
        }
    )


def _coverage_udf(value_col: str, order_col: str, max_neighbors: int = 50):
    def f(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = sort_series(pdf, order_col)
        m = int(pdf["m"].iloc[0])
        radius = float(pdf["radius"].iloc[0])
        ez = max(1, int(m * float(pdf["ez_frac"].iloc[0])))
        k = int(pdf["k"].iloc[0])
        t = pdf[value_col].to_numpy(dtype="float64", na_value=np.nan)
        covered = np.zeros(len(t), dtype=bool)
        if len(t) >= 2 * m:
            mp, pi = stomp(t, m)
            motifs = top_k_motifs_kernel(t, mp, pi, m, ez, radius, k,
                                         max_neighbors=max_neighbors)
            for mo in motifs:
                for s in [*mo["motifs"], *mo["neighbors"]]:
                    covered[s : s + m] = True
        out = pdf[["conv_id", "indiv", order_col]].copy()
        out["pred"] = covered[: len(out)]
        return out

    return f


def evaluate_generation(
    grid: DataFrame,
    labels_mask: DataFrame,
    population: pd.DataFrame,
    value_col: str = "latency_avg_filled",
    order_col: str = "bucket_start",
    max_neighbors: int = 50,
) -> pd.DataFrame:
    """One Spark job: per (conv, individual) motif coverage → join the
    label mask → per-individual confusion → F1 (collected: |pop| rows)."""
    spark = grid.sparkSession
    pop_df = F.broadcast(spark.createDataFrame(population))
    # project BEFORE the fan-out: the crossJoin replicates every grid row
    # |pop| times through the shuffle, so it must carry only the three
    # columns the kernel reads plus the gene columns (VERDICT r01 #6)
    slim = grid.select("conv_id", order_col, value_col)
    fanned = slim.crossJoin(pop_df)
    # the broadcast crossJoin preserves the grid's partitioning (often
    # conv_id from an upstream stage), which satisfies the grouped UDF's
    # distribution and would serialize every individual of a conversation
    # on one task — the opposite of what the fan-out is for (see
    # partitioning.spread_groups)
    from more_pattern_extraction_spark.plans.partitioning import spread_groups

    cov = spread_groups(fanned, "conv_id", "indiv").groupBy("conv_id", "indiv").applyInPandas(
        _coverage_udf(value_col, order_col, max_neighbors),
        f"conv_id string, indiv long, {order_col} timestamp, pred boolean",
    )
    j = cov.join(labels_mask, ["conv_id", order_col])
    a = F.col("flag").cast("int")
    p = F.col("pred").cast("int")
    scores = (
        j.groupBy("indiv")
        .agg(
            F.sum(((a == 1) & (p == 1)).cast("long")).alias("tp"),
            F.sum(((a == 0) & (p == 1)).cast("long")).alias("fp"),
            F.sum(((a == 1) & (p == 0)).cast("long")).alias("fn"),
        )
        .withColumn(
            "f1",
            F.coalesce(
                F.try_divide(2 * F.col("tp"), 2 * F.col("tp") + F.col("fp") + F.col("fn")),
                F.lit(0.0),
            ),
        )
        .toPandas()
    )
    return population.merge(scores[["indiv", "f1"]], on="indiv", how="left").fillna(
        {"f1": 0.0}
    )


_GENES = ["m", "radius", "ez_frac", "k"]

# the reference's six selection strategies (io.py:263-434), seeded/
# vectorized here (the reference's unseeded random.choice is
# irreproducible, SURVEY §5.1)
SELECTIONS = (
    "steady_state", "rank", "random", "tournament", "roulette", "sus",
)
# ... and its four crossovers (io.py:436-621)
CROSSOVERS = ("single_point", "two_points", "uniform", "scattered")


def _parent_pool(
    scored: pd.DataFrame,
    rng: np.random.Generator,
    size: int,
    strategy: str = "tournament",
    toursize: int = 3,
) -> pd.DataFrame:
    """Draw ``size`` parents by the named strategy.  All draws come from
    the seeded generator; fitness ties resolve by stable order (indiv)."""
    f = scored["f1"].to_numpy(dtype=float)
    n = len(scored)
    if strategy == "steady_state":
        # top half, recycled in fitness order (io.py:263-280)
        order = np.argsort(-f, kind="stable")[: max(2, n // 2)]
        idx = np.tile(order, size // len(order) + 1)[:size]
    elif strategy == "rank":
        rank = np.argsort(np.argsort(-f, kind="stable"))  # 0 = best
        w = (n - rank).astype(float)
        idx = rng.choice(n, size, p=w / w.sum())
    elif strategy == "random":
        idx = rng.integers(0, n, size)
    elif strategy == "tournament":
        cand = rng.integers(0, n, (size, toursize))
        idx = cand[np.arange(size), np.argmax(f[cand], axis=1)]
    elif strategy == "roulette":
        w = f - f.min() + 1e-9
        idx = rng.choice(n, size, p=w / w.sum())
    elif strategy == "sus":
        # stochastic universal sampling: one spin, evenly-spaced pointers
        w = f - f.min() + 1e-9
        cum = np.cumsum(w / w.sum())
        pts = rng.random() / size + np.arange(size) / size
        idx = np.searchsorted(cum, pts)
    else:
        raise ValueError(f"unknown selection {strategy!r}; one of {SELECTIONS}")
    return scored.iloc[idx].reset_index(drop=True)


def _crossover_mask(
    rng: np.random.Generator, n_genes: int, strategy: str = "uniform"
) -> np.ndarray:
    """True → gene from parent 1.  The reference's four crossover shapes
    (io.py:436-621)."""
    pos = np.arange(n_genes)
    if strategy == "single_point":
        return pos < rng.integers(1, n_genes)
    if strategy == "two_points":
        a, b = sorted(rng.choice(np.arange(1, n_genes), 2, replace=False))
        return (pos < a) | (pos >= b)
    if strategy == "uniform":
        return rng.random(n_genes) < 0.5
    if strategy == "scattered":
        return rng.integers(0, 2, n_genes).astype(bool)
    raise ValueError(f"unknown crossover {strategy!r}; one of {CROSSOVERS}")


def _breed(
    scored: pd.DataFrame,
    rng: np.random.Generator,
    hof: pd.Series | None = None,
    selection: str = "tournament",
    crossover: str = "uniform",
) -> pd.DataFrame:
    """Selection + crossover + gaussian mutation with elitism
    (the reference's strategy matrix, io.py:263-621, made deterministic).

    ``hof`` — the all-time-best individual (hall of fame) — is always
    re-seeded into the next generation's elite, so the population's best
    fitness is monotone non-decreasing across generations (the reference's
    unseeded GA has no such guarantee, learning.py:430-431)."""
    n = len(scored)
    genes = _GENES
    elite = scored.sort_values("f1", ascending=False).head(max(1, n // 10))[genes]
    if hof is not None:
        elite = pd.concat([hof[genes].to_frame().T, elite], ignore_index=True)
        elite = elite.astype(
            {"m": "int64", "radius": "float64", "ez_frac": "float64", "k": "int64"}
        ).drop_duplicates()
    # elite (plus hall-of-fame) can reach n for tiny populations — clamp so
    # the parent pool is never asked for a negative draw
    n_child = max(0, n - len(elite))
    pool = _parent_pool(scored, rng, 2 * n_child, selection) if n_child else None
    rows = []
    for c in range(n_child):
        p1, p2 = pool.iloc[2 * c], pool.iloc[2 * c + 1]
        mask = _crossover_mask(rng, len(genes), crossover)
        child = {g: (p1[g] if mask[i] else p2[g]) for i, g in enumerate(genes)}
        if rng.random() < 0.3:  # mutate one gene
            g = genes[rng.integers(0, len(genes))]
            lo, hi = GENE_BOUNDS[g]
            if g in ("m", "k"):
                child[g] = int(np.clip(child[g] + rng.integers(-4, 5), lo, hi))
            else:
                child[g] = float(np.clip(child[g] + rng.normal(0, 0.3), lo, hi))
        rows.append(child)
    out = pd.concat([elite[genes], pd.DataFrame(rows)], ignore_index=True)
    out["m"] = out["m"].astype(int)
    out["k"] = out["k"].astype(int)
    out["indiv"] = range(len(out))
    return out[["indiv", *genes]]


def run_ga(
    grid: DataFrame,
    labels_mask: DataFrame,
    pop_size: int = 12,
    generations: int = 3,
    seed: int = 42,
    value_col: str = "latency_avg_filled",
    order_col: str = "bucket_start",
    selection: str = "tournament",
    crossover: str = "uniform",
    max_neighbors: int = 50,
) -> pd.DataFrame:
    """Returns the final scored population, best-first.  ``selection`` /
    ``crossover`` pick from the reference's strategy matrix (SELECTIONS ×
    CROSSOVERS)."""
    rng = np.random.default_rng(seed)
    pop = init_population(pop_size, rng)
    hof = None  # all-time best individual (hall of fame)
    best = None
    for _gen in range(generations):
        scored = evaluate_generation(grid, labels_mask, pop, value_col, order_col,
                                     max_neighbors=max_neighbors)
        best = scored.sort_values("f1", ascending=False)
        gen_best = best.iloc[0]
        if hof is None or gen_best["f1"] > hof["f1"]:
            hof = gen_best
        pop = _breed(scored, rng, hof, selection, crossover)
    return best.reset_index(drop=True)


def grid_search(
    grid: DataFrame,
    labels_mask: DataFrame,
    param_grid: dict[str, list],
    value_col: str = "latency_avg_filled",
    order_col: str = "bucket_start",
    max_neighbors: int = 50,
) -> pd.DataFrame:
    """GridSearchCV-style exhaustive parameter sweep (the reference's
    ``GridSearchCV(n_jobs=-1)`` family, ``notebooks/
    underperformance_detection.ipynb`` cell 13 / SURVEY §4 "grid sweeps
    as nested Python loops"): the full cartesian product of ``param_grid``
    becomes ONE parameter DataFrame fanned out through the same
    (conversation × individual) grouped-UDF job as a GA generation — one
    Spark job evaluates every combination shuffle-parallel, instead of
    the reference's serial joblib loop.

    ``param_grid`` keys must be the GA genes (m, radius, ez_frac, k);
    omitted genes take their lower bound.  Returns every combination
    scored, best-first, deterministic (no randomness anywhere).
    """
    import itertools

    keys = list(param_grid)
    unknown = set(keys) - set(_GENES)
    if unknown:
        raise ValueError(f"unknown parameters {sorted(unknown)}; genes: {_GENES}")
    combos = list(itertools.product(*(param_grid[k] for k in keys)))
    pop = pd.DataFrame(combos, columns=keys)
    for g in _GENES:
        if g not in pop.columns:
            pop[g] = GENE_BOUNDS[g][0]
    pop = pop.astype({"m": "int64", "radius": "float64",
                      "ez_frac": "float64", "k": "int64"})
    pop.insert(0, "indiv", range(len(pop)))
    scored = evaluate_generation(grid, labels_mask, pop, value_col, order_col,
                                 max_neighbors=max_neighbors)
    return scored.sort_values(
        ["f1", "indiv"], ascending=[False, True]
    ).reset_index(drop=True)
