"""Approximate-nearest-neighbor search over embedding columns.

Brute-force cosine top-k as the exactness baseline (JVM-side
``zip_with``/``aggregate`` — no Python on the hot path), and a random-
hyperplane LSH-bucketed variant as the scale path (the 100 TB story:
bucket the corpus once, probe per query bucket, candidate set ≪ corpus).

Hyperplanes are generated deterministically from a seed on the driver
(numpy, a few KB) and inlined as literal arrays — broadcast-by-plan, no
closure pickling per task.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a, b):
    return _dot(a, b) / F.sqrt(_dot(a, a) * _dot(b, b))


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force top-k: broadcast the (small) query side against
    the full corpus, rank per query.  At 100 TB the corpus side stays
    partition-parallel and never shuffles; only the per-query top-k
    reduction moves data (partial top-k per partition via the window)."""
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = emb.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "cand_id")
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _planes(n_planes: int, dim: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket(vec_col, planes: np.ndarray):
    """Sign-bit bucket id from random hyperplanes, computed JVM-side:
    bit_b = dot(v, plane_b) >= 0."""
    bits = []
    for b, p in enumerate(planes):
        lit = F.array(*[F.lit(float(x)) for x in p])
        bits.append(
            F.when(_dot(vec_col, lit) >= 0, F.lit(1 << b)).otherwise(F.lit(0))
        )
    out = bits[0]
    for bexpr in bits[1:]:
        out = out + bexpr
    return out


def cosine_topk_lsh(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_planes: int = 6,
    seed: int = 7,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multi_probe: bool = False,
) -> DataFrame:
    """ANN top-k: candidates limited to the query's hyperplane-sign bucket,
    then exact cosine rank inside it.  Recall < 1 by construction; the
    recall/SF trade is 2^n_planes buckets.

    ``multi_probe=True`` additionally probes every bucket at Hamming
    distance 1 from the query's bucket (n_planes single-bit flips,
    exploded on the *query* side only — the corpus is still bucketed
    once).  This recovers most of the recall lost to a larger n_planes:
    a near neighbor disagrees with the query on few hyperplane signs, so
    its bucket is usually within Hamming-1."""
    from pyspark.sql import Window

    planes = _planes(n_planes, dim, seed)
    c = emb.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("cv"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    if multi_probe:
        probes = F.array(
            F.col("bucket"),
            *[F.col("bucket").bitwiseXOR(F.lit(1 << b)) for b in range(n_planes)],
        )
        q = q.select(
            "query_id", "qv", F.explode(probes).alias("bucket")
        )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos"),
        )
        # a candidate reachable through several probes must rank once
        .dropDuplicates(["query_id", "cand_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "cand_id")
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_near_dups(
    emb: DataFrame,
    threshold: float = 0.95,
    n_planes: int | None = None,
    seed: int = 7,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_width: int | None = None,
    target_bucket_rows: int = 1024,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH bucketing (same-bucket
    candidates only) + threshold verify.

    Scale shape: the same-bucket self-join is O(Σ w_b²) over bucket widths
    w_b, so bucket count must GROW with the corpus — ``n_planes=None``
    (default) sizes it as ceil(log2(n / target_bucket_rows)), keeping the
    expected width ≈ target_bucket_rows at any corpus size (one count()
    job, driver-side).  ``max_bucket_width`` is the deterministic hard cap
    for adversarial skew (a viral embedding cluster): each bucket keeps
    its lowest ids, same policy as dedup.minhash_lsh_pairs.  Both are
    opt-in/auto rather than silently lossy: the fixed-plane path (explicit
    ``n_planes``) reproduces engine-portable buckets for the oracle."""
    if n_planes is None:
        import math

        n = emb.count()
        n_planes = max(6, math.ceil(math.log2(max(n, 2) / target_bucket_rows)))
    planes = _planes(n_planes, dim, seed)
    s = emb.select(
        F.col(id_col).alias("doc"),
        F.col(vec_col).alias("v"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    if max_bucket_width:
        from pyspark.sql import Window

        w = Window.partitionBy("bucket").orderBy("doc")
        s = (
            s.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= max_bucket_width)
            .drop("_rn")
        )
    a, b = s.alias("a"), s.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.doc") < F.col("b.doc")))
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.round(cosine(F.col("a.v"), F.col("b.v")), 6).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the second scale path named in the task brief
# ("an IVF or LSH-bucketed variant").  A coarse k-means quantizer is
# trained driver-side on a deterministic sample (standard IVF practice —
# at 100 TB the quantizer trains on a ~1e6-row sample, never the
# corpus), centroids are inlined as literal arrays (broadcast-by-plan),
# the corpus is assigned to its nearest cell ONCE (pure Catalyst fold —
# one narrow pass, no shuffle), and each query probes only its
# ``n_probe`` nearest cells.  Candidate set ≈ corpus × n_probe / n_cells.
# ---------------------------------------------------------------------------


def train_ivf_centroids(
    emb: DataFrame,
    n_centroids: int = 8,
    iters: int = 5,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_mod: int = 1,
) -> np.ndarray:
    """Deterministic Lloyd's k-means for the IVF coarse quantizer.

    Seeded init drawn from the id-ordered sample, fixed iteration count,
    first-index tie-break in assignment — reruns and engines agree
    bit-for-bit on the returned centroids.  ``sample_mod`` keeps the
    driver-side collect bounded (train on vec_id % mod == 0)."""
    s = emb
    if sample_mod > 1:
        s = s.filter(F.pmod(F.col(id_col), F.lit(sample_mod)) == 0)
    pdf = s.orderBy(id_col).select(vec_col).toPandas()
    X = np.array(pdf[vec_col].tolist(), dtype="float64")
    return kmeans_fit(X, n_centroids, iters=iters, seed=seed)


def kmeans_fit(
    X: np.ndarray, n_centroids: int, iters: int = 5, seed: int = 7
) -> np.ndarray:
    """Pure-numpy deterministic Lloyd's iterations (shared by the Spark
    trainer above and the oracle-side pyarrow loader in plans/entry.py —
    ONE implementation so both engines inline identical centroids)."""
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=n_centroids, replace=False)].copy()
    for _ in range(iters):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        assign = d2.argmin(1)  # numpy argmin = first-index tie-break
        for j in range(n_centroids):
            pts = X[assign == j]
            if len(pts):
                C[j] = pts.mean(0)
    return C


def _cell_structs(vec_col, centroids: np.ndarray) -> list:
    """Per-centroid (distance, id) structs; d = ||c||^2 - 2 v.c (the
    ||v||^2 term is constant per vector and cancels in the argmin),
    rounded to 6 dp so the DuckDB oracle's argmin agrees on near-ties."""
    out = []
    for j, c in enumerate(centroids):
        lit = F.array(*[F.lit(float(x)) for x in c])
        n2 = float((c * c).sum())
        out.append(F.struct(
            F.round(F.lit(n2) - 2.0 * _dot(vec_col, lit), 6).alias("d"),
            F.lit(j).alias("j"),
        ))
    return out


def ivf_cell(vec_col, centroids: np.ndarray):
    """Nearest-centroid cell id, pure Catalyst (lexicographic struct min
    = rounded-distance argmin with first-index tie-break).

    Wrapped in ``coalesce(.., -1)`` so the column is provably non-null:
    without it, the equi-join on cell infers ``isnotnull(cell)`` and
    pushes it below the Project, evaluating the whole centroid-distance
    fold TWICE per corpus row (seen in .explain).  -1 never matches a
    probe (cells are 0..n-1), and in practice never occurs (embeddings
    are non-null), so semantics are unchanged."""
    return F.coalesce(
        F.array_min(F.array(*_cell_structs(vec_col, centroids)))["j"], F.lit(-1)
    )


def ivf_probes(vec_col, centroids: np.ndarray, n_probe: int):
    """The query's n_probe nearest cell ids (array<int>), same metric."""
    ranked = F.slice(
        F.array_sort(F.array(*_cell_structs(vec_col, centroids))), 1, n_probe
    )
    return F.transform(ranked, lambda s: s["j"])


def assign_ivf_cells(
    emb: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "ivf_cell",
) -> DataFrame:
    """Materializable corpus→cell assignment (the ingest-time half of
    IVF).  At 100 TB the cell id is computed ONCE when a vector lands
    and persisted alongside the embedding table; queries then pay only
    the probed-cell scoring — per corpus row that's Q·n_probe/n_cells
    dot products instead of n_centroids (assignment) + scoring every
    search.  Pass the stored column to ``cosine_topk_ivf(cell_col=...)``."""
    return emb.withColumn(out_col, ivf_cell(F.col(vec_col), centroids))


def cosine_topk_ivf(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_centroids: int = 8,
    n_probe: int = 3,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
    cell_col: str | None = None,
) -> DataFrame:
    """IVF ANN top-k: assign corpus to cells once, probe the query's
    n_probe nearest cells, exact cosine rank inside the candidate set.
    Recall < 1 by construction (a neighbor can live in an unprobed
    cell); n_probe/n_centroids is the recall/cost dial.  Plan shape at
    100 TB: corpus-side Project (cell fold) + one equi-join shuffle on
    cell id against the broadcast probed queries — the corpus never
    crosses the wire more than once.  If ``cell_col`` names a
    precomputed assignment column (see ``assign_ivf_cells``), the fold
    is skipped entirely — the repeated-search shape, where assignment
    was paid at ingest (measured: scripts/bench_ivf_crossover.py)."""
    from pyspark.sql import Window

    C = centroids if centroids is not None else train_ivf_centroids(
        emb, n_centroids, seed=seed, id_col=id_col, vec_col=vec_col)
    cell_expr = (F.col(cell_col) if cell_col is not None
                 else ivf_cell(F.col(vec_col), C))
    c = emb.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("cv"),
        cell_expr.alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.explode(ivf_probes(F.col(vec_col), C, n_probe)).alias("cell"),
    )
    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id", "cand_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "cand_id")
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
