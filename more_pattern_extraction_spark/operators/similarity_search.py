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
