"""Matrix-profile operators (reference W1: create_mp,
``modules/patterns.py:313-364``; Dask stumped/mstumped replaced by Spark
grouped pandas UDFs).

Two physical strategies, one logical result:

  * ``matrix_profile`` — one conversation per ``applyInPandas`` group.
    Right when every conversation's gridded series fits a task
    (≤ ``max_points``).  The shuffle key is ``conv_id``; hot conversations
    are exactly the case this does NOT cover.
  * ``matrix_profile_distributed`` — EXACT distributed self-join for long
    conversations: split the grid into chunks of ``chunk_size`` with
    ``m-1`` halo rows, form all chunk pairs, run the STOMP AB-join kernel
    per pair (both directions), min-reduce by global position.  Work is
    O((n/S)²) tasks of O(S²) each — the unavoidable quadratic cost of an
    exact MP, but now embarrassingly parallel and bounded-memory
    (SURVEY.md §4 "windowed ops across partition edges").  Halo rows mean
    each chunk ships S+m-1 points; the pair fan-out replicates each chunk
    n/S times — at 10^12-turn scale one bounds this with per-conversation
    time windows (compute MP per day/week of rollup grid, as the reference
    does with m = 1 day on a 60 s grid).

Input contract: a regular, gap-filled grid per conversation (rollup tier +
gapfill), value column non-null, ordered by ``bucket_start``.  NaNs from
unfilled gaps must be handled upstream (interpolate/locf) — the z-norm of
a window containing NaN is NaN and poisons the profile, matching the
reference's requirement to interpolate before stump.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from more_pattern_extraction_spark.functions.kernels import mstomp, stomp, stomp_ab

MP_SCHEMA = "conv_id string, pos int, mp double, pi bigint"
MDMP_SCHEMA = "conv_id string, k int, pos int, mp double, pi bigint"


#: columns that break ties when ``order_col`` has duplicates (duplicate
#: timestamps within one conversation).  The DuckDB oracles order by
#: ``(ts, event_id)``; without the same tie-break the series order — and
#: hence the profile and every downstream motif/knee pick — would be
#: shuffle-nondeterministic.
_TIE_BREAKERS = ("event_id", "turn_idx")


def _sort_keys(order_col: str, columns) -> list[str]:
    """Shared ordering-key builder for :func:`sort_series` and
    :func:`with_positions` — one definition so the pandas-side sort and
    the Catalyst-side row_number can never drift (ADVICE r04)."""
    return [order_col] + [
        c for c in _TIE_BREAKERS if c in columns and c != order_col
    ]


def sort_series(pdf: pd.DataFrame, order_col: str) -> pd.DataFrame:
    """Deterministically order a grouped-UDF series frame.

    Sorts by ``order_col`` plus any present tie-break column; mergesort so
    that even a tie-break-free frame keeps a stable (input-order) sort
    rather than numpy's unstable introsort."""
    return pdf.sort_values(_sort_keys(order_col, pdf.columns), kind="mergesort")


def with_positions(grid: DataFrame, order_col: str = "bucket_start") -> DataFrame:
    """Attach the 0-based grid position used as the MP coordinate system.

    Ties on ``order_col`` get the same ``(order_col, event_id/turn_idx)``
    tie-break as :func:`sort_series` so positions are deterministic."""
    w = Window.partitionBy("conv_id").orderBy(*_sort_keys(order_col, grid.columns))
    return grid.withColumn("pos", (F.row_number().over(w) - 1).cast("int"))


def matrix_profile(
    grid: DataFrame,
    m: int,
    value_col: str = "latency_avg_filled",
    ez: int | None = None,
    order_col: str = "bucket_start",
    window: str | None = None,
) -> DataFrame:
    """Per-conversation self-join MP: (conv_id, pos, mp, pi).

    ``window`` (e.g. ``"week"``/``"day"``): compute the profile per
    (conv_id, date_trunc(window, order_col)) instead of per whole
    conversation — the production shape for unbounded/hot conversations
    (the reference's m=1-day profile over bounded series slices), and the
    skew guard: a 10^8-turn conversation becomes many bounded tasks
    instead of one O(n²) monster.  Motifs crossing window borders need the
    exact distributed path (matrix_profile_distributed)."""

    def f(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = sort_series(pdf, order_col)
        out_cols = {
            "conv_id": pd.Series(dtype="str"), "pos": pd.Series(dtype="int32"),
            "mp": pd.Series(dtype="float64"), "pi": pd.Series(dtype="int64"),
        }
        if window:
            out_cols["win"] = pd.Series(dtype="datetime64[ns]")
        t = pdf[value_col].to_numpy(dtype="float64", na_value=np.nan)
        if len(t) < m:
            return pd.DataFrame(out_cols)
        mp, pi = stomp(t, m, ez)
        out = {
            "conv_id": pdf["conv_id"].iloc[0],
            "pos": np.arange(len(mp), dtype="int32"),
            "mp": mp,
            "pi": pi,
        }
        if window:
            out["win"] = pdf["_win"].iloc[0]
        return pd.DataFrame(out)

    if window:
        from more_pattern_extraction_spark.plans.partitioning import spread_groups

        keyed = grid.withColumn("_win", F.date_trunc(window, F.col(order_col)))
        # the skew guard only works if the (conv, win) exchange physically
        # happens — see partitioning.spread_groups for why it can be
        # silently skipped (upstream conv_id partitioning satisfies the
        # grouped UDF's required distribution)
        return spread_groups(keyed, "conv_id", "_win").groupBy(
            "conv_id", "_win"
        ).applyInPandas(f, MP_SCHEMA + ", win timestamp")
    return grid.groupBy("conv_id").applyInPandas(f, MP_SCHEMA)


def corrected_matrix_profile(
    grid: DataFrame,
    m: int,
    value_col: str = "latency_avg_filled",
    ez: int | None = None,
    order_col: str = "bucket_start",
) -> DataFrame:
    """W3 annotation-vector-corrected MP (reference compute_mp_av /
    apply_av, patterns.py:68-93; genlib.py:116-119): cmp = mp +
    (1 − av)·max(mp), av = min-max-normalized window complexity
    sqrt(Σ diff²).

    The annotation vector is RELATIONAL (window sum of squared diffs +
    per-conversation min-max — pure Catalyst, no UDF); only the base MP
    comes from the STOMP kernel.  Returns (conv_id, pos, mp, pi, av, cmp).
    """
    mp = matrix_profile(grid, m, value_col, ez, order_col)
    w_ord = Window.partitionBy("conv_id").orderBy(order_col)
    d = F.col(value_col) - F.lag(value_col).over(w_ord)
    comp_frame = Window.partitionBy("conv_id").orderBy(order_col).rowsBetween(1, m - 1)
    comp = (
        with_positions(grid, order_col)
        .withColumn("_d2", d * d)
        .withColumn("comp", F.sqrt(F.sum("_d2").over(comp_frame)))
        .select("conv_id", "pos", "comp")
    )
    # ONE join attaches the complexity column, then per-conversation
    # whole-partition windows derive the min-max range (over MP positions
    # only — the inner join restricts comp to them, matching the kernel's
    # normalization over the l complete windows) and the finite-MP max.
    # The previous form referenced the ``mp`` frame through four subtree
    # copies (the scoped frame fed both the min-max aggregate and the av
    # projection, plus the finite-max aggregate and the final join), and
    # Spark plans are trees: each copy re-ran the whole STOMP
    # applyInPandas subtree — only the Exchange below it was reused — so
    # the kernel executed 4x per query (r07 plan audit: 4 -> 1
    # FlatMapGroupsInPandas nodes, 13 -> 4 Exchanges).
    wc = Window.partitionBy("conv_id")
    j = mp.join(comp, ["conv_id", "pos"])
    j = (
        j.withColumn("_lo", F.min("comp").over(wc))
        .withColumn("_hi", F.max("comp").over(wc))
        .withColumn(
            "_mx",
            F.max(F.when(F.col("mp") != float("inf"), F.col("mp"))).over(wc),
        )
    )
    av = F.when(F.col("_hi") - F.col("_lo") < 1e-13, F.lit(1.0)).otherwise(
        (F.col("comp") - F.col("_lo")) / (F.col("_hi") - F.col("_lo"))
    )
    # _mx NULL ⟺ no finite mp row in the conversation ⟺ the old inner
    # join against the filtered-aggregate mx dropped the conversation
    return (
        j.filter(F.col("_mx").isNotNull())
        .withColumn("av", av)
        .withColumn("cmp", F.col("mp") + (1 - F.col("av")) * F.col("_mx"))
        .select("conv_id", "pos", "mp", "pi", "av", "cmp")
    )


def subspace_columns(
    grid: DataFrame,
    m: int,
    value_cols: list[str],
    k: int | None = None,
    include: list[int] | None = None,
    ez: int | None = None,
    order_col: str = "bucket_start",
) -> DataFrame:
    """W12 pick_subspace_columns (reference patterns.py:7-35 →
    stumpy.subspace): for each conversation, find the best (k+1)-dim motif
    pair in the k-dim MP and rank which dimensions participate.

    Selection runs on round-4 profile values with the canonical
    smaller-index pair representative (engine-portable, see
    top_k_motifs_kernel)."""
    import numpy as np

    from more_pattern_extraction_spark.functions.kernels import subspace_kernel

    cols = list(value_cols)
    kk = (len(cols) - 1) if k is None else k
    schema = "conv_id string, motif_pos int, nn_pos int, dim_rank int, dim string"

    def f(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = sort_series(pdf, order_col)
        ts = pdf[cols].to_numpy(dtype="float64", na_value=np.nan).T
        empty = pd.DataFrame(
            {c: pd.Series(dtype=t) for c, t in
             [("conv_id", "str"), ("motif_pos", "int32"), ("nn_pos", "int32"),
              ("dim_rank", "int32"), ("dim", "str")]}
        )
        if ts.shape[1] < m:
            return empty
        mps, idx = mstomp(ts, m, ez, include)
        prof = np.round(mps[kk], 4)
        fin = np.isfinite(prof)
        if not fin.any():
            return empty
        a = int(np.argmin(np.where(fin, prof, np.inf)))
        b = int(idx[kk][a])
        i, j = (a, b) if a <= b else (b, a)
        order = subspace_kernel(ts, m, i, j, kk, include)
        return pd.DataFrame(
            {
                "conv_id": pdf["conv_id"].iloc[0],
                "motif_pos": np.int32(i),
                "nn_pos": np.int32(j),
                "dim_rank": np.arange(1, len(order) + 1, dtype="int32"),
                "dim": [cols[d] for d in order],
            }
        )

    return grid.groupBy("conv_id").applyInPandas(f, schema)


def matrix_profile_multidim(
    grid: DataFrame,
    m: int,
    value_cols: list[str],
    include: list[int] | None = None,
    ez: int | None = None,
    order_col: str = "bucket_start",
) -> DataFrame:
    """k-dimensional MP (reference mstump): one row per (conv, k, pos)."""
    cols = list(value_cols)

    def f(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = sort_series(pdf, order_col)
        ts = pdf[cols].to_numpy(dtype="float64", na_value=np.nan).T
        if ts.shape[1] < m:
            return pd.DataFrame(
                {"conv_id": pd.Series(dtype="str"), "k": pd.Series(dtype="int32"),
                 "pos": pd.Series(dtype="int32"), "mp": pd.Series(dtype="float64"),
                 "pi": pd.Series(dtype="int64")}
            )
        mps, idx = mstomp(ts, m, ez, include)
        d, l = mps.shape
        return pd.DataFrame(
            {
                "conv_id": pdf["conv_id"].iloc[0],
                "k": np.repeat(np.arange(1, d + 1, dtype="int32"), l),
                "pos": np.tile(np.arange(l, dtype="int32"), d),
                "mp": mps.ravel(),
                "pi": idx.ravel(),
            }
        )

    return grid.groupBy("conv_id").applyInPandas(f, MDMP_SCHEMA)


def chunk_pairs(chunk_ids: DataFrame, max_horizon_chunks: int | None = None) -> DataFrame:
    """All (ca ≤ cb) chunk pairs per conversation, optionally banded to
    ``cb - ca <= H``.  Factored out so tests can assert the pair fan-out
    count directly (O(C·H) banded vs O(C²) full, C = chunks/conv)."""
    pairs = (
        chunk_ids.alias("a")
        .join(chunk_ids.alias("b"), "conv_id")
        .select("conv_id", F.col("a.chunk").alias("ca"), F.col("b.chunk").alias("cb"))
        .filter(F.col("ca") <= F.col("cb"))
    )
    if max_horizon_chunks is not None:
        pairs = pairs.filter(F.col("cb") - F.col("ca") <= max_horizon_chunks)
    return pairs


def matrix_profile_distributed(
    grid: DataFrame,
    m: int,
    value_col: str = "latency_avg_filled",
    chunk_size: int = 4096,
    ez: int | None = None,
    order_col: str = "bucket_start",
    max_horizon_chunks: int | None = None,
) -> DataFrame:
    """Exact distributed self-join MP via chunk-pair AB-joins + min-reduce.

    Equal to ``matrix_profile`` bit-for-bit (tests/test_matrix_profile.py)
    but scales to conversations that don't fit one task.

    ``max_horizon_chunks`` (H): band the chunk-pair fan-out to
    ``|ca - cb| <= H`` — the profile is then EXACT over the motif horizon
    ``H·chunk_size`` positions (any neighbor within ~H·S grid steps is
    found; a strictly-farther neighbor is not, leaving that position's
    distance an upper bound and its index within-horizon).  This is the
    tunable exactness/cost knob the reference's whole-series stump cannot
    offer (VERDICT r03 "what's missing" #4): O(n·H/S) tasks instead of
    O((n/S)²) — for a 10^8-turn conversation at S=4096, H=8 that is
    ~2·10^5 pairs instead of ~3·10^8.  ``H >= n/S`` (or None) is
    bit-equal to the full path (tests/test_matrix_profile.py).
    """
    if ez is None:
        ez = int(np.ceil(m / 4))
    if chunk_size < m - 1:
        # the halo only replicates the FIRST m-1 rows of the next chunk;
        # smaller chunks would need rows from chunk c+2 and silently drop
        # late positions instead of erroring
        raise ValueError(
            f"chunk_size ({chunk_size}) must be >= m - 1 ({m - 1}): "
            "the single-chunk halo cannot complete trailing windows otherwise"
        )
    S = chunk_size
    pts = with_positions(grid, order_col).select(
        "conv_id", "pos", F.col(value_col).alias("v")
    )
    # every row belongs to its main chunk, plus the previous chunk's halo
    # (first m-1 rows of chunk c complete chunk c-1's windows)
    main = pts.withColumn("chunk", (F.col("pos") / S).cast("int"))
    halo = (
        pts.filter((F.col("pos") % S) < m - 1)
        .withColumn("chunk", (F.col("pos") / S).cast("int") - 1)
        .filter(F.col("chunk") >= 0)
    )
    ch = main.unionByName(halo)

    chunk_ids = ch.select("conv_id", "chunk").distinct()
    pairs = chunk_pairs(chunk_ids, max_horizon_chunks)
    rows_a = pairs.join(
        ch.withColumnRenamed("chunk", "ca"), ["conv_id", "ca"]
    ).select("conv_id", "ca", "cb", F.lit("a").alias("side"), "pos", "v")
    rows_b = pairs.filter(F.col("ca") != F.col("cb")).join(
        ch.withColumnRenamed("chunk", "cb"), ["conv_id", "cb"]
    ).select("conv_id", "ca", "cb", F.lit("b").alias("side"), "pos", "v")
    both = rows_a.unionByName(rows_b)

    def pair_kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        conv, ca, cb = key
        a = pdf[pdf["side"] == "a"].sort_values("pos")
        b = a if ca == cb else pdf[pdf["side"] == "b"].sort_values("pos")
        ta = a["v"].to_numpy(dtype="float64")
        tb = b["v"].to_numpy(dtype="float64")
        off_a = int(a["pos"].iloc[0]) if len(a) else 0
        off_b = int(b["pos"].iloc[0]) if len(b) else 0
        out = []
        la = len(ta) - m + 1
        lb = len(tb) - m + 1
        if la >= 1 and lb >= 1:
            mp_ab, pi_ab = stomp_ab(ta, tb, m, ez, off_a, off_b)
            # emit only positions whose MAIN chunk is ca (halo dedup)
            keep = (np.arange(la) + off_a) // S == ca
            out.append(
                pd.DataFrame(
                    {"pos": (np.arange(la) + off_a)[keep],
                     "mp": mp_ab[keep], "pi": pi_ab[keep]}
                )
            )
            if ca != cb:
                mp_ba, pi_ba = stomp_ab(tb, ta, m, ez, off_b, off_a)
                keep = (np.arange(lb) + off_b) // S == cb
                out.append(
                    pd.DataFrame(
                        {"pos": (np.arange(lb) + off_b)[keep],
                         "mp": mp_ba[keep], "pi": pi_ba[keep]}
                    )
                )
        res = pd.concat(out, ignore_index=True) if out else pd.DataFrame(
            {"pos": [], "mp": [], "pi": []}
        )
        res.insert(0, "conv_id", conv)
        return res.astype({"pos": "int32", "pi": "int64"})

    from more_pattern_extraction_spark.plans.partitioning import spread_groups

    # without the explicit exchange a hot conversation's chunk PAIRS all
    # stay on the task that held the conversation (upstream join leaves
    # conv_id partitioning, which satisfies the UDF's requirement) —
    # serializing exactly the workload this banded path exists to spread
    partials = spread_groups(both, "conv_id", "ca", "cb").groupBy(
        "conv_id", "ca", "cb"
    ).applyInPandas(pair_kernel, MP_SCHEMA)
    reduced = (
        partials.groupBy("conv_id", "pos")
        .agg(F.min("mp").alias("mp"), F.expr("min_by(pi, mp)").alias("pi"))
    )
    # positions with no finite distance anywhere → mp inf, pi -1 (match kernel)
    return reduced.select(
        "conv_id", "pos",
        F.col("mp"),
        F.when(F.col("mp") == float("inf"), F.lit(-1)).otherwise(F.col("pi")).alias("pi"),
    )


def knee_dimensions(mdmp: DataFrame, group_col: str = "conv_id") -> DataFrame:
    """W14 knee-over-dimensions (reference ``plot_knee``,
    ``modules/plots.py:17-44``): the min value of each k-dim profile as a
    curve over k — the reference plots it and eyeballs the elbow; here the
    elbow is made explicit as the k maximizing the discrete curvature
    (second difference) of the curve, with NULL curvature at the ends.

    Input is ``matrix_profile_multidim`` output (conv, k, pos, mp, pi).
    All Catalyst: one groupBy min + two ordered windows — the k-axis is
    tiny (d rows per conversation), so this costs nothing after the MP.
    Per-position values are rounded to 4 before the min (round is
    monotone, so min∘round == round∘min — engine-portable either way)."""
    from pyspark.sql import Window

    per_k = (
        mdmp.filter(F.col("mp") != float("inf"))
        .groupBy(group_col, "k")
        .agg(F.min(F.round("mp", 4)).alias("min_mp"))
    )
    w = Window.partitionBy(group_col).orderBy("k")
    cur = per_k.withColumn("increment", F.col("min_mp") - F.lag("min_mp").over(w))
    cur = cur.withColumn("curvature", F.lead("increment").over(w) - F.col("increment"))
    wk = Window.partitionBy(group_col).orderBy(
        F.desc_nulls_last("curvature"), "k"
    )
    return cur.withColumn(
        "is_knee",
        F.col("curvature").isNotNull() & (F.row_number().over(wk) == 1),
    )
