"""Gap-fill: bucket-spine densification + LOCF + linear interpolation with
pandas ``interpolate(method='linear', limit=k, limit_direction='both')``
semantics (reference ``chunk_interpolate``, ``modules/preprocessing.py:
185-208``, applied by ``change_granularity`` :23-44).

Semantics matched empirically against pandas (tests/test_gapfill.py):
  * interior NaN run between anchors a..b → linear interpolation, but only
    positions within ``limit`` of either end of the run are filled;
  * trailing NaNs → flat-fill (last value) up to ``limit`` positions;
  * leading NaNs → back-fill (next value) up to ``limit`` positions
    counted from the first valid point backwards.

Everything is Catalyst window functions — zero UDFs.  The spine join is a
per-conversation ``sequence()`` explode left-joined to the rollup; at
10^12-turn scale the spine is generated per (conv, ts-day) so no single
``sequence`` array exceeds one day of buckets (1440 for 1m).

Reference chunking (``chunker`` 10^6-row pieces for RAM) is subsumed by
partitioning itself; unlike the reference, window frames here never cross
executor memory limits because frames are bounded (the unbounded LOCF
window is a running aggregate, streamed by Spark's window operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SECONDS = {"1m": 60, "1h": 3600, "1d": 86400}


def bucket_spine(rollup: DataFrame, tier: str = "1m") -> DataFrame:
    """Dense per-conversation bucket grid from min to max observed bucket.

    Split per (conv, day): the bounds row is first crossed with a one-day
    spine, then each (conv, day) row generates a day-bounded ``sequence``
    (≤1440 elements at 1m) — a multi-year conversation never materializes
    its whole range in a single array row.  The union of the per-day
    sequences equals the single full-range sequence exactly because every
    supported step divides a day and ``bucket_start`` is step-aligned, so
    each midnight lies on the bucket grid.  The (conv, day) repartition
    doubles as hot-conversation salting: one viral conversation's spine
    spreads across tasks by day.
    """
    step = _SECONDS[tier]
    bounds = rollup.groupBy("conv_id").agg(
        F.min("bucket_start").alias("b0"), F.max("bucket_start").alias("b1")
    )
    if tier == "1d":
        # one bucket per day — the whole-range sequence IS the day spine
        return bounds.repartition("conv_id").select(
            "conv_id",
            F.explode(
                F.sequence(F.col("b0"), F.col("b1"), F.expr(f"interval {step} seconds"))
            ).alias("bucket_start"),
        )
    days = bounds.select(
        "conv_id",
        "b0",
        "b1",
        F.explode(
            F.sequence(
                F.date_trunc("day", F.col("b0")),
                F.date_trunc("day", F.col("b1")),
                F.expr("interval 1 day"),
            )
        ).alias("day"),
    )
    # the day table is still small (rows = conv-days, pre-explode) but the
    # sequence below fans each row out ×1440 (1m) — spread (conv, day)
    # across tasks FIRST so a hot conversation doesn't pin one task
    days = days.repartition("conv_id", "day")
    day_end = F.col("day") + F.expr("interval 1 day") - F.expr(f"interval {step} seconds")
    return days.select(
        "conv_id",
        F.explode(
            F.sequence(
                F.greatest(F.col("b0"), F.col("day")),
                F.least(F.col("b1"), day_end),
                F.expr(f"interval {step} seconds"),
            )
        ).alias("bucket_start"),
    )


def densify(rollup: DataFrame, tier: str = "1m") -> DataFrame:
    """Left-join the rollup onto its dense spine; missing buckets appear as
    all-null feature rows with ``gap_filled`` candidate flag."""
    spine = bucket_spine(rollup, tier)
    joined = spine.join(rollup, ["conv_id", "bucket_start"], "left")
    return joined.withColumn("is_gap", F.col("turn_cnt").isNull())


def interpolate(
    df: DataFrame,
    cols: list[str],
    limit: int = 1,
    partition_cols: tuple[str, ...] = ("conv_id",),
    order_col: str = "bucket_start",
    with_locf: bool = False,
) -> DataFrame:
    """pandas-parity linear interpolation over a dense grid (see module
    docstring).  Adds ``<col>_filled`` per input col plus ``gap_filled``.

    ``with_locf=True`` additionally emits ``<col>_locf`` from the SAME
    forward window pass (coalesce(col, prev-non-null) ≡ the standalone
    ``locf``) — fusing it here saves a third full per-partition sort at
    scale (forward, reverse, and the separate locf window each cost one).
    """
    ord_w = Window.partitionBy(*partition_cols).orderBy(order_col)
    df = df.withColumn("_pos", F.row_number().over(ord_w))
    # CRUCIAL at scale: both look-around frames must be *growing* frames
    # (unboundedPreceding..-1), which Spark evaluates incrementally in
    # O(n).  A (1, unboundedFollowing) frame is re-aggregated per row —
    # O(n²) — and hangs on month-long spines; the "next non-null" leg is
    # therefore a growing frame over the REVERSED ordering.
    w_prev = ord_w.rowsBetween(Window.unboundedPreceding, -1)
    w_next = (
        Window.partitionBy(*partition_cols)
        .orderBy(F.desc(order_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )

    any_filled = F.lit(False)
    for c in cols:
        pos_nn = F.when(F.col(c).isNotNull(), F.col("_pos"))
        val_prev = F.last(F.col(c), ignorenulls=True).over(w_prev)
        pos_prev = F.last(pos_nn, ignorenulls=True).over(w_prev)
        val_next = F.last(F.col(c), ignorenulls=True).over(w_next)
        pos_next = F.last(pos_nn, ignorenulls=True).over(w_next)
        d_prev = F.col("_pos") - pos_prev
        d_next = pos_next - F.col("_pos")
        interp = F.when(
            val_prev.isNotNull() & val_next.isNotNull(),
            val_prev + (val_next - val_prev) * d_prev / (d_next + d_prev),
        ).when(val_prev.isNotNull(), val_prev).otherwise(val_next)
        in_limit = (
            (pos_prev.isNotNull() & (d_prev <= limit))
            | (pos_next.isNotNull() & (d_next <= limit))
        )
        filled = F.when(F.col(c).isNotNull(), F.col(c)).when(in_limit, interp)
        df = df.withColumn(f"{c}_filled", filled)
        if with_locf:
            df = df.withColumn(f"{c}_locf", F.coalesce(F.col(c), val_prev))
        any_filled = any_filled | (F.col(c).isNull() & filled.isNotNull())
    return df.withColumn("gap_filled", any_filled).drop("_pos")


def locf(
    df: DataFrame,
    cols: list[str],
    partition_cols: tuple[str, ...] = ("conv_id",),
    order_col: str = "bucket_start",
) -> DataFrame:
    """Last-observation-carried-forward: ``last(col, ignorenulls) over
    (unboundedPreceding, 0)`` (reference fillna/LOCF masks,
    ``modules/learning.py:450``)."""
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in cols:
        df = df.withColumn(f"{c}_locf", F.last(F.col(c), ignorenulls=True).over(w))
    return df


def gap_fill_rollup(rollup: DataFrame, tier: str = "1m", limit: int = 1) -> DataFrame:
    """End-to-end: densify → counts default 0 → LOCF + linear interp on
    latency features (the §7.1 slice)."""
    dense = densify(rollup, tier)
    dense = dense.withColumn("turn_cnt", F.coalesce("turn_cnt", F.lit(0))).withColumn(
        "tool_call_cnt", F.coalesce("tool_call_cnt", F.lit(0))
    )
    return interpolate(dense, ["latency_avg"], limit=limit, with_locf=True)
