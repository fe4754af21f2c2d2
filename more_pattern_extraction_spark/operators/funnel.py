"""Funnel analysis: ordered step sequences within a conversation.

"view → click → purchase, each step within X seconds of the previous"
— the standard product-analytics funnel, here over turn streams
("question → tool call → error within the next N seconds" is the
transcript form).  Per conversation, find the EARLIEST completion of
each step given the previous step's time, and report the furthest step
reached.

Relational form (no UDF, no explode): step i's timestamp is
``min(ts) FILTER (pred_i AND ts > t_{i-1} [AND ts <= t_{i-1}+gap])``
as a window aggregate over the conversation — k steps are k chained
window expressions over ONE key shuffle (consecutive windows on the
same partitioning reuse the Exchange; plan test).  Earliest-completion
semantics (greedy): each step takes the first qualifying event after
the previous step — the standard funnel definition (Amplitude/GA
"closed funnel"); it can under-count vs an exhaustive subsequence
search when a later step-1 event would enable an otherwise-impossible
step 2 inside a gap bound, which is the accepted trade every funnel
engine makes (exhaustive search is combinatorial).

Reference analogue: none (the reference's label/event alignment is
nearest-window joins); the funnel is the ordered-sequence form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_steps(
    turns: DataFrame,
    steps: list,
    conv_col: str = "conv_id",
    ts_col: str = "ts",
    within_s: int | None = None,
) -> DataFrame:
    """One row per conversation: ``step{i}_ts`` for each step (NULL once
    the funnel stalls) and ``furthest_step`` (0 = none).

    ``steps`` is an ordered list of boolean Columns over the turn row;
    ``within_s`` bounds the gap between CONSECUTIVE steps (unbounded if
    None)."""
    w = Window.partitionBy(conv_col)
    df = turns
    prev = None
    names = []
    for i, pred in enumerate(steps, start=1):
        cond = pred
        if prev is not None:
            # NTZ-safe epoch comparison (cast through timestamp)
            t = F.col(ts_col).cast("timestamp").cast("double")
            p = F.col(prev).cast("timestamp").cast("double")
            cond = cond & (t > p)
            if within_s is not None:
                cond = cond & (t <= p + F.lit(float(within_s)))
        name = f"step{i}_ts"
        df = df.withColumn(name, F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = name
        names.append(name)
    out = df.groupBy(conv_col).agg(
        *[F.min(n).alias(n) for n in names]
    )
    furthest = F.lit(0)
    for i, n in enumerate(names, start=1):
        furthest = F.when(F.col(n).isNotNull(), i).otherwise(furthest)
    return out.withColumn("furthest_step", furthest)


def funnel_counts(per_conv: DataFrame, n_steps: int) -> DataFrame:
    """Classic funnel report from ``funnel_steps`` output: conversations
    reaching AT LEAST each step (monotone non-increasing)."""
    rows = [
        F.sum(
            (F.col("furthest_step") >= i).cast("bigint")
        ).alias(f"reached_{i}")
        for i in range(1, n_steps + 1)
    ]
    return per_conv.agg(*rows)
