"""Sessionization: split a conversation's turn stream on inactivity gaps.

The standard event-analytics operator (a "session" ends after
``gap_s`` seconds of silence): lag the timestamp per conversation, flag
gap > bound (or stream start) as a session boundary, running-sum the
flags — two window passes over ONE key shuffle, all whole-stage
codegen, no Python.

Skew note: like every per-conversation ordered window in this engine,
the running sum sorts a conversation's turns on one task.  The lag
features carry an adaptive segmented-scan escape hatch for >100k-turn
conversations (rollup.turn_features ``seg_rows``, LAG_SEG_ROWS); the
session index is a PREFIX SUM, which would need a block-carry second
pass to segment the same way — not implemented until a measured need,
same policy as the gates (the hazard bound and precedent are
documented, the plain form is the measured-faster default on real
shapes: SEG_OVERHEAD_r06.json).

Reference analogue: none as an operator (the reference's notebooks
slice fixed calendar windows); sessionization is the transcript-native
form of its date-interval slicing (J2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    turns: DataFrame,
    gap_s: int = 1800,
    conv_col: str = "conv_id",
    ts_col: str = "ts",
    tie_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Add ``session_idx`` (1-based per conversation) and ``is_session_start``.

    ``tie_cols`` break ordering ties at equal timestamps (determinism —
    pass the row id when timestamps can collide)."""
    w = Window.partitionBy(conv_col).orderBy(ts_col, *tie_cols)
    prev_ts = F.lag(ts_col).over(w)
    # NTZ sources: cast through timestamp before double (Spark 4 forbids
    # the direct cast; session TZ is pinned UTC so this equals epoch())
    gap = (F.col(ts_col).cast("timestamp").cast("double")
           - prev_ts.cast("timestamp").cast("double"))
    new_sess = (prev_ts.isNull() | (gap > gap_s)).cast("int")
    run = Window.partitionBy(conv_col).orderBy(ts_col, *tie_cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return turns.withColumn("is_session_start", new_sess.cast("boolean")).withColumn(
        "session_idx", F.sum(new_sess).over(run)
    )


def session_stats(
    sessions: DataFrame, conv_col: str = "conv_id", ts_col: str = "ts"
) -> DataFrame:
    """Per-session aggregate: turn count, start/end, duration — one
    partial-aggregated shuffle on (conv, session_idx)."""
    return sessions.groupBy(conv_col, "session_idx").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.min(ts_col).alias("sess_start"),
        F.max(ts_col).alias("sess_end"),
        (F.max(ts_col).cast("timestamp").cast("double")
         - F.min(ts_col).cast("timestamp").cast("double")).alias("duration_s"),
    )
