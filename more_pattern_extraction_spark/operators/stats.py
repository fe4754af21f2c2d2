"""Statistical scoring operators (reference A4/A5/A9:
``modules/statistics.py``, ``modules/learning.py:444-466`` tester/scorer).

Regression error measures and binary-classification metrics as pure
column aggregates; the coefficient of multiple correlation collects the
(tiny) pairwise-corr matrix to the driver for the inverse, exactly like
the reference (a d×d matrix for d feature columns — never data-sized).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def regression_scores(
    df: DataFrame, y_col: str, pred_col: str, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """R², MAE, ME, MAPE, MPE (statistics.py:43-64; mape1/mpe1 divide by
    mean(y), :7-40)."""
    y, p = F.col(y_col), F.col(pred_col)
    gb = df.groupBy(*group_cols) if group_cols else df.groupBy()
    return gb.agg(
        (1 - F.sum((y - p) * (y - p))
         / (F.sum(y * y) - F.count(F.lit(1)) * F.avg(y) * F.avg(y))).alias("r2"),
        F.avg(F.abs(y - p)).alias("mae"),
        F.avg(y - p).alias("me"),
        (F.avg(F.abs(y - p)) / F.avg(y)).alias("mape"),
        (F.avg(y - p) / F.avg(y)).alias("mpe"),
    )


def classification_scores(
    df: DataFrame, actual_col: str, pred_col: str, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Binary-classification metrics from confusion counts (the reference's
    scorer, learning.py:457-466): f1, precision, recall, accuracy, hamming
    loss, jaccard, cohen's kappa, balanced accuracy (== ROC-AUC for hard
    binary predictions)."""
    a = F.col(actual_col).cast("int")
    p = F.col(pred_col).cast("int")
    gb = df.groupBy(*group_cols) if group_cols else df.groupBy()
    c = gb.agg(
        F.sum(((a == 1) & (p == 1)).cast("long")).alias("tp"),
        F.sum(((a == 0) & (p == 1)).cast("long")).alias("fp"),
        F.sum(((a == 1) & (p == 0)).cast("long")).alias("fn"),
        F.sum(((a == 0) & (p == 0)).cast("long")).alias("tn"),
    )
    tp, fp, fn, tn = (F.col(x).cast("double") for x in ("tp", "fp", "fn", "tn"))
    n = tp + fp + fn + tn
    # try_divide: empty/degenerate confusion cells → NULL metric (ANSI-safe;
    # the DuckDB oracle mirrors with x / nullif(d, 0))
    prec = F.try_divide(tp, tp + fp)
    rec = F.try_divide(tp, tp + fn)
    spec = F.try_divide(tn, tn + fp)
    acc = F.try_divide(tp + tn, n)
    pe = F.try_divide((tp + fp) * (tp + fn) + (fn + tn) * (fp + tn), n * n)
    return c.select(
        *[F.col(g) for g in group_cols],
        "tp", "fp", "fn", "tn",
        F.try_divide(2 * prec * rec, prec + rec).alias("f1"),
        prec.alias("precision"),
        rec.alias("recall"),
        acc.alias("accuracy"),
        F.try_divide(fp + fn, n).alias("hamming_loss"),
        F.try_divide(tp, tp + fp + fn).alias("jaccard"),
        F.try_divide(acc - pe, 1 - pe).alias("cohen_kappa"),
        ((rec + spec) / 2).alias("balanced_accuracy"),
    )


def top_deviations(
    scores: DataFrame, metric: str = "mpe", n: int = 5, ascending: bool = True
) -> DataFrame:
    """Top-n most deviant segments by a score column (get_top_deviations,
    statistics.py:67-84: argsort ascending, most-negative mpe first)."""
    order = F.col(metric).asc() if ascending else F.col(metric).desc()
    return scores.orderBy(order).limit(n)


def multi_corr(df: DataFrame, dep_col: str, indep_cols: list[str]) -> float:
    """Coefficient of multiple correlation (statistics.py:87-107): pairwise
    Pearson corr aggregates in Spark (one pass, d(d+1)/2 aggs), then the
    d×d inverse on the driver."""
    cols = [dep_col, *indep_cols]
    aggs = []
    for i, ci in enumerate(cols):
        for cj in cols[i + 1 :]:
            aggs.append(F.corr(ci, cj).alias(f"{ci}__{cj}"))
    row = df.agg(*aggs).collect()[0].asDict()
    d = len(cols)
    m = np.eye(d)
    for i, ci in enumerate(cols):
        for j in range(i + 1, d):
            v = row[f"{ci}__{cols[j]}"]
            m[i, j] = m[j, i] = v if v is not None else 0.0
    r_ind = m[1:, 1:]
    r_dep = m[1:, 0]
    return float(r_dep @ np.linalg.inv(r_ind) @ r_dep)
