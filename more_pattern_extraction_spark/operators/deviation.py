"""Deviation / changepoint scoring pipelines (reference entry point C,
SURVEY §3.3: ``modules/learning.py:98-228`` train_on_reference_points /
predict_on_sliding_windows / changepoint_scores; scored with
``modules/statistics.py`` and ranked by ``get_top_deviations``).

The reference fits per-window polynomial-Ridge models; here the fit is the
closed-form degree-1 OLS (the reference's get_line_and_slope,
learning.py:76-96) expressed as window aggregates — 100 % Catalyst, no
UDF.  Each hopping window carries (slope, intercept, scores); deviation
score = -(mpe · min(slope, 0)) exactly as deviation_detection.ipynb cell
11 (penalise under-prediction with downward trend).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fit_polynomial_models(
    df: DataFrame,
    y_col: str,
    x_col: str,
    group_col: str = "event_id",
    degree: int = 2,
    alpha: float = 0.0,
) -> DataFrame:
    """Per-group polynomial (ridge) fit via normal equations (the
    reference's model family: PolynomialFeatures + Ridge,
    learning.py:37-74,180-228).  Grouped pandas UDF, closed form —
    (VᵀV + αI)⁻¹Vᵀy with V the increasing-power Vandermonde; α penalizes
    every coefficient including the intercept (documented difference from
    sklearn's fit_intercept handling).  Returns (group, coefs) with
    coefs[k] the x^k coefficient."""
    import numpy as np
    import pandas as pd

    def f(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[x_col].to_numpy(dtype="float64")
        y = pdf[y_col].to_numpy(dtype="float64")
        V = np.vander(x, degree + 1, increasing=True)
        A = V.T @ V + alpha * np.eye(degree + 1)
        c = np.linalg.solve(A, V.T @ y)
        return pd.DataFrame({group_col: [pdf[group_col].iloc[0]], "coefs": [list(c)]})

    # derive the group column's type from the input schema — hardcoding
    # string breaks/coerces non-string keys (e.g. bigint event_id)
    gtype = df.schema[group_col].dataType.simpleString()
    return df.groupBy(group_col).applyInPandas(
        f, f"{group_col} {gtype}, coefs array<double>"
    )


def _poly2_fit_relational(train: DataFrame, y_col: str, x_col: str, key: str) -> DataFrame:
    """Closed-form degree-2 OLS per key in PURE Catalyst: Cramer's rule
    over the 3×3 normal-equation moments — no UDF, and (crucially for the
    DuckDB oracle) the exact same arithmetic expression on both engines."""
    x, y = F.col(x_col), F.col(y_col)
    mo = train.groupBy(key).agg(
        F.count(F.lit(1)).cast("double").alias("s0"),
        F.sum(x).alias("s1"),
        F.sum(x * x).alias("s2"),
        F.sum(x * x * x).alias("s3"),
        F.sum(x * x * x * x).alias("s4"),
        F.sum(y).alias("t0"),
        F.sum(x * y).alias("t1"),
        F.sum(x * x * y).alias("t2"),
    )
    s0, s1, s2, s3, s4 = [F.col(c) for c in ("s0", "s1", "s2", "s3", "s4")]
    t0, t1, t2 = [F.col(c) for c in ("t0", "t1", "t2")]
    det = s0 * (s2 * s4 - s3 * s3) - s1 * (s1 * s4 - s3 * s2) + s2 * (s1 * s3 - s2 * s2)
    c0 = (t0 * (s2 * s4 - s3 * s3) - s1 * (t1 * s4 - s3 * t2) + s2 * (t1 * s3 - s2 * t2)) / det
    c1 = (s0 * (t1 * s4 - s3 * t2) - t0 * (s1 * s4 - s3 * s2) + s2 * (s1 * t2 - t1 * s2)) / det
    c2 = (s0 * (s2 * t2 - t1 * s3) - s1 * (s1 * t2 - t1 * s2) + t0 * (s1 * s3 - s2 * s2)) / det
    return mo.select(key, c0.alias("c0"), c1.alias("c1"), c2.alias("c2"))


def fit_reference_model(
    df: DataFrame,
    y_col: str,
    x_col: str,
    ref_filter,
) -> DataFrame:
    """Global OLS fit y = a + b·x on reference rows (the reference's
    train_on_reference_points): returns a 1-row DataFrame (slope,
    intercept) — broadcast back for prediction."""
    r = df.filter(ref_filter)
    x, y = F.col(x_col), F.col(y_col)
    return r.agg(
        (
            (F.avg(x * y) - F.avg(x) * F.avg(y))
            / (F.avg(x * x) - F.avg(x) * F.avg(x))
        ).alias("slope"),
        F.lit(None).cast("double").alias("_tmp"),
        F.avg(y).alias("_my"),
        F.avg(x).alias("_mx"),
    ).select(
        "slope", (F.col("_my") - F.col("slope") * F.col("_mx")).alias("intercept")
    )


def predict_on_sliding_windows(
    df: DataFrame,
    model: DataFrame,
    y_col: str,
    x_col: str,
    window_size: str = "90 days",
    hop: str = "30 days",
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Hopping-window residual scoring (learning.py:144-178): per window,
    R²/MAE/ME/MAPE/MPE of the broadcast reference model's predictions."""
    p = df.crossJoin(F.broadcast(model)).withColumn(
        "pred", F.col("intercept") + F.col("slope") * F.col(x_col)
    )
    y, pr = F.col(y_col), F.col("pred")
    win = F.window("ts", window_size, hop).alias("win")
    return (
        p.groupBy(*group_cols, win)
        .agg(
            F.count(F.lit(1)).alias("n"),
            (1 - F.sum((y - pr) * (y - pr))
             / (F.sum(y * y) - F.count(F.lit(1)) * F.avg(y) * F.avg(y))).alias("r2"),
            F.avg(F.abs(y - pr)).alias("mae"),
            F.avg(y - pr).alias("me"),
            (F.avg(F.abs(y - pr)) / F.avg(y)).alias("mape"),
            (F.avg(y - pr) / F.avg(y)).alias("mpe"),
            # closed-form slope of the residual inside the window, x = ts
            ((F.avg(F.col(x_col) * (y - pr)) - F.avg(x_col) * F.avg(y - pr))
             / (F.avg(F.col(x_col) * F.col(x_col)) - F.avg(x_col) * F.avg(x_col))
             ).alias("res_slope"),
        )
        .select(
            *group_cols, F.col("win.start").alias("win_start"),
            "n", "r2", "mae", "me", "mape", "mpe", "res_slope",
        )
    )


def deviation_score(windows: DataFrame) -> DataFrame:
    """score = -(mpe · min(res_slope, 0)) (deviation_detection.ipynb cell
    11): large when the model over-predicts AND the residual trends down.
    Rank ascending like get_top_deviations (most negative first)."""
    return windows.withColumn(
        "dev_score", -(F.col("mpe") * F.least(F.col("res_slope"), F.lit(0.0)))
    )


def changepoint_event_scores(
    df: DataFrame,
    events: DataFrame,
    y_col: str,
    x_col: str,
    train_w: str = "7 days",
    val_w: str = "2 days",
    test_w: str = "2 days",
    degree: int = 1,
    alpha: float = 0.0,
    relative_x: bool = False,
) -> DataFrame:
    """Per labeled event (changepoint_scores, learning.py:180-228): fit a
    degree-``degree`` polynomial (ridge if ``alpha`` > 0, matching the
    reference's PolynomialFeatures+Ridge family, learning.py:37-74) on
    [event − train_w − val_w, event − val_w), validate on
    [event − val_w, event), test on [event, event + test_w); emit
    val/test error measures + the ratio used for ranking
    (changepoint_detection.ipynb cells 28-36).

    degree 1/2 with alpha 0 run CLOSED-FORM in pure Catalyst (degree 2
    via Cramer's rule over normal-equation moments); other settings use
    the grouped-UDF normal-equation fit.

    ``relative_x`` replaces ``x_col`` with days-relative-to-event
    ((ts − event_ts)/86400): a small, centered regressor that keeps the
    quadratic normal equations well-conditioned regardless of the series'
    absolute epoch.

    events: (event_id, event_ts [, join cols]).  Small → broadcast; each
    data row joins the events whose windows cover it (range join), tagged
    with its split, then one groupBy computes every per-event per-split
    score.  ``on_cols`` adds equality conditions (e.g. conv key) so events
    only see their own series.
    """
    on_cols: tuple[str, ...] = tuple(
        c for c in events.columns if c not in ("event_id", "event_ts")
    )
    cond = (
        F.col("ts") >= F.col("event_ts") - F.expr(f"INTERVAL {train_w}")
        - F.expr(f"INTERVAL {val_w}")
    ) & (F.col("ts") < F.col("event_ts") + F.expr(f"INTERVAL {test_w}"))
    ev = F.broadcast(events.withColumnsRenamed({c: f"_ev_{c}" for c in on_cols}))
    for c in on_cols:
        cond = cond & (F.col(c) == F.col(f"_ev_{c}"))
    e = df.join(ev, cond).withColumn(
        "split",
        F.when(
            F.col("ts") < F.col("event_ts") - F.expr(f"INTERVAL {val_w}"), "train"
        )
        .when(F.col("ts") < F.col("event_ts"), "val")
        .otherwise("test"),
    )
    if relative_x:
        # NTZ timestamps need the hop through TIMESTAMP before DOUBLE;
        # session TZ is UTC so this equals DuckDB's epoch()
        sec = lambda c: F.col(c).cast("timestamp").cast("double")  # noqa: E731
        e = e.withColumn("_xfit", (sec("ts") - sec("event_ts")) / 86400.0)
        xname = "_xfit"
    else:
        xname = x_col
    x, y = F.col(xname), F.col(y_col)
    train = e.filter(F.col("split") == "train")
    if degree == 1 and alpha == 0.0:
        fit = (
            train.groupBy("event_id")
            .agg(
                ((F.avg(x * y) - F.avg(x) * F.avg(y))
                 / (F.avg(x * x) - F.avg(x) * F.avg(x))).alias("slope"),
                (F.avg(y)).alias("_my"),
                (F.avg(x)).alias("_mx"),
            )
            .select(
                "event_id", "slope",
                (F.col("_my") - F.col("slope") * F.col("_mx")).alias("intercept"),
            )
        )
        pr = F.col("intercept") + F.col("slope") * x
    elif degree == 2 and alpha == 0.0:
        # closed-form quadratic per event — pure Catalyst, no UDF
        fit = _poly2_fit_relational(train, y_col, xname, "event_id")
        pr = F.col("c0") + F.col("c1") * x + F.col("c2") * x * x
    else:
        # general degree / ridge: grouped-UDF normal equations, then a
        # JVM-side fold over the coefficient array for prediction
        fit = fit_polynomial_models(train, y_col, xname, "event_id", degree, alpha)
        pr = F.aggregate(
            F.zip_with(
                F.col("coefs"),
                F.sequence(F.lit(0), F.lit(degree)),
                lambda c, p: c * F.pow(x, p.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    scored = e.filter(F.col("split") != "train").join(F.broadcast(fit), "event_id")
    per_split = scored.groupBy("event_id", "split").agg(
        F.avg(y - pr).alias("me"),
        (F.avg(F.abs(y - pr)) / F.avg(y)).alias("mape"),
    )
    val = per_split.filter("split = 'val'").select(
        "event_id", F.col("me").alias("val_me"), F.col("mape").alias("val_mape")
    )
    test = per_split.filter("split = 'test'").select(
        "event_id", F.col("me").alias("test_me")
    )
    return val.join(test, "event_id").withColumn(
        "ratio", (F.col("test_me") - F.col("val_me")) / F.abs(F.col("val_me"))
    )


def fit_quantile_line(
    train: DataFrame,
    y_col: str,
    x_col: str,
    group_col: str = "event_id",
    tau: float = 0.9,
) -> DataFrame:
    """Exact τ-quantile (pinball-loss) degree-1 fit per group — the
    deterministic linear member of the reference's quantile-regression
    model family (underperformance_estimator.py:20-48, LightGBM
    ``objective='quantile'``; learning.py's model zoo).

    An optimal solution of the quantile-regression LP passes through at
    least two sample points (a basic solution), so the exact fit is the
    argmin of the pinball loss over every point-pair line.  The argmin is
    made engine-portable by rounding the loss to 1e-6 and tie-breaking on
    the pair's time-order indices — the DuckDB oracle runs the identical
    argmin.  Cost is O(n² pairs × n) per group, which is the point: this
    fits BOUNDED event windows (n ≲ 10³ train points), not unbounded
    streams; Spark parallelism is across events, the exact LP is within
    one.  Vectorized numpy inside a grouped pandas UDF, pair dimension
    blocked to bound memory.
    """
    import numpy as np
    import pandas as pd

    def f(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", y_col], kind="mergesort").reset_index(drop=True)
        x = pdf[x_col].to_numpy(dtype="float64")
        y = pdf[y_col].to_numpy(dtype="float64")
        n = len(x)
        gid = pdf[group_col].iloc[0]
        if n < 2:
            return pd.DataFrame(
                {group_col: [gid], "slope": [0.0],
                 "icept": [float(y[0]) if n else 0.0], "n_train": [n]}
            )
        ii, jj = np.triu_indices(n, k=1)
        dx = x[jj] - x[ii]
        keep = dx != 0
        ii, jj, dx = ii[keep], jj[keep], dx[keep]
        b = (y[jj] - y[ii]) / dx
        a = y[ii] - b * x[ii]
        best = None  # (round(loss, 6), first-index-in-(i,j)-order, slope, icept)
        for s in range(0, len(b), 8192):
            e = min(s + 8192, len(b))
            R = y[None, :] - (a[s:e, None] + b[s:e, None] * x[None, :])
            L = np.where(R >= 0, tau * R, (tau - 1.0) * R).sum(axis=1)
            Lr = np.round(L, 6)
            k = int(np.argmin(Lr))  # first occurrence == (i, j) tie-break
            cand = (Lr[k], s + k)
            if best is None or cand[0] < best[0]:
                best = (cand[0], cand[1], float(b[s + k]), float(a[s + k]))
        return pd.DataFrame(
            {group_col: [gid], "slope": [best[2]], "icept": [best[3]],
             "n_train": [n]}
        )

    gtype = train.schema[group_col].dataType.simpleString()
    return train.groupBy(group_col).applyInPandas(
        f, f"{group_col} {gtype}, slope double, icept double, n_train long"
    )


def quantile_event_scores(
    df: DataFrame,
    events: DataFrame,
    y_col: str,
    tau: float = 0.9,
    train_w: str = "7 days",
    val_w: str = "2 days",
    test_w: str = "2 days",
) -> DataFrame:
    """Per labeled event: exact τ-quantile line fit on the train window
    (days-relative-to-event regressor), then val/test exceedance +
    pinball scores — the underperformance signal of the reference's
    quantile family (a healthy series exceeds the τ-line ≈(1−τ) of the
    time; a post-event shift moves the exceed fraction / pinball mean).

    Same broadcast range-join split machinery as
    ``changepoint_event_scores``."""
    on_cols: tuple[str, ...] = tuple(
        c for c in events.columns if c not in ("event_id", "event_ts")
    )
    cond = (
        F.col("ts") >= F.col("event_ts") - F.expr(f"INTERVAL {train_w}")
        - F.expr(f"INTERVAL {val_w}")
    ) & (F.col("ts") < F.col("event_ts") + F.expr(f"INTERVAL {test_w}"))
    ev = F.broadcast(events.withColumnsRenamed({c: f"_ev_{c}" for c in on_cols}))
    for c in on_cols:
        cond = cond & (F.col(c) == F.col(f"_ev_{c}"))
    sec = lambda c: F.col(c).cast("timestamp").cast("double")  # noqa: E731
    e = (
        df.join(ev, cond)
        .withColumn(
            "split",
            F.when(
                F.col("ts") < F.col("event_ts") - F.expr(f"INTERVAL {val_w}"), "train"
            )
            .when(F.col("ts") < F.col("event_ts"), "val")
            .otherwise("test"),
        )
        .withColumn("_xe", (sec("ts") - sec("event_ts")) / 86400.0)
        .filter(F.col(y_col).isNotNull())
    )
    fit = fit_quantile_line(
        e.filter(F.col("split") == "train"), y_col, "_xe", "event_id", tau
    )
    y = F.col(y_col)
    pr = F.col("icept") + F.col("slope") * F.col("_xe")
    r = y - pr
    pinball = F.when(r >= 0, F.lit(tau) * r).otherwise(F.lit(tau - 1.0) * r)
    scored = e.filter(F.col("split") != "train").join(F.broadcast(fit), "event_id")
    per_split = scored.groupBy("event_id", "split").agg(
        F.avg((y > pr).cast("double")).alias("exceed"),
        F.avg(pinball).alias("pinball"),
        F.first("slope").alias("slope"),
        F.first("icept").alias("icept"),
    )
    val = per_split.filter("split = 'val'").select(
        "event_id", "slope", "icept",
        F.col("exceed").alias("val_exceed"), F.col("pinball").alias("val_pinball"),
    )
    test = per_split.filter("split = 'test'").select(
        "event_id",
        F.col("exceed").alias("test_exceed"), F.col("pinball").alias("test_pinball"),
    )
    return val.join(test, "event_id")
