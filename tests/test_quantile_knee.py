"""Round-3 operators: exact pinball-loss quantile fit (deviation) and the
W14 knee-over-dimensions pick (matrix_profile) — vs independent python
oracles."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from more_pattern_extraction_spark.operators import deviation as DV
from more_pattern_extraction_spark.operators import matrix_profile as MP


def _pinball(y, pred, tau):
    r = y - pred
    return np.where(r >= 0, tau * r, (tau - 1.0) * r).sum()


def _py_quantile_line(x, y, tau):
    """Independent O(n^3) loop implementation of the same exact LP."""
    best = None
    n = len(x)
    for i in range(n):
        for j in range(i + 1, n):
            if x[j] == x[i]:
                continue
            b = (y[j] - y[i]) / (x[j] - x[i])
            a = y[i] - b * x[i]
            loss = round(_pinball(y, a + b * x, tau), 6)
            if best is None or loss < best[0]:
                best = (loss, b, a)
    return best


@pytest.mark.parametrize("tau", [0.5, 0.9])
def test_fit_quantile_line_matches_bruteforce(spark, tau):
    rng = np.random.default_rng(33)
    rows = []
    for g in range(3):
        n = 25
        x = np.sort(rng.uniform(0, 10, n))
        y = 2.0 + 0.5 * x + rng.normal(0, 1, n)
        ts = pd.to_datetime("2024-01-01") + pd.to_timedelta(x, unit="D")
        for k in range(n):
            rows.append({"event_id": f"e{g}", "ts": ts[k], "x": x[k], "y": y[k]})
    pdf = pd.DataFrame(rows)
    df = spark.createDataFrame(pdf)
    got = DV.fit_quantile_line(df, "y", "x", "event_id", tau=tau).toPandas()
    for g in range(3):
        sub = pdf[pdf.event_id == f"e{g}"].sort_values(["ts", "y"])
        loss, b, a = _py_quantile_line(sub.x.to_numpy(), sub.y.to_numpy(), tau)
        r = got[got.event_id == f"e{g}"].iloc[0]
        assert r.n_train == 25
        np.testing.assert_allclose([r.slope, r.icept], [b, a], rtol=1e-12)


def test_quantile_line_exceedance_property(spark):
    """For the exact tau-quantile line, at most tau*n points lie strictly
    below and at most (1-tau)*n strictly above (LP optimality)."""
    rng = np.random.default_rng(34)
    n, tau = 60, 0.8
    x = np.sort(rng.uniform(0, 30, n))
    y = 1.0 + 0.2 * x + rng.standard_t(4, n)
    ts = pd.to_datetime("2024-01-01") + pd.to_timedelta(x, unit="D")
    df = spark.createDataFrame(
        pd.DataFrame({"event_id": "e", "ts": ts, "x": x, "y": y})
    )
    r = DV.fit_quantile_line(df, "y", "x", "event_id", tau=tau).toPandas().iloc[0]
    pred = r.icept + r.slope * x
    assert (y < pred).sum() <= tau * n
    assert (y > pred).sum() <= (1 - tau) * n


def test_knee_dimensions_picks_max_curvature(spark):
    """Synthetic k-dim profile mins: y = [1, 1.2, 3.0, 3.1] → the jump at
    k=3 gives max curvature at k=2? curvature_k = (y[k+1]-y[k]) -
    (y[k]-y[k-1]): k=2: (3.0-1.2)-(1.2-1)=1.6; k=3: (3.1-3.0)-(3.0-1.2)
    = -1.7 → knee at k=2."""
    rows = []
    ys = {1: 1.0, 2: 1.2, 3: 3.0, 4: 3.1}
    for k, y in ys.items():
        # two positions per k; min is what matters
        rows.append({"conv_id": "c", "k": k, "pos": 0, "mp": y, "pi": 0})
        rows.append({"conv_id": "c", "k": k, "pos": 1, "mp": y + 0.5, "pi": 0})
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = MP.knee_dimensions(df).orderBy("k").toPandas()
    assert list(out.min_mp) == [1.0, 1.2, 3.0, 3.1]
    assert list(out.is_knee) == [False, True, False, False]
    np.testing.assert_allclose(out.curvature[1], 1.6)


def test_knee_two_dims_no_knee(spark):
    """d=2 → no defined curvature anywhere → no knee flagged."""
    rows = [
        {"conv_id": "c", "k": 1, "pos": 0, "mp": 1.0, "pi": 0},
        {"conv_id": "c", "k": 2, "pos": 0, "mp": 2.0, "pi": 0},
    ]
    out = MP.knee_dimensions(spark.createDataFrame(pd.DataFrame(rows))).toPandas()
    assert not out.is_knee.any()
