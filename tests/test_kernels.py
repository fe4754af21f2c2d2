"""Kernel correctness vs brute-force z-normalized distance oracles
(the reference's stumpy outputs are reproduced by these same definitions;
motif/changepoint indices are integers → exact matches, SURVEY §5.2)."""

import numpy as np
import pytest

from more_pattern_extraction_spark.functions import kernels as K


def brute_znorm_dist(a: np.ndarray, b: np.ndarray) -> float:
    sa, sb = a.std(), b.std()
    if sa < 1e-13 and sb < 1e-13:
        return 0.0
    if sa < 1e-13 or sb < 1e-13:
        return float(np.sqrt(len(a)))
    az = (a - a.mean()) / sa
    bz = (b - b.mean()) / sb
    return float(np.linalg.norm(az - bz))


def brute_mp(t: np.ndarray, m: int, ez: int):
    l = len(t) - m + 1
    mp = np.full(l, np.inf)
    pi = np.full(l, -1, dtype=np.int64)
    for i in range(l):
        best, bj = np.inf, -1
        for j in range(l):
            if abs(i - j) <= ez:
                continue
            d = brute_znorm_dist(t[i : i + m], t[j : j + m])
            if d < best:
                best, bj = d, j
        mp[i], pi[i] = best, bj
    return mp, pi


@pytest.mark.parametrize("seed,n,m", [(0, 200, 16), (1, 137, 8), (2, 80, 25)])
def test_stomp_matches_brute_force(seed, n, m):
    rng = np.random.default_rng(seed)
    t = rng.normal(0, 1, n).cumsum()  # random walk: realistic structure
    ez = int(np.ceil(m / 4))
    mp, pi = K.stomp(t, m)
    bmp, bpi = brute_mp(t, m, ez)
    np.testing.assert_allclose(mp, bmp, rtol=1e-7, atol=1e-7)
    # indices may differ only on exact ties; verify distances at pi agree
    for i in range(len(pi)):
        d = brute_znorm_dist(t[i : i + m], t[pi[i] : pi[i] + m])
        np.testing.assert_allclose(d, bmp[i], rtol=1e-7, atol=1e-7)


def test_stomp_constant_windows():
    t = np.concatenate([np.zeros(30), np.sin(np.arange(40)), np.zeros(30)])
    mp, pi = K.stomp(t, 10)
    assert np.isfinite(mp).all()
    # the two flat ends are each other's zero-distance matches
    assert mp[0] == 0.0


def test_mass2_matches_brute():
    rng = np.random.default_rng(3)
    t = rng.normal(0, 1, 300).cumsum()
    q = t[50:74]
    prof = K.mass2(q, t)
    assert len(prof) == 300 - 24 + 1
    brute = np.array(
        [brute_znorm_dist(q, t[i : i + 24]) for i in range(len(prof))]
    )
    np.testing.assert_allclose(prof, brute, rtol=1e-6, atol=1e-6)
    assert prof[50] < 1e-5  # exact self-match


def test_mstomp_first_row_equals_stomp():
    rng = np.random.default_rng(4)
    t = rng.normal(0, 1, 150).cumsum()
    mp1, pi1 = K.stomp(t, 12)
    mps, idx = K.mstomp(t.reshape(1, -1), 12)
    np.testing.assert_allclose(mps[0], mp1, rtol=1e-7, atol=1e-9)
    assert (idx[0] == pi1).all()


def test_mstomp_kdim_monotone_and_include():
    rng = np.random.default_rng(5)
    d, n, m = 3, 200, 10
    ts = rng.normal(0, 1, (d, n)).cumsum(axis=1)
    mps, idx = K.mstomp(ts, m)
    # k-dim MP is non-decreasing in k at every position (mean of k smallest)
    assert (np.diff(mps, axis=0) >= -1e-9).all()
    mps_inc, _ = K.mstomp(ts, m, include=[2])
    # constrained 1-dim profile == dimension 2's own profile
    mp2, _ = K.stomp(ts[2], m)
    np.testing.assert_allclose(mps_inc[0], mp2, rtol=1e-7, atol=1e-9)


def test_fluss_detects_planted_regime_change():
    rng = np.random.default_rng(6)
    # two regimes with different generating patterns
    a = np.sin(np.arange(600) * 0.3) + rng.normal(0, 0.1, 600)
    b = np.sign(np.sin(np.arange(600) * 0.05)) + rng.normal(0, 0.1, 600)
    t = np.concatenate([a, b])
    m = 25
    mp, pi = K.stomp(t, m)
    cac, regimes = K.fluss(pi, L=m, n_regimes=2, excl_factor=5)
    assert len(regimes) == 1
    assert abs(regimes[0] - 600) < 100  # changepoint near the true boundary
    assert cac.min() < 0.4


def test_top_k_motifs_finds_planted_motif():
    rng = np.random.default_rng(7)
    t = rng.normal(0, 1, 500)
    pattern = np.sin(np.arange(30) * 0.7) * 3
    for pos in (50, 200, 400):
        t[pos : pos + 30] = pattern + rng.normal(0, 0.01, 30)
    mp, pi = K.stomp(t, 30)
    motifs = K.top_k_motifs_kernel(t, mp, pi, m=30, ez=15, radius=3.0, k=2)
    found = sorted(motifs[0]["motifs"] + motifs[0]["neighbors"])
    assert all(any(abs(f - p) <= 2 for p in (50, 200, 400)) for f in found)
    assert len(found) == 3  # pair + 1 neighbor


def test_top_k_discords_finds_planted_anomaly():
    t = np.sin(np.arange(400) * 0.5)
    t[200:215] += np.linspace(0, 6, 15)  # anomaly
    mp, pi = K.stomp(t, 15)
    discords = K.top_k_discords_kernel(mp, ez=15, k=1)
    assert len(discords) == 1
    assert abs(discords[0][0] - 200) <= 15


def test_find_neighbors_multidim():
    rng = np.random.default_rng(8)
    n = 300
    ts = rng.normal(0, 1, (n, 2)).cumsum(axis=0)
    q = ts[40:70]
    nbrs, dists = K.find_neighbors_kernel(
        q, ts, min_dist=float("inf"), exclusion_zone=15, max_neighbors=3
    )
    assert nbrs[0] == 40 and dists[0] < 1e-5
    assert len(nbrs) == 3 and all(d >= -1e-9 for d in np.diff(dists))


def test_complexity_av_and_apply():
    # flat region has low complexity, sine region high
    t = np.concatenate([np.zeros(100), np.sin(np.arange(100) * 0.5) * 3])
    m = 10
    av = K.complexity_av(t, m)
    assert av.min() >= 0 and av.max() <= 1
    assert av[:80].mean() < 0.1 < av[110:].mean()
    mp, pi = K.stomp(t, m)
    cmp_ = K.apply_av(mp, av)
    finite = np.isfinite(mp)
    assert (cmp_[finite] >= mp[finite] - 1e-12).all()
    # flat windows get pushed toward the max → ranked away from motifs
    assert cmp_[10] > mp[10]
