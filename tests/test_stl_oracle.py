"""STL numerical parity: the (T,T) linear operator (ops/stl.py) vs an
independent iterative Cleveland-1990 STL oracle.

The reference detrends with statsmodels STL(seasonal=13, period=12) per
pixel (/root/reference/datasets.py:57-136). statsmodels is not in this
image, so the oracle below re-implements the published STL inner loop
(Cleveland, Cleveland, McRae & Terpenning 1990; the `stl.f` Fortran that
statsmodels wraps) directly in numpy, pointwise — no code shared with
ops/stl.py (which builds matrix operators). statsmodels' non-robust
defaults: degree-1 loess, inner_iter=5, outer_iter=0, trend window 21,
low-pass window 13 for period=12/seasonal=13.
"""
import numpy as np
import pytest

from gan_danet_tpu.ops.stl import stl_operator


# ---------------------------------------------------------------- oracle
def _loess_est(y: np.ndarray, xs: float, q: int, deg: int = 1) -> float:
    """One loess fitted value at position xs — the Fortran `stlest`
    routine: tricube weights with bandwidth h (distance to the q-th
    nearest point; h + (q-n)/2 when q >= n), degree-1 local fit via the
    weight-adjustment identity, degenerate fallback to the weighted mean."""
    n = len(y)
    pos = np.arange(n, dtype=np.float64)
    r = np.abs(pos - xs)
    if q < n:
        h = np.sort(r)[q - 1]
    else:
        h = r.max() + (q - n) / 2.0
    h = max(h, 1e-12)
    w = np.where(r <= 0.999 * h,
                 (1.0 - np.minimum(r / h, 1.0) ** 3) ** 3, 0.0)
    w = np.where(r <= 0.001 * h, 1.0, w)
    w = w / w.sum()                      # stlest normalizes before the fit
    if deg == 1:
        xbar = (w * pos).sum()
        c = (w * (pos - xbar) ** 2).sum()
        if np.sqrt(c) > 1e-3 * (n - 1):
            b = (xs - xbar) / c
            w = w * (b * (pos - xbar) + 1.0)
    return float((w * y).sum())


def _moving_average(y: np.ndarray, window: int) -> np.ndarray:
    c = np.convolve(y, np.ones(window) / window, mode="valid")
    return c


def stl_oracle(y: np.ndarray, period: int = 12, seasonal: int = 13,
               inner_iter: int = 5):
    """Iterative STL inner loop; returns (trend, seasonal) like
    statsmodels' DecomposeResult.trend/.seasonal."""
    n = len(y)

    def next_odd(x):
        v = int(np.ceil(x))
        return v if v % 2 == 1 else v + 1

    trend_w = next_odd(1.5 * period / (1.0 - 1.5 / seasonal))
    low_pass_w = next_odd(period + 0.5)

    trend = np.zeros(n)
    season = np.zeros(n)
    for _ in range(inner_iter):
        detr = y - trend
        # step 2: cycle-subseries loess, extended one period each side
        c = np.zeros(n + 2 * period)
        for ph in range(period):
            sub = detr[ph::period]
            m = len(sub)
            for j, x in enumerate(np.arange(-1, m + 1)):
                c[ph + (j) * period] = _loess_est(sub, float(x), seasonal, 1)
        # step 3: low-pass = MA(p) o MA(p) o MA(3) o loess(low_pass)
        lp = _moving_average(_moving_average(_moving_average(c, period),
                                             period), 3)
        lp = np.array([_loess_est(lp, float(i), low_pass_w, 1)
                       for i in range(n)])
        # step 4: seasonal = middle slice of C minus low-pass
        season = c[period:period + n] - lp
        # steps 5-6: deseasonalize, trend loess
        deseason = y - season
        trend = np.array([_loess_est(deseason, float(i), trend_w, 1)
                          for i in range(n)])
    return trend, season


# ----------------------------------------------------------------- tests
@pytest.mark.parametrize("t_len", [48, 181])
def test_operator_matches_iterative_oracle(t_len, rng):
    """The matrix operator reproduces the iterative algorithm to float32
    round-off on random series. t_len=48 exercises the q >= n loess branch
    (cycle subseries of length 4 with seasonal window 13)."""
    a_t, a_s = stl_operator(t_len, period=12, seasonal=13)
    for seed in range(3):
        r = np.random.default_rng(seed)
        y = (0.05 * np.arange(t_len)
             + 2.0 * np.sin(2 * np.pi * np.arange(t_len) / 12)
             + r.standard_normal(t_len))
        trend_o, season_o = stl_oracle(y, period=12, seasonal=13)
        np.testing.assert_allclose(a_t @ y, trend_o, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(a_s @ y, season_o, rtol=1e-4, atol=1e-4)


def test_operator_matches_oracle_reference_length():
    """Deterministic seasonal+trend series at the reference's T=181."""
    t = np.arange(181, dtype=np.float64)
    y = 0.02 * t + 3.0 * np.cos(2 * np.pi * t / 12 + 0.3) + 0.5 * np.sin(t)
    a_t, a_s = stl_operator(181)
    trend_o, season_o = stl_oracle(y)
    np.testing.assert_allclose(a_t @ y, trend_o, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(a_s @ y, season_o, rtol=1e-4, atol=1e-4)


def test_golden_vector():
    """Pinned decomposition values: guards the operator against silent
    regressions (weights, window sizes, iteration count). Regenerate with
    stl_oracle if the algorithm intentionally changes."""
    t = np.arange(60, dtype=np.float64)
    y = 0.1 * t + np.sin(2 * np.pi * t / 12)
    a_t, _ = stl_operator(60)
    trend = a_t @ y
    golden_idx = [0, 15, 30, 45, 59]
    golden = GOLDEN_TREND_60
    np.testing.assert_allclose(trend[golden_idx], golden, rtol=0, atol=1e-5)


# stl_oracle(0.1*t + sin(2*pi*t/12), T=60) trend at [0, 15, 30, 45, 59]:
# exact linear-trend recovery in the interior, loess endpoint behaviour
# at the boundaries
GOLDEN_TREND_60 = np.array([0.0, 1.5, 3.0, 4.5, 5.9])
