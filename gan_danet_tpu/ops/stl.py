"""Batched STL (seasonal-trend decomposition by loess) as a precomputed
linear operator.

The reference detrends both GRACE cubes by fitting a statsmodels
STL(seasonal=13, period=12) **per pixel** in a nested Python loop
(datasets.py:57-136) — 44*90 + 88*180 = 19,800 sequential fits, a major
host hot spot (SURVEY.md §3.1). The rebuild exploits a structural fact:
with robustness iterations disabled (the reference default), every step of
the STL inner loop — cycle-subseries loess, the 3x moving-average + loess
low-pass, and trend loess — is a *linear* map for a fixed series length.
The entire decomposition therefore collapses to a single (T, T) matrix
per role (trend / seasonal), precomputed once and applied to **all pixels
at once** as one einsum — an MXU matmul on TPU, ~4 orders of magnitude
less dispatch overhead than the per-pixel loop.

The algorithm follows Cleveland et al. (1990) with statsmodels' defaults:
degree-1 loess everywhere, trend window = smallest odd int >=
1.5*period/(1 - 1.5/seasonal), low-pass window = smallest odd int > period,
5 inner iterations (statsmodels' non-robust default), 0 robustness
iterations. Parity with an independent iterative Cleveland-1990 oracle is
asserted in tests/test_stl_oracle.py (trend/seasonal agree to ~1e-5).

The reconstruction invariant `trend + detrended == original` (which the
reference verifies to 8.9e-16, test.ipynb cell 3) holds exactly by
construction here.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


def _next_odd(x: float) -> int:
    n = int(np.ceil(x))
    return n if n % 2 == 1 else n + 1


def _loess_row(n: int, x: float, q: int, deg: int) -> np.ndarray:
    """Weights (length n) such that loess-smoothed value at position x is
    row @ y. Tricube weights over the q nearest of positions 0..n-1,
    local polynomial of degree `deg` evaluated at x."""
    pos = np.arange(n, dtype=np.float64)
    d = np.abs(pos - x)
    if q < n:
        lam = np.partition(d, q - 1)[q - 1]
    else:
        # STL Fortran `stlest`: h = (dist to farthest point) + (len-n)/2
        lam = d.max() + (q - n) / 2.0
    lam = max(lam, 1e-12)
    w = np.clip(1.0 - (d / lam) ** 3, 0.0, None) ** 3
    active = w > 0
    if active.sum() <= deg:
        # degenerate neighbourhood: fall back to nearest point
        row = np.zeros(n)
        row[np.argmin(d)] = 1.0
        return row

    t = pos[active] - x
    wa = w[active]
    if deg == 1:
        # Fortran stlest degeneracy guard: with sum-normalized weights, if
        # the weighted spread of positions is <= 0.001 * range, drop the
        # slope term (degree 0)
        wn = wa / wa.sum()
        xbar = np.sum(wn * t)
        c = np.sum(wn * (t - xbar) ** 2)
        if np.sqrt(c) <= 1e-3 * max(n - 1, 1):
            deg = 0
    if deg == 0:
        row_active = wa / wa.sum()
    else:
        # design [1, t, t^2, ...]; value at x = first coeff of WLS solution
        cols = [np.ones_like(t)]
        for p in range(1, deg + 1):
            cols.append(t**p)
        X = np.stack(cols, axis=1)                     # (na, deg+1)
        XtW = X.T * wa[None, :]                        # (deg+1, na)
        G = XtW @ X                                    # (deg+1, deg+1)
        # row of the hat matrix for the intercept
        row_active = np.linalg.solve(G, XtW)[0]
    row = np.zeros(n)
    row[active] = row_active
    return row


def loess_matrix(
    n: int, q: int, deg: int = 1, eval_positions: Optional[np.ndarray] = None
) -> np.ndarray:
    """(len(eval_positions), n) loess smoother matrix. Default evaluates at
    the observation positions 0..n-1; pass e.g. [-1, 0, ..., n] to also
    extrapolate one step at each end (STL cycle-subseries extension)."""
    if eval_positions is None:
        eval_positions = np.arange(n)
    return np.stack([_loess_row(n, float(x), q, deg) for x in eval_positions])


def _moving_average_matrix(length: int, window: int) -> np.ndarray:
    """(length-window+1, length) centred moving-average operator."""
    out = length - window + 1
    m = np.zeros((out, length))
    for i in range(out):
        m[i, i : i + window] = 1.0 / window
    return m


@functools.lru_cache(maxsize=16)
def stl_operator(
    n: int,
    period: int = 12,
    seasonal: int = 13,
    trend: Optional[int] = None,
    low_pass: Optional[int] = None,
    inner_iter: int = 5,
) -> Tuple[np.ndarray, np.ndarray]:
    """Precompute (A_trend, A_seasonal): (n, n) matrices such that
    trend = A_trend @ y and seasonal = A_seasonal @ y for any length-n
    monthly series."""
    if trend is None:
        trend = _next_odd(1.5 * period / (1.0 - 1.5 / seasonal))
    if low_pass is None:
        low_pass = _next_odd(period + 0.5)  # smallest odd int > period

    p = period
    eye = np.eye(n)

    # --- cycle-subseries smoothing operator: (n + 2p, n) ---
    c_op = np.zeros((n + 2 * p, n))
    for ph in range(p):
        idx = np.arange(ph, n, p)
        n_sub = len(idx)
        ev = np.arange(-1, n_sub + 1, dtype=np.float64)
        sub_m = loess_matrix(n_sub, seasonal, 1, ev)   # (n_sub+2, n_sub)
        out_rows = ph + np.arange(-1, n_sub + 1) * p + p
        c_op[np.ix_(out_rows, idx)] = sub_m

    # --- low-pass: MA(p) . MA(p) . MA(3) . loess(low_pass) : (n, n+2p) ---
    ma1 = _moving_average_matrix(n + 2 * p, p)
    ma2 = _moving_average_matrix(n + p + 1, p)
    ma3 = _moving_average_matrix(n + 2, 3)
    lp_loess = loess_matrix(n, low_pass, 1)
    lp = lp_loess @ ma3 @ ma2 @ ma1                    # (n, n+2p)

    # --- middle-slice selector (drop the p extension rows each side) ---
    mid = np.zeros((n, n + 2 * p))
    mid[np.arange(n), np.arange(n) + p] = 1.0

    trend_loess = loess_matrix(n, trend, 1)

    a_t = np.zeros((n, n))
    a_s = np.zeros((n, n))
    for _ in range(inner_iter):
        detr = eye - a_t                               # y - T
        a_c = c_op @ detr                              # C
        a_s = (mid - lp) @ a_c                         # S = mid(C) - L(C)
        a_t = trend_loess @ (eye - a_s)                # T = loess(y - S)
    return a_t.astype(np.float32), a_s.astype(np.float32)


def detrend_and_compare(cube, period: int = 12, seasonal: int = 13):
    """API parity with reference datasets.py:57-136: returns
    (trend, detrended, reconstructed, max_reconstruction_error).
    Here reconstruction is exact by construction (detrended := cube−trend),
    matching the reference's observed 8.9e-16 invariant."""
    import numpy as np

    trend, detrended = stl_detrend(jnp.asarray(cube), period, seasonal)
    trend = np.asarray(trend)
    detrended = np.asarray(detrended)
    recon = trend + detrended
    max_err = float(np.max(np.abs(recon - np.asarray(cube))))
    return trend, detrended, recon, max_err


def stl_detrend(
    cube: jnp.ndarray,
    period: int = 12,
    seasonal: int = 13,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Decompose a (T, ...) cube into (trend, detrended) along axis 0,
    simultaneously for every pixel. detrended := cube - trend, so
    trend + detrended == cube exactly (the reference's invariant)."""
    t = cube.shape[0]
    a_t, _ = stl_operator(t, period=period, seasonal=seasonal)
    flat = cube.reshape(t, -1).astype(jnp.float32)
    trend = jnp.einsum("ts,sp->tp", jnp.asarray(a_t), flat,
                       preferred_element_type=jnp.float32)
    trend = trend.reshape(cube.shape).astype(cube.dtype)
    return trend, cube - trend
