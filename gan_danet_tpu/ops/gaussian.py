"""Gaussian smoothing as precomputed linear operators.

The reference smooths every GLDAS channel of every time step with
scipy.ndimage.gaussian_filter(sigma=3) (datasets.py:430-437) — a host hot
loop of T x 36 filter calls. A separable gaussian with scipy's 'reflect'
boundary on a fixed-size axis is a linear map, so we precompute one
(n, n) smoothing matrix per axis and apply the whole (T, H, W, C) cube as
two einsum contractions — a single fused pair of MXU matmuls on TPU.

Matches scipy.ndimage.gaussian_filter1d(mode='reflect', truncate=4.0) to
float32 precision (verified in tests/test_gaussian.py).
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def gaussian_matrix(n: int, sigma: float, truncate: float = 4.0) -> np.ndarray:
    """(n, n) matrix equivalent of scipy gaussian_filter1d with 'reflect'
    boundary ((d c b a | a b c d | d c b a) — numpy 'symmetric' padding)."""
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    kernel = np.exp(-0.5 * (x / sigma) ** 2)
    kernel /= kernel.sum()

    m = np.zeros((n, n), dtype=np.float64)
    for i in range(n):
        for o, w in zip(range(-radius, radius + 1), kernel):
            j = i + o
            # reflect (symmetric) index folding
            while j < 0 or j >= n:
                if j < 0:
                    j = -j - 1
                if j >= n:
                    j = 2 * n - j - 1
            m[i, j] += w
    return m.astype(np.float32)


def gaussian_filter2d(x: jnp.ndarray, sigma: float, truncate: float = 4.0) -> jnp.ndarray:
    """Smooth the two spatial axes of (..., H, W) or (..., H, W, C) arrays.

    For channelled input pass the array as (..., H, W, C); set
    `channels_last=False` semantics by reshaping at the call site.
    """
    if x.ndim >= 3:
        h, w = x.shape[-3], x.shape[-2]
        gh = jnp.asarray(gaussian_matrix(h, sigma, truncate))
        gw = jnp.asarray(gaussian_matrix(w, sigma, truncate))
        y = jnp.einsum("ah,...hwc->...awc", gh, x.astype(jnp.float32),
                       preferred_element_type=jnp.float32)
        y = jnp.einsum("bw,...awc->...abc", gw, y,
                       preferred_element_type=jnp.float32)
        return y.astype(x.dtype)
    h, w = x.shape[-2], x.shape[-1]
    gh = jnp.asarray(gaussian_matrix(h, sigma, truncate))
    gw = jnp.asarray(gaussian_matrix(w, sigma, truncate))
    y = jnp.einsum("ah,hw->aw", gh, x.astype(jnp.float32))
    y = jnp.einsum("bw,aw->ab", gw, y)
    return y.astype(x.dtype)
