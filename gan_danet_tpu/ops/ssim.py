"""SSIM with an 11-tap gaussian window (sigma=1.5), matching the reference
implementation (models/losses.py:90-147): depthwise conv with zero ('SAME')
padding, C1=0.01^2, C2=0.03^2, biased (non-Bessel) variance estimates.

NHWC layout; the five window convolutions are expressed as one depthwise
conv over a stacked channel axis so XLA fuses them into a single pass.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    coords = np.arange(window_size, dtype=np.float64)
    g = np.exp(-((coords - window_size // 2) ** 2) / (2 * sigma**2))
    g = g / g.sum()
    w = np.outer(g, g)
    return w.astype(np.float32)


def _depthwise_blur(x: jnp.ndarray, window_size: int, sigma: float) -> jnp.ndarray:
    """(B,H,W,C) -> gaussian-window depthwise conv, zero padding."""
    c = x.shape[-1]
    w2d = jnp.asarray(_gaussian_window(window_size, sigma))
    kernel = jnp.tile(w2d[:, :, None, None], (1, 1, 1, c))  # (kh,kw,1,C)
    return jax.lax.conv_general_dilated(
        x.astype(jnp.float32),
        kernel,
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def ssim(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    window_size: int = 11,
    sigma: float = 1.5,
    size_average: bool = True,
) -> jnp.ndarray:
    """Structural similarity of two (B,H,W,C) images."""
    x = img1.astype(jnp.float32)
    y = img2.astype(jnp.float32)
    # Stack the five blur inputs on the channel axis -> one conv dispatch.
    c = x.shape[-1]
    stacked = jnp.concatenate([x, y, x * x, y * y, x * y], axis=-1)
    blurred = _depthwise_blur(stacked, window_size, sigma)
    mu1, mu2, ex2, ey2, exy = (
        blurred[..., :c],
        blurred[..., c : 2 * c],
        blurred[..., 2 * c : 3 * c],
        blurred[..., 3 * c : 4 * c],
        blurred[..., 4 * c :],
    )
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = ex2 - mu1_sq
    sigma2_sq = ey2 - mu2_sq
    sigma12 = exy - mu1_mu2

    c1 = 0.01**2
    c2 = 0.03**2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    if size_average:
        return jnp.mean(ssim_map)
    return jnp.mean(ssim_map, axis=(1, 2, 3))
