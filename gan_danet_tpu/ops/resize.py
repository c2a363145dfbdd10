"""Torch-parity separable image resize as MXU matmuls.

The reference leans on `F.interpolate(mode='bicubic'|'bilinear',
align_corners=False)` everywhere: the training input construction
(GAN_DANet_train.ipynb cell 0: bicubic x0.5 of GRACE-0.5deg and x0.25 of the
aux stack), the generator's two bicubic x2 upsample stages
(models/generator.py:217-226), the bilinear skip-fusion resize
(models/generator.py:244), and the 0.05deg pipeline's x1.25/x4 stages
(test.ipynb cell 3).

TPU-first design: a 1-D resample with a fixed in/out size is a *linear* map,
so we precompute the (n_out, n_in) weight matrix once per (size, mode) pair
and apply it as two einsum contractions (rows then columns). That turns every
resize into dense matmuls that ride the MXU instead of gather-heavy
interpolation, is trivially differentiable, and bit-matches torch's kernel
(cubic convolution a=-0.75, half-pixel centers, edge-clamped taps,
antialias=False).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax.numpy as jnp
import numpy as np


def _cubic_weight(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Cubic convolution kernel (Keys), torch uses a=-0.75."""
    t = np.abs(t)
    t2 = t * t
    t3 = t2 * t
    w = np.where(
        t <= 1.0,
        (a + 2.0) * t3 - (a + 3.0) * t2 + 1.0,
        np.where(t < 2.0, a * t3 - 5.0 * a * t2 + 8.0 * a * t - 4.0 * a, 0.0),
    )
    return w


@functools.lru_cache(maxsize=256)
def resize_matrix(n_in: int, n_out: int, method: str = "bicubic") -> np.ndarray:
    """(n_out, n_in) resampling matrix with torch `align_corners=False`
    semantics: src = (dst + 0.5) * (n_in / n_out) - 0.5, tap indices clamped
    to the valid range (replicate edges), tap weights NOT renormalised —
    exactly torch's upsample_bicubic2d / upsample_bilinear2d behaviour."""
    if n_in == n_out:
        return np.eye(n_in, dtype=np.float32)
    ratio = n_in / n_out
    dst = np.arange(n_out, dtype=np.float64)
    src = (dst + 0.5) * ratio - 0.5
    i0 = np.floor(src).astype(np.int64)
    t = src - i0

    m = np.zeros((n_out, n_in), dtype=np.float64)
    if method == "bicubic":
        offsets = (-1, 0, 1, 2)
        weights = [
            _cubic_weight(t + 1.0),
            _cubic_weight(t),
            _cubic_weight(1.0 - t),
            _cubic_weight(2.0 - t),
        ]
    elif method in ("bilinear", "linear"):
        offsets = (0, 1)
        weights = [1.0 - t, t]
    elif method == "nearest":
        # torch 'nearest' (legacy): src = dst * ratio, floor
        idx = np.minimum((dst * ratio).astype(np.int64), n_in - 1)
        m[np.arange(n_out), idx] = 1.0
        return m.astype(np.float32)
    else:
        raise ValueError(f"unknown resize method: {method}")

    for off, w in zip(offsets, weights):
        idx = np.clip(i0 + off, 0, n_in - 1)
        np.add.at(m, (np.arange(n_out), idx), w)
    return m.astype(np.float32)


def resize2d(
    x: jnp.ndarray,
    size: Tuple[int, int],
    method: str = "bicubic",
) -> jnp.ndarray:
    """Resize the two spatial axes of an NHWC (or HW / NHW / NHWC) array.

    x: (..., H, W, C) for ndim>=3, or (H, W) for ndim==2.
    Matches torch `F.interpolate(x_nchw, size, mode=method,
    align_corners=False)` (verified in tests/test_resize.py against torch).
    """
    # NOTE: the resample matrices deliberately stay f32 even for bf16
    # activations — casting them to bf16 was measured NEUTRAL inside the
    # fused train step (round-3 interleaved timing, DESIGN.md §8), so the
    # extra precision is free.
    if x.ndim == 2:
        h_in, w_in = x.shape
        mh = jnp.asarray(resize_matrix(h_in, size[0], method))
        mw = jnp.asarray(resize_matrix(w_in, size[1], method))
        y = jnp.einsum("ah,hw->aw", mh, x, preferred_element_type=jnp.float32)
        y = jnp.einsum("bw,aw->ab", mw, y, preferred_element_type=jnp.float32)
        return y.astype(x.dtype)

    h_in, w_in = x.shape[-3], x.shape[-2]
    mh = jnp.asarray(resize_matrix(h_in, size[0], method))
    mw = jnp.asarray(resize_matrix(w_in, size[1], method))
    # (..., H, W, C): contract H then W; keep accumulation in f32.
    y = jnp.einsum("ah,...hwc->...awc", mh, x, preferred_element_type=jnp.float32)
    y = jnp.einsum("bw,...awc->...abc", mw, y, preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


def resize2d_scale(x: jnp.ndarray, scale: float, method: str = "bicubic") -> jnp.ndarray:
    """Resize by scale factor: out size = floor(in * scale), torch semantics."""
    if x.ndim == 2:
        h_in, w_in = x.shape
    else:
        h_in, w_in = x.shape[-3], x.shape[-2]
    return resize2d(x, (int(h_in * scale), int(w_in * scale)), method)
