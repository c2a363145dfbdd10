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


@functools.lru_cache(maxsize=64)
def spline_zoom_matrix(n_in: int, n_out: int, order: int = 3) -> np.ndarray:
    """Exact (n_out, n_in) operator for scipy.ndimage.zoom along ONE axis
    (default grid_mode=False / mode='constant' semantics, incl. the
    B-spline prefilter).

    scipy's spline zoom — prefilter + evaluation on the fixed output grid
    — is a LINEAR map for fixed (n_in, n_out, order), so the operator is
    extracted exactly by resampling the identity basis with scipy itself
    (one (n_in, n_in) zoom call at setup). Parity with
    scipy.ndimage.zoom is then by construction (float-roundoff only,
    tests/test_resize.py), while the hot path becomes an MXU matmul
    instead of a host scipy call — the reference's 0.05deg pipeline zooms
    (T,440,900)-scale trend/bias/mask cubes on host (test.ipynb cell 3:
    zoom(trend25,(1,5,5)), zoom(biash,(1,1.25,1.25)), zoom(tpb_h,(5,5))),
    which round-3 measured as the stage-2 wall-time tail."""
    from scipy.ndimage import zoom as _scipy_zoom

    if n_in == n_out:
        return np.eye(n_in, dtype=np.float32)
    m = _scipy_zoom(np.eye(n_in, dtype=np.float64), (1.0, n_out / n_in),
                    order=order)
    if m.shape != (n_in, n_out):
        # scipy's output length is int(round(n_in * zoom)); guard the
        # contract with a real error (asserts vanish under python -O)
        raise ValueError(
            f"spline_zoom_matrix: scipy produced {m.shape}, expected "
            f"({n_in}, {n_out}) — non-representable zoom factor")
    return np.ascontiguousarray(m.T).astype(np.float32)


def spline_zoom2d(x: jnp.ndarray, size: Tuple[int, int],
                  order: int = 3) -> jnp.ndarray:
    """Device-resident scipy.ndimage.zoom over the two TRAILING axes of a
    (..., H, W) array (channel-less cubes — the stage-2 post-processing
    layout), as two f32 einsum contractions per axis.

    order=0 (nearest) runs as an index gather, not a matmul: each output
    samples exactly one input, so NaN stays LOCAL exactly as in scipy —
    a one-hot matmul would poison every output with 0*NaN (the ensemble
    uncertainty grid is NaN outside the plateau mask, test.ipynb:613).
    order>=1 operators assume finite inputs — zero-fill NaN first as
    predict_005 does for the bias grid (scipy's own spline prefilter
    would smear a NaN across the whole axis anyway)."""
    h_in, w_in = x.shape[-2], x.shape[-1]
    if order == 0:
        # a row can be ALL ZERO: scipy maps the last output coord to
        # n_in-1 + 1 ulp of float error, lands out of range and
        # constant-fills 0 (observed at 16->80: coord 15.000000000000002)
        # — mask those rows to 0 so gather == matmul == scipy exactly
        mh = spline_zoom_matrix(h_in, size[0], 0)
        mw = spline_zoom_matrix(w_in, size[1], 0)
        ih = jnp.asarray(np.argmax(mh, axis=1))
        iw = jnp.asarray(np.argmax(mw, axis=1))
        vh = jnp.asarray(mh.sum(axis=1) > 0)
        vw = jnp.asarray(mw.sum(axis=1) > 0)
        y = jnp.take(x, ih, axis=-2)
        y = jnp.where(vh[:, None], y, 0)
        y = jnp.take(y, iw, axis=-1)
        return jnp.where(vw, y, 0)
    mh = jnp.asarray(spline_zoom_matrix(h_in, size[0], order))
    mw = jnp.asarray(spline_zoom_matrix(w_in, size[1], order))
    y = jnp.einsum("ah,...hw->...aw", mh, x,
                   preferred_element_type=jnp.float32)
    y = jnp.einsum("bw,...aw->...ab", mw, y,
                   preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


def resize2d_scale(x: jnp.ndarray, scale: float, method: str = "bicubic") -> jnp.ndarray:
    """Resize by scale factor: out size = floor(in * scale), torch semantics."""
    if x.ndim == 2:
        h_in, w_in = x.shape
    else:
        h_in, w_in = x.shape[-3], x.shape[-2]
    return resize2d(x, (int(h_in * scale), int(w_in * scale)), method)
